"""Multimodal pipeline demo — all three modalities, all vendored codecs:

    images: synthesize → encode (PNG + baseline JPEG, pure numpy) →
    media table → distributed decode stats → REAL feature extraction →
    embedding near-dup buckets → frame-server payloads (decode → resize
    → JPEG re-encode → base64), exactly the hop the reference's video
    frame server performs (video.py:47-55, cv2-free here);
    audio: WAV/PCM decode → spectral-band + RMS/ZCR features;
    video: raw MJPEG streams → distributed per-frame decode stats.

Run:  python examples/demo_multimodal.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe.jpegcodec import encode_jpeg
from aeon_mecha_spark.datapipe.multimodal import (
    decode_images,
    encode_png,
    extract_features,
    serve_frames_base64,
)
from aeon_mecha_spark.datapipe.similarity import near_duplicates_lsh
from aeon_mecha_spark.session import get_spark


def main() -> None:
    spark = get_spark("demo_multimodal")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)

    # 1. synthesize 12 frames: 6 scenes x 2 near-duplicate variants
    #    (tiny noise), half stored as PNG and half as baseline JPEG
    rows = []
    for scene in range(6):
        # distinct brightness band per scene -> disjoint histograms,
        # so only same-scene variants are near-duplicates
        lo = scene * 40
        base = rng.integers(lo, lo + 36, size=(48, 64, 3), dtype=np.uint8)
        for variant in range(2):
            img = np.clip(
                base.astype(int) + rng.integers(-2, 3, base.shape), 0, 255
            ).astype(np.uint8)
            mid = scene * 2 + variant
            payload = (
                encode_png(img) if mid % 2 == 0 else encode_jpeg(img, quality=92)
            )
            rows.append((mid, "image", 64, 48, 0, bytearray(payload)))
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    ).repartition(4)

    # 2. distributed decode: exact pixel stats per payload
    print("== decode_images (PNG + JPEG, vendored codecs) ==")
    decode_images(media).orderBy("media_id").show(12)

    # 3. REAL feature extraction (gray histogram + moments)
    feats = extract_features(media, dim=16).cache()
    print("== extract_features (real, fake=False) ==")
    feats.select("media_id", "n_bytes", F.slice("feature", 1, 4).alias("head")).show(4)

    # 4. near-duplicate scene detection on the real features
    emb = feats.select("media_id", F.col("feature").alias("embedding"))
    prng = np.random.default_rng(13)
    planes = prng.standard_normal((8, 16)).tolist()
    pairs = near_duplicates_lsh(
        emb, planes, id_col="media_id", vec_col="embedding", threshold=0.9
    )
    print("== near-dup pairs (same-scene variants should pair) ==")
    pairs.orderBy("id_a", "id_b").show(12)

    # 5. frame-server payloads: decode -> resize to 32 -> JPEG -> base64
    served = serve_frames_base64(media, max_side=32, quality=85)
    print("== frame server payloads ==")
    served.select(
        "media_id", "out_width", "out_height",
        F.length("payload_b64").alias("b64_len"),
    ).orderBy("media_id").show(4)

    # 6. audio: WAV tones -> real spectral features
    from aeon_mecha_spark.datapipe.multimodal import decode_video_frames, encode_wav

    t = np.arange(0, 4000) / 8000.0
    audio = spark.createDataFrame(
        [
            (100 + i, "audio", 0, 0, 500,
             bytearray(encode_wav(0.5 * np.sin(2 * np.pi * f * t), 8000, bits=32)))
            for i, f in enumerate((220, 440, 880))
        ],
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    print("== audio features (WAV, real: band energies + RMS/ZCR/dur) ==")
    extract_features(audio, dim=12).select(
        "media_id", F.slice("feature", 10, 3).alias("rms_zcr_dur")
    ).orderBy("media_id").show(3, truncate=False)

    # 6b. the same 440 Hz tone as FLAC: the vendored bit-level decoder
    # (fixed/LPC/Rice capable; verbatim-coded here) feeds the same
    # feature path and lands on the same duration/RMS
    from aeon_mecha_spark.datapipe.flaccodec import encode_flac_verbatim

    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int64)
    flac = spark.createDataFrame(
        [(110, "audio", 0, 0, 500,
          bytearray(encode_flac_verbatim(tone.reshape(-1, 1), 8000, bits=16)))],
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    print("== audio features (FLAC, vendored decoder) ==")
    extract_features(flac, dim=12).select(
        "media_id", F.slice("feature", 10, 3).alias("rms_zcr_dur")
    ).show(truncate=False)

    # 7. video: MJPEG stream -> distributed per-frame decode
    from aeon_mecha_spark.datapipe.jpegcodec import encode_jpeg as _ej

    yy, xx = np.mgrid[0:16, 0:24]
    stream = b"".join(
        _ej(np.clip(np.stack([yy * 8 + k * 25, xx * 6, yy + xx], -1), 0, 255)
            .astype(np.uint8), quality=88)
        for k in range(6)
    )
    video = spark.createDataFrame(
        [(200, "video", 24, 16, 240, bytearray(stream))],
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    print("== video: MJPEG per-frame decode stats (every 2nd frame) ==")
    decode_video_frames(video, every_n=2).orderBy("frame_idx").show()

    # 8. the same frames inside BOTH common containers: the vendored
    # RIFF (AVI) and ISO-BMFF (MP4) demuxers feed the same decode path
    from aeon_mecha_spark.datapipe import avicodec, mp4codec

    frames = [
        _ej(np.clip(np.stack([yy * 8 + k * 25, xx * 6, yy + xx], -1), 0, 255)
            .astype(np.uint8), quality=88)
        for k in range(3)
    ]
    containers = spark.createDataFrame(
        [
            (201, "video", 24, 16, 300,
             bytearray(avicodec.build_avi_mjpeg(frames, 24, 16, fps=10))),
            (202, "video", 24, 16, 300,
             bytearray(mp4codec.build_mp4_mjpeg(frames, 24, 16, fps=10))),
        ],
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    print("== video containers: AVI + MP4 demux -> identical frame stats ==")
    decode_video_frames(containers).orderBy("media_id", "frame_idx").show()
    spark.stop()


if __name__ == "__main__":
    main()
