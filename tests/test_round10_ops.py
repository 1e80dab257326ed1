"""Round-10 operator tests: vendored baseline JPEG codec (S17/F22),
distributed JPEG decode, and the grain-side mad_outliers rewrite."""

from __future__ import annotations

import struct

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# JPEG codec — spec-level decode checks independent of the encoder

def _handmade_dc_only_jpeg(pq16: bool = False) -> bytes:
    """Hand-assembled baseline JPEG: 8x8 grayscale, quant table all 16s,
    single DC-only block with quantized DC = +5 (diff from predictor 0).

    Entropy bits, derived by hand from the Annex K canonical tables:
    DC size symbol 3 → code ``100``; magnitude bits of +5 → ``101``;
    EOB (AC symbol 0x00) → ``1010``; 1-padded to two bytes:
    ``10010110 10111111`` = 0x96 0xBF.

    Expected pixels: dequantized DC = 80; orthonormal IDCT of a DC-only
    block is flat 80/8 = 10; +128 level shift = 138 everywhere — a
    closed-form identity, so a decoder bug cannot cancel against the
    encoder.
    """
    from aeon_mecha_spark.datapipe.jpegcodec import DC_LUMA, AC_LUMA

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    if pq16:
        dqt = bytes([0x10]) + b"".join(struct.pack(">H", 16) for _ in range(64))
    else:
        dqt = bytes([0x00]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    dht = bytes([0x00]) + bytes(DC_LUMA[0]) + bytes(DC_LUMA[1])
    dht += bytes([0x10]) + bytes(AC_LUMA[0]) + bytes(AC_LUMA[1])
    sos = bytes([1]) + struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"
    return (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + bytes([0x96, 0xBF])
        + b"\xff\xd9"
    )


def test_jpeg_decode_handmade_dc_only_exact():
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg

    img = decode_jpeg(_handmade_dc_only_jpeg())
    assert img.shape == (8, 8, 1)
    assert img.min() == img.max() == 138


def test_jpeg_decode_16bit_quant_table():
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg

    img = decode_jpeg(_handmade_dc_only_jpeg(pq16=True))
    assert img.min() == img.max() == 138


def test_jpeg_flat_roundtrip_exact():
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg

    for v in (0, 73, 128, 200, 255):
        img = np.full((16, 16), v, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=50))
        # flat blocks quantize to DC-only; IDCT returns the flat value
        # to within the DC quantization step (≤ half of q/8 = 1)
        assert abs(int(dec[:, :, 0].max()) - v) <= 1
        assert dec[:, :, 0].min() == dec[:, :, 0].max()


def test_jpeg_gray_roundtrip_close():
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    x = np.linspace(0, 255, 32)
    img = np.clip(
        np.add.outer(x, x) / 2 + rng.normal(0, 2, (32, 32)), 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_jpeg_rgb_subsampling_roundtrip_odd_dims():
    """4:4:4, 4:2:2 (asymmetric h=2,v=1 — exercises the decoder's
    general sampling-factor path), and 4:2:0 on non-multiple-of-MCU
    dimensions."""
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:33, 0:29]
    img = np.clip(np.stack([yy * 2 + 10, xx * 3 + 5, yy + xx], axis=-1), 0, 255).astype(
        np.uint8
    )
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 12, (sub, err.max())
        assert err.mean() < 3.0, (sub, err.mean())


def test_jpeg_restart_interval_identical_decode():
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:40, 0:24]
    img = np.clip(np.stack([yy * 4, xx * 7, (yy + xx) * 2], axis=-1), 0, 255).astype(
        np.uint8
    )
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=85, subsampling="4:2:0", restart_interval=2)
    )
    np.testing.assert_array_equal(plain, with_rst)


def test_jpeg_guards():
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    # flip the handmade stream's SOF0 marker to SOF2 (progressive)
    payload = bytearray(_handmade_dc_only_jpeg())
    idx = payload.index(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(payload))
    # 12-bit precision
    payload = bytearray(_handmade_dc_only_jpeg())
    idx = payload.index(b"\xff\xc0")
    payload[idx + 4] = 12  # precision byte of the SOF payload
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=0)


def test_decode_images_distributed_mixed_png_jpeg(spark):
    """The S17 decode stage handles PNG and JPEG payloads side by side
    inside one mapInPandas pass — dims exact for both, pixel stats
    exact for PNG and matching a local decode for JPEG."""
    import zlib

    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg
    from aeon_mecha_spark.datapipe.multimodal import decode_images, encode_png

    rng = np.random.default_rng(7)
    rows, expected = [], {}
    for mid in range(6):
        h, w = 9 + mid, 12 + (mid % 3)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if mid % 2 == 0:
            payload = encode_png(img)
            pix = img
        else:
            payload = encode_jpeg(img, quality=90)
            pix = decode_jpeg(payload)  # JPEG is lossy: compare vs local decode
        rows.append((mid, "image", w, h, 0, bytearray(payload)))
        expected[mid] = (
            w, h, 3,
            int(pix.astype(np.int64).sum()),
            zlib.crc32(pix.tobytes()) & 0xFFFFFFFF,
        )
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    ).repartition(3)
    got = {
        r["media_id"]: (
            r["width"], r["height"], r["channels"], r["pixel_sum"], r["pixel_crc"]
        )
        for r in decode_images(media).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# grain-side mad_outliers (round-10 rewrite) — exact mirror

def test_mad_outliers_matches_row_level_mirror(spark):
    from aeon_mecha_spark.operators.analytics import mad_outliers
    from aeon_mecha_spark.util import release_cached

    rng = np.random.default_rng(3)
    rows = []
    for k in ("a", "b"):
        vals = list(rng.integers(0, 40, 101))
        vals += [500, 500]  # wild values
        rows += [(k, float(v)) for v in vals]
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "k string, v double")
    out = mad_outliers(df, ["k"], "v", k=3.0)
    got = out.collect()
    release_cached(out)

    # python mirror: type-1 medians at rank ceil(n/2)

    by_k = {}
    for k, v in rows:
        if v is not None:
            by_k.setdefault(k, []).append(v)
    fences = {}
    for k, vs in by_k.items():
        vs = sorted(vs)
        med = vs[(len(vs) + 1) // 2 - 1]
        devs = sorted(abs(x - med) for x in vs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        fences[k] = (med, mad)
    for r in got:
        med, mad = fences[r["k"]]
        assert r["_median"] == med and r["_mad"] == mad
        if r["v"] is None:
            assert r["is_outlier"] is None
        else:
            assert r["is_outlier"] == (abs(r["v"] - med) > 3.0 * mad)
    # the wild rows must be flagged
    assert all(r["is_outlier"] for r in got if r["v"] == 500.0)


# ---------------------------------------------------------------------------
# organic-growth linearity, pinned (round 10 — VERDICT r09 item 9):
# the LSH dedup scale property can't silently regress

def test_organic_scale_lsh_pairs_grow_linearly(spark, tmp_path):
    """Build a 3x organic replica of the sf0.001 corpus (seeded
    substitution cipher per document replica, sign-flip per embedding
    replica — within-replica near-dup structure exactly preserved,
    replicas mutually novel) and pin that the LSH candidate-pair gates
    grow LINEARLY: q35 (MinHash-band Jaccard pairs) and q116 (semantic
    embedding dedup) must output ~3x the 1x rows — never ~9x, which is
    the all-pairs signature the bucketed plans exist to avoid."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(os.path.dirname(__file__), "..", "tools", "scale_probe.py")
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)
    import __spark_entry__ as entry

    n = 3
    scaled = sp.build_scaled(
        spark, n, organic=True,
        base_dir="/root/testdata/sf0.001", out_root=str(tmp_path),
    )
    qs = entry.queries()
    for gate in ("q35_lsh_jaccard", "q116_semantic_dedup"):
        base_rows = qs[gate](spark, "/root/testdata/sf0.001").count()
        scaled_rows = qs[gate](spark, scaled).count()
        # ~linear, not exact: the cipher/sign-flip re-hashes shingles
        # and bucket signs, so each replica's LSH banding RECALL is an
        # independent draw — per-replica pair counts fluctuate around
        # the 1x count. The pin only needs to exclude the quadratic
        # regime: at n=3, all-pairs behavior would land near n²·base
        # (9x = 3·(n·base)), far outside the [0.55, 1.8]·n·base band.
        lo = int(0.55 * n * base_rows)
        hi = int(1.8 * n * base_rows) + 4
        assert lo <= scaled_rows <= hi, (gate, base_rows, scaled_rows)


def test_serve_frames_base64_full_pipeline(spark):
    """The frame-server contract end-to-end, distributed: PNG and JPEG
    inputs decode, downscale to max_side, re-encode as baseline JPEG,
    base64 — and the served payload decodes back to the expected
    dimensions with pixels close to a local nearest-neighbor resize."""
    import base64

    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg
    from aeon_mecha_spark.datapipe.multimodal import encode_png, serve_frames_base64

    yy, xx = np.mgrid[0:40, 0:64]
    img = np.clip(np.stack([yy * 4, xx * 2, yy + xx], axis=-1), 0, 255).astype(np.uint8)
    rows = [
        (0, "image", 64, 40, 0, bytearray(encode_png(img))),
        (1, "image", 64, 40, 0, bytearray(encode_jpeg(img, quality=95))),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    got = {r["media_id"]: r for r in serve_frames_base64(media, max_side=32).collect()}
    assert got[0]["out_width"] == 32 and got[0]["out_height"] == 20
    # local mirror of the nearest-neighbor resize
    yi = (np.arange(20) * 40) // 20
    xi = (np.arange(32) * 64) // 32
    expect = img[yi][:, xi]
    for mid in (0, 1):
        served = decode_jpeg(base64.b64decode(got[mid]["payload_b64"]))
        assert served.shape == (20, 32, 3)
        err = np.abs(served.astype(int) - expect.astype(int))
        assert err.mean() < 6.0, (mid, err.mean())


# ---------------------------------------------------------------------------
# round-10 analytics additions — exact Python mirrors

def test_cliffs_delta_matches_bruteforce_mirror(spark):
    from aeon_mecha_spark.operators.analytics import cliffs_delta
    from aeon_mecha_spark.util import release_cached
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    rows = []
    for k in ("g1", "g2"):
        for _ in range(40):
            rows.append((k, float(rng.integers(0, 12)), bool(rng.random() < 0.5)))
    rows.append(("g1", None, True))
    df = spark.createDataFrame(rows, "k string, v double, isa boolean")
    out = cliffs_delta(df, ["k"], "v", F.col("isa"))
    got = {r["k"]: r for r in out.collect()}
    release_cached(out)
    for k in ("g1", "g2"):
        a = [v for kk, v, isa in rows if kk == k and v is not None and isa]
        b = [v for kk, v, isa in rows if kk == k and v is not None and not isa]
        gt = sum(1 for x in a for y in b if x > y)
        lt = sum(1 for x in a for y in b if x < y)
        r = got[k]
        assert (r["n_a"], r["n_b"], r["gt"], r["lt"]) == (len(a), len(b), gt, lt)
        num = gt - lt
        expect = (1 if num > 0 else -1 if num < 0 else 0) * (
            abs(num) * 1_000_000 // (len(a) * len(b))
        )
        assert r["delta_ppm"] == expect
    # consistency with Mann-Whitney: gt + lt + ties == n_a * n_b
    r = got["g1"]
    assert r["gt"] + r["lt"] <= r["n_a"] * r["n_b"]


def test_cliffs_delta_extremes(spark):
    from aeon_mecha_spark.operators.analytics import cliffs_delta
    from aeon_mecha_spark.util import release_cached
    from pyspark.sql import functions as F

    rows = [("k", float(v), v >= 10) for v in range(20)]  # A strictly above B
    df = spark.createDataFrame(rows, "k string, v double, isa boolean")
    out = cliffs_delta(df, ["k"], "v", F.col("isa"))
    r = out.collect()[0]
    release_cached(out)
    assert r["delta_ppm"] == 1_000_000 and r["gt"] == 100 and r["lt"] == 0


def test_markov_transitions_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import markov_transitions

    # user 1: a b a b ; user 2: a a c — pairs: ab, ba, ab, aa, ac
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "a"), (2, 3, "c"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, ev string")
    got = {
        (r["from_type"], r["to_type"]): r
        for r in markov_transitions(df, "u", "ev", ["t"], alpha=1).collect()
    }
    # S = 3 states; n_from(a) = 4, n_from(b) = 1
    assert got[("a", "b")]["n"] == 2
    assert got[("a", "b")]["n_from"] == 4
    assert got[("a", "b")]["p_ppm"] == (2 + 1) * 1_000_000 // (4 + 3)
    assert got[("b", "a")]["p_ppm"] == (1 + 1) * 1_000_000 // (1 + 3)
    assert got[("a", "a")]["n"] == 1 and got[("a", "c")]["n"] == 1
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "a"), ("a", "c")}


def test_brier_decomposition_identity(spark):
    """rel/res/unc terms match a float mirror to within the documented
    floor quantization, and every emitted value is the exact integer
    the mirror's floored arithmetic produces."""
    from aeon_mecha_spark.operators.analytics import brier_decomposition
    from pyspark.sql import functions as F

    rng = np.random.default_rng(2)
    rows = [
        (int(s), bool(rng.random() * 1_000_000 < s))
        for s in rng.integers(0, 1_000_001, 600)
    ]
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = {r["bucket"]: r for r in
           brier_decomposition(df, F.col("y"), "s", n_buckets=5).collect()}
    # python mirror with identical floors
    buckets = {}
    for s, y in rows:
        b = s * 5 // 1000001
        n, npos, ss = buckets.get(b, (0, 0, 0))
        buckets[b] = (n + 1, npos + int(y), ss + s)
    N = sum(v[0] for v in buckets.values())
    NP = sum(v[1] for v in buckets.values())
    base = NP * 1_000_000 // N
    for b, (n, npos, ss) in buckets.items():
        conf = ss // n
        acc = npos * 1_000_000 // n
        r = got[b]
        assert (r["n"], r["n_pos"], r["conf_ppm"], r["acc_ppm"]) == (n, npos, conf, acc)
        assert r["rel_term"] == n * (conf - acc) ** 2
        assert r["res_term"] == n * (acc - base) ** 2
        assert r["unc_ppm2"] == base * (1_000_000 - base)


def test_jpeg_decoder_corrupt_streams_fail_cleanly():
    """Truncations and byte flips of a valid stream must raise a clean
    ValueError/NotImplementedError (or still decode, for flips that
    only perturb pixel data) — never hang, loop, or crash the
    interpreter. 60 seeded mutations."""
    import random

    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:16]
    img = np.clip(np.stack([yy * 8, xx * 9, yy + xx], axis=-1), 0, 255).astype(np.uint8)
    good = encode_jpeg(img, quality=80, subsampling="4:2:0")
    rng = random.Random(99)
    for trial in range(60):
        buf = bytearray(good)
        if trial % 2 == 0:  # truncate
            cut = rng.randrange(2, len(buf))
            buf = buf[:cut]
        else:  # flip a byte
            pos = rng.randrange(2, len(buf) - 2)
            buf[pos] ^= 1 << rng.randrange(8)
        try:
            out = decode_jpeg(bytes(buf))
            # decoded despite the mutation: must still be a sane image
            assert out.dtype == np.uint8 and out.shape[2] in (1, 3)
        except (
            ValueError, NotImplementedError, IndexError, KeyError,
            OverflowError, struct.error,
        ):
            pass  # clean, typed failure


# ---------------------------------------------------------------------------
# WAV audio + MJPEG video: the round-10 real decode paths

def test_wav_roundtrip_16bit_and_float():
    from aeon_mecha_spark.datapipe.multimodal import decode_wav, encode_wav

    t = np.arange(0, 800) / 8000.0
    stereo = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 880 * t)], axis=1)
    for bits, tol in ((16, 1.0 / 32768), (32, 1e-7)):
        dec, rate = decode_wav(encode_wav(stereo, 8000, bits=bits))
        assert rate == 8000 and dec.shape == (800, 2)
        assert np.abs(dec - stereo).max() <= tol + 1e-12


def test_wav_guards():
    import struct as _struct

    from aeon_mecha_spark.datapipe.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG not audio")
    # compressed tag (2 = ADPCM) must raise a named error
    good = bytearray(encode_wav(np.zeros(16), 8000))
    i = good.index(b"fmt ") + 8
    good[i : i + 2] = _struct.pack("<H", 2)
    with pytest.raises(NotImplementedError, match="tag 2"):
        decode_wav(bytes(good))


def test_audio_features_real(spark):
    """fake=False yields real spectral features for WAV payloads: a
    440 Hz tone and white noise must separate in band energies, and
    RMS/duration match analytic values."""
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe import multimodal as MM

    t = np.arange(0, 4000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    rng = np.random.default_rng(0)
    noise = 0.5 * rng.standard_normal(4000)
    media = spark.createDataFrame(
        [
            Row(media_id=1, modality="audio", width=0, height=0,
                duration_ms=500, payload=bytearray(MM.encode_wav(tone, 8000, bits=32))),
            Row(media_id=2, modality="audio", width=0, height=0,
                duration_ms=500, payload=bytearray(MM.encode_wav(noise, 8000, bits=32))),
        ],
        schema=MM.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: np.array(r["feature"])
           for r in MM.extract_features(media, dim=16, fake=False).collect()}
    # duration = n/rate; RMS of 0.5*sin = 0.5/sqrt(2)
    assert abs(got[1][-1] - 0.5) < 1e-6
    assert abs(got[1][-3] - 0.5 / np.sqrt(2)) < 1e-3
    # the tone's band spectrum is concentrated (one band ~1, most ~0);
    # noise spreads across bands
    tone_bands, noise_bands = got[1][:13], got[2][:13]
    assert (tone_bands > 0.5).sum() <= 2
    assert (noise_bands > 0.2).sum() >= 6


def test_mjpeg_split_and_distributed_frame_decode(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg
    from aeon_mecha_spark.datapipe.multimodal import (
        decode_video_frames,
        split_mjpeg_frames,
    )

    frames = []
    for k in range(5):
        yy, xx = np.mgrid[0:16, 0:24]
        img = np.clip(np.stack([yy * 4 + k * 30, xx * 5, yy + xx], -1), 0, 255).astype(
            np.uint8
        )
        frames.append(encode_jpeg(img, quality=88))
    stream = b"".join(frames)
    parts = split_mjpeg_frames(stream)
    assert parts == frames  # lossless split on frame boundaries
    media = spark.createDataFrame(
        [Row(media_id=9, modality="video", width=24, height=16,
             duration_ms=200, payload=bytearray(stream))],
        "media_id long, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    rows = {r["frame_idx"]: r for r in decode_video_frames(media, every_n=2).collect()}
    assert set(rows) == {0, 2, 4}
    import zlib as _zlib

    for idx in (0, 2, 4):
        img = decode_jpeg(frames[idx])
        assert rows[idx]["pixel_sum"] == int(img.astype(np.int64).sum())
        assert rows[idx]["pixel_crc"] == _zlib.crc32(img.tobytes()) & 0xFFFFFFFF


def test_mjpeg_video_features_real(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe import multimodal as MM
    from aeon_mecha_spark.datapipe.jpegcodec import encode_jpeg

    rng = np.random.default_rng(4)
    frames = [
        encode_jpeg(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), quality=90)
        for _ in range(4)
    ]
    media = spark.createDataFrame(
        [Row(media_id=3, modality="video", width=16, height=16,
             duration_ms=160, payload=bytearray(b"".join(frames)))],
        schema=MM.MEDIA_SCHEMA,
    )
    rows = MM.extract_features(media, dim=16, fake=False).collect()
    assert len(rows) == 1 and len(rows[0]["feature"]) == 16
