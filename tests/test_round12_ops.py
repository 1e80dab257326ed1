"""Round-12 regression tests: ADVICE fixes from round 11.

Covers the five code-level advisories: the distributed discovery walk
must skip hidden directories exactly as the pre-r11 driver glob did
(NFS .snapshot mirrors would double-ingest chunks), a largesize moof
must anchor default-base-is-moof at the 16-byte header start, a trun
without sample sizes must fall back to the movie-level trex
default_sample_size, a fragmented trak without tkhd must raise by name
(never silently yield zero frames), and perplexity_buckets must hand
back its persisted grain via track_cached.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest


def _mjpeg_frames(n=3, w=16, h=8, seed=12):
    from aeon_mecha_spark.datapipe.jpegcodec import encode_jpeg

    rng = np.random.default_rng(seed)
    return [
        encode_jpeg(rng.integers(0, 255, (h, w, 3)).astype(np.uint8), quality=90)
        for _ in range(n)
    ]


def test_discovery_skips_hidden_mirror_dirs(spark, tmp_path):
    # ADVICE r11 (medium): glob('**') never matches hidden entries, so
    # the driver-glob era skipped .snapshot/.Trash mirrors; the
    # distributed os.listdir walk must too, or an NFS snapshot mirror
    # of the same chunks under a different rel-path double-ingests.
    from aeon_mecha_spark.sources import load as L
    from aeon_mecha_spark.sources.readers import REGISTRY

    rdr = REGISTRY["encoder"]
    root = tmp_path / "root"
    for epoch in range(3):
        dev = root / f"2024-01-0{epoch + 1}T00-00-00" / "Patch1"
        dev.mkdir(parents=True)
        for h in range(2):
            (dev / f"Patch1_Encoder_2024-01-0{epoch + 1}T{h:02d}-00-00.csv").write_text(
                "aeon_time,angle,intensity\n"
            )
    # .snapshot mirror: same chunk files, different root-relative path
    for epoch in range(3):
        dev = root / ".snapshot" / "daily.0" / f"2024-01-0{epoch + 1}T00-00-00" / "Patch1"
        dev.mkdir(parents=True)
        for h in range(2):
            (dev / f"Patch1_Encoder_2024-01-0{epoch + 1}T{h:02d}-00-00.csv").write_text(
                "aeon_time,angle,intensity\n"
            )
    driver = L.discover_chunk_files(str(root), rdr)
    dist = L.discover_chunk_files(str(root), rdr, spark=spark, distributed_threshold=0)
    assert dist == driver
    assert len(driver) == 6
    assert all("/.snapshot/" not in p for p, _ in driver)


def _promote_first_moof_to_largesize(buf: bytes) -> bytes:
    """Rewrite the first moof box to use a 64-bit largesize header
    (size field = 1, 8-byte largesize after the fourcc) and bump its
    trun data_offset by the 8 extra header bytes so the
    default-base-is-moof arithmetic still points at the same mdat
    payload. Produces a spec-legal file (ISO 14496-12 4.2)."""
    from aeon_mecha_spark.datapipe import mp4codec as M

    for btype, ps, pe, hs in M._boxes(buf, 0, len(buf)):
        if btype != b"moof":
            continue
        payload = bytearray(buf[ps:pe])
        # patch the trun data_offset (trun: fullbox hdr 4 + count 4,
        # then the signed offset) inside the copied payload
        for t, tps, tpe, _h in M._boxes(payload, 0, len(payload)):
            if t != b"traf":
                continue
            for bt, qs, _qe, _h2 in M._boxes(payload, tps, tpe):
                if bt == b"trun":
                    (off,) = struct.unpack_from(">i", payload, qs + 8)
                    struct.pack_into(">i", payload, qs + 8, off + 8)
        big = (
            struct.pack(">I", 1)
            + b"moof"
            + struct.pack(">Q", len(payload) + 16)
            + bytes(payload)
        )
        return buf[:hs] + big + buf[pe:]
    raise AssertionError("no moof in fixture")


def test_fmp4_largesize_moof_anchors_at_header_start():
    # ADVICE r11 (low): moof_start must be the header start even for a
    # 16-byte largesize header; ps - 8 would mis-anchor by 8 bytes and
    # silently extract wrong sample bytes.
    from aeon_mecha_spark.datapipe import mp4codec as M

    frames = _mjpeg_frames(4)
    flat = M.build_fmp4_mjpeg(frames, 16, 8, frames_per_fragment=2)
    assert M.split_mp4_frames(flat) == frames  # sanity: fixture intact
    big = _promote_first_moof_to_largesize(flat)
    assert big != flat
    assert M.split_mp4_frames(big) == frames


def test_fmp4_trex_default_sample_size():
    # ADVICE r11 (low): a trun without per-sample sizes must use the
    # moov>mvex>trex default_sample_size (the code previously named
    # trex in the error but never read it).
    from aeon_mecha_spark.datapipe import mp4codec as M

    frames = [bytes([i]) * 120 for i in range(5)]  # equal-length samples
    payload = M.build_fmp4_mjpeg(
        frames, 16, 8, frames_per_fragment=2, use_trex_default_size=True
    )
    assert M.split_mp4_frames(payload) == frames
    assert M.probe_mp4(payload)["n_samples"] == 5
    # and with NO trex default either, the raise-by-name contract holds
    no_trex = payload.replace(b"trex", b"trxX", 1)
    with pytest.raises(ValueError, match="trex"):
        M.split_mp4_frames(no_trex)


def test_fmp4_missing_tkhd_raises_by_name():
    # ADVICE r11 (low): a fragmented video trak without tkhd must raise
    # (was: _video_track_id -> None -> zero frames, silently).
    from aeon_mecha_spark.datapipe import mp4codec as M

    frames = _mjpeg_frames(2)
    payload = M.build_fmp4_mjpeg(frames, 16, 8)
    broken = payload.replace(b"tkhd", b"tkhX", 1)
    with pytest.raises(ValueError, match="tkhd"):
        M.probe_mp4(broken)
    with pytest.raises(ValueError, match="tkhd"):
        M.split_mp4_frames(broken)


def test_perplexity_buckets_returns_cache_handle(spark):
    # ADVICE r11 (low): the persisted grain must ride along on the
    # result via track_cached so callers can release executor storage.
    from aeon_mecha_spark.datapipe.textqc import perplexity_buckets
    from aeon_mecha_spark.util import release_cached

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i}") for i in range(20)],
        "doc_id int, text string",
    )
    out = perplexity_buckets(docs)
    handles = getattr(out, "_aeon_cached", [])
    assert handles, "perplexity_buckets must track its persisted grain"
    assert out.count() == 20
    release_cached(out)
    assert all(not h.is_cached for h in handles)
