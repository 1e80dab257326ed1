"""Round-trip tests for the zarr v2 numpy fallback decoder (S11 decode
path): stores are written by hand (json metadata + raw/zlib chunk
files, the on-disk v2 format), then read back both directly and through
the distributed mapInPandas reader."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest

from aeon_mecha_spark.sources.zarr_source import decode_zarr_v2, read_zarr_array, resolve_twins


def _write_store(path, arr, chunks, compressor=None, order="C", fill_value=0, skip=()):
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": compressor,
        "fill_value": fill_value,
        "order": order,
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    grid = [-(-s // c) for s, c in zip(arr.shape, chunks)]
    import itertools

    for idx in itertools.product(*[range(g) for g in grid]):
        if idx in skip:
            continue
        # v2 stores FULL-SIZE chunks; edge chunks are padded
        block = np.full(chunks, fill_value, dtype=arr.dtype)
        sel = tuple(slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, arr.shape))
        part = arr[sel]
        block[tuple(slice(0, p) for p in part.shape)] = part
        raw = block.tobytes(order=order)
        if compressor is not None:
            raw = zlib.compress(raw)
        with open(os.path.join(path, ".".join(map(str, idx))), "wb") as f:
            f.write(raw)


def test_decode_uncompressed_2d_with_edge_chunks(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.normal(size=(10, 7)).astype("<f8")
    store = str(tmp_path / "a.zarr")
    _write_store(store, arr, chunks=(4, 3))
    np.testing.assert_array_equal(decode_zarr_v2(store), arr)


def test_decode_zlib_int16_fortran_order(tmp_path):
    arr = (np.arange(60, dtype="<i2") * 7).reshape(12, 5)
    store = str(tmp_path / "b.zarr")
    _write_store(store, arr, chunks=(5, 5), compressor={"id": "zlib", "level": 5}, order="F")
    np.testing.assert_array_equal(decode_zarr_v2(store), arr)


def test_decode_missing_chunk_uses_fill_value(tmp_path):
    arr = np.ones((6, 4), dtype="<f4")
    store = str(tmp_path / "c.zarr")
    _write_store(store, arr, chunks=(3, 4), fill_value=-9.0, skip={(1, 0)})
    out = decode_zarr_v2(store)
    np.testing.assert_array_equal(out[:3], arr[:3])
    assert (out[3:] == -9.0).all()


def test_decode_rejects_blosclz_with_clear_error(tmp_path):
    """A structurally valid blosc chunk whose inner codec is blosclz
    (codec bits 5-7 = 0 — the one codec with no stdlib/pyarrow
    implementation) must raise naming the missing library."""
    from aeon_mecha_spark.sources.zarr_source import encode_blosc1_zlib

    arr = np.arange(4, dtype="<f8").reshape(2, 2)
    store = str(tmp_path / "d.zarr")
    _write_store(store, arr, chunks=(2, 2), compressor=None)
    meta = json.load(open(os.path.join(store, ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "blosclz", "shuffle": 1}
    json.dump(meta, open(os.path.join(store, ".zarray"), "w"))
    chunk = bytearray(encode_blosc1_zlib(arr.tobytes(), typesize=8))
    chunk[2] = chunk[2] & 0x1F  # rewrite codec bits to 0 = blosclz
    with open(os.path.join(store, "0.0"), "wb") as f:
        f.write(bytes(chunk))
    with pytest.raises(NotImplementedError, match="blosclz"):
        decode_zarr_v2(store)


def test_blosc1_zstd_lz4_snappy_roundtrip():
    """The reference's actual intermediate codec is blosc-zstd
    (SPEC_ZARR_INTERMEDIATES.md) — decodable via pyarrow's raw codecs,
    as are lz4 and snappy."""
    from aeon_mecha_spark.sources.zarr_source import decode_blosc1, encode_blosc1_zlib

    a = (np.arange(5000, dtype="<i8") // 17).tobytes()
    for cname in ("zstd", "lz4", "snappy"):
        for ts, bs in ((8, 4096), (4, 1000)):
            enc = encode_blosc1_zlib(a, typesize=ts, blocksize=bs, cname=cname)
            assert decode_blosc1(enc) == a, (cname, ts, bs)
        enc = encode_blosc1_zlib(a, typesize=8, shuffle=False, cname=cname)
        assert decode_blosc1(enc) == a, cname


def test_blosc1_zlib_roundtrip_multiblock_shuffle():
    """Vendored blosc v1 frame codec: byte-shuffle + zlib, several
    blocks, a non-full tail block, both compressible and stored-raw
    streams."""
    from aeon_mecha_spark.sources.zarr_source import decode_blosc1, encode_blosc1_zlib

    rng = np.random.default_rng(7)
    # compressible structured data (int64 ramp) with an odd tail
    a = (np.arange(5000, dtype="<i8") // 17).tobytes()
    for ts, bs in ((8, 4096), (8, 1 << 20), (2, 512), (1, 333)):
        enc = encode_blosc1_zlib(a, typesize=ts, blocksize=bs)
        assert decode_blosc1(enc) == a, (ts, bs)
    # incompressible data exercises the stored-raw stream branch
    b = rng.bytes(4096)
    enc = encode_blosc1_zlib(b, typesize=4, blocksize=1024)
    assert decode_blosc1(enc) == b
    # unshuffled path
    enc = encode_blosc1_zlib(a, typesize=8, shuffle=False)
    assert decode_blosc1(enc) == a


def test_blosc1_memcpy_and_header_guards():
    import struct

    from aeon_mecha_spark.sources.zarr_source import decode_blosc1

    payload = b"\x01\x02\x03\x04" * 4
    head = struct.pack("<BBBBIII", 2, 1, 0x2, 4, len(payload), len(payload), 16 + len(payload))
    assert decode_blosc1(head + payload) == payload
    with pytest.raises(ValueError, match="header"):
        decode_blosc1(b"\x00" * 8)
    bad = struct.pack("<BBBBIII", 2, 1, 0x4, 4, 16, 16, 16)
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
        decode_blosc1(bad)
    # delta filter (flag bit 3) must raise, not silently mis-decode
    delta = struct.pack("<BBBBIII", 2, 1, 0x8 | (3 << 5), 4, 16, 16, 16)
    with pytest.raises(NotImplementedError, match="delta"):
        decode_blosc1(delta)
    # memcpy wins over any filter flag (c-blosc decoder order): a
    # stored-raw chunk that still carries bit-shuffle decodes as-is
    head = struct.pack(
        "<BBBBIII", 2, 1, 0x2 | 0x4, 4, len(payload), len(payload), 16 + len(payload)
    )
    assert decode_blosc1(head + payload) == payload


def test_blosc1_legacy_split_layout_named_error():
    """A shuffled non-LZ4 chunk whose block stream doesn't parse as the
    modern unsplit layout raises a NotImplementedError naming the
    legacy (c-blosc < 1.11) split layout, not an opaque size mismatch."""
    import struct

    from aeon_mecha_spark.sources.zarr_source import decode_blosc1

    # hand-build a zlib chunk in the LEGACY typesize-split layout:
    # 4 sub-streams of 4 bytes each for one 16-byte shuffled block
    import zlib as _zlib

    raw = bytes(range(16))
    streams = b""
    for i in range(4):
        part = raw[i * 4 : (i + 1) * 4]
        comp = _zlib.compress(part, 5)
        if len(comp) >= 4:  # stored raw
            streams += struct.pack("<i", 4) + part
        else:
            streams += struct.pack("<i", len(comp)) + comp
    flags = (3 << 5) | 0x1  # zlib + byte-shuffle
    head = struct.pack("<BBBBIII", 2, 1, flags, 4, 16, 16, 16 + 4 + len(streams))
    chunk = head + struct.pack("<i", 20) + streams
    with pytest.raises(NotImplementedError, match="split"):
        decode_blosc1(chunk)


def test_decode_zarr_store_with_blosc_zlib_chunks(tmp_path):
    """End-to-end: a zarr v2 store whose chunks are blosc(zlib, byte-
    shuffle) frames decodes through decode_zarr_v2 — the S11 shape the
    reference's compressed intermediates use, minus the env-blocked
    zstd inner codec."""
    from aeon_mecha_spark.sources.zarr_source import encode_blosc1_zlib

    rng = np.random.default_rng(3)
    arr = rng.integers(-1000, 1000, size=(37, 5)).astype("<i4")
    store = str(tmp_path / "b.zarr")
    _write_store(store, arr, chunks=(16, 5), compressor=None)
    meta = json.load(open(os.path.join(store, ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 1}
    json.dump(meta, open(os.path.join(store, ".zarray"), "w"))
    import itertools

    for idx in itertools.product(range(3), range(1)):
        block = np.zeros((16, 5), dtype="<i4")
        sel = tuple(slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, (16, 5), arr.shape))
        part = arr[sel]
        block[tuple(slice(0, p) for p in part.shape)] = part
        enc = encode_blosc1_zlib(block.tobytes(), typesize=4, blocksize=128)
        with open(os.path.join(store, ".".join(map(str, idx))), "wb") as f:
            f.write(enc)
    np.testing.assert_array_equal(decode_zarr_v2(store), arr)


def test_read_zarr_array_distributed_roundtrip(spark, tmp_path):
    """resolve_twins → read_zarr_array: the full S11 path, zarr preferred
    over its bin twin, decoded inside executor tasks."""
    rng = np.random.default_rng(11)
    ephys = rng.normal(size=(50, 3)).astype("<f8")  # samples x channels
    clock = np.arange(20, dtype="<u8").astype("<f8") * 32  # 1-D stream
    s1 = str(tmp_path / "stream_a.zarr")
    s2 = str(tmp_path / "stream_b.zarr")
    _write_store(s1, ephys, chunks=(16, 3), compressor={"id": "zlib", "level": 1})
    _write_store(s2, clock, chunks=(8,))
    listing = spark.createDataFrame(
        [(s1,), (str(tmp_path / "stream_a.bin"),), (s2,)], "file_path string"
    )
    resolved = resolve_twins(listing, prefer="zarr")
    assert {r["resolved_format"] for r in resolved.collect()} == {"zarr"}
    out = read_zarr_array(spark, resolved).toPandas()
    a = out[out.store_path == s1].sort_values("idx")
    np.testing.assert_array_equal(np.stack(a["values"].to_numpy()), ephys)
    b = out[out.store_path == s2].sort_values("idx")
    np.testing.assert_array_equal(np.stack(b["values"].to_numpy())[:, 0], clock)
