"""Zarr compressed-intermediate source (S11; /root/reference/aeon/
dj_pipeline/utils/ephys_utils.py:24-72; docs/specs/SPEC_READ_COMPRESSED.md).

Reference semantics: every raw ``.bin`` may have a compressed ``.zarr``
twin; readers resolve the pair at read time preferring compressed
(prefer='zarr'), falling back per a preference matrix
(SPEC_READ_COMPRESSED.md:178-192).

Spark shape: twin resolution is a *catalog* operation over the file
listing (pure DataFrame — implemented here, tested); the decode stage is
``mapInPandas`` over resolved store paths. Decoding uses the zarr
library when present, else a pure numpy fallback that reads zarr **v2**
stores with ``compressor: null``, ``zlib``, or ``blosc`` whose inner
codec is zlib/zstd/lz4/snappy (vendored frame decoder; zstd — the
reference's actual intermediate codec — via pyarrow's raw codecs);
only blosc-blosclz and bit-shuffle still raise a clear error naming
the missing library.
"""

from __future__ import annotations

import itertools
import json
import os
import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - environment-dependent
    import zarr  # noqa: F401

    HAS_ZARR = True
except Exception:  # pragma: no cover
    HAS_ZARR = False

# Blosc1 chunk constants (c-blosc README_HEADER.rst — public format):
# byte 0 format version, byte 1 codec version, byte 2 flags, byte 3
# typesize, then three LE uint32: nbytes, blocksize, cbytes. Flags:
# bit 0 byte-shuffle, bit 1 pure memcpy, bit 2 bit-shuffle, bits 5-7
# inner codec (0 blosclz, 1 lz4, 2 snappy, 3 zlib, 4 zstd).
_BLOSC_SHUFFLE = 0x1
_BLOSC_MEMCPY = 0x2
_BLOSC_BITSHUFFLE = 0x4
_BLOSC_DELTA = 0x8
_BLOSC_LZ4 = 1
_BLOSC_SNAPPY = 2
_BLOSC_ZLIB = 3
_BLOSC_ZSTD = 4
# pyarrow (a hard Spark dependency) ships raw-block codecs for the
# non-zlib blosc inner codecs: zstd frames, raw LZ4 blocks
# (LZ4_compress_default — pyarrow 'lz4_raw'), raw snappy
_PA_CODEC_NAME = {_BLOSC_LZ4: "lz4_raw", _BLOSC_SNAPPY: "snappy", _BLOSC_ZSTD: "zstd"}


def _inner_decompress(codec: int, raw: bytes, out_size: int) -> bytes:
    if codec == _BLOSC_ZLIB:
        return zlib.decompress(raw)
    name = _PA_CODEC_NAME.get(codec)
    if name is None:
        raise NotImplementedError(
            f"blosc inner codec {codec} (blosclz) needs the blosc library"
        )
    try:
        import pyarrow as pa
    except Exception as exc:  # pragma: no cover - pyarrow is baked in
        raise NotImplementedError(
            f"blosc inner codec {name} needs pyarrow or the blosc library"
        ) from exc
    if not pa.Codec.is_available(name):  # pragma: no cover
        raise NotImplementedError(f"pyarrow build lacks the {name} codec")
    return pa.Codec(name).decompress(raw, out_size, asbytes=True)


def _unshuffle(b: np.ndarray, typesize: int) -> np.ndarray:
    """Invert blosc byte-shuffle: shuffled[i·n + j] = orig[j·ts + i]."""
    n = b.size // typesize
    return b.reshape(typesize, n).T.ravel()


def _shuffle(b: np.ndarray, typesize: int) -> np.ndarray:
    n = b.size // typesize
    return b.reshape(n, typesize).T.ravel()


def decode_blosc1(buf: bytes) -> bytes:
    """Pure-python Blosc v1 chunk decoder for the byte-shuffle + zlib /
    zstd / lz4 / snappy (and memcpy) cases — zstd being the codec the
    reference compresses its zarr intermediates with
    (SPEC_ZARR_INTERMEDIATES.md:40-57). zlib decodes with the stdlib;
    the others through pyarrow's raw-block codecs (a hard Spark
    dependency). Layout per the public c-blosc header spec: 16-byte
    header, then (unless memcpy) one LE int32 block-start offset per
    block; each block stream opens with an LE int32 compressed size —
    equal to the block's uncompressed size means stored-raw. zlib /
    zstd / snappy never split blocks in blosc1 (one stream per block);
    LZ4 chunks MAY be split into ``typesize`` sub-streams when shuffle
    is on — decoding first tries the unsplit layout and falls back to
    the typesize-split one. Shuffle is applied PER BLOCK before
    compression, so it is inverted per block here.

    blosclz, bit-shuffle, the delta filter, and the legacy (c-blosc
    < 1.11) all-codec split-block layout raise ``NotImplementedError``
    naming the missing library / layout.
    """
    if len(buf) < 16:
        raise ValueError("blosc chunk shorter than its 16-byte header")
    flags, typesize = buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", buf, 4)
    if cbytes != len(buf):
        raise ValueError(f"blosc header cbytes {cbytes} != chunk size {len(buf)}")
    if flags & _BLOSC_MEMCPY:
        # c-blosc's decoder honors memcpy before any filter flag — a
        # stored-raw chunk that still carries shuffle bits decodes as-is.
        return bytes(buf[16 : 16 + nbytes])
    if flags & _BLOSC_BITSHUFFLE:
        raise NotImplementedError("blosc bit-shuffle needs the blosc library")
    if flags & _BLOSC_DELTA:
        raise NotImplementedError("blosc delta filter needs the blosc library")
    codec = (flags >> 5) & 0x7

    def _read_streams(start: int, sizes: list[int]) -> bytes:
        parts, pos = [], start
        for out_size in sizes:
            (sbytes,) = struct.unpack_from("<i", buf, pos)
            raw = buf[pos + 4 : pos + 4 + sbytes]
            part = raw if sbytes == out_size else _inner_decompress(codec, raw, out_size)
            if len(part) != out_size:
                raise ValueError(f"blosc stream: got {len(part)} of {out_size} bytes")
            parts.append(part)
            pos += 4 + sbytes
        return b"".join(parts)

    shuffled = bool(flags & _BLOSC_SHUFFLE) and typesize > 1
    nblocks = max(1, -(-nbytes // blocksize)) if blocksize else 1
    bstarts = struct.unpack_from(f"<{nblocks}i", buf, 16)
    out = np.empty(nbytes, dtype=np.uint8)
    for j, bs in enumerate(bstarts):
        neblock = min(blocksize, nbytes - j * blocksize)
        try:
            block = _read_streams(bs, [neblock])
        except (ValueError, OSError, zlib.error) as exc:
            if codec != _BLOSC_LZ4 or typesize <= 1 or neblock % typesize:
                if shuffled:
                    # c-blosc < 1.11 split shuffled blocks into typesize
                    # sub-streams for EVERY codec; modern c-blosc only does
                    # so for LZ4. Name the layout instead of a raw mismatch.
                    raise NotImplementedError(
                        "blosc legacy typesize-split block layout (c-blosc "
                        "< 1.11) needs the blosc library"
                    ) from exc
                raise
            # c-blosc splits shuffled LZ4 blocks into typesize streams
            block = _read_streams(bs, [neblock // typesize] * typesize)
        b = np.frombuffer(block, dtype=np.uint8)
        out[j * blocksize : j * blocksize + neblock] = (
            _unshuffle(b, typesize) if shuffled else b
        )
    return out.tobytes()


_CNAME_TO_CODE = {
    "zlib": _BLOSC_ZLIB,
    "zstd": _BLOSC_ZSTD,
    "lz4": _BLOSC_LZ4,
    "snappy": _BLOSC_SNAPPY,
}


def _inner_compress(codec: int, raw: bytes) -> bytes:
    if codec == _BLOSC_ZLIB:
        return zlib.compress(raw, 5)
    import pyarrow as pa

    return pa.Codec(_PA_CODEC_NAME[codec]).compress(raw, asbytes=True)


def encode_blosc1_zlib(
    data: bytes,
    typesize: int,
    blocksize: int | None = None,
    shuffle: bool = True,
    cname: str = "zlib",
) -> bytes:
    """Blosc v1 chunk WRITER (byte-shuffle + zlib/zstd/lz4/snappy,
    unsplit stream layout) — the fixture generator for
    :func:`decode_blosc1` (the container has no blosc library to
    produce real chunks, so tests round-trip through this encoder,
    which follows the identical public header layout a real c-blosc
    chunk uses). Name kept from the zlib-only round-9 original."""
    nbytes = len(data)
    if typesize < 1 or nbytes % typesize:
        raise ValueError("nbytes must be a multiple of typesize")
    codec = _CNAME_TO_CODE[cname]
    if blocksize is None:
        blocksize = min(nbytes, max(typesize, 1 << 16))
    blocksize = max(typesize, blocksize - blocksize % typesize)
    nblocks = max(1, -(-nbytes // blocksize))
    arr = np.frombuffer(data, dtype=np.uint8)
    streams: list[bytes] = []
    for j in range(nblocks):
        neblock = min(blocksize, nbytes - j * blocksize)
        b = arr[j * blocksize : j * blocksize + neblock]
        if shuffle and typesize > 1:
            b = _shuffle(b, typesize)
        comp = _inner_compress(codec, b.tobytes())
        if len(comp) >= neblock:  # incompressible: store raw
            streams.append(struct.pack("<i", neblock) + b.tobytes())
        else:
            streams.append(struct.pack("<i", len(comp)) + comp)
    header_len = 16 + 4 * nblocks
    bstarts, pos = [], header_len
    for s in streams:
        bstarts.append(pos)
        pos += len(s)
    flags = (codec << 5) | (_BLOSC_SHUFFLE if shuffle and typesize > 1 else 0)
    head = struct.pack(
        "<BBBBIII", 2, 1, flags, min(typesize, 255), nbytes, blocksize, pos
    )
    return head + struct.pack(f"<{nblocks}i", *bstarts) + b"".join(streams)


def decode_zarr_v2(store_path: str) -> np.ndarray:
    """Pure numpy+json+zlib reader for a zarr v2 array directory.

    Supports the on-disk format the reference's intermediates use: C/F
    order, any numpy dtype string, ``compressor`` null, ``zlib``, or
    ``blosc`` with a zlib/zstd/lz4/snappy/memcpy inner codec
    (byte-shuffle inverted by the vendored :func:`decode_blosc1`; zstd
    is the reference's actual intermediate codec — decoded through
    pyarrow's raw codecs; only blosclz still needs the real blosc
    library), missing chunks filled with ``fill_value``. Runs
    identically on the driver or inside an executor task (no Spark/zarr
    imports).
    """
    with open(os.path.join(store_path, ".zarray"), "rb") as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise ValueError(f"{store_path}: not a zarr v2 store")
    if meta.get("filters"):
        raise NotImplementedError(f"{store_path}: zarr filters unsupported without the zarr library")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in ("zlib", "blosc"):
        raise NotImplementedError(
            f"{store_path}: compressor {comp.get('id')!r} needs the zarr/numcodecs "
            "libraries (null/zlib/blosc[zlib|zstd|lz4|snappy] decodable here)"
        )
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    order = meta.get("order", "C")
    fill = meta.get("fill_value", 0)
    sep = meta.get("dimension_separator", ".")
    arr = np.full(shape, 0 if fill is None else fill, dtype=dtype)
    grid = [max(1, -(-s // c)) for s, c in zip(shape, chunks)] or [1]
    for idx in itertools.product(*[range(g) for g in grid]):
        name = sep.join(str(i) for i in idx) if shape else "0"
        path = os.path.join(store_path, name)
        if not os.path.exists(path):
            continue  # missing chunk == fill_value
        with open(path, "rb") as f:
            raw = f.read()
        if comp is not None:
            raw = (
                decode_blosc1(raw)
                if comp.get("id") == "blosc"
                else zlib.decompress(raw)
            )
        chunk = np.frombuffer(raw, dtype=dtype).reshape(chunks, order=order)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, shape)
        )
        trim = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        arr[sel] = chunk[trim]
    return arr


def resolve_twins(listing: DataFrame, path_col: str = "file_path", prefer: str = "zarr") -> DataFrame:
    """Group ``X.bin`` / ``X.zarr`` twins by stem and pick per preference
    (SPEC_READ_COMPRESSED.md resolver matrix):

    prefer='zarr'  → zarr if present else bin;
    prefer='bin'   → bin if present else zarr;
    prefer='strict-zarr' → zarr only (rows without a zarr twin drop out).
    """
    p = F.col(path_col)
    stem = F.regexp_replace(p, r"\.(bin|zarr)$", "")
    ext = F.regexp_extract(p, r"\.(bin|zarr)$", 1)
    t = listing.select(p.alias("file_path"), stem.alias("stem"), ext.alias("ext"))
    g = t.groupBy("stem").agg(
        F.max(F.when(F.col("ext") == "zarr", F.col("file_path"))).alias("zarr_path"),
        F.max(F.when(F.col("ext") == "bin", F.col("file_path"))).alias("bin_path"),
    )
    if prefer == "zarr":
        resolved = F.coalesce(F.col("zarr_path"), F.col("bin_path"))
    elif prefer == "bin":
        resolved = F.coalesce(F.col("bin_path"), F.col("zarr_path"))
    elif prefer == "strict-zarr":
        resolved = F.col("zarr_path")
    else:
        raise ValueError(f"unknown preference {prefer!r}")
    out = g.withColumn("resolved_path", resolved).withColumn(
        "resolved_format", F.when(F.col("resolved_path").endswith(".zarr"), "zarr").otherwise("bin")
    )
    return out.filter(F.col("resolved_path").isNotNull())


def read_zarr_array(
    spark,
    resolved: DataFrame,
    path_col: str = "resolved_path",
) -> DataFrame:
    """Decode resolved zarr v2 stores distributedly via ``mapInPandas``.

    Input: one row per store (e.g. ``resolve_twins`` output). Each
    executor task decodes its stores locally — only row-shaped output
    crosses the wire, never whole arrays through the driver. Output is
    long-form: (store_path, idx, values) with ``idx`` the first-axis
    index and ``values`` the remaining axis as array<double> (a 1-D
    store yields single-element arrays), ready to join back onto sample
    indexes the way the reference aligns ephys blocks
    (ephys_utils.py:24-72).

    Uses the zarr library when installed; otherwise ``decode_zarr_v2``
    (null/zlib codecs). One store per task row keeps peak executor
    memory at one decoded array.
    """
    import pandas as pd  # local: executors import lazily

    paths = resolved.select(F.col(path_col).cast("string").alias("store_path"))

    def gen(batches):
        for pdf in batches:
            for store in pdf["store_path"]:
                if HAS_ZARR:  # pragma: no cover - container has no zarr
                    arr = np.asarray(zarr.open(store, mode="r"))
                else:
                    arr = decode_zarr_v2(store)
                mat = arr.reshape(arr.shape[0], -1) if arr.ndim > 1 else arr.reshape(-1, 1)
                yield pd.DataFrame(
                    {
                        "store_path": store,
                        "idx": np.arange(mat.shape[0], dtype=np.int64),
                        "values": [row.astype(np.float64) for row in mat],
                    }
                )

    return paths.mapInPandas(
        gen, schema="store_path string, idx long, values array<double>"
    )
