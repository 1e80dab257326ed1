"""Deterministic hashing primitives.

The reference identifies parameter sets by an MD5-of-sorted-dict UUID
(/root/reference/aeon/dj_pipeline/utils/hashing.py:7-13, used at
tracking.py:83-85). We keep MD5 as the engine-portable hash family: it is
bit-identical across Spark, DuckDB, and Python, which makes every
hash-derived operator (dedup keys, MinHash, LSH bands) oracle-checkable.

``md5_long`` maps a string to a 60-bit non-negative integer (15 hex
nibbles < 2^63), the workhorse for MinHash/SimHash/LSH. Seeded variants
emulate independent hash functions: h_i(x) = md5(i || ':' || x).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column, seed: int | None = None) -> Column:
    """60-bit integer hash of a string column (seeded ⇒ independent fn).

    DuckDB equivalent (used by oracles):
    ``('0x' || substr(md5(<seed> || ':' || x), 1, 15))::bigint``.
    """
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def key_hash(*cols: Column | str) -> Column:
    """MD5 identity of an ordered key tuple (ref hashing.py:7-13 hashes
    sorted dict key=value pairs; callers pass columns already sorted by
    name). NULLs are encoded distinctly from empty strings."""
    parts = [F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit("\x00null")) for c in cols]
    return F.md5(F.concat_ws("|", *parts))
