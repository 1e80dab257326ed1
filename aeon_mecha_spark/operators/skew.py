"""Skew mitigation for hot join keys.

A shuffle join hashes rows to reducers by key; one hot key (a viral
user, a default device id) lands its entire volume on ONE task and the
stage runs at the speed of that straggler. AQE's skew-join split
(`spark.sql.adaptive.skewJoin`) handles sort-merge joins after the fact;
`salted_join` is the explicit form that also works where AQE can't see
the skew (e.g. under a window or when statistics lag) and keeps the
plan's parallelism deterministic.

Scheme: the big (skewed) side gets a deterministic salt in [0, salt)
derived from a uniquifying column set; the small side is replicated
`salt`× with `explode(sequence(...))`. Join on (key, salt): each hot key
now spreads over `salt` reducers. Replication multiplies the small side
— keep `salt` modest (8–64) and the replicated side the smaller one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side
    replicated ``salt``×.

    ``salt_from``: columns of the skewed side whose hash spreads the hot
    key's rows (any high-cardinality column works; it need not be
    unique). Deterministic — same data ⇒ same placement, every run.
    Semantics are exactly ``skewed.join(small, on, how)`` for inner and
    left joins (each skewed row meets each matching small row exactly
    once, in exactly one salt bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "_salt" in skewed.columns or "_salt" in small.columns:
        raise ValueError("salted_join: inputs must not already have a '_salt' column")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(salt))
    left = skewed.withColumn("_salt", lsalt.cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return left.join(right, [*on, "_salt"], how).drop("_salt")
