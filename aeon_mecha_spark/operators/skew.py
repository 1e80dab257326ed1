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


def key_skew_stats(
    df: DataFrame,
    keys: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Hot-key diagnostic: the ``top_n`` heaviest join/group keys with
    their row counts and share of the table — the measurement that
    decides whether a join needs ``salted_join`` (or AQE skew split)
    BEFORE the straggler task appears in production.

    Output: ``(keys…, n, share, rank)`` ordered by weight;
    ``share = n / total`` (one double division — engine-exact). A key
    whose share approaches 1/shuffle-partitions is a straggler in
    waiting; a share over a few percent at 100 TB means that single
    reducer task receives terabytes.

    Plan: one hash-groupBy (map-side partial) + a TakeOrdered top-n on
    the counts (orderBy+limit — never a global window over the
    unbounded distinct-key table) + a 1-row total broadcast; the rank
    window runs over the already-limited ≤ top_n rows.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    order = [F.col("n").desc(), *[F.col(k).asc() for k in keys]]
    top = counts.orderBy(*order).limit(top_n)
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n").cast("double") / F.col("_total").cast("double"))
        .withColumn("rank", F.row_number().over(W.orderBy(*order)))
        .drop("_total")
    )
