"""Declarative data-quality constraint checking (Deequ/Great-Expectations
style) over any table — the validation layer a production ingest runs
before publishing a partition.

The reference guards its pipeline with per-table QC rules and golden-count
assertions (/root/reference/aeon/dj_pipeline/qc.py:64-108 row-level QC
metrics; /root/reference/docs/specs/SPEC_TESTING.md:66 exact-count gates).
This module generalizes that idea into a reusable, engine-level constraint
suite: each constraint reports its violation count and pass/fail status in
ONE result table, so a scheduler can gate a publish on ``status = 'fail'``.

Scale shape: every row-level check (not-null, range, accepted values,
arbitrary predicate) and every uniqueness check folds into a SINGLE
aggregate pass over the table — one scan, map-side partial aggregation,
a 1-row result. Referential-integrity checks add one left-anti join each
(shuffled on the key, count-aggregated to 1 row) and are crossJoin'd onto
the same 1-row spine — the only "wide" rows ever materialized are the
final one-row-per-constraint explode. Nothing here is collect()ed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null",
    "in_range",
    "accepted_values",
    "satisfies",
    "check_constraints",
]


def not_null(col: str) -> tuple[str, Column]:
    """Violation when ``col`` is NULL."""
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violation when ``col`` is NULL or outside [lo, hi]."""
    c = F.col(col)
    return (f"in_range({col},{lo},{hi})", c.isNull() | ~c.between(lo, hi))


def accepted_values(col: str, values: Sequence) -> tuple[str, Column]:
    """Violation when ``col`` is NULL or not in the accepted set."""
    c = F.col(col)
    shown = ",".join(str(v) for v in values)
    return (f"accepted_values({col},[{shown}])", c.isNull() | ~c.isin(list(values)))


def satisfies(name: str, predicate: Column) -> tuple[str, Column]:
    """Violation when ``predicate`` is not TRUE (NULL counts as violation)."""
    return (f"satisfies({name})", ~F.coalesce(predicate, F.lit(False)))


def check_constraints(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]] = (),
    unique: Sequence[Sequence[str]] = (),
    foreign_keys: Sequence[tuple[str, Sequence[str], DataFrame, Sequence[str]]] = (),
) -> DataFrame:
    """Run a constraint suite and return one row per constraint:
    ``(constraint, n_rows, violations, status)`` with status
    'pass' iff violations == 0.

    ``checks``: (name, violation_condition) pairs — see the constructors
    above. ``unique``: key-column lists; violations = rows beyond the
    first per duplicate key (exact ``count - count_distinct``).
    ``foreign_keys``: (name, child_cols, parent_df, parent_cols) —
    violations = child rows whose key has no parent (left-anti count).

    One aggregate pass for checks+unique; one anti-join per FK; lazy
    until the caller acts.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_n")]
    names: list[str] = []
    for name, bad in checks:
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"_v{len(names)}")
        )
        names.append(name)
    for keys in unique:
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(F.struct(*keys)))
            .cast("long")
            .alias(f"_v{len(names)}")
        )
        names.append("unique(" + ",".join(keys) + ")")
    spine = df.agg(*aggs)
    for name, child_cols, parent, parent_cols in foreign_keys:
        k = len(names)
        child = df.select(
            *[F.col(c).alias(p) for c, p in zip(child_cols, parent_cols)]
        )
        viol = (
            child.join(parent.select(*parent_cols).distinct(), list(parent_cols), "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias(f"_v{k}"))
        )
        spine = spine.crossJoin(F.broadcast(viol))  # 1-row side
        names.append(name)
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("constraint"), F.col(f"_v{i}").alias("violations")
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        spine.select(F.col("_n").alias("n_rows"), F.explode(rows).alias("_c"))
        .select(
            F.col("_c.constraint").alias("constraint"),
            "n_rows",
            F.col("_c.violations").alias("violations"),
            F.when(F.col("_c.violations") == 0, F.lit("pass"))
            .otherwise(F.lit("fail"))
            .alias("status"),
        )
    )
