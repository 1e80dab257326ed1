"""Per-chunk summary statistics — parity with the reference's
``column_stats`` and ``timestamp_stats``
(/root/reference/aeon/dj_pipeline/utils/stats.py:14-39), which every
generated stream table stores per chunk (streams_maker.py:183-197).

The reference computes these per chunk in pandas; here they are one
distributed groupBy over the stream table — map-side partial aggregation,
no Python. Pinned semantics (tests/dj_pipeline/utils/test_stats_unit.py):

- min/max/mean over *finite* values only (NaN/±Inf excluded);
- mean rounded to 4 decimal places (stats.py:22);
- sampling_rate_hz = round(1e9 / median(diff(ns)), 2), NULL when fewer
  than 2 timestamps or non-positive median (stats.py:26-39).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _finite(c: Column) -> Column:
    return F.when((~F.isnan(c)) & (c != float("inf")) & (c != float("-inf")), c)


def column_stats_exprs(col: str) -> list[Column]:
    """Aggregate expressions for one numeric column (stats.py:14-23).

    The mean sums through decimal(27,6): double summation is
    order-dependent (partial aggregation order differs run to run and
    engine to engine), while decimal summation is exact and associative —
    the same trick makes the result reproducible on a 1000-executor
    cluster *and* bit-identical to the DuckDB oracle. The final value is
    rounded to 4 dp (stats.py:22 parity), far coarser than the 1e-6
    input quantization.
    """
    c = F.col(col).cast("double")
    fin = _finite(c)
    mean = F.round(
        F.sum(fin.cast("decimal(27,6)")).cast("double") / F.count(fin), 4
    )
    return [
        F.count(c).alias(f"{col}_count"),
        F.min(fin).alias(f"{col}_min"),
        F.max(fin).alias(f"{col}_max"),
        mean.alias(f"{col}_mean"),
    ]


def column_stats(df: DataFrame, cols: list[str], group_keys: list[str]) -> DataFrame:
    exprs: list[Column] = []
    for col in cols:
        exprs.extend(column_stats_exprs(col))
    return df.groupBy(*group_keys).agg(*exprs)


def timestamp_stats(df: DataFrame, ts_col: str, group_keys: list[str]) -> DataFrame:
    """min/max/count + median-diff sampling rate per group (stats.py:26-39).

    The lag-diff needs an ordered window per group; at scale the window
    partitions by the same keys as the final groupBy so there is exactly
    one shuffle, and the median uses exact ``percentile`` for parity
    (approx at 100 TB would use percentile_approx — the reference's
    numbers are per-chunk, so groups are small and exact is cheap).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_keys).orderBy(ts_col)
    ts = F.col(ts_col)
    diff_ns = (F.unix_micros(ts) - F.unix_micros(F.lag(ts, 1).over(w))) * 1000
    with_diff = df.select(*group_keys, ts_col).withColumn("_diff_ns", diff_ns)
    agg = with_diff.groupBy(*group_keys).agg(
        F.min(ts_col).alias("ts_min"),
        F.max(ts_col).alias("ts_max"),
        F.count(ts_col).alias("ts_count"),
        F.percentile(F.col("_diff_ns"), F.lit(0.5)).alias("_median_ns"),
    )
    rate = F.when(F.col("_median_ns") > 0, F.round(F.lit(1e9) / F.col("_median_ns"), 2))
    return agg.withColumn("sampling_rate_hz", rate).drop("_median_ns")


def table_profile(
    df: DataFrame,
    numeric_cols: list[str],
    other_cols: list[str] | None = None,
) -> DataFrame:
    """Long-form table profile — the "dataset card" primitive: one row
    per column with ``(column, n_rows, n_nulls, n_distinct, min_val,
    max_val)``; ``min_val``/``max_val`` are NULL for non-numeric
    columns (string formatting of extremes is not engine-portable, so
    only counts are profiled there).

    ONE aggregation over the table computes every column's stats
    simultaneously (Catalyst plans the multiple count-distincts via a
    single Expand — input rows multiply by the distinct-column count,
    the standard engine strategy, in exchange for a single scan and a
    single shuffle of tiny partials). The long form is produced by a
    map-side unpivot of the 1-row wide aggregate.
    """
    other_cols = list(other_cols or [])
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in [*numeric_cols, *other_cols]:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in numeric_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_val"),
                F.col(f"_mx_{c}").alias("max_val"),
            )
        )
    for c in other_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_val"),
                F.lit(None).cast("double").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
