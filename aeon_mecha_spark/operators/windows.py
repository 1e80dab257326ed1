"""Window/analytic operators (SURVEY.md §2.5).

Covers the reference's per-stream analytic patterns: lag deltas (QC frame
deltas, qc.py:92-99), running sums (frame_offset cumsum qc.py:99; patch
counters tracking.py:322), time-based rolling windows (wheel-moving
detector tracking.py:319), keep-first dedupe (load_metadata.py:37-46),
top-k per group (dj.Top, ephys.py:788-790), ownership dedup
(spike_sorting.py:1519-1560), and frontier bounds (spike_sorting.py:1283-1296).

All are single-shuffle Window plans: partitionBy the stream key, orderBy
time. At 100 TB the partition key (experiment, device/unit, chunk…) keeps
window state bounded per executor; no driver-side iteration anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _order(order_cols):
    return order_cols if isinstance(order_cols, list) else [order_cols]


def lag_delta(df: DataFrame, order_col: str | list[str], keys: list[str], cols: list[str], ns: bool = False) -> DataFrame:
    """Per-key successive differences (qc.py:92-99 ``df.diff()``).
    Timestamp columns produce deltas in seconds (double) — HARP parity.
    ``order_col`` may be a list for deterministic tie-breaks."""
    oc = _order(order_col)
    w = W.partitionBy(*keys).orderBy(*oc) if keys else W.orderBy(*oc)
    out = df
    for c in cols:
        col = F.col(c)
        if dict(df.dtypes)[c].startswith("timestamp"):
            us = F.unix_micros(col) - F.unix_micros(F.lag(col).over(w))
            delta = (us * 1000) if ns else (us / 1e6)
        else:
            delta = col - F.lag(col).over(w)
        out = out.withColumn(f"{c}_delta", delta)
    return out


def running_sum(df: DataFrame, value: Column, order_col: str | list[str], keys: list[str], alias: str) -> DataFrame:
    """Cumulative sum within key, ordered (qc.py:99; tracking.py:322)."""
    w = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy(*_order(order_col)).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn(alias, F.sum(value).over(w))


def rolling_time_sum(
    df: DataFrame, value: Column, ts_col: str, keys: list[str], window_us: int, alias: str
) -> DataFrame:
    """Trailing time-window sum, e.g. 1-s wheel-displacement detector
    (tracking.py:319 ``rolling("1s").sum()``). Range frame over epoch
    microseconds so sub-second windows are exact."""
    base = df.withColumn("_ts_us", F.unix_micros(F.col(ts_col)))
    w = (
        (W.partitionBy(*keys) if keys else W.partitionBy())
        .orderBy("_ts_us")
        .rangeBetween(-window_us, 0)
    )
    return base.withColumn(alias, F.sum(value).over(w)).drop("_ts_us")


def dedupe_first(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep-first dedupe with a deterministic order
    (load_metadata.py:37-46 `_dedupe`; ownership convention
    spike_sorting.py:1519-1560 = keys=(global_unit, chunk),
    order_by=block_start)."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def top_k_per_group(df: DataFrame, keys: list[str], order_by: list[Column], k: int) -> DataFrame:
    """Top-k within each group — the scalable form of ``dj.Top``."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def sign_change(df: DataFrame, flag: Column, order_col: str, keys: list[str], alias: str) -> DataFrame:
    """Falling-edge detector: ``flag.astype(int8).diff() < 0``
    (patch-exit events, tracking.py:318)."""
    w = W.partitionBy(*keys).orderBy(order_col) if keys else W.orderBy(order_col)
    i = flag.cast("int")
    return df.withColumn(alias, (i - F.lag(i).over(w)) < 0)


def forward_fill(df: DataFrame, col: str, order_col: str, keys: list[str]) -> DataFrame:
    """Pad-reindex equivalent (align wheel onto position timestamps,
    tracking.py:319-320): last non-null value at or before each row."""
    w = (
        (W.partitionBy(*keys) if keys else W.partitionBy())
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return df.withColumn(col, F.last(col, ignorenulls=True).over(w))


def rolling_rows_avg(
    df: DataFrame, value: Column, order_col: str | list[str], keys: list[str], n: int, alias: str
) -> DataFrame:
    """Trailing n-row moving average per key (the rows-frame sibling of
    ``rolling_time_sum``). Pass ``value`` as an exact decimal so the
    frame sum is associative; the mean is then decimal-sum → double →
    one IEEE division — bit-identical on any partitioning.

    AVG semantics: the denominator counts NON-NULL frame values (NULLs
    are excluded from both sum and count, like SQL AVG / pandas
    ``rolling(...).mean()``); an all-NULL frame yields NULL. Frames
    shorter than ``n`` (a key's first rows) average over the rows
    available — pandas ``rolling(n, min_periods=1)``."""
    w = (
        (W.partitionBy(*keys) if keys else W.partitionBy())
        .orderBy(*_order(order_col))
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn(
        alias, F.sum(value).over(w).cast("double") / F.count(value).over(w)
    )


def ewma_weights_micro(alpha_num: int, alpha_den: int, depth: int) -> list[int]:
    """EWMA lag weights ``α(1−α)^i`` for i = 0..depth−1 in exact
    micro-units, computed ONCE from the rational α = num/den in Python
    integer arithmetic — the same literals embed in the Spark plan and
    any SQL oracle (no runtime float powers)."""
    out = []
    for i in range(depth):
        # α(1−α)^i = num·(den−num)^i / den^(i+1), floored to micro
        out.append(1_000_000 * alpha_num * (alpha_den - alpha_num) ** i // alpha_den ** (i + 1))
    return out


def ewma(
    df: DataFrame,
    keys: list[str],
    order_cols: list,
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    depth: int = 16,
) -> DataFrame:
    """Exponentially-weighted moving average as a FINITE unrolled lag
    kernel — the streaming-telemetry smoother, made exact and
    engine-portable: true EWMA is a recursion no SQL window expresses,
    but its weights decay geometrically, so a ``depth``-term truncation
    (residual mass ``(1−α)^depth`` ≈ 1% at α=¼, depth=16) evaluated
    with LITERAL micro-unit weights is deterministic everywhere.

    Per row: ``ewma_milli = (Σᵢ lagᵢ(v)·wᵢ · 1000) div Σᵢ{present} wᵢ``
    — integer dot product over the last ``depth`` values, renormalized
    over the lags that exist (series heads shorter than the kernel use
    the weight mass actually present, like pandas ``adjust=True``).

    Plan: ONE per-key window carrying ``depth`` lag expressions over a
    single sort — no self-join, no frame collect. ``order_cols`` must
    be a unique total order. Appends ``ewma_milli``.
    """
    w = W.partitionBy(*keys).orderBy(*[F.col(c) for c in _order(order_cols)])
    weights = ewma_weights_micro(alpha_num, alpha_den, depth)
    num = F.lit(0).cast("decimal(38,0)")
    den = F.lit(0).cast("long")
    for i, wt in enumerate(weights):
        lag_i = F.lag(F.col(value_col), i).over(w)
        num = num + F.coalesce(lag_i.cast("decimal(38,0)") * F.lit(wt), F.lit(0))
        den = den + F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return (
        df.withColumn("_ewma_num", num)
        .withColumn("_ewma_den", den)
        .withColumn(
            "ewma_milli",
            F.expr("CAST(sign(_ewma_num) * ((abs(_ewma_num) * 1000) div _ewma_den) AS BIGINT)"),
        )
        .drop("_ewma_num", "_ewma_den")
    )
