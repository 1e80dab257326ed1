"""column_stats / timestamp_stats parity — edge cases pinned by the
reference's tests/dj_pipeline/utils/test_stats_unit.py:19-97 (empty,
all-NaN, ±Inf, partial NaN/Inf, 4-dp mean rounding, median-diff rate)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.operators.stats import column_stats, timestamp_stats

NAN = float("nan")
INF = float("inf")


def rows(spark, vals, key="a"):
    return spark.createDataFrame([Row(g=key, v=float(v)) for v in vals])


def one(df):
    return df.collect()[0]


def test_basic_stats(spark):
    r = one(column_stats(rows(spark, [1, 2, 3, 4]), ["v"], ["g"]))
    assert (r.v_count, r.v_min, r.v_max, r.v_mean) == (4, 1.0, 4.0, 2.5)


def test_mean_rounded_4dp(spark):
    r = one(column_stats(rows(spark, [1, 2]), ["v"], ["g"]))
    assert r.v_mean == 1.5
    r = one(column_stats(rows(spark, [1, 1, 1, 1, 1, 1, 0.9999999]), ["v"], ["g"]))
    assert r.v_mean == 1.0  # rounded to 4 dp


def test_nan_inf_excluded_from_min_max_mean(spark):
    r = one(column_stats(rows(spark, [1.0, NAN, INF, -INF, 3.0]), ["v"], ["g"]))
    assert r.v_count == 5  # count includes non-finite (pandas count parity)
    assert (r.v_min, r.v_max, r.v_mean) == (1.0, 3.0, 2.0)


def test_all_nonfinite_yields_nulls(spark):
    r = one(column_stats(rows(spark, [NAN, INF]), ["v"], ["g"]))
    assert r.v_min is None and r.v_max is None and r.v_mean is None


def ts_rows(spark, micros):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [Row(g="a", t=base + dt.timedelta(microseconds=int(u))) for u in micros]
    )


def test_timestamp_stats_rate(spark):
    # 10 Hz: diffs of 100_000 µs → rate 1e9/1e8 = 10.0
    df = ts_rows(spark, range(0, 1_000_000, 100_000))
    r = one(timestamp_stats(df, "t", ["g"]))
    assert r.ts_count == 10
    assert r.sampling_rate_hz == 10.0


def test_timestamp_stats_median_is_robust_to_gaps(spark):
    # one big gap doesn't change the median-based rate
    micros = list(range(0, 500_000, 100_000)) + [10_000_000, 10_100_000]
    r = one(timestamp_stats(ts_rows(spark, micros), "t", ["g"]))
    assert r.sampling_rate_hz == 10.0


def test_timestamp_stats_single_sample_null_rate(spark):
    r = one(timestamp_stats(ts_rows(spark, [0]), "t", ["g"]))
    assert r.sampling_rate_hz is None
