"""Unit tests for operators/analytics.py (continuous-aggregate /
funnel / gap-fill extensions) against hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aeon_mecha_spark.operators import analytics

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_granularity_rollup_levels(spark):
    rows = [
        ("a", _ts(10), 1.0),
        ("a", _ts(70), 2.0),
        ("b", _ts(10), 4.0),
    ]
    df = spark.createDataFrame(rows, "t string, ts timestamp, value double")
    out = analytics.granularity_rollup(
        df, "ts", dims=["t"], aggs=[F.count(F.lit(1)).alias("n")],
        granularities=("day", "hour"),
    ).collect()
    by = {(r["t"], r["bucket_day"], r["bucket_hour"], r["level"]): r["n"] for r in out}
    assert by[("a", "2024-01-01", "2024-01-01 00:00", "hour")] == 1
    assert by[("a", "2024-01-01", "2024-01-01 01:00", "hour")] == 1
    assert by[("a", "2024-01-01", "(all)", "day")] == 2
    assert by[("a", "(all)", "(all)", "t")] == 2
    assert by[("(all)", "(all)", "(all)", "total")] == 3
    # one aggregate, 4 levels: 3 hour rows + 2 day + 2 dim + 1 total
    assert len(out) == 8


def test_pivot_table_fills_empty_cells(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "k int, t string"
    )
    out = analytics.pivot_table(
        df, ["k"], "t", ["x", "y", "z"], F.count(F.lit(1))
    )
    by = {r["k"]: r for r in out.collect()}
    assert (by[1]["x"], by[1]["y"], by[1]["z"]) == (2, 0, 0)
    assert (by[2]["x"], by[2]["y"], by[2]["z"]) == (0, 1, 0)


def test_time_weighted_avg_exact(spark):
    # value 10 held 60 s, value 20 held 180 s -> twa = (10*60+20*180)/240
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(1), 20.0),
        (1, _ts(4), 99.0),  # last obs carries no weight
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, value double")
    r = analytics.time_weighted_avg(df, "ts", "value", ["k"]).collect()[0]
    assert r["twa"] == (10 * 60 + 20 * 180) / 240
    assert r["span_us"] == 240 * 1_000_000


def test_gap_fill_locf_synthesizes_missing_buckets(spark):
    rows = [(1, _ts(0), 5.0), (1, _ts(180), 7.0)]  # hours 0 and 3
    df = spark.createDataFrame(rows, "k int, bucket timestamp, value double")
    out = analytics.gap_fill_locf(df, "bucket", ["value"], ["k"], "1 hour")
    got = sorted((r["bucket"], r["value"], r["filled"]) for r in out.collect())
    assert got == [
        (_ts(0), 5.0, False),
        (_ts(60), 5.0, True),
        (_ts(120), 5.0, True),
        (_ts(180), 7.0, False),
    ]


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes all 3 in order
        (1, "s1", _ts(0)), (1, "s2", _ts(1)), (1, "s3", _ts(2)),
        # u2 has s2 BEFORE s1 (doesn't count) and none after -> depth 1
        (2, "s2", _ts(0)), (2, "s1", _ts(1)),
        # u3 never does s1 -> excluded entirely
        (3, "s2", _ts(0)), (3, "s3", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "u int, t string, ts timestamp")
    per_user = analytics.funnel(df, "u", "t", "ts", ["s1", "s2", "s3"])
    depths = {r["u"]: r["depth"] for r in per_user.collect()}
    assert depths == {1: 3, 2: 1}
    counts = analytics.funnel_counts(df, "u", "t", "ts", ["s1", "s2", "s3"]).collect()[0]
    assert (counts["n_step_1"], counts["n_step_2"], counts["n_step_3"]) == (2, 1, 1)


def test_rank_quantiles_deterministic_ties(spark):
    rows = [("g", float(v), i) for i, v in enumerate([1, 1, 1, 1, 2, 2, 2, 2])]
    df = spark.createDataFrame(rows, "g string, value double, id int")
    out = analytics.rank_quantiles(df, ["g"], "value", ["id"], n=4)
    by = {r["bucket"]: (r["n"], r["lo"], r["hi"]) for r in out.collect()}
    assert by == {1: (2, 1.0, 1.0), 2: (2, 1.0, 1.0), 3: (2, 2.0, 2.0), 4: (2, 2.0, 2.0)}


def test_funnel_counts_zero_on_empty_step_one(spark):
    df = spark.createDataFrame([(1, "other", T0)], "u int, t string, ts timestamp")
    r = analytics.funnel_counts(df, "u", "t", "ts", ["s1", "s2"]).collect()[0]
    assert (r["n_step_1"], r["n_step_2"]) == (0, 0)


def test_funnel_rejects_empty_steps(spark):
    import pytest

    df = spark.createDataFrame([(1, "a", T0)], "u int, t string, ts timestamp")
    with pytest.raises(ValueError, match="at least one step"):
        analytics.funnel(df, "u", "t", "ts", [])
