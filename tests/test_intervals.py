"""Interval/as-of join semantics — staggered-window fixtures modeled on
the reference's deliberately misaligned IMU chunks
(tests/fixtures/ephys/ephys_factories.py:326-357: 90 000-tick chunks
offset 15 000 against 60 000-tick sync windows)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.operators.intervals import (
    asof_join,
    overlap_join,
    point_in_interval_join,
    range_join_bucketed,
)


@pytest.fixture(scope="module")
def staggered(spark):
    # sync windows: [0, 60k), [60k, 120k), [120k, 180k) per device
    sync = spark.createDataFrame(
        [Row(dev="d1", win=i, s=i * 60_000, e=(i + 1) * 60_000 - 1) for i in range(3)]
    )
    # chunks: 90k span, offset 15k: [15k,105k], [105k,195k]
    chunks = spark.createDataFrame(
        [Row(dev="d1", chunk=j, first=15_000 + j * 90_000, last=15_000 + (j + 1) * 90_000) for j in range(2)]
    )
    return sync, chunks


def test_overlap_join_staggered_inclusive(staggered):
    sync, chunks = staggered
    out = overlap_join(sync, chunks, "s", "e", "first", "last", on=["dev"])
    got = sorted((r.win, r.chunk) for r in out.collect())
    # win0=[0,59999] ∩ chunk0=[15000,105000]; win1=[60000,119999] ∩ both;
    # win2=[120000,179999] ∩ chunk1=[105000,195000]
    assert got == [(0, 0), (1, 0), (1, 1), (2, 1)]


def test_point_in_interval(spark):
    points = spark.createDataFrame([Row(k="a", t=5), Row(k="a", t=10), Row(k="a", t=15)])
    iv = spark.createDataFrame([Row(k="a", lo=5, hi=10)])
    out = point_in_interval_join(points, iv, "t", "lo", "hi", on=["k"])
    assert sorted(r.t for r in out.collect()) == [5, 10]  # inclusive both ends


def test_range_join_bucketed_matches_broadcast_plan(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [Row(k="a", t=base + dt.timedelta(minutes=m)) for m in range(0, 240, 7)]
    )
    iv = spark.createDataFrame(
        [
            Row(k="a", lo=base + dt.timedelta(minutes=30), hi=base + dt.timedelta(minutes=95)),
            Row(k="a", lo=base + dt.timedelta(minutes=180), hi=base + dt.timedelta(minutes=181)),
        ]
    )
    broad = point_in_interval_join(points, iv, "t", "lo", "hi", on=["k"])
    bucketed = range_join_bucketed(points, iv, "t", "lo", "hi", on=["k"])
    assert sorted((r.t, r.lo) for r in broad.collect()) == sorted(
        (r.t, r.lo) for r in bucketed.collect()
    )


def test_asof_backward_with_ties(spark):
    left = spark.createDataFrame(
        [Row(k="a", lt=10), Row(k="a", lt=20), Row(k="a", lt=5), Row(k="b", lt=10)]
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=10, val="x10"), Row(k="a", rt=15, val="x15"), Row(k="b", rt=99, val="z")]
    )
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt", value_cols=["val"])
    got = {(r.k, r.lt): r.val for r in out.collect()}
    # equal timestamps are inclusive (rt=10 matches lt=10); no earlier → null
    assert got == {("a", 10): "x10", ("a", 20): "x15", ("a", 5): None, ("b", 10): None}


def test_asof_null_value_in_matched_row_stays_null(spark):
    left = spark.createDataFrame([Row(k="a", lt=3)])
    right = spark.createDataFrame(
        [Row(k="a", rt=1, val="old"), Row(k="a", rt=2, val=None)],
        schema="k string, rt bigint, val string",
    )
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt", value_cols=["val"])
    assert out.collect()[0].val is None  # rt=2 row matched; its NULL wins


def test_asof_multiple_value_cols_stay_row_atomic(spark):
    left = spark.createDataFrame([Row(k="a", lt=3)])
    right = spark.createDataFrame(
        [Row(k="a", rt=1, v1=5.0, v2=None), Row(k="a", rt=2, v1=None, v2=7.0)],
        schema="k string, rt bigint, v1 double, v2 double",
    )
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt", value_cols=["v1", "v2"]).collect()[0]
    assert out.v1 is None and out.v2 == 7.0  # both from the rt=2 row


def test_overlap_join_drops_colliding_right_columns(spark):
    left = spark.createDataFrame([Row(k="a", s=0, e=10, label="L")])
    right = spark.createDataFrame([Row(k="a", rs=5, re=6, label="R")])
    out = overlap_join(left, right, "s", "e", "rs", "re", on=["k"])
    assert out.columns.count("label") == 1
    assert out.collect()[0].label == "L"


def test_asof_forward(spark):
    left = spark.createDataFrame([Row(k="a", lt=10)])
    right = spark.createDataFrame([Row(k="a", rt=9, val="p"), Row(k="a", rt=12, val="n")])
    out = asof_join(
        left, right, on=["k"], left_ts="lt", right_ts="rt", value_cols=["val"], direction="forward"
    )
    assert out.collect()[0].val == "n"
