"""Window operators + sessionization/epoch-chunk derivation semantics
(W1-W9, T1-T3). Epoch/chunk invariants follow FIXTURES.md §4 /
acquisition.py:254-304,500-511."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.operators import sessionize, windows

BASE = dt.datetime(2024, 1, 1)


def test_lag_delta_and_cumsum(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=BASE + dt.timedelta(seconds=s), c=int(c)) for s, c in [(0, 1), (1, 2), (3, 4)]]
    )
    out = windows.lag_delta(df, "t", ["k"], ["t", "c"])
    rows = sorted(out.collect(), key=lambda r: r.t)
    assert [r.t_delta for r in rows] == [None, 1.0, 2.0]
    assert [r.c_delta for r in rows] == [None, 1, 2]
    # frame_offset = cumsum(counter_delta - 1) — dropped-frame QC (qc.py:99)
    summed = windows.running_sum(
        out.na.fill({"c_delta": 1}), F.col("c_delta") - 1, "t", ["k"], "frame_offset"
    )
    assert [r.frame_offset for r in sorted(summed.collect(), key=lambda r: r.t)] == [0, 0, 1]


def test_rolling_time_sum_window_is_inclusive_trailing(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=BASE + dt.timedelta(seconds=s), v=1.0) for s in [0, 0.5, 0.9, 2.0]]
    )
    out = windows.rolling_time_sum(df, F.col("v"), "t", ["k"], 1_000_000, "s1")
    got = [r.s1 for r in sorted(out.collect(), key=lambda r: r.t)]
    assert got == [1.0, 2.0, 3.0, 1.0]


def test_dedupe_first_and_top_k(spark):
    df = spark.createDataFrame(
        [Row(k="a", o=2, v="second"), Row(k="a", o=1, v="first"), Row(k="b", o=9, v="only")]
    )
    first = windows.dedupe_first(df, ["k"], [F.col("o").asc()])
    assert {r.k: r.v for r in first.collect()} == {"a": "first", "b": "only"}
    top2 = windows.top_k_per_group(df, ["k"], [F.col("o").desc()], 2)
    assert top2.count() == 3


def test_sign_change_detects_falling_edge(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=i, flag=f) for i, f in enumerate([False, True, True, False, True])]
    )
    out = windows.sign_change(df, F.col("flag"), "t", ["k"], "exited")
    got = [r.exited for r in sorted(out.collect(), key=lambda r: r.t)]
    assert got == [None, False, False, True, False]


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=1, v=10.0), Row(k="a", t=2, v=None), Row(k="a", t=3, v=None), Row(k="a", t=4, v=7.0)]
    )
    out = windows.forward_fill(df, "v", "t", ["k"])
    assert [r.v for r in sorted(out.collect(), key=lambda r: r.t)] == [10.0, 10.0, 10.0, 7.0]


def test_gap_sessionize(spark):
    secs = [0, 10, 20, 2000, 2010, 9000]
    df = spark.createDataFrame([Row(k="u", t=BASE + dt.timedelta(seconds=s)) for s in secs])
    out = sessionize.gap_sessionize(df, "t", ["k"], gap_us=60_000_000)
    got = [r.session_id for r in sorted(out.collect(), key=lambda r: r.t)]
    assert got == [1, 1, 1, 2, 2, 3]


def test_epoch_chunk_derivation_invariants(spark):
    # two epochs; epoch2 starts mid-hour → epoch1's chunks capped there,
    # epoch1 first chunk clamped up to epoch_start (acquisition.py:500-511)
    e1 = dt.datetime(2024, 1, 1, 10, 13, 15)
    e2 = dt.datetime(2024, 1, 1, 12, 30, 0)
    listing = spark.createDataFrame(
        [
            Row(experiment_name="exp", epoch_start=e1, chunk_ts=dt.datetime(2024, 1, 1, 10, 0)),
            Row(experiment_name="exp", epoch_start=e1, chunk_ts=dt.datetime(2024, 1, 1, 11, 0)),
            Row(experiment_name="exp", epoch_start=e1, chunk_ts=dt.datetime(2024, 1, 1, 12, 0)),
            Row(experiment_name="exp", epoch_start=e2, chunk_ts=dt.datetime(2024, 1, 1, 12, 0)),
        ]
    )
    chunks = sessionize.derive_chunks(listing).collect()
    by_key = {(r.epoch_start, r.chunk_ts): r for r in chunks}
    first = by_key[(e1, dt.datetime(2024, 1, 1, 10, 0))]
    assert first.chunk_start == e1  # clamped to epoch start
    assert first.chunk_end == dt.datetime(2024, 1, 1, 11, 0)
    last_of_e1 = by_key[(e1, dt.datetime(2024, 1, 1, 12, 0))]
    assert last_of_e1.chunk_end == e2  # truncated by next epoch
    live = by_key[(e2, dt.datetime(2024, 1, 1, 12, 0))]
    assert live.chunk_start == e2
    assert live.chunk_end == dt.datetime(2024, 1, 1, 13, 0)  # open epoch → next hour


def test_epoch_end_is_next_epoch_start(spark):
    listing = spark.createDataFrame(
        [
            Row(experiment_name="e", epoch_start=dt.datetime(2024, 1, 1)),
            Row(experiment_name="e", epoch_start=dt.datetime(2024, 1, 2)),
        ]
    )
    eps = {r.epoch_start: r.epoch_end for r in sessionize.derive_epochs(listing).collect()}
    assert eps[dt.datetime(2024, 1, 1)] == dt.datetime(2024, 1, 2)
    assert eps[dt.datetime(2024, 1, 2)] is None
