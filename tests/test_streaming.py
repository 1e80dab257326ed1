"""Structured Streaming equivalents (T1-T5): hourly chunk stats, session
epochs, and AvailableNow incremental drains with exactly-once resume."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.streaming import stream as S

BASE = dt.datetime(2024, 1, 1)
SCHEMA = "time timestamp, device string, v double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def feed(spark, tmp_path):
    path = str(tmp_path / "feed")
    rows = [
        Row(time=BASE + dt.timedelta(minutes=10 * i), device="cam", v=float(i)) for i in range(12)
    ]  # spans 2 hours
    _write_batch(spark, path, rows)
    return path


def test_hourly_chunk_stats_stream(spark, feed):
    src = S.read_parquet_stream(spark, feed, SCHEMA)
    agg = S.hourly_chunk_stats(src, "time", ["device"], value_col="v")
    S.run_to_memory(agg, "hourly_out", mode="complete")
    rows = {r.chunk_start: r for r in spark.sql("SELECT * FROM hourly_out").collect()}
    assert rows[BASE].sample_count == 6
    assert rows[BASE + dt.timedelta(hours=1)].sample_count == 6
    assert rows[BASE].v_min == 0.0 and rows[BASE].v_max == 5.0


def test_session_epochs_stream(spark, tmp_path):
    path = str(tmp_path / "sessions")
    rows = [Row(time=BASE + dt.timedelta(seconds=s), device="cam", v=0.0) for s in (0, 60, 120)]
    rows += [Row(time=BASE + dt.timedelta(hours=3, seconds=s), device="cam", v=0.0) for s in (0, 60)]
    _write_batch(spark, path, rows)
    src = S.read_parquet_stream(spark, path, SCHEMA)
    epochs = S.session_epochs(src, "time", ["device"], gap="30 minutes")
    S.run_to_memory(epochs, "epochs_out", mode="complete")
    got = sorted(
        (r.epoch_start, r.sample_count) for r in spark.sql("SELECT * FROM epochs_out").collect()
    )
    assert got == [(BASE, 3), (BASE + dt.timedelta(hours=3), 2)]


def test_available_now_incremental_resume(spark, tmp_path, feed):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src = S.read_parquet_stream(spark, feed, SCHEMA)
    passthrough = src.withColumn("v2", src["v"] * 2)
    S.run_available_now(passthrough, sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == 12
    # new files arrive; a second drain processes ONLY the delta
    _write_batch(
        spark, feed,
        [Row(time=BASE + dt.timedelta(hours=5), device="cam", v=99.0)],
    )
    src2 = S.read_parquet_stream(spark, feed, SCHEMA)
    S.run_available_now(src2.withColumn("v2", src2["v"] * 2), sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 13  # exactly-once: no reprocessing of the first 12
    assert out.filter("v = 99.0").count() == 1


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    path = str(tmp_path / "dedup_feed")
    rows = [
        Row(time=BASE, device="cam", v=1.0),
        Row(time=BASE, device="cam", v=1.0),  # exact redelivery
        Row(time=BASE + dt.timedelta(minutes=1), device="cam", v=2.0),
        Row(time=BASE + dt.timedelta(minutes=1), device="imu", v=3.0),
    ]
    _write_batch(spark, path, rows)
    src = S.read_parquet_stream(spark, path, SCHEMA)
    out = S.dedup_stream(src, ["device", "time"], "time")
    S.run_to_memory(out, "dedup_out", mode="append")
    got = sorted((r.device, r.time, r.v) for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert got == [
        ("cam", BASE, 1.0),
        ("cam", BASE + dt.timedelta(minutes=1), 2.0),
        ("imu", BASE + dt.timedelta(minutes=1), 3.0),
    ]


def test_hourly_distinct_stream(spark, tmp_path):
    path = str(tmp_path / "hll_feed")
    # 3 distinct devices in hour 0, 1 in hour 1
    rows = [Row(time=BASE + dt.timedelta(minutes=i), device=f"d{i % 3}", v=0.0) for i in range(9)]
    rows += [Row(time=BASE + dt.timedelta(hours=1, minutes=5), device="d0", v=0.0)]
    _write_batch(spark, path, rows)
    src = S.read_parquet_stream(spark, path, SCHEMA)
    out = S.hourly_distinct(src, "time", [], "device")
    S.run_to_memory(out, "hll_out", mode="complete")
    got = {r.chunk_start: r.approx_distinct for r in spark.sql("SELECT * FROM hll_out").collect()}
    # rsd 5% at tiny cardinalities => exact
    assert got == {BASE: 3, BASE + dt.timedelta(hours=1): 1}
