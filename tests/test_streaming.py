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
