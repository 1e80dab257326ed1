"""Custom stateful streaming operator: state must survive across
micro-batches AND across separate AvailableNow drains (checkpoint)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.streaming.stateful import streaming_drop_counter

SCHEMA = "device string, hw_counter bigint"


def _drain(spark, feed, sink, ckpt):
    src = spark.readStream.schema(SCHEMA).parquet(feed)
    out = streaming_drop_counter(src)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_drop_counter_state_survives_drains(spark, tmp_path):
    feed = str(tmp_path / "feed")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: cam counters 0..4 with a jump 2->5 (2 drops)
    rows1 = [Row(device="cam", hw_counter=c) for c in [0, 1, 2, 5, 6]]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain(spark, feed, sink, ckpt)
    out1 = {r.device: r for r in spark.read.parquet(sink).collect()}
    assert out1["cam"].total_drops == 2
    assert out1["cam"].last_counter == 6

    # batch 2 arrives later: continues at 7, then jumps to 10 (2 more)
    rows2 = [Row(device="cam", hw_counter=c) for c in [7, 10]] + [
        Row(device="cam2", hw_counter=0)
    ]
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain(spark, feed, sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    cam_latest = max((r for r in rows if r.device == "cam"), key=lambda r: r.last_counter)
    # state carried across drains: 2 earlier drops + gap 7->10 = 4 total
    assert cam_latest.total_drops == 4
    assert cam_latest.last_counter == 10
    assert any(r.device == "cam2" and r.total_drops == 0 for r in rows)


def test_null_counters_and_reset(spark, tmp_path):
    feed = str(tmp_path / "feed")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # batch 1 with a NULL counter mixed in: must not poison the query
    rows1 = [Row(device="cam", hw_counter=c) for c in [0, 1, None, 3, 10]]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain(spark, feed, sink, ckpt)
    out1 = spark.read.parquet(sink).collect()[0]
    assert out1.batch_rows == 4  # null ignored
    assert out1.total_drops == 7  # gaps 1->3 (1) and 3->10 (6)
    # batch 2: hardware reset — every counter below last_counter=10
    rows2 = [Row(device="cam", hw_counter=c) for c in [0, 1, 4]]
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain(spark, feed, sink, ckpt)
    latest = max(spark.read.parquet(sink).collect(), key=lambda r: r.total_drops)
    # reset re-seeds (no invented cross-reset drops); in-batch gap 1->4 = 2
    assert latest.total_drops == 9
    assert latest.last_counter == 4


# -- streaming HLL with batch parity -----------------------------------------

HLL_SCHEMA = "k string, v string"


def _drain_hll(spark, feed, sink, ckpt):
    from aeon_mecha_spark.streaming.stateful import streaming_hll_distinct

    src = spark.readStream.schema(HLL_SCHEMA).parquet(feed)
    out = streaming_hll_distinct(src, "k", "v")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_hll_matches_batch_after_two_drains(spark, tmp_path):
    from aeon_mecha_spark.datapipe.sketch import hll_distinct

    feed = str(tmp_path / "hfeed")
    sink = str(tmp_path / "hsink")
    ckpt = str(tmp_path / "hckpt")

    b1 = [("g", f"v{i}") for i in range(300)]
    b2 = [("g", f"v{i}") for i in range(200, 700)]  # overlap on purpose
    spark.createDataFrame(b1, HLL_SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain_hll(spark, feed, sink, ckpt)
    spark.createDataFrame(b2, HLL_SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    _drain_hll(spark, feed, sink, ckpt)

    # latest streaming emission (largest register fill)
    rows = spark.read.parquet(sink).filter("key = 'g'").collect()
    latest = max(rows, key=lambda r: r.n_registers)

    batch = hll_distinct(
        spark.createDataFrame(b1 + b2, HLL_SCHEMA), ["k"], "v"
    ).collect()[0]
    # BIT parity with the batch operator over the unioned feed
    assert (latest.n_registers, latest.v_zeros, latest.estimate) == (
        batch.n_registers,
        batch.v_zeros,
        batch.estimate,
    )
    # and the estimate is a sane distinct count of 700 true values
    assert abs(latest.estimate - 700) / 700 < 0.4
