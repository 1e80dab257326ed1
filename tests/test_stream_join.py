"""Hopping-window aggregation and the watermarked stream-stream
interval join: batch == streaming parity, multi-micro-batch
incremental equivalence, and plan sanity.

Reference parity anchor: the reference recomputes rolling views and
stream-to-epoch pairings batch-wise each poll cycle
(/root/reference/aeon/io/api.py load windows; dj_pipeline ingest);
here one declaration serves batch and continuous modes and the two
must agree exactly.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.streaming.stream import sliding_window_stats, stream_interval_join

UTC = dt.timezone.utc


def _events(spark, n=200):
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        Row(
            user_id=i % 7,
            ts=base + dt.timedelta(minutes=3 * i + (i % 5)),
            kind="a" if i % 3 else "b",
            value=float(i % 11) + 0.25,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    )


def test_sliding_window_batch_streaming_parity(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    feed = str(tmp_path / "feed")
    _events(spark).write.parquet(feed)
    batch_df = spark.read.parquet(feed)
    expected = sliding_window_stats(
        batch_df, "ts", ["kind"], window="1 hour", slide="15 minutes", value_col="value"
    )

    schema = "user_id bigint, ts timestamp, kind string, value double"
    src = spark.readStream.schema(schema).parquet(feed)
    streamed = sliding_window_stats(
        src,
        "ts",
        ["kind"],
        window="1 hour",
        slide="15 minutes",
        value_col="value",
        watermark="2 hours",
    )
    name = f"slide_{uuid.uuid4().hex[:8]}"
    q = (
        streamed.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT * FROM {name}")
    assert _canon(got) == _canon(expected)
    # 4 overlapping windows per row: total n across windows = 4 * rows
    assert expected.agg(F.sum("n")).collect()[0][0] == 4 * batch_df.count()


def test_stream_interval_join_matches_batch_across_microbatches(spark, tmp_path):
    """Two time-split files drained with maxFilesPerTrigger=1 (two
    micro-batches, second arrives 'late') must reproduce the batch
    interval join exactly — buffered state carries candidates across
    the batch boundary."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark)
    mid = dt.datetime(2024, 1, 1, 5, tzinfo=UTC)
    feed = tmp_path / "feed2"
    feed.mkdir()

    # the file-stream source lists only the top level: flatten each
    # half to a single plain file in the feed dir. File 1 = later half,
    # file 2 = earlier half → out-of-order arrival across micro-batches.
    def _flat(df, name):
        import glob
        import shutil

        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        shutil.move(part, str(feed / f"{name}.parquet"))

    _flat(ev.filter(F.col("ts") >= F.lit(mid)), "b_late")
    _flat(ev.filter(F.col("ts") < F.lit(mid)), "a_early")

    schema = "user_id bigint, ts timestamp, kind string, value double"

    def _src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )

    left = _src().filter(F.col("kind") == "b").select("user_id", "ts")
    right = _src().filter(F.col("kind") == "a").select("user_id", "ts", "value")
    joined = stream_interval_join(
        left,
        right,
        ["user_id"],
        "ts",
        "ts",
        upper="30 minutes",
        watermark="24 hours",  # generous: nothing may drop in this test
        right_cols=["value"],
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT user_id, ts, r_ts, r_value FROM {name}")

    b = spark.read.parquet(str(feed))
    bl = b.filter(F.col("kind") == "b").select("user_id", "ts")
    br = b.filter(F.col("kind") == "a").select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    expected = bl.join(
        br,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("ts"))
        & (F.col("r_ts") <= F.expr("ts + INTERVAL 30 minutes")),
    ).select("user_id", "ts", "r_ts", "r_value")
    assert _canon(got) == _canon(expected)
    assert expected.count() > 0  # the fixture must actually exercise pairs


def test_sliding_window_plan_is_partial_agg(spark):
    """The hopping window must explode map-side and pre-aggregate
    before the shuffle: one exchange, partial+final HashAggregate, no
    window operator (it is an explode+groupBy, not a sort window)."""
    ev = _events(spark)
    df = sliding_window_stats(ev, "ts", ["kind"], value_col="value")
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in txt
    assert txt.count("HashAggregate") >= 2  # partial + final
    assert "WindowExec" not in txt and "Window\n" not in txt
