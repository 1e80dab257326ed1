"""Structured Streaming equivalents of the reference's micro-batch
incremental pipeline (SURVEY §2.9).

The reference polls an append-only file store every few hours and
re-derives chunk tables; its semantics map 1:1 onto Structured Streaming
concepts:

- 1-hour chunk binning (T1)            → ``window(ts, "1 hour")`` aggs
- late/out-of-order chunk arrivals (T3)→ watermarks
- populate-on-new-files triggers (T4)  → file source + Trigger.AvailableNow
- skip-ingested idempotency (T5)       → checkpointed exactly-once sinks
- session epochs (T2)                  → ``session_window`` gap windows

``run_available_now`` is the cron-worker replacement: one call drains
everything new since the last checkpoint and stops — identical cadence
semantics to docker/cron_script.bash:3-5 but with exactly-once state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over an append-only parquet directory — the
    raw-chunk arrival feed."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 64).parquet(path)


def hourly_chunk_stats(
    stream: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-chunk summary stats as a streaming windowed agg (the
    streams_maker per-chunk stats table, computed continuously).
    Watermark bounds state: chunks later than ``watermark`` are final."""
    aggs = [F.count(F.lit(1)).alias("sample_count")]
    if value_col:
        aggs += [
            F.min(value_col).alias(f"{value_col}_min"),
            F.max(value_col).alias(f"{value_col}_max"),
        ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("chunk"), *keys)
        .agg(*aggs)
        .select(
            F.col("chunk.start").alias("chunk_start"),
            F.col("chunk.end").alias("chunk_end"),
            *keys,
            *[F.col(c) for c in ["sample_count"] + ([f"{value_col}_min", f"{value_col}_max"] if value_col else [])],
        )
    )


def session_epochs(
    stream: DataFrame, ts_col: str, keys: list[str], gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Epoch discovery as session windows (T2): an epoch closes when no
    data arrives for ``gap``."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("epoch"), *keys)
        .agg(F.count(F.lit(1)).alias("sample_count"))
        .select(
            F.col("epoch.start").alias("epoch_start"),
            F.col("epoch.end").alias("epoch_end"),
            *keys,
            "sample_count",
        )
    )


def dedup_stream(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup on a key set (the skip-ingested guard T5 /
    ownership-claim T7, continuously): keeps the FIRST arrival of each
    key, drops re-deliveries within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark window — unbounded-history dedup is the batch
    ``Table.insert`` anti-join's job; the stream only needs to absorb
    at-least-once delivery from the file feed.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def hourly_distinct(
    stream: DataFrame,
    ts_col: str,
    keys: list[str],
    distinct_col: str,
    watermark: str = "2 hours",
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct-cardinality per hour window, continuously — HyperLogLog
    (``approx_count_distinct``) because exact distinct needs unbounded
    per-window sets while HLL state is a fixed few KB per (window, key).
    The deterministic batch twin is datapipe/sketch.py::kmv_distinct."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("chunk"), *keys)
        .agg(F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"))
        .select(
            F.col("chunk.start").alias("chunk_start"),
            *keys,
            "approx_distinct",
        )
    )


def run_available_now(
    result: DataFrame, sink_path: str, checkpoint_path: str, mode: str = "append"
) -> None:
    """Drain all currently-available input through the streaming plan
    into a parquet sink, exactly once, then stop (Trigger.AvailableNow) —
    the cron-populate replacement."""
    q = (
        result.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(result: DataFrame, name: str, mode: str = "complete") -> None:
    """Test/debug sink: run the whole available input into an in-memory
    table queryable as ``SELECT * FROM <name>``."""
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
