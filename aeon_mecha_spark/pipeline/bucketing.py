"""Bucketed stream tables — co-located joins without a shuffle.

The reference leans on MySQL B-tree indexes for its hot per-key lookups
(SURVEY §4 "Index usage"); the Spark-native analog for *join* locality is
bucketing: both sides pre-hash-partitioned on the join key at write time,
so a sort-merge join reads matching buckets directly — no Exchange on
either side at query time.

At 100 TB this is the difference between re-shuffling a stream table for
every chunk⋈summary / spikes⋈sync join and paying the partitioning once
at ingest. Bucket count is fixed at write time — size it to target
~128 MB/bucket at the expected table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) catalog table.
    Sorting within buckets additionally removes the per-task Sort from
    later merge joins on the same keys."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
