"""Small plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Ensure at least cluster-parallelism partitions before CPU-heavy
    per-row work (regex, hashing, explode).

    A small parquet file scans as ONE partition, serializing everything
    downstream onto one core; at 100 TB the scan is naturally parallel
    and this is a no-op (we only repartition *up*). The round-robin
    shuffle of the raw input is far cheaper than losing N-1 cores on
    the compute stage.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
