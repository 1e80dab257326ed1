"""Small plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def track_cached(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach the persisted intermediates a library function created to
    the DataFrame it returns, so callers can release them explicitly.

    Library operators (``ivf_knn``, ``substring_duplicate_spans``, …)
    persist multi-consumer intermediates for speed; only the CALLER
    knows when the result has been fully consumed, so eager try/finally
    unpersist inside the function would silently disable the cache.
    Instead the handles ride along on the result — call
    :func:`release_cached` (or ``spark.catalog.clearCache()``) once
    done, and long-lived sessions never accumulate cached blocks.
    """
    existing = list(getattr(result, "_aeon_cached", ()))
    result._aeon_cached = existing + list(cached)
    return result


def release_cached(result: DataFrame) -> None:
    """Unpersist every intermediate :func:`track_cached` attached to
    ``result`` (no-op for untracked DataFrames). Call after the result
    has been consumed (collected / written); consuming it again simply
    recomputes without the cache."""
    for df in getattr(result, "_aeon_cached", ()):
        df.unpersist()
    result._aeon_cached = []


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
