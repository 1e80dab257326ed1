"""Sessionization & epoch/chunk derivation (SURVEY.md §2.9 T1-T3).

The reference discovers *epochs* (acquisition runs) from directory names
and backfills each epoch's end when the next epoch appears — a mutable
look-back update (/root/reference/aeon/dj_pipeline/acquisition.py:219-306).
Chunks are hour-aligned windows clamped to the epoch (ibid:457-511).

Spark-first re-expression: both are deterministic *batch recomputes* over
the file-listing table — ``lead()`` for epoch end, ``date_trunc`` +
clamping for chunk bounds. No in-place updates; re-running on an appended
listing yields the same (now-extended) result, which is exactly the
idempotency the reference gets from update1() with far more machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from aeon_mecha_spark.functions.time import chunk_end, chunk_start


def gap_sessionize(
    df: DataFrame, ts_col: str, keys: list[str], gap_us: int, session_col: str = "session_id"
) -> DataFrame:
    """Classic gap-based sessionization: a new session starts when the
    gap to the previous event exceeds ``gap_us``. lag + cumsum — one
    shuffle on the session keys."""
    w = W.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_flag = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us), 1
    ).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("_new", new_flag).withColumn(
        session_col, F.sum("_new").over(wsum)
    ).drop("_new")


def derive_epochs(listing: DataFrame, exp_col: str = "experiment_name", epoch_ts_col: str = "epoch_start") -> DataFrame:
    """Epoch table from a file/dir listing: epoch_end = next epoch's
    start within the experiment (open-ended for the live epoch) —
    the reference's EpochEnd backfill (acquisition.py:254-304) as a
    ``lead()`` window."""
    epochs = listing.select(exp_col, epoch_ts_col).dropDuplicates()
    w = W.partitionBy(exp_col).orderBy(epoch_ts_col)
    return epochs.withColumn("epoch_end", F.lead(epoch_ts_col).over(w))


def derive_chunks(
    listing: DataFrame,
    exp_col: str = "experiment_name",
    epoch_ts_col: str = "epoch_start",
    chunk_ts_col: str = "chunk_ts",
) -> DataFrame:
    """Chunk table with reference-parity bounds (acquisition.py:500-511):
    chunk_start = max(hour-floor(file ts), epoch_start);
    chunk_end   = min(next-hour boundary, epoch_end)."""
    epochs = derive_epochs(listing, exp_col, epoch_ts_col)
    chunks = listing.join(epochs, [exp_col, epoch_ts_col], "inner")
    return chunks.withColumn(
        "chunk_start", chunk_start(F.col(chunk_ts_col), F.col(epoch_ts_col))
    ).withColumn(
        "chunk_end", chunk_end(F.col(chunk_ts_col), F.col("epoch_end"))
    )
