"""Camera-frame QC — parity with the reference's qc.CameraQC routine
(/root/reference/aeon/dj_pipeline/qc.py:70-116; FIXTURES.md §6).

Input: per-frame stream (time, hw_counter, hw_timestamp[, frame_idx])
keyed by (experiment, device, chunk). Output per key:

- per-frame deltas of each column (W1),
- frame_offset = cumsum(hw_counter_delta − 1) — cumulative dropped
  frames (W2, qc.py:99),
- chunk summary: drop_count (last frame_offset), max_harp_delta (s),
  max_camera_delta (s from hw_timestamp ns).

One window shuffle on the chunk key; summary is a groupBy over the same
key — co-partitioned, no second shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from aeon_mecha_spark.operators.windows import lag_delta, running_sum


def frame_deltas(frames: DataFrame, keys: list[str], time_col: str = "time") -> DataFrame:
    cols = [c for c in ("time", "hw_counter", "hw_timestamp", "frame_idx") if c in frames.columns]
    out = lag_delta(frames, time_col, keys, cols)
    return running_sum(
        out,
        F.coalesce(F.col("hw_counter_delta") - 1, F.lit(0)),
        time_col,
        keys,
        "frame_offset",
    )


def qc_summary(frames: DataFrame, keys: list[str], time_col: str = "time") -> DataFrame:
    d = frame_deltas(frames, keys, time_col)
    return d.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("sample_count"),
        F.max("frame_offset").cast("long").alias("drop_count"),
        F.max("time_delta").alias("max_harp_delta"),
        (F.max("hw_timestamp_delta") / 1e9).alias("max_camera_delta"),
    )
