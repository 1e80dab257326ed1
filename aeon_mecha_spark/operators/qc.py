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
        F.max_by("frame_offset", F.col(time_col)).cast("long").alias("drop_count"),
        F.max("time_delta").alias("max_harp_delta"),
        (F.max("hw_timestamp_delta") / 1e9).alias("max_camera_delta"),
    )


# -- QC routine registry (X4) ------------------------------------------------
# The reference stores (module, function) names in a Lookup table and
# dispatches dynamically per device type (qc.py:26-34). Here: a plain
# registry of named DataFrame transforms — same extensibility, no
# reflection, and the registry itself is catalog data.

QC_ROUTINES: dict[str, object] = {}


def qc_routine(name: str):
    def deco(fn):
        QC_ROUTINES[name] = fn
        return fn

    return deco


@qc_routine("camera_frame_qc")
def _camera_frame_qc(frames: DataFrame, keys: list[str], **kw) -> DataFrame:
    return qc_summary(frames, keys, **kw)


@qc_routine("frame_deltas")
def _frame_deltas(frames: DataFrame, keys: list[str], **kw) -> DataFrame:
    return frame_deltas(frames, keys, **kw)


def run_qc(name: str, df: DataFrame, keys: list[str], **kw) -> DataFrame:
    """Dynamic dispatch by routine name (the QCRoutine lookup pattern)."""
    if name not in QC_ROUTINES:
        raise KeyError(f"unknown QC routine {name!r}; known: {sorted(QC_ROUTINES)}")
    return QC_ROUTINES[name](df, keys, **kw)
