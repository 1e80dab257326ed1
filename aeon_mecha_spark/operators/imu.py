"""ONIX IMU 4-stream merge — parity with
/root/reference/aeon/dj_pipeline/utils/onix_imu.py:17-134 (FIXTURES.md §3).

The reference reads four per-chunk binary streams (euler, gravity,
linear-acceleration, quaternion), concatenates them column-wise on the
shared sample index (J8 ``pd.concat(axis=1)``), selects chunks whose
[first_ts, last_ts] overlaps the requested ONIX window *inclusively*
(zone-map check reading only first+last uint64 — onix_imu.py:89-134),
and trims to the window.

Spark re-expression: each stream is a DataFrame keyed by
(device, chunk_index, sample_idx); the column concat is a multi-way
equi-join on that key (co-partitioned: one shuffle per stream, then
joined within partitions); chunk selection is an aggregate zone-map
(min/max onix_ts per chunk ≙ the O(1) first/last read — Parquet footer
stats give this for free on a columnar store) + inclusive overlap join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMU_COLUMNS = [
    "euler_x", "euler_y", "euler_z",
    "gravity_vector_x", "gravity_vector_y", "gravity_vector_z",
    "linear_acceleration_x", "linear_acceleration_y", "linear_acceleration_z",
    "quaternion_w", "quaternion_x", "quaternion_y", "quaternion_z",
]

KEY = ["device_name", "chunk_index", "sample_idx"]


def merge_imu_streams(
    euler: DataFrame, gravity: DataFrame, linear_acc: DataFrame, quaternion: DataFrame
) -> DataFrame:
    """Index-aligned column concat of the four streams (onix_imu.py:63-86).
    ``onix_ts`` comes from the first stream; the joins are inner — a
    sample missing from any stream is dropped (reference concat+dropna)."""
    out = euler
    for other in (gravity, linear_acc, quaternion):
        dup = [c for c in other.columns if c in out.columns and c not in KEY]
        out = out.join(other.drop(*dup), KEY, "inner")
    cols = [c for c in IMU_COLUMNS if c in out.columns]
    return out.select(*KEY, "onix_ts", *cols)


def chunk_zone_map(stream: DataFrame, ts_col: str = "onix_ts") -> DataFrame:
    """Per-chunk (first, last) ONIX bounds — the O(1) zone map the
    reference reads from each Clock binary (onix_imu.py:117-131; W8)."""
    return stream.groupBy("device_name", "chunk_index").agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )


def select_overlapping_chunks(zone_map: DataFrame, onix_start: int, onix_end: int) -> DataFrame:
    """Inclusive interval-overlap chunk selection (onix_imu.py:89-114):
    keep chunks with first_ts <= onix_end AND last_ts >= onix_start."""
    return zone_map.filter(
        (F.col("first_ts") <= F.lit(onix_end)) & (F.col("last_ts") >= F.lit(onix_start))
    )


def load_imu_window(merged: DataFrame, onix_start: int, onix_end: int) -> DataFrame:
    """Codec-decode equivalent (S16, codec.py:86-190): chunk-pruned scan
    + exact ONIX-bound trim, inclusive both ends."""
    zones = chunk_zone_map(merged)
    keep = select_overlapping_chunks(zones, onix_start, onix_end).select(
        "device_name", "chunk_index"
    )
    pruned = merged.join(F.broadcast(keep), ["device_name", "chunk_index"], "left_semi")
    return pruned.filter(
        (F.col("onix_ts") >= F.lit(onix_start)) & (F.col("onix_ts") <= F.lit(onix_end))
    )
