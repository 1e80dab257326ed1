"""QC, IMU merge, position geometry, spike sync/matching — synthetic
fixtures per FIXTURES.md §3, §6, §7, §10 (staggered windows, planted
dropped frames, planted matched/unmatched units)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.operators import imu, position, qc, spikes

BASE = dt.datetime(2024, 1, 1)


def test_camera_qc_dropped_frames(spark):
    # hw_counter jumps by 3 at one point → 2 dropped frames
    counters = [0, 1, 2, 5, 6]
    rows = [
        Row(exp="e", dev="cam", time=BASE + dt.timedelta(milliseconds=20 * i),
            hw_counter=c, hw_timestamp=int(c * 20e6))
        for i, c in enumerate(counters)
    ]
    frames = spark.createDataFrame(rows)
    summary = qc.qc_summary(frames, ["exp", "dev"]).collect()[0]
    assert summary.sample_count == 5
    assert summary.drop_count == 2
    assert math.isclose(summary.max_harp_delta, 0.02, rel_tol=1e-9)
    assert math.isclose(summary.max_camera_delta, 0.06, rel_tol=1e-9)


@pytest.fixture(scope="module")
def imu_streams(spark):
    def stream(cols):
        return spark.createDataFrame(
            [
                Row(device_name="bno", chunk_index=c, sample_idx=s,
                    onix_ts=15_000 + c * 90_000 + s * 900,
                    **{col: float(c * 100 + s) for col in cols})
                for c in range(2)
                for s in range(100)
            ]
        )

    euler = stream(["euler_x", "euler_y", "euler_z"])
    grav = stream(["gravity_vector_x", "gravity_vector_y", "gravity_vector_z"])
    lin = stream(["linear_acceleration_x", "linear_acceleration_y", "linear_acceleration_z"])
    quat = stream(["quaternion_w", "quaternion_x", "quaternion_y", "quaternion_z"])
    return euler, grav, lin, quat


def test_imu_merge_column_set(imu_streams):
    merged = imu.merge_imu_streams(*imu_streams)
    assert set(merged.columns) == set(imu.KEY) | {"onix_ts"} | set(imu.IMU_COLUMNS)
    assert merged.count() == 200


def test_imu_window_selection_staggered(imu_streams):
    """Sync window [60000, 120000) vs chunks [15000,104100], [105000,194100]:
    only chunk 0 contains samples ≥60000 ≤119999... chunk 1 starts 105000 —
    both overlap; inclusive-bound chunk selection must keep both."""
    merged = imu.merge_imu_streams(*imu_streams)
    zones = {r.chunk_index: (r.first_ts, r.last_ts) for r in imu.chunk_zone_map(merged).collect()}
    assert zones[0] == (15_000, 104_100)
    assert zones[1] == (105_000, 194_100)
    out = imu.load_imu_window(merged, 60_000, 119_999)
    chunks_used = {r.chunk_index for r in out.select("chunk_index").distinct().collect()}
    assert chunks_used == {0, 1}
    ts = [r.onix_ts for r in out.collect()]
    assert min(ts) >= 60_000 and max(ts) <= 119_999


def test_in_patch_requires_wheel_motion(spark):
    keys = ["subj"]
    # position: at patch (0,0) the whole time
    pos = spark.createDataFrame(
        [Row(subj="m1", time=BASE + dt.timedelta(seconds=s), x=0.0, y=0.0) for s in range(10)]
    )
    # wheel: cumulative distance moves only during seconds 3-6
    wheel_rows = []
    total = 0.0
    for s in range(10):
        if 3 <= s <= 6:
            total += 2.0
        wheel_rows.append(Row(subj="m1", time=BASE + dt.timedelta(seconds=s), wheel_distance=total))
    wheel = spark.createDataFrame(wheel_rows)
    out = position.in_patch(pos, wheel, keys, patch_x=0.0, patch_y=0.0, radius=0.2)
    got = {r.time.second: r.in_patch for r in out.collect()}
    assert got[4] and got[5] and got[6]
    assert not got[0] and not got[1] and not got[9]
    exits = [r.time.second for r in out.collect() if r.exit_patch]
    assert exits == [7]


def test_point_in_polygon_square(spark):
    df = spark.createDataFrame(
        [Row(x=0.5, y=0.5), Row(x=1.5, y=0.5), Row(x=-0.1, y=0.0), Row(x=0.99, y=0.99)]
    )
    out = position.in_nest(df, [(0, 0), (1, 0), (1, 1), (0, 1)]).collect()
    assert [r.in_nest for r in out] == [True, False, False, True]


def test_spike_chunk_assignment(spark):
    chunks = spark.createDataFrame(
        [Row(probe="A", chunk_index=i, n_samples=100) for i in range(3)]
    )
    off = spikes.chunk_offsets(chunks, ["probe"])
    got = {r.chunk_index: (r.start_offset, r.end_offset) for r in off.collect()}
    assert got == {0: (0, 100), 1: (100, 200), 2: (200, 300)}
    sp = spark.createDataFrame(
        [Row(probe="A", unit=1, spike_index=i) for i in [0, 99, 100, 250, 299]]
    )
    assigned = spikes.assign_spike_chunks(sp, off, ["probe"])
    by_idx = {r.spike_index: (r.chunk_index, r.sample_in_chunk) for r in assigned.collect()}
    assert by_idx == {0: (0, 0), 99: (0, 99), 100: (1, 0), 250: (2, 50), 299: (2, 99)}


def test_spikes_to_harp_exact_boundary(spark):
    models = spark.createDataFrame(
        [
            Row(probe="A", onix_ts_start=0, onix_ts_end=1000, slope=0.001, intercept=100.0),
            Row(probe="A", onix_ts_start=1000, onix_ts_end=2000, slope=0.002, intercept=99.0),
        ]
    )
    sp = spark.createDataFrame([Row(probe="A", unit=1, onix_ts=t) for t in [500, 1000, 1500]])
    out = {r.onix_ts: r.harp_time for r in spikes.spikes_to_harp(sp, models, ["probe"]).collect()}
    assert math.isclose(out[500], 100.5)
    assert math.isclose(out[1000], 101.0)  # boundary → second window (inclusive start)
    assert math.isclose(out[1500], 102.0)


def test_match_units_agreement(spark):
    # unit 1 ↔ unit 10: identical trains (offset 0.1 ms < delta);
    # unit 2 ↔ unit 20: disjoint times
    a_rows = [Row(unit=1, harp_time=float(i)) for i in range(100)] + [
        Row(unit=2, harp_time=1000.0 + i) for i in range(50)
    ]
    b_rows = [Row(unit=10, harp_time=float(i) + 0.0001) for i in range(100)] + [
        Row(unit=20, harp_time=5000.0 + i) for i in range(50)
    ]
    out = spikes.match_units(
        spark.createDataFrame(a_rows), spark.createDataFrame(b_rows), delta_s=0.0004
    )
    scores = {(r.unit_a, r.unit_b): r.agreement for r in out.collect()}
    assert math.isclose(scores[(1, 10)], 1.0)
    assert (2, 20) not in scores


def test_match_units_boundary_pairs_not_double_counted(spark):
    a = spark.createDataFrame([Row(unit=1, harp_time=0.0004)])
    b = spark.createDataFrame([Row(unit=9, harp_time=0.0008)])
    out = spikes.match_units(a, b, delta_s=0.0004).collect()
    assert len(out) == 1 and out[0].n_matched == 1
