"""Pose-stream validation (S7) and zarr twin resolution (S11)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.operators import pose as P
from aeon_mecha_spark.sources import zarr_source as Z

T0 = dt.datetime(2024, 1, 1)


def pose_rows(spark, extra=(), anchor="anchor_centroid"):
    rows = [
        Row(experiment_name="e", device_name="cam", time=T0 + dt.timedelta(seconds=s),
            identity="m1", identity_likelihood=0.9, part=part, x=float(s), y=0.0,
            part_likelihood=0.8)
        for s in range(3)
        for part in (anchor, "nose")
    ]
    return spark.createDataFrame(rows + list(extra))


def test_validate_pose_ok(spark):
    P.validate_pose(pose_rows(spark))  # no raise


def test_validate_pose_duplicate_time_raises(spark):
    dup = Row(experiment_name="e", device_name="cam", time=T0, identity="m1",
              identity_likelihood=0.9, part="nose", x=9.0, y=9.0, part_likelihood=0.1)
    with pytest.raises(ValueError, match="duplicate"):
        P.validate_pose(pose_rows(spark, extra=[dup]))


def test_validate_pose_requires_single_anchor(spark):
    extra = [Row(experiment_name="e", device_name="cam", time=T0 + dt.timedelta(seconds=9),
                 identity="m1", identity_likelihood=0.9, part="anchor_other", x=0.0, y=0.0,
                 part_likelihood=0.5)]
    with pytest.raises(ValueError, match="anchor"):
        P.validate_pose(pose_rows(spark, extra=extra))


def test_anchor_positions_and_summary(spark):
    df = pose_rows(spark)
    anchors = P.anchor_positions(df)
    assert anchors.count() == 3
    summ = {r.identity: r for r in P.identity_summary(df).collect()}
    assert summ["m1"].n_rows == 6 and summ["m1"].n_parts == 2
    assert summ["m1"].mean_likelihood == 0.8


def test_zarr_twin_resolution(spark):
    paths = [
        "/data/a/rec1.bin", "/data/a/rec1.zarr",
        "/data/a/rec2.bin",
        "/data/a/rec3.zarr",
    ]
    listing = spark.createDataFrame([Row(file_path=p) for p in paths])
    prefer_zarr = {r.stem.split("/")[-1]: r.resolved_format for r in Z.resolve_twins(listing).collect()}
    assert prefer_zarr == {"rec1": "zarr", "rec2": "bin", "rec3": "zarr"}
    prefer_bin = {r.stem.split("/")[-1]: r.resolved_format for r in Z.resolve_twins(listing, prefer="bin").collect()}
    assert prefer_bin == {"rec1": "bin", "rec2": "bin", "rec3": "zarr"}
    strict = {r.stem.split("/")[-1] for r in Z.resolve_twins(listing, prefer="strict-zarr").collect()}
    assert strict == {"rec1", "rec3"}


def test_zarr_blosc_codec_is_gated(spark, tmp_path):
    """The numpy fallback decodes null/zlib v2 stores (test_zarr_decode);
    the one remaining gate is the Blosc codec, which needs the zarr lib
    and must fail with an error naming it."""
    import json

    store = tmp_path / "rec1.zarr"
    store.mkdir()
    (store / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
        "compressor": {"id": "blosc", "cname": "zstd"},
        "fill_value": 0, "order": "C", "filters": None,
    }))
    (store / "0").write_bytes(b"\x00" * 16)
    listing = spark.createDataFrame([Row(file_path=str(store))])
    resolved = Z.resolve_twins(listing)
    if not Z.HAS_ZARR:
        with pytest.raises(Exception, match="blosc"):
            Z.read_zarr_array(spark, resolved).collect()
