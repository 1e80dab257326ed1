"""Probe-geometry JSON flattening, listing parser, case conversions."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.sources import metadata as M


@pytest.fixture(scope="module")
def probe_json(tmp_path_factory):
    # synthetic multishank probe, FIXTURES.md §9 shape: 8 contacts,
    # 4 active (device_channel_indices != -1)
    d = {
        "probes": [
            {
                "annotations": {"model_name": "NP2-4shank"},
                "contact_positions": [[float(i * 10), float(i % 4 * 20)] for i in range(8)],
                "device_channel_indices": [0, -1, 1, -1, 2, -1, 3, -1],
                "shank_ids": ["0", "0", "1", "1", "2", "2", "3", "3"],
                "contact_ids": [f"e{i}" for i in range(8)],
            }
        ]
    }
    p = tmp_path_factory.mktemp("probe") / "probe.json"
    p.write_text(json.dumps(d))
    return str(p)


def test_probe_geometry_flatten(spark, probe_json):
    geo = M.probe_geometry(spark, probe_json)
    rows = geo.collect()
    assert len(rows) == 8
    by_e = {r.electrode: r for r in rows}
    assert by_e[0].probe_type == "NP2-4shank"
    assert by_e[2].device_channel_index == 1
    assert by_e[1].device_channel_index == -1
    assert by_e[2].shank == 1
    assert by_e[7].electrode_name == "e7"
    assert by_e[4].x_coord == 40.0


def test_electrode_config_active_subset(spark, probe_json):
    geo = M.probe_geometry(spark, probe_json)
    cfg = M.electrode_config(geo)
    assert cfg.count() == 4
    cmap = {r.electrode: r.device_channel_index for r in M.channel_map(geo).collect()}
    assert cmap == {0: 0, 2: 1, 4: 2, 6: 3}


def test_parse_chunk_listing(spark):
    paths = [
        "/ceph/aeon/exp01/2024-01-01T10-13-15/CameraTop/CameraTop_video_2024-01-01T10-00-00.csv",
        "/ceph/aeon/exp01/2026-05-11T075134Z/Patch1/Patch1_Encoder_2026-05-11T08-00-00.csv",
    ]
    df = spark.createDataFrame([Row(file_path=p) for p in paths])
    out = {r.device_name: r for r in M.parse_chunk_listing(df).collect()}
    cam = out["CameraTop"]
    assert cam.experiment_name == "exp01"
    assert cam.epoch_start == dt.datetime(2024, 1, 1, 10, 13, 15)
    assert cam.stream_name == "video"
    assert cam.chunk_ts == dt.datetime(2024, 1, 1, 10, 0, 0)
    patch = out["Patch1"]
    assert patch.epoch_start == dt.datetime(2026, 5, 11, 7, 51, 34)  # Z format
    assert patch.stream_name == "Encoder"


def test_case_conversions(spark):
    df = spark.createDataFrame([Row(p="CameraTopVideo", s="camera_top_video")])
    out = df.select(
        M.snake_case(F.col("p")).alias("snake"), M.pascal_case(F.col("s")).alias("pascal")
    ).collect()[0]
    assert out.snake == "camera_top_video"
    assert out.pascal == "CameraTopVideo"
