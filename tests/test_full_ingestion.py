"""Tier-2 integration: synthetic experiment on tmp_path → full ingestion
flow → summary tables → fetch_stream round-trip (modeled on the
reference's tests/dj_pipeline/test_full_ingestion.py:163-363)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.pipeline import ingest
from aeon_mecha_spark.pipeline.orchestrator import ComputedTable, Table, Tier
from aeon_mecha_spark.sources import load as L
from aeon_mecha_spark.sources.readers import REGISTRY

HARP0 = 2_082_844_800 + 1_704_067_200  # 2024-01-01 as HARP seconds


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """exp01 with two epochs and two devices; epoch2 starts mid-hour so
    epoch1's last chunk must truncate (staggered on purpose)."""
    root = tmp_path_factory.mktemp("exp01_raw")
    exp = root / "exp01"

    def write_chunks(epoch, device, stream, hours, rate_s=60):
        d = exp / epoch / device
        d.mkdir(parents=True, exist_ok=True)
        for h in hours:
            lines = ["aeon_time,angle,intensity"]
            for s in range(0, 3600, rate_s):
                t = HARP0 + h * 3600 + s
                lines.append(f"{t},{float((h * 3600 + s) % 360)},{1.5}")
            name = f"{device}_Encoder_2024-01-01T{h:02d}-00-00.csv"
            (d / name).write_text("\n".join(lines) + "\n")

    write_chunks("2024-01-01T00-00-00", "Patch1", "Encoder", [0, 1, 2])
    write_chunks("2024-01-01T02-30-00", "Patch1", "Encoder", [2, 3])
    write_chunks("2024-01-01T00-00-00", "Patch2", "Encoder", [0, 1])
    return str(exp)


def listing_df(spark, exp_root):
    files = sorted(glob.glob(os.path.join(exp_root, "**", "*.csv"), recursive=True))
    return spark.createDataFrame([Row(file_path=p) for p in files])


def test_epoch_derivation_with_backfill(spark, experiment):
    epochs = ingest.epoch_table(listing_df(spark, experiment)).collect()
    by_start = {r.epoch_start: r.epoch_end for r in epochs}
    assert by_start[dt.datetime(2024, 1, 1, 0, 0)] == dt.datetime(2024, 1, 1, 2, 30)
    assert by_start[dt.datetime(2024, 1, 1, 2, 30)] is None  # live epoch


def test_chunk_bounds_truncated_by_next_epoch(spark, experiment):
    chunks = ingest.ingestion_facts(listing_df(spark, experiment))
    e1_last = chunks.filter(
        (F.col("epoch_start") == "2024-01-01 00:00:00")
        & (F.col("chunk_ts") == "2024-01-01 02:00:00")
        & (F.col("device_name") == "Patch1")
    ).collect()[0]
    assert e1_last.chunk_end == dt.datetime(2024, 1, 1, 2, 30)
    e2_first = chunks.filter(
        (F.col("epoch_start") == "2024-01-01 02:30:00")
        & (F.col("chunk_ts") == "2024-01-01 02:00:00")
    ).collect()[0]
    assert e2_first.chunk_start == dt.datetime(2024, 1, 1, 2, 30)
    assert e2_first.chunk_end == dt.datetime(2024, 1, 1, 3, 0)


def test_full_populate_and_fetch_stream(spark, experiment, tmp_path):
    wh = str(tmp_path / "warehouse")
    rdr = REGISTRY["encoder"]

    # 1. load the raw stream (all chunks, all devices) → stream table
    raw = L.load(spark, experiment, rdr)
    stream = raw.select(
        F.lit("exp01").alias("experiment_name"),
        F.lit("Encoder").alias("stream_name"),
        "time", "angle", "intensity",
    )
    t = ingest.write_stream_table(stream, wh, "encoder_stream")

    # 2. per-chunk summary via the orchestrator (idempotent populate)
    keys = ["experiment_name", "stream_name"]
    summary_table = Table("encoder_summary", pk=[*keys, "chunk_start"], root=wh, tier=Tier.COMPUTED)
    ct = ComputedTable(
        table=summary_table,
        key_source=lambda s: ingest.stream_summary(
            s.read.parquet(t.path), ["angle", "intensity"], keys=keys
        ).select(*summary_table.pk),
        make=lambda s, pend: ingest.stream_summary(
            s.read.parquet(t.path), ["angle", "intensity"], keys=keys
        ).join(pend, summary_table.pk, "left_semi"),
    )
    n = ct.populate(spark)
    # hours 0..3 exist (epoch1: 0,1,2 + epoch2: 2,3 + Patch2: 0,1 → hours 0-3)
    assert n == 4
    assert ct.populate(spark) == 0  # idempotent

    summary = summary_table.read(spark)
    rows = {r.chunk_start: r for r in summary.collect()}
    # hour 0: Patch1 epoch1 (60) + Patch2 (60) = 120 samples
    assert rows[dt.datetime(2024, 1, 1, 0, 0)].sample_count == 120
    # hour 2: Patch1 epoch1 (60) + Patch1 epoch2 copy (60) = 120
    assert rows[dt.datetime(2024, 1, 1, 2, 0)].sample_count == 120
    # hour 3: epoch2 only
    assert rows[dt.datetime(2024, 1, 1, 3, 0)].sample_count == 60
    assert rows[dt.datetime(2024, 1, 1, 0, 0)].intensity_mean == 1.5


def test_fetch_stream_roundtrip_sorted_and_pruned(spark, experiment, tmp_path):
    wh = str(tmp_path / "warehouse2")
    rdr = REGISTRY["encoder"]
    raw = L.load(spark, experiment, rdr)
    stream = raw.select(F.lit("Encoder").alias("stream_name"), "time", "angle")
    t = ingest.write_stream_table(stream, wh, "s2")
    out = ingest.fetch_stream(
        spark, t, start=dt.datetime(2024, 1, 1, 1), end=dt.datetime(2024, 1, 1, 2)
    )
    rows = out.collect()
    assert len(rows) > 0
    ts = [r.time for r in rows]
    assert ts == sorted(ts)
    assert ts[0] >= dt.datetime(2024, 1, 1, 1) and ts[-1] < dt.datetime(2024, 1, 1, 2)
