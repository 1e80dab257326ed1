"""Tier-2 ephys integration from RAW files: HarpSync CSVs + Clock/
Amplifier binaries on disk (FIXTURES.md §1-2 generator rules) → readers
→ sync-model fits → chunk-bound resolution → spike HARP times."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import Row, Window as W
from pyspark.sql import functions as F

from aeon_mecha_spark.operators.spikes import chunk_offsets, spikes_to_harp
from aeon_mecha_spark.pipeline import ephys_ingest as E
from aeon_mecha_spark.sources import load as L
from aeon_mecha_spark.sources.readers import REGISTRY


@pytest.fixture(scope="module")
def ephys_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ephys_raw")
    dev = root / "2024-01-01T00-00-00" / "ProbeA"
    dev.mkdir(parents=True)
    # two HarpSync CSVs with the FIXTURES ramp: clock=1000*(n*60+s)+1,
    # harp=3000+n*60+s
    for n in range(2):
        lines = ["aeon_time,clock,hub_clock,harp_time"]
        for s in range(60):
            clock = 1000 * (n * 60 + s) + 1
            harp = 3000.0 + n * 60 + s
            lines.append(f"{harp},{clock},{clock},{harp}")
        (dev / f"ProbeA_HarpSync_2024-01-01T{n:02d}-00-00.csv").write_text("\n".join(lines) + "\n")
    # clock binaries inside each sync window (FIXTURES §2: strictly inside)
    for n in range(2):
        ticks = np.linspace(n * 60_000 + 500, (n + 1) * 60_000 - 500, 10).astype("<u8")
        ticks.tofile(dev / f"ProbeA_Clock_2024-01-01T{n:02d}-00-00.bin")
    return str(root)


def test_harp_sync_csv_reader(spark, ephys_root):
    df = L.load(spark, ephys_root, REGISTRY["harp_sync"])
    rows = df.collect()
    assert len(rows) == 120
    assert rows[0].clock == 1.0 and rows[0].harp_time == 3000.0


def test_raw_to_sync_models_to_spike_times(spark, ephys_root):
    # 1. load sync stream; tag file ids from the harp ramp (hour index)
    sync = L.load(spark, ephys_root, REGISTRY["harp_sync"]).select(
        F.lit("exp01").alias("experiment_name"),
        F.lit("2024-01-01T00-00-00").alias("epoch_dir"),
        F.concat(F.lit("sync"), F.floor((F.col("harp_time") - 3000) / 60).cast("int")).alias("file_chunk"),
        "clock", "harp_time",
    )
    models = E.sync_models(sync)
    ms = {r.file_chunk: r for r in models.collect()}
    assert len(ms) == 2
    assert math.isclose(ms["sync0"].slope, 1e-3, rel_tol=1e-9)
    assert math.isclose(ms["sync1"].slope, 1e-3, rel_tol=1e-9)

    # 2. load clock binaries; derive per-chunk ONIX bounds
    clock = L.load(spark, ephys_root, REGISTRY["onix_clock"])
    chunks = (
        clock.groupBy("chunk_file")
        .agg(F.min("clock").alias("first_ts"), F.max("clock").alias("last_ts"), F.count("*").alias("n_samples"))
        .withColumn("experiment_name", F.lit("exp01"))
        .withColumn("epoch_dir", F.lit("2024-01-01T00-00-00"))
    )
    resolved = E.resolve_chunk_bounds(chunks, models)
    got = {r.chunk_file: r for r in resolved.collect()}
    assert len(got) == 2
    c0 = got["ProbeA_Clock_2024-01-01T00-00-00.bin"]
    # harp(500) = 2999.999 + 0.5
    assert math.isclose(c0.chunk_start_harp, 3000.499, rel_tol=1e-9)

    # 3. spikes (sample indices into the concatenated 20-sample recording)
    offs = chunk_offsets(
        chunks.withColumn("chunk_index", F.regexp_extract("chunk_file", r"T(\d{2})-", 1).cast("int")),
        ["experiment_name"],
    )
    spikes = spark.createDataFrame(
        [Row(experiment_name="exp01", epoch_dir="2024-01-01T00-00-00", unit=1, onix_ts=t)
         for t in [500, 60_001, 90_000]]
    )
    wm = W.partitionBy("experiment_name", "epoch_dir").orderBy("onix_ts_start")
    model_windows = models.select(
        "experiment_name", "epoch_dir", "onix_ts_start",
        F.coalesce(F.lead("onix_ts_start").over(wm), F.lit(2**62)).alias("onix_ts_end"),
        "slope", "intercept",
    )
    harp = spikes_to_harp(spikes, model_windows, ["experiment_name", "epoch_dir"])
    by_ts = {r.onix_ts: r.harp_time for r in harp.collect()}
    assert math.isclose(by_ts[500], 3000.499, rel_tol=1e-9)      # window 0
    assert math.isclose(by_ts[60_001], 3060.0, rel_tol=1e-9)     # boundary → window 1
    assert math.isclose(by_ts[90_000], 3089.999, rel_tol=1e-9)   # window 1 interior
