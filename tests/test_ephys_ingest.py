"""Ephys ingestion flow on the FIXTURES.md §1-2 synthetic shapes:
clock = 1000·(n·60+s)+1, harp = 3000 + n·60 + s per chunk n; binary
chunks placed strictly inside sync windows, plus a boundary chunk for
the exact-boundary fast path."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.pipeline import ephys_ingest as E


@pytest.fixture(scope="module")
def harp_sync(spark):
    rows = []
    for n in range(3):  # three hourly sync files
        for s in range(60):
            rows.append(
                Row(
                    experiment_name="exp01",
                    epoch_dir="2024-01-01T00-00-00",
                    file_chunk=f"sync{n}",
                    clock=float(1000 * (n * 60 + s) + 1),
                    harp_time=3000.0 + n * 60 + s,
                )
            )
    rows.append(  # trailing null harp: dropna-before-fit
        Row(experiment_name="exp01", epoch_dir="2024-01-01T00-00-00",
            file_chunk="sync0", clock=61001.0, harp_time=None)
    )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def binary_chunks(spark):
    # chunk inside sync0's window, one exactly at sync1's start boundary,
    # one in sync2's extended tail
    return spark.createDataFrame(
        [
            Row(experiment_name="exp01", epoch_dir="2024-01-01T00-00-00",
                chunk_index=0, first_ts=500, last_ts=58_000),
            Row(experiment_name="exp01", epoch_dir="2024-01-01T00-00-00",
                chunk_index=1, first_ts=60_001, last_ts=110_000),
            Row(experiment_name="exp01", epoch_dir="2024-01-01T00-00-00",
                chunk_index=2, first_ts=170_000, last_ts=200_000),
        ]
    )


def test_epoch_start_is_observed_harp(spark, harp_sync):
    ep = E.ephys_epochs(harp_sync).collect()[0]
    assert ep.epoch_start_harp == 3000.0
    assert ep.n_sync_rows == 181
    # 3000 s after 1904-01-01 00:00 UTC
    assert ep.epoch_start == dt.datetime(1904, 1, 1, 0, 50)


def test_sync_models_per_file(spark, harp_sync):
    ms = {r.file_chunk: r for r in E.sync_models(harp_sync).collect()}
    assert len(ms) == 3
    m0 = ms["sync0"]
    assert m0.n_samples == 60  # null dropped
    assert (m0.onix_ts_start, m0.onix_ts_end) == (1, 59_001)
    assert math.isclose(m0.slope, 1e-3, rel_tol=1e-9)
    assert math.isclose(m0.intercept, 2999.999, rel_tol=1e-9)


def test_chunk_bounds_resolution(spark, harp_sync, binary_chunks):
    models = E.sync_models(harp_sync)
    out = {r.chunk_index: r for r in E.resolve_chunk_bounds(binary_chunks, models).collect()}
    # chunk 0 → sync0's model: harp = 3000 + (ts-1)/1000
    assert math.isclose(out[0].chunk_start_harp, 2999.999 + 0.5, rel_tol=1e-9)
    assert math.isclose(out[0].chunk_end_harp, 2999.999 + 58.0, rel_tol=1e-9)
    # chunk 1 starts exactly at sync1's clock_start → sync1's model (fast path)
    assert out[1].model_start == 60_001
    assert math.isclose(out[1].chunk_start_harp, 3060.0, rel_tol=1e-9)
    # chunk 2 past sync2's end → still sync2's (last) model
    assert out[2].model_start == 120_001
    ts = out[0].chunk_start
    assert ts.year == 1904  # HARP-epoch timestamps


def test_full_flow_composes(spark, harp_sync, binary_chunks):
    epochs, models, chunks = E.ingest_ephys(harp_sync, binary_chunks)
    assert epochs.count() == 1 and models.count() == 3 and chunks.count() == 3
