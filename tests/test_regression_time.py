"""Clock-sync regression parity (FIXTURES.md §1: clock = 1000·s + 1,
harp = 3000 + s → slope 1e-3, intercept ≈ 2999.999) and HARP/epoch time
functions (F1-F5)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.functions import time as tf
from aeon_mecha_spark.operators.regression import (
    fit_applyinpandas,
    fit_closed_form,
    fit_closed_form_portable,
    predict,
)


@pytest.fixture(scope="module")
def harp_sync(spark):
    # factories :53-70 ramp + one trailing null harp (dropna pinned by
    # test_ephys_reader_unit.py:49-63)
    rows = [
        Row(f="chunk0", clock=float(1000 * s + 1), harp=3000.0 + s) for s in range(60)
    ]
    rows.append(Row(f="chunk0", clock=61001.0, harp=None))
    return spark.createDataFrame(rows)


def test_closed_form_matches_reference_ramp(harp_sync):
    r = fit_closed_form(harp_sync, "clock", "harp", ["f"]).collect()[0]
    assert r.n_samples == 60  # null dropped before fit
    assert r.clock_start == 1.0 and r.clock_end == 59001.0
    assert r.harp_start == 3000.0 and r.harp_end == 3059.0
    assert math.isclose(r.slope, 1e-3, rel_tol=1e-12)
    assert math.isclose(r.intercept, 2999.999, rel_tol=1e-12)
    assert math.isclose(r.r2, 1.0, rel_tol=1e-12)


def test_three_implementations_agree(harp_sync):
    a = fit_closed_form(harp_sync, "clock", "harp", ["f"]).collect()[0]
    b = fit_applyinpandas(harp_sync, "clock", "harp", ["f"]).collect()[0]
    c = fit_closed_form_portable(
        harp_sync, "clock", "harp", ["f"], x_scale=1.0, y_scale=1000.0
    ).collect()[0]
    for other in (b, c):
        assert math.isclose(a.slope, other.slope, rel_tol=1e-9)
        assert math.isclose(a.intercept, other.intercept, rel_tol=1e-9)


def test_portable_fit_survives_nan_inf(spark):
    rows = [Row(f="c", clock=float(i), harp=2.0 * i) for i in range(10)]
    rows += [Row(f="c", clock=float("nan"), harp=1.0), Row(f="c", clock=5.0, harp=float("inf"))]
    df = spark.createDataFrame(rows)
    r = fit_closed_form_portable(df, "clock", "harp", ["f"], x_scale=1e3, y_scale=1e3).collect()[0]
    assert r.n_samples == 10  # non-finite rows dropped, no ANSI cast crash
    assert math.isclose(r.slope, 2.0, rel_tol=1e-9)


def test_predict_is_affine(spark, harp_sync):
    model = fit_closed_form(harp_sync, "clock", "harp", ["f"])
    pts = spark.createDataFrame([Row(f="chunk0", clock=30_001.0)])
    out = predict(pts.join(model, "f"), "clock", alias="harp_hat").collect()[0]
    assert math.isclose(out.harp_hat, 3030.0, rel_tol=1e-9)


def test_harp_roundtrip_exact_at_us(spark):
    ts = dt.datetime(2024, 3, 1, 12, 34, 56, 789123)
    df = spark.createDataFrame([Row(t=ts)])
    out = df.select(
        tf.harp_to_timestamp(tf.timestamp_to_harp(F.col("t"))).alias("rt")
    ).collect()[0]
    assert out.rt == ts


def test_epoch_dir_both_formats(spark):
    df = spark.createDataFrame([Row(d="2026-04-15T09-03-01"), Row(d="2026-04-15T090301Z")])
    out = df.select(tf.parse_epoch_dir(F.col("d")).alias("t")).collect()
    assert out[0].t == out[1].t == dt.datetime(2026, 4, 15, 9, 3, 1)


def test_chunk_arithmetic(spark):
    e_start = dt.datetime(2024, 1, 1, 10, 13, 15)
    e_end = dt.datetime(2024, 1, 1, 12, 30, 0)
    df = spark.createDataFrame([Row(ts=dt.datetime(2024, 1, 1, 12, 0), es=e_start, ee=e_end)])
    out = df.select(
        tf.chunk_start(F.col("ts"), F.col("es")).alias("cs"),
        tf.chunk_end(F.col("ts"), F.col("ee")).alias("ce"),
        tf.duration_hours(F.col("es"), F.col("ee")).alias("hrs"),
    ).collect()[0]
    assert out.cs == dt.datetime(2024, 1, 1, 12, 0)
    assert out.ce == e_end
    assert math.isclose(out.hrs, 2.279166666, rel_tol=1e-6)
