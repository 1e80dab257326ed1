"""Continuous-aggregate maintenance: incremental refresh recomputes only
the open bucket; explicit since= repairs history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aeon_mecha_spark.pipeline.continuous import ContinuousAggregate
from aeon_mecha_spark.pipeline.orchestrator import Table

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "ts timestamp, device string, v double"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ca(spark, tmp_path, fact_path):
    return ContinuousAggregate(
        source=lambda s: s.read.parquet(fact_path),
        ts_col="ts",
        dims=["device"],
        agg_factory=lambda: [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("sum_v"),
        ],
        table=Table("rollup_hourly", pk=["bucket", "device"], root=str(tmp_path)),
    )


def test_first_refresh_builds_full_rollup(spark, tmp_path):
    fact = str(tmp_path / "fact")
    _rows(spark, [
        (T0 + dt.timedelta(minutes=m), "cam", 1.0) for m in (0, 30, 70)
    ]).write.mode("overwrite").parquet(fact)
    ca = _ca(spark, tmp_path, fact)
    assert ca.refresh(spark) == 2  # hours 0 and 1
    got = {(r["bucket"], r["n"]) for r in ca.table.read(spark).collect()}
    assert got == {(T0, 2), (T0 + dt.timedelta(hours=1), 1)}


def test_incremental_refresh_only_touches_open_bucket(spark, tmp_path):
    fact = str(tmp_path / "fact")
    _rows(spark, [
        (T0, "cam", 1.0),
        (T0 + dt.timedelta(hours=1), "cam", 1.0),
    ]).write.mode("overwrite").parquet(fact)
    ca = _ca(spark, tmp_path, fact)
    ca.refresh(spark)

    # late rows: one lands in the OPEN bucket (hour 1), one in a NEW
    # bucket (hour 2), and one rewrites CLOSED history (hour 0)
    _rows(spark, [
        (T0 + dt.timedelta(hours=1, minutes=30), "cam", 10.0),
        (T0 + dt.timedelta(hours=2), "cam", 100.0),
        (T0 + dt.timedelta(minutes=5), "cam", 1000.0),
    ]).write.mode("append").parquet(fact)

    ca.refresh(spark)
    got = {r["bucket"]: (r["n"], r["sum_v"]) for r in ca.table.read(spark).collect()}
    # open bucket re-aggregated, new bucket added
    assert got[T0 + dt.timedelta(hours=1)] == (2, 11.0)
    assert got[T0 + dt.timedelta(hours=2)] == (1, 100.0)
    # closed bucket intentionally NOT picked up by a watermark refresh
    assert got[T0] == (1, 1.0)

    # explicit history repair
    ca.refresh(spark, since=T0)
    got = {r["bucket"]: (r["n"], r["sum_v"]) for r in ca.table.read(spark).collect()}
    assert got[T0] == (2, 1001.0)


def test_refresh_matches_full_recompute(spark, tmp_path):
    fact = str(tmp_path / "fact")
    rows = [
        (T0 + dt.timedelta(minutes=7 * i), f"d{i % 3}", float(i)) for i in range(40)
    ]
    _rows(spark, rows[:25]).write.mode("overwrite").parquet(fact)
    ca = _ca(spark, tmp_path, fact)
    ca.refresh(spark)
    _rows(spark, rows[25:]).write.mode("append").parquet(fact)
    ca.refresh(spark)

    expected = (
        spark.read.parquet(fact)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "device")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("sum_v"))
    )
    got = sorted(map(tuple, ca.table.read(spark).select("bucket", "device", "n", "sum_v").collect()))
    want = sorted(map(tuple, expected.collect()))
    assert got == want


def test_kmv_column_refresh_matches_full_recompute(spark, tmp_path):
    """A KMV sketch column rides the rollup like any other aggregate:
    incremental open-bucket refresh leaves the stored sketches identical
    to a from-scratch build, and merging the stored hourly partials to a
    coarser grouping is bit-identical to sketching the raw facts —
    distinct counts become composable the way sums already are."""
    from aeon_mecha_spark.datapipe import sketch

    fact = str(tmp_path / "fact")
    schema = "ts timestamp, device string, user string"
    rows = [
        (T0 + dt.timedelta(minutes=11 * i), f"d{i % 2}", f"u{i % 7}")
        for i in range(40)
    ]
    spark.createDataFrame(rows[:22], schema).write.mode("overwrite").parquet(fact)
    ca = ContinuousAggregate(
        source=lambda s: s.read.parquet(fact),
        ts_col="ts",
        dims=["device"],
        agg_factory=lambda: [
            F.count(F.lit(1)).alias("n"),
            sketch.kmv_agg("user", k=4).alias("kmv"),
        ],
        table=Table("rollup_kmv", pk=["bucket", "device"], root=str(tmp_path)),
    )
    ca.refresh(spark)
    spark.createDataFrame(rows[22:], schema).write.mode("append").parquet(fact)
    ca.refresh(spark)

    full = (
        spark.read.parquet(fact)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "device")
        .agg(F.count(F.lit(1)).alias("n"), sketch.kmv_agg("user", k=4).alias("kmv"))
    )
    got = sorted(map(tuple, ca.table.read(spark).select("bucket", "device", "n", "kmv").collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want

    # stored hourly partials -> per-device sketches, no fact rescan
    merged = sketch.kmv_estimate(
        sketch.kmv_merge(ca.table.read(spark), ["device"], k=4), k=4
    )
    direct = sketch.kmv_estimate(
        sketch.kmv_partial(spark.read.parquet(fact), "user", ["device"], k=4), k=4
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_dim_partitioned_rollup_keeps_closed_history(spark, tmp_path):
    """A partition spec WITHOUT the bucket column must take the upsert
    path — dynamic overwrite would wipe each dim's closed buckets."""
    fact = str(tmp_path / "fact")
    _rows(spark, [
        (T0, "cam", 1.0),
        (T0 + dt.timedelta(hours=1), "cam", 2.0),
    ]).write.mode("overwrite").parquet(fact)
    ca = ContinuousAggregate(
        source=lambda s: s.read.parquet(fact),
        ts_col="ts",
        dims=["device"],
        agg_factory=lambda: [F.count(F.lit(1)).alias("n")],
        table=Table(
            "rollup_by_device", pk=["bucket", "device"], root=str(tmp_path),
            partition_by=["device"],
        ),
    )
    ca.refresh(spark)
    _rows(spark, [(T0 + dt.timedelta(hours=2), "cam", 3.0)]).write.mode("append").parquet(fact)
    ca.refresh(spark)
    got = {r["bucket"]: r["n"] for r in ca.table.read(spark).collect()}
    assert got == {T0: 1, T0 + dt.timedelta(hours=1): 1, T0 + dt.timedelta(hours=2): 1}


def test_bucket_partitioned_rollup_dynamic_overwrite(spark, tmp_path):
    """bucket IN partition_by => dynamic overwrite replaces exactly the
    refreshed bucket partitions and closed history survives."""
    fact = str(tmp_path / "fact")
    _rows(spark, [
        (T0, "cam", 1.0),
        (T0 + dt.timedelta(hours=1), "cam", 2.0),
    ]).write.mode("overwrite").parquet(fact)
    ca = ContinuousAggregate(
        source=lambda s: s.read.parquet(fact),
        ts_col="ts",
        dims=["device"],
        agg_factory=lambda: [F.count(F.lit(1)).alias("n")],
        table=Table(
            "rollup_bucketed", pk=["bucket", "device"], root=str(tmp_path),
            partition_by=["bucket"],
        ),
    )
    ca.refresh(spark)
    _rows(spark, [
        (T0 + dt.timedelta(hours=1, minutes=30), "cam", 9.0),  # open bucket
        (T0 + dt.timedelta(hours=2), "imu", 9.0),              # new bucket
    ]).write.mode("append").parquet(fact)
    n = ca.refresh(spark)
    assert n == 2  # re-aggregated open bucket + new bucket
    got = {(r["bucket"], r["device"]): r["n"] for r in ca.table.read(spark).collect()}
    assert got == {
        (T0, "cam"): 1,                            # closed history intact
        (T0 + dt.timedelta(hours=1), "cam"): 2,    # re-aggregated in place
        (T0 + dt.timedelta(hours=2), "imu"): 1,
    }
