"""The warehouse-maintenance layer, end to end, on this engine:

    SCD2 dimension merge → effective-dated temporal join →
    watermark-incremental continuous aggregate → reconciliation
    fingerprints → hot-key skew check

Every stage is a library operator (the same ones gates q117–q128
verify against DuckDB oracles); everything is deterministic, so a
re-run reproduces the same stored rollup byte for byte.

Run:  python examples/demo_warehouse.py [sf_dir]
      (defaults to /root/testdata/sf0.01; writes only under /tmp)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark.operators.skew import key_skew_stats
from aeon_mecha_spark.pipeline import scd
from aeon_mecha_spark.pipeline.continuous import ContinuousAggregate
from aeon_mecha_spark.pipeline.orchestrator import Table
from aeon_mecha_spark.pipeline.reconcile import fingerprint_diff, table_fingerprint
from aeon_mecha_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-warehouse")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="warehouse_demo_")

    # 1. SCD2: customer balances become a versioned dimension; one
    #    update batch changes every 10th key effective 1998-01-01
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    dim = cust.select(
        "c_custkey",
        "c_acctbal",
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("1998-01-01").cast("timestamp").alias("effective_ts"),
    )
    dim2 = scd.scd2_apply(dim, upd, ["c_custkey"], ["c_acctbal"])
    n_open = dim2.filter("is_current").count()
    n_closed = dim2.filter("NOT is_current").count()
    print(f"dimension after merge: {n_open} open rows, {n_closed} closed")

    # 2. temporal join: orders see the balance version valid at order date
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_orderdate"
    )
    enriched = scd.temporal_join(orders, dim2, ["c_custkey"], "o_orderdate")
    per_version = enriched.groupBy("is_current").count().collect()
    print("orders by dimension version:", {r["is_current"]: r["count"] for r in per_version})

    # 3. continuous aggregate: hourly event rollup built incrementally
    #    (first half, then watermark-forward), stored under /tmp
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

    def events_src(s):
        df = s.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn(
            "_vm", F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
        )

    table = Table(name="hourly_rollup", pk=["bucket", "event_type"], root=root)
    ca = ContinuousAggregate(
        source=events_src,
        ts_col="ts",
        dims=["event_type"],
        agg_factory=lambda: [
            F.count(F.lit(1)).alias("n"),
            F.sum("_vm").alias("sum_micro"),
        ],
        table=table,
        granularity="hour",
    )
    ev = events_src(spark)
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = lohi["lo"] + (lohi["hi"] - lohi["lo"]) / 2
    ca.refresh(spark, until=mid)
    ca.refresh(spark)
    rollup = table.read(spark)
    print(f"continuous rollup: {rollup.count()} (hour, type) buckets stored")

    # 4. reconciliation: the stored rollup must equal the direct GROUP BY
    direct = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_vm").alias("sum_micro"))
    )
    key = F.concat_ws("|", F.col("bucket").cast("string"), "event_type")
    ra = rollup.withColumn("_k", key)
    rb = direct.withColumn("_k", key)
    fa = table_fingerprint(ra, "_k", ["n", "sum_micro"])
    fb = table_fingerprint(rb, "_k", ["n", "sum_micro"])
    diff = fingerprint_diff(fa, fb).count()
    print(f"reconciliation: {diff} differing fingerprint buckets (expect 0)")

    # 5. pre-flight skew check on the join key the rollup shuffles on
    top = key_skew_stats(ev, ["event_type"], top_n=3).collect()
    for r in top:
        print(f"  hot key {r['event_type']!r}: {r['n']} rows ({r['share']:.1%})")

    shutil.rmtree(root)
    spark.stop()


if __name__ == "__main__":
    main()
