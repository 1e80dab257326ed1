"""Analytics-layer demo: continuous aggregates, funnels, time-weighted
averages, gap-filling, sketches, and the SQL surface over the catalog.

Run:  python examples/demo_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark import catalog
from aeon_mecha_spark.datapipe import sketch
from aeon_mecha_spark.operators import analytics
from aeon_mecha_spark.pipeline.continuous import ContinuousAggregate
from aeon_mecha_spark.pipeline.orchestrator import Table
from aeon_mecha_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo_analytics")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = catalog.load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )

    print("== multi-granularity rollup (one GROUPING SETS aggregate)")
    roll = analytics.granularity_rollup(
        ev, "ts", ["event_type"],
        [F.count(F.lit(1)).alias("n")], ("day", "hour"),
    )
    roll.groupBy("level").count().orderBy("level").show()

    print("== ordered funnel signup -> view -> click -> purchase")
    analytics.funnel_counts(
        ev, "user_id", "event_type", "ts", ["signup", "view", "click", "purchase"]
    ).show()

    print("== time-weighted average value, top 5 users by span")
    analytics.time_weighted_avg(ev, "ts", "value", ["user_id"]).orderBy(
        F.desc("span_us")
    ).show(5)

    print("== KMV distinct-user sketch vs exact")
    est = sketch.kmv_distinct(ev, "user_id", ["event_type"], k=32)
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    est.join(exact, "event_type").orderBy("event_type").show()

    print("== continuous aggregate: build, append, incremental refresh")
    with tempfile.TemporaryDirectory() as root:
        fact = os.path.join(root, "fact")
        ev.write.mode("overwrite").parquet(fact)
        ca = ContinuousAggregate(
            source=lambda s: s.read.parquet(fact),
            ts_col="ts",
            dims=["event_type"],
            agg_factory=lambda: [F.count(F.lit(1)).alias("n")],
            table=Table("rollup", pk=["bucket", "event_type"], root=root),
        )
        print("  first refresh rows:", ca.refresh(spark))
        print("  watermark:", ca.watermark(spark))
        print("  incremental refresh rows (open bucket only):", ca.refresh(spark))

    print("== SQL surface over the registered catalog")
    catalog.register_views(spark, sf_dir)
    spark.sql(
        """
        SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value
        FROM events GROUP BY event_type ORDER BY n DESC
        """
    ).show()


if __name__ == "__main__":
    main()
