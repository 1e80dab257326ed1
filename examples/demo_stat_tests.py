"""The classical statistical-test battery, end to end — every test an
exact-integer distributed plan from ``operators/analytics.py`` (the
same implementations the q207-q267 gates hash-verify against DuckDB),
so every number here is bit-reproducible on any cluster size:

    two-sample:   Welch t² (raw scale) vs Mann-Whitney U (ranks)
                  + Cliff's delta / Kendall τ-b effect sizes
    k-sample:     ANOVA F vs Kruskal-Wallis vs Mood's median,
                  Brown-Forsythe variance pre-check
    paired:       McNemar (binary), Friedman + Page's L (blocks)
    trend/sequence: Cochran-Armitage dose trend, Durbin-Watson,
                  Wald-Wolfowitz runs, permutation entropy

Run:  python examples/demo_stat_tests.py [sf_dir]
      (defaults to /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark.operators import analytics
from aeon_mecha_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("demo_stat_tests", shuffle_partitions=8)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    returned = F.col("l_returnflag") == "R"

    print("== two-sample location: Welch t^2 (raw) vs Mann-Whitney (ranks)")
    analytics.welch_t2(li, ["l_linestatus"], "l_quantity", returned).orderBy(
        "l_linestatus"
    ).show()
    analytics.mann_whitney_u(li, ["l_linestatus"], "l_quantity", returned).orderBy(
        "l_linestatus"
    ).show()

    print("== effect sizes: Cliff's delta and Kendall tau-b (+GK gamma)")
    analytics.cliffs_delta(
        li, ["l_linestatus"], "l_extendedprice", returned
    ).orderBy("l_linestatus").show()
    pairs = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
    )
    analytics.kendall_tau(pairs, ["l_returnflag"], "qty", "disc").orderBy(
        "l_returnflag"
    ).show()

    print("== k-sample: ANOVA F / Kruskal-Wallis / Mood's median,")
    print("   with the Brown-Forsythe variance-homogeneity pre-check")
    analytics.brown_forsythe(
        li, ["l_linestatus"], "l_quantity", "l_returnflag"
    ).orderBy("l_linestatus").show()
    analytics.anova_f(li, ["l_linestatus"], "l_quantity", "l_returnflag").orderBy(
        "l_linestatus"
    ).show()
    analytics.kruskal_wallis(
        li, ["l_linestatus"], "l_quantity", "l_returnflag"
    ).orderBy("l_linestatus").show()
    analytics.mood_median(
        li, ["l_linestatus"], "l_quantity", "l_returnflag"
    ).orderBy("l_linestatus").show()

    print("== paired: McNemar on per-user click/purchase flags")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
    )
    analytics.mcnemar(per_user, [], F.col("a") == 1, F.col("b") == 1).show()

    print("== blocks: Friedman + Page's L on per-user event-type counts")
    analytics.friedman(
        ev.withColumn("_one", F.lit(1)), [], "user_id", "event_type", "_one"
    ).show()

    print("== trend: Cochran-Armitage (return rate vs discount dose)")
    analytics.cochran_armitage(
        li.withColumn("disc_pct", F.round(F.col("l_discount") * 100).cast("long")),
        ["l_linestatus"],
        "disc_pct",
        returned,
    ).orderBy("l_linestatus").show()

    print("== sequence diagnostics on 3 user value-series:")
    print("   Durbin-Watson / runs test / permutation entropy")
    few = ev.filter(F.col("user_id") < 3)
    analytics.durbin_watson(few, ["user_id"], ["ts", "event_id"], "value").orderBy(
        "user_id"
    ).show()
    analytics.runs_test(few, ["user_id"], ["ts", "event_id"], "value").orderBy(
        "user_id"
    ).show()
    analytics.permutation_entropy(
        few, ["user_id"], ["ts", "event_id"], "value"
    ).orderBy("user_id").show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
