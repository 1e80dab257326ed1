"""High-cardinality scale probe for the distinct-grain operators.

The standard scale probe (tools/scale_probe.py) replicates rows with
PK offsets, which leaves VALUE columns — and therefore the distinct
grain of ``lift_table`` / ``quantile_map`` / ``roc_points`` — at its
1× cardinality, so it cannot stress the axis VERDICT r07 flagged: a
CONTINUOUS model score whose distinct count ≈ corpus size. This probe
closes that gap: the score is ``n_chars + (doc_id mod p)/1e12`` —
doc_id is PK-offset by the replicator, so the distinct-score count
grows ∝ rows, exactly the continuous-score regime.

A superlinear time ratio here would mean the two-level bucketed prefix
sum still funnels the distinct grain through one task; flat-to-linear
means the de-globalization holds.

Writes only under /tmp. Usage: python tools/hicard_probe.py [N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scale_probe import BASE, SCRATCH, build_scaled  # noqa: E402


def _docs(spark, sf_dir):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(
            "doc_id",
            "lang",
            "source",
            (
                F.col("n_chars").cast("double")
                + (F.col("doc_id") % 1000000007).cast("double") / 1e12
            ).alias("score"),
        )
    )


def probes(spark, sf_dir):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators import analytics

    docs = _docs(spark, sf_dir)
    # a second continuous axis so spearman's PAIR grain grows ∝ rows too
    docs2 = docs.withColumn(
        "score2",
        ((F.col("doc_id") * 37) % 1000000007).cast("double") / 1e6
        + F.col("score") * 0.125,
    )
    return {
        "lift_table_hicard": analytics.lift_table(
            docs, F.col("source") == "src0", "score", n_buckets=10
        ),
        "quantile_map_hicard": analytics.quantile_map(
            docs, "lang", "score", "en"
        ),
        "roc_points_hicard": analytics.roc_points(
            docs, F.col("source") == "src0", "score"
        ),
        # round 10: the rank stats + the selection-based medians on the
        # SAME growing grain — flat-to-linear here proves their slope in
        # the pk-offset probe is data volume, not grain serialization
        "mad_outliers_hicard": analytics.mad_outliers(
            docs, ["lang"], "score", k=3.0, range_buckets=1024
        ),
        "mannwhitney_hicard": analytics.mann_whitney_u(
            docs, ["lang"], "score", F.col("source") == "src0"
        ),
        "kruskal_hicard": analytics.kruskal_wallis(
            docs, ["lang"], "score", "source"
        ),
        "spearman_hicard": analytics.spearman_by_group(
            docs2, ["lang"], "score", "score2"
        ),
    }


def run_once(spark, sf_dir):
    from aeon_mecha_spark.util import release_cached

    out = {}
    for name, df in probes(spark, sf_dir).items():
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        release_cached(df)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from aeon_mecha_spark.session import get_spark

    spark = get_spark("hicard_probe")
    scaled_dir = build_scaled(spark, n)

    # warmup
    _docs(spark, BASE).count()
    base_card = _docs(spark, BASE).select("score").distinct().count()
    scaled_card = _docs(spark, scaled_dir).select("score").distinct().count()

    base_t = run_once(spark, BASE)
    scaled_t = run_once(spark, scaled_dir)
    report = {
        "n": n,
        "distinct_scores": {"base": base_card, "scaled": scaled_card},
        "queries": {
            q: {
                "base_s": base_t[q],
                "scaled_s": scaled_t[q],
                "ratio": round(scaled_t[q] / base_t[q], 2) if base_t[q] else None,
            }
            for q in base_t
        },
    }
    print(json.dumps(report))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
