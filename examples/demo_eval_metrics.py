"""The model-evaluation / dataset-diagnostics layer, end to end:

    exact-quota split → classifier-score proxy → AUC + KS + lift/gain
    → per-class confusion metrics → distribution drift (KL, quantile
    map) → uncertainty (Poisson-bootstrap SE)

Every metric is an exact-integer operator from
``aeon_mecha_spark.operators.analytics`` (the same ones the q156–q186
gates hash-verify against DuckDB), so this report is bit-reproducible
on any cluster size or partitioning — an eval number that moves between
runs is a data change, never engine noise.

Run:  python examples/demo_eval_metrics.py [sf_dir]
      (defaults to /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import curation, textqc
from aeon_mecha_spark.operators import analytics
from aeon_mecha_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("demo_eval_metrics", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. Deterministic exact-quota split (train 8 / val 1 / test 1 per lang)
    split = curation.exact_split_quota(
        docs, ["lang"], "doc_id", [("train", 8), ("val", 1), ("test", 1)]
    )
    print("== split quotas per lang ==")
    split.groupBy("lang", "split").count().orderBy("lang", "split").show(6)

    test = split.filter(F.col("split") == "test").join(docs, ["lang", "doc_id"])

    # 2. Score proxy: document length as a 'src0 detector'; label = source
    label = F.col("source") == "src0"

    print("== ROC-AUC per lang (exact Mann–Whitney, ppm) ==")
    analytics.auc_by_group(test, ["lang"], label, "n_chars").orderBy("lang").show()

    print("== KS separation per lang (ppm) ==")
    analytics.ks_statistic(test, ["lang"], label, "n_chars").orderBy("lang").show()

    print("== decile gain/lift table (whole test split) ==")
    analytics.lift_table(test, label, "n_chars", 10).show()

    # 3. Per-class quality of the language-ID heuristic
    pred = textqc.language_id(docs).select("doc_id", "pred_lang")
    joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    print("== language-ID confusion metrics (ppm) ==")
    analytics.confusion_metrics(joined, "lang", "pred_lang").orderBy("label").show()

    # 4. Drift: is the src0 slice's language mix shifted vs the rest?
    print("== categorical KL drift, src0 vs rest (micro-nats) ==")
    analytics.categorical_kl(docs, "lang", F.col("source") == "src0").orderBy(
        "category"
    ).show()

    # 5. Cross-group calibration: German lengths on the English scale
    print("== quantile map sample (de lengths → en scale) ==")
    analytics.quantile_map(
        docs.select("doc_id", "lang", "n_chars"), "lang", "n_chars", "en"
    ).filter(F.col("lang") == "de").orderBy("doc_id").show(5)

    # 6. Uncertainty: bootstrap SE of mean length per lang (deterministic)
    print("== Poisson-bootstrap SE of mean length (micro units) ==")
    analytics.bootstrap_se(
        docs, ["lang"], "doc_id", "n_chars", replicates=32
    ).orderBy("lang").show()

    # 7. Round-8 additions: the full curve, reliability, and the
    # multiple-testing gate on the same score
    from aeon_mecha_spark.util import release_cached

    print("== ROC curve head (two-level bucketed prefix sum) ==")
    roc = analytics.roc_points(test, label, "n_chars")
    roc.show(5)
    release_cached(roc)

    print("== calibration / ECE terms (score quantized to ppm) ==")
    scored = test.withColumn(
        "_score_ppm",
        F.expr(
            "CAST(least(1000000, (CAST(n_chars AS DECIMAL(38,0)) * 1000000)"
            " div 4000) AS BIGINT)"
        ),
    )
    analytics.calibration_table(scored, label, "_score_ppm", 10).show()

    print("== BH-FDR selection over synthetic per-doc p-values ==")
    pvals = docs.select(
        "doc_id",
        F.expr("CAST((doc_id * 2654435761) % 1000001 AS BIGINT)").alias("p_ppm"),
    )
    sel = analytics.bh_select(pvals, "p_ppm", alpha_num=5, alpha_den=100)
    sel.groupBy("bh_rejected").count().show()

    print("== rank agreement: length-rank vs alphabetical-rank (Spearman) ==")
    analytics.spearman_by_group(
        docs.withColumn("_alpha", F.length("text")), ["lang"], "n_chars", "_alpha"
    ).orderBy("lang").show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
