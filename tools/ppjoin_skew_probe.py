"""PPJoin skew probe (VERDICT r12 next-round item 7): q282's candidate
volume tracks rare-token collisions, so its organic 1.44×@8× law could
degrade on a token distribution with a heavy head. This probe measures
the prefix-filter join on a DETERMINISTIC Zipf-skewed corpus (s ≈ 1:
the top token carries ~9% of all occurrences) at 1×/8×/32×, recording
wall time, candidate-pair volume (the quantity the prefix filter
bounds), and output pairs.

Corpus: D docs × 30 tokens, vocabulary V=2000, token rank drawn by the
inverse-CDF of the Zipf(1) measure from a seeded xxhash64 uniform —
fully distributed, reproducible, no RNG state. Shingles are the gate's
k=3 token windows, so head-token mass compounds cubically into shingle
frequencies — the adversarial direction for a frequency-ordered prefix.

Writes nothing outside /tmp. Usage: python tools/ppjoin_skew_probe.py
[D] [scales ...]  (defaults: D=5000, scales 1 8 32)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V = 2000          # vocabulary size
L = 30            # tokens per doc
K = 3             # shingle width (the q282 gate's)
TAU = 0.5


def zipf_docs(spark, n_docs: int, seed: int = 40_913):
    """(doc_id, text): token rank = inverse-CDF Zipf(1) of a seeded
    xxhash64 uniform — P(rank ≤ r) = ln(r+1)/ln(V+1)."""
    from pyspark.sql import functions as F

    import math  # noqa: F401  (documenting the CDF; the expr does the math)

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    tok = (
        f"transform(sequence(0, {L - 1}, 1), p -> concat('w', CAST("
        f"CAST(exp((pmod(xxhash64(concat(CAST(doc_id AS STRING), ':', "
        f"CAST(p AS STRING), ':', '{seed}')), 1000003) / 1000003.0D) "
        f"* ln({V + 1}.0D)) AS BIGINT) AS STRING)))"
    )
    return base.select(
        "doc_id", F.expr(f"array_join({tok}, ' ')").alias("text")
    )


def cand_count(docs) -> int:
    """Candidate-pair volume of the q282 plan (the pre-verify join),
    rebuilt from the same public helpers dedup.prefix_filter_pairs
    composes — the quantity the prefix filter is supposed to bound."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe.dedup import shingle_sets

    sets = shingle_sets(docs, "doc_id", "text", K)
    sized = sets.select("doc_id", "sh", F.size("sh").alias("_n"))
    tok = sized.select("doc_id", "_n", F.explode("sh").alias("shingle"))
    freq = tok.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = W.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
    ranked = tok.join(freq, "shingle").withColumn("_rn", F.row_number().over(w))
    plen = F.col("_n") - F.floor(F.lit(TAU) * F.col("_n")).cast("int") + F.lit(1)
    prefix = ranked.filter(F.col("_rn") <= plen).select("doc_id", "_n", "shingle")
    a, b = prefix.alias("a"), prefix.alias("b")
    size_ok = F.least(F.col("a._n"), F.col("b._n")) >= (
        F.lit(TAU) * F.greatest(F.col("a._n"), F.col("b._n")) - F.lit(1e-9)
    )
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .select("a.doc_id", "b.doc_id")
        .dropDuplicates()
        .count()
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    d0 = int(args[0]) if args else 5000
    scales = [int(a) for a in args[1:]] or [1, 8, 32]

    from aeon_mecha_spark.datapipe import dedup
    from aeon_mecha_spark.session import get_spark

    spark = get_spark("ppjoin-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup
    dedup.prefix_filter_pairs(zipf_docs(spark, 500), k=K, threshold=TAU).count()

    out = {"d0": d0, "V": V, "L": L, "k": K, "tau": TAU, "scales": {}}
    for s in scales:
        docs = zipf_docs(spark, d0 * s).cache()
        docs.count()
        best = None
        for _ in range(2):
            t0 = time.time()
            pairs = dedup.prefix_filter_pairs(docs, k=K, threshold=TAU).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        cands = cand_count(docs)
        out["scales"][str(s)] = {
            "docs": d0 * s,
            "wall_s": round(best, 2),
            "candidates": cands,
            "pairs_out": pairs,
        }
        docs.unpersist()
    for s in scales[1:]:
        r = out["scales"][str(s)]
        b = out["scales"][str(scales[0])]
        r["wall_ratio"] = round(r["wall_s"] / b["wall_s"], 2)
        r["cand_ratio"] = round(r["candidates"] / max(b["candidates"], 1), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
