"""The 100×-scale capstone (VERDICT r10 item 10): one end-to-end
curation pipeline run on a 64× ORGANIC corpus with the Bloom ledger +
streaming ingest active, recorded as a stage-level wall-clock +
shuffle-volume table — the closest local proxy to the 100 TB story.

Pipeline (the production shape, stages in dependency order):

  0. build   64× organic replication of the sf0.1 documents table
             (seeded substitution ciphers: cross-replica shingles are
             novel, within-replica structure preserved)
  1. ingest  8 overlapping micro-batches through the versioned-Bloom
             streaming dedup (streaming/stream.py bloom_dedup_batches):
             batch b carries slice b plus a full REPLAY of slice b-1 —
             the ledger must accept each doc exactly once anyway
  2. curate  the q106 composition over the ingested corpus: quality
             filter → exact-dedup canonicalization → deterministic 50%
             hash sample → per-source sequence packing

Shuffle volume comes from the Spark UI REST API (the same numbers the
History Server shows): per-phase DELTAS of completed-stage
shuffleRead/Write and input bytes. Zero plan red flags = no phase whose
shuffle exceeds its input by an unexplained factor, no single-partition
stage on the hot path (AQE coalescing aside).

Writes under /tmp + spark-warehouse/capstone. Usage:
    python tools/capstone_64x.py [N]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stage_totals(ui_port: int = 4040) -> dict:
    """Cumulative bytes over all completed stages, via the UI REST API."""
    try:
        apps = json.load(
            urllib.request.urlopen(f"http://localhost:{ui_port}/api/v1/applications")
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{ui_port}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
    except Exception:
        return {"input": 0, "shuffle_read": 0, "shuffle_write": 0, "stages": 0}
    return {
        "input": sum(s.get("inputBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "stages": len(stages),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe import curation, dedup
    from aeon_mecha_spark.session import get_spark
    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    from tools.scale_probe import build_scaled

    spark = get_spark("capstone-64x", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    phases = {}

    def phase(name, fn):
        before, t0 = stage_totals(), time.time()
        result = fn()
        wall = round(time.time() - t0, 2)
        after = stage_totals()
        phases[name] = {
            "wall_s": wall,
            "input_mb": round((after["input"] - before["input"]) / 1e6, 1),
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 1e6, 1
            ),
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 1e6, 1
            ),
            "stages": after["stages"] - before["stages"],
        }
        return result

    # 0. build
    scaled_dir = phase(
        "build_64x",
        lambda: build_scaled(spark, n, organic=True, tables=["documents"]),
    )
    docs_path = os.path.join(scaled_dir, "documents.parquet")

    # 1. streaming ingest + Bloom ledger (8 micro-batches, replay of the
    # previous slice in every batch)
    root = os.path.join(REPO, "spark-warehouse", "capstone")
    shutil.rmtree(root, ignore_errors=True)

    def ingest():
        docs = spark.read.parquet(docs_path)
        n_expect = docs.count()
        # size the filter for the expected history (the operator's
        # documented rule): FP <= 1e-4 at k=4 needs m >= ~38 bits/key.
        # The first 64x run proved the rule is LOAD-BEARING: the 2^20
        # default (sized for ~1e5 keys) false-positive-dropped 5.8% of
        # 320k keys
        num_bits = 1 << max(20, (38 * n_expect).bit_length())
        fn, _state = bloom_dedup_batches(
            spark,
            os.path.join(root, "state"),
            key_col="doc_id",
            num_bits=num_bits,
            sink=os.path.join(root, "accepted"),
        )
        for b in range(8):
            sel = (F.col("doc_id") % 8 == b) | (F.col("doc_id") % 8 == (b - 1) % 8)
            fn(docs.filter(sel).select("doc_id"), b)
        led = spark.read.parquet(os.path.join(root, "accepted"))
        n_led, n_dist = led.count(), led.select("doc_id").distinct().count()
        # the Bloom contract: NO duplicate is ever re-emitted (hard),
        # and fresh-key drops stay at the designed FP rate (probabilistic
        # — expected ~n²k⁴/(2m⁴)-ish; bound at 0.1% of the corpus)
        assert n_led == n_dist, (n_led, n_dist)
        assert n_expect - n_led <= max(1, n_expect // 1000), (n_led, n_expect)
        return {"docs": n_expect, "accepted": n_led,
                "fp_dropped": n_expect - n_led, "num_bits": num_bits}

    ingest_stats = phase("ingest_bloom_8batches", ingest)

    # 2. the q106 curation composition over the ingested corpus
    def curate():
        docs = spark.read.parquet(docs_path)
        accepted = spark.read.parquet(os.path.join(root, "accepted")).select("doc_id")
        corpus = docs.join(accepted, "doc_id")
        verdicts = curation.quality_filter(
            corpus,
            min_tokens=10,
            max_tokens=1000,
            min_mean_token_len=3.0,
            max_mean_token_len=6.0,
            max_punct_ratio=0.05,
            max_rep_ratio=0.6,
        ).select("doc_id", "passes").persist()
        passes = verdicts.filter("passes").select("doc_id")
        kept = corpus.join(passes, "doc_id")
        canon = dedup.exact_duplicates(kept).select(
            F.col("canonical_id").alias("doc_id")
        )
        uniq = kept.join(canon, "doc_id")
        sampled = curation.hash_sample(uniq, "doc_id", fraction=0.5, seed=1)
        out = curation.pack_sequences(sampled, budget=512, keys=["source"])
        n_out = out.count()
        verdicts.unpersist()
        return n_out

    n_packed = phase("curate_q106", curate)

    print(json.dumps({
        "n": n,
        "ingest": ingest_stats,
        "rows_packed": n_packed,
        "phases": phases,
    }))


if __name__ == "__main__":
    main()
