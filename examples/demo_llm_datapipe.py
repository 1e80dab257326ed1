"""A training-data curation pipeline, end to end, on this engine:

    quality scoring → exact + fuzzy + near dedup → benchmark
    decontamination → LM scoring → quality filter → weighted sampling
    → token-budget selection → packing → range sharding

Every stage is a library operator from ``aeon_mecha_spark.datapipe``
(the same operators the q30–q115 correctness gates verify against
DuckDB oracles); every stage is deterministic, so re-running this
script — on any cluster size or partitioning — reproduces the same
output shards byte for byte.

Run:  python examples/demo_llm_datapipe.py [sf_dir]
      (defaults to /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import curation, dedup, textqc
from aeon_mecha_spark.session import get_spark
from aeon_mecha_spark.util import release_cached


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-llm-datapipe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"corpus: {n0} documents from {sf_dir}")

    # 1. quality features + composite score (map-only)
    feats = textqc.quality_features(docs)

    # 2. exact dedup: drop non-canonical copies by content hash
    canon = dedup.exact_duplicates(docs).select("canonical_id")
    docs1 = docs.join(
        canon.withColumnRenamed("canonical_id", "doc_id"), "doc_id", "semi"
    )
    n1 = docs1.count()

    # 3. near-dup dedup: MinHash/LSH candidates -> Jaccard verify ->
    #    connected components -> keep cluster canonicals (the min id)
    sigs = dedup.minhash_signatures(docs1, k=3, num_hashes=16)
    cands = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=8)
    verified = dedup.ngram_jaccard(docs1, cands, k=3).filter(F.col("jaccard") >= 0.5)
    clusters = dedup.dedup_clusters(verified.select("id_a", "id_b"))
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs2 = docs1.join(drop, "doc_id", "anti")
    n2 = docs2.count()

    # 4. benchmark decontamination: here the "benchmark" is a slice of
    #    the corpus itself, as a stand-in for an eval set
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    scored = curation.decontaminate(docs2, bench, k=3)
    clean = docs2.join(
        scored.filter(F.col("contamination") < 0.5).select("doc_id"), "doc_id", "semi"
    )
    n3 = clean.count()

    # 5. LM quality proxy: corpus-trained smoothed unigram log-prob
    lm = textqc.unigram_logprob(clean, vocab_size=256, alpha=0.5)

    # 6. join scores, filter, weighted-sample the survivors by quality
    pool = (
        feats.join(lm.select("doc_id", "logprob_per_token"), "doc_id")
        .join(clean.select("doc_id"), "doc_id", "semi")
        .filter((F.col("quality_score") > 0.3) & (F.col("n_tokens") >= 10))
    )
    picked = curation.weighted_sample(pool, "quality_score", n=200, seed=11)

    # 7. token-budget selection over the sample
    budgeted = curation.token_budget_select(picked, token_budget=20_000)
    n4 = budgeted.count()

    # 8. pack into 512-token training bins per source shard, then
    #    range-shard by document length for size-balanced output files
    chosen = clean.join(budgeted.select("doc_id"), "doc_id", "semi")
    packed = curation.pack_sequences(
        chosen.select("source", "doc_id", "text"), budget=512, keys=["source"]
    )
    sharded = curation.range_shard(
        packed.withColumn("n_tokens_d", F.col("n_tokens").cast("double")),
        "n_tokens_d",
        4,
        key_col="doc_id",
        sample_fraction=1.0,
    )
    bins = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    )

    # 9. ingest ledger: versioned-Bloom streaming dedup with the
    #    PRODUCTION Parquet sink — each micro-batch's accepted rows land
    #    in <sink>/batch_id=<n>, state commits via write-version-then-
    #    flip-pointer, and a replayed duplicate batch emits nothing new.
    #    (Living documentation of the bloom_dedup_batches commit
    #    contract; the unit tests pin the crash/retry corners.)
    import shutil
    import tempfile

    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    ledger_root = tempfile.mkdtemp(prefix="bloom_ledger_")
    sink_path = os.path.join(ledger_root, "accepted")
    fn, _ = bloom_dedup_batches(
        spark, os.path.join(ledger_root, "state"), key_col="doc_id", sink=sink_path
    )
    batch1 = chosen.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    batch2 = chosen.select("doc_id", "source")  # replays every batch-1 key
    fn(batch1, 0)
    fn(batch2, 1)
    ledger = spark.read.parquet(sink_path)  # full ledger: both batch dirs
    n_b1 = batch1.count()
    n_led = ledger.count()
    n_b2_fresh = ledger.filter(F.col("batch_id") == 1).count()

    print(f"after exact dedup:      {n1}")
    print(f"after near-dup dedup:   {n2}")
    print(f"after decontamination:  {n3}")
    print(f"after budget selection: {n4}")
    print("output shards (docs / tokens):")
    for r in bins.orderBy("shard").collect():
        print(f"  shard {r['shard']}: {r['docs']:5d} docs  {r['tokens']:8d} tokens")
    print(
        f"bloom ledger: batch 0 accepted {n_b1}, batch 1 accepted "
        f"{n_b2_fresh} fresh (replayed {n_b1} dups dropped), "
        f"ledger total {n_led}"
    )
    shutil.rmtree(ledger_root)

    release_cached(budgeted)
    spark.stop()


if __name__ == "__main__":
    main()
