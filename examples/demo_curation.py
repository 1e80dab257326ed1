"""End-to-end training-data curation demo: the full document pipeline a
100 TB pretraining corpus goes through, on this engine at toy scale.

    quality filter → entropy screen → PII redaction → Bloom pre-filter →
    decontamination → substring dedup → MinHash/LSH near-dup → cluster
    canonicalization → mixture sampling → weighted sampling →
    sequence packing

Every stage is a pure Catalyst plan (datapipe/curation.py, dedup.py) —
the same composition runs unchanged on a cluster; only the input path
and the shard keys change.

Run:  python examples/demo_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import curation, dedup, textqc, unigram, urltools
from aeon_mecha_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo_curation")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"== corpus: {n0} documents")

    print("== 0. URL provenance (r13): canonicalize -> eTLD+1 -> blocklist")
    # a crawl corpus carries its URL; here one is synthesized per doc
    withurl = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://WWW."), F.col("source"),
            F.lit(".Example.COM:443/p/"), F.col("doc_id").cast("string"),
            F.lit("?utm_source=feed&id=1"),
        ),
    )
    rules = spark.createDataFrame([("com",), ("co.uk",)], "suffix string")
    dom = urltools.registrable_domain(
        urltools.url_canonicalize(withurl), rules
    )
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    dom = urltools.blocklist_filter(dom, blocked)
    urltools.domain_rollup(dom).orderBy(F.desc("n_docs")).show(3)
    docs = dom.drop("url", "url_canon", "host", "domain")

    print("== 1. rule-based quality filter (C4/Gopher rules)")
    verdicts = curation.quality_filter(docs, min_tokens=10, max_rep_ratio=0.6)
    for row in (
        verdicts.agg(
            *[
                F.sum((~F.col(c)).cast("long")).alias(c)
                for c in ("ok_n_tokens", "ok_token_len", "ok_punct", "ok_repetition")
            ]
        ).collect()
    ):
        print("   rejections by rule:", row.asDict())
    docs = docs.join(verdicts.filter("passes").select("doc_id"), "doc_id")
    print(f"   kept {docs.count()}/{n0}")

    print("== 1b. entropy screen (template/boilerplate detector)")
    ent = textqc.token_entropy(docs)
    low = ent.filter(F.col("entropy") < 0.5)
    print(f"   dropping {low.count()} low-entropy docs")
    docs = docs.join(low.select("doc_id"), "doc_id", "left_anti")

    print("== 1c. Gopher document rules (integer cross-multiplied ratios)")
    gv = curation.gopher_filter(
        docs, min_words=20,
        required_words=("the", "a", "value", "table"), min_required_hits=2,
    )
    gv.agg(*[
        F.sum(F.when(F.col(c), 0).otherwise(1)).alias(f"fail_{c}")
        for c in ("ok_n_words", "ok_word_len", "ok_symbols", "ok_alpha",
                  "ok_required")
    ]).show()
    docs = docs.join(gv.filter("passes").select("doc_id"), "doc_id")

    print("== 1d. CCNet perplexity buckets (keep head+middle)")
    ppl = textqc.perplexity_buckets(docs)
    ppl.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("bucket").show()
    docs = docs.join(
        ppl.filter(F.col("bucket") != "tail").select("doc_id"), "doc_id"
    )
    # the quality stages above tripled the lineage every later stage
    # replays — truncate it once (same reason dedup_clusters checkpoints)
    docs = docs.localCheckpoint()

    print("== 1e. trained quality classifier (IRLS logistic, r12)")
    from aeon_mecha_spark.datapipe import classifier

    qfeat = textqc.quality_features(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select(
        "doc_id",
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)).alias("x_len"),
        F.col("punct_ratio").alias("x_punct"),
        F.col("stopword_ratio").alias("x_stop"),
        F.least(F.col("mean_token_len") / 10.0, F.lit(1.0)).alias("x_mtl"),
        (F.col("lang") == "en").cast("double").alias("label"),
    )
    feats = ["x_len", "x_punct", "x_stop", "x_mtl"]
    coefs = classifier.logreg_irls_train(qfeat, feats, "label", iters=4)
    print("   trained coefficients:", [round(c, 4) for c in coefs])
    scored = classifier.logreg_score_ppm(qfeat, feats, coefs)
    scored.agg(
        F.min("prob_ppm").alias("min_ppm"), F.max("prob_ppm").alias("max_ppm")
    ).show()

    print("== 2. PII redaction (audit counts ride along)")
    red = curation.redact_pii(docs)
    audit = red.agg(
        F.sum("n_email").alias("emails"),
        F.sum("n_ipv4").alias("ips"),
        F.sum("n_phone").alias("phones"),
    ).collect()[0]
    print("   redacted:", audit.asDict())
    docs = docs.join(red.select("doc_id", "clean_text"), "doc_id").select(
        "doc_id", F.col("clean_text").alias("text"), "lang", "source"
    )

    print("== 3. benchmark decontamination (Bloom pre-filter, then exact)")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    # fixed-size Bloom filter clears the untouched majority without the
    # full benchmark shingle set ever broadcasting...
    flagged = curation.bloom_decontaminate(corpus, bench).filter(
        F.col("n_bloom_hits") > 0
    )
    print(f"   bloom flags {flagged.count()} docs for the exact check")
    # ...and only flagged docs pay the exact overlap join
    scores = curation.decontaminate(
        corpus.join(flagged.select("doc_id"), "doc_id"), bench
    )
    dirty = scores.filter(F.col("contamination") >= 0.5)
    print(f"   dropping {dirty.count()} contaminated docs (θ=0.5)")
    docs = corpus.join(dirty.select("doc_id"), "doc_id", "left_anti")

    print("== 3b. cross-document substring dedup (8-gram spans)")
    spans = dedup.substring_duplicate_spans(docs, n=8)
    heavy = spans.filter(F.col("dup_tokens") * 2 > F.col("n_grams") + 7)
    print(f"   {heavy.count()} docs are >50% duplicated spans")
    docs = docs.join(heavy.select("doc_id"), "doc_id", "left_anti")

    print("== 4. near-duplicate removal (MinHash → LSH → clusters)")
    sigs = dedup.minhash_signatures(docs, num_hashes=8)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    verified = dedup.ngram_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.8)
    clusters = dedup.dedup_clusters(verified.select("id_a", "id_b"))
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id"))
    print(f"   {losers.count()} near-duplicates removed, keeping cluster canonicals")
    docs = docs.join(losers.select("doc_id"), "doc_id", "left_anti")

    print("== 5. mixture sampling toward the target language distribution")
    docs = curation.mixture_sample(
        docs, "lang", {"en": 1.0, "zh": 0.8}, default_fraction=0.5
    )
    docs.groupBy("lang").count().orderBy("lang").show()

    print("== 5a2. mixture SOLVE: weights to a target token-share mix")
    curation.mixture_weights(
        docs, "lang",
        {"en": 400_000, "zh": 200_000, "es": 200_000, "de": 150_000,
         "fr": 50_000},
    ).orderBy("domain").show()

    print("== 5a3. DSIR importance selection toward English (r12)")
    from aeon_mecha_spark.util import release_cached

    imp = curation.dsir_importance(docs, F.col("lang") == "en", n_buckets=64)
    imp.agg(
        F.min("logratio_micro").alias("min_lr"),
        F.max("logratio_micro").alias("max_lr"),
    ).show()
    release_cached(imp)

    print("== 5b. quality-weighted subset (Efraimidis-Spirakis, top 300)")
    weighted = docs.withColumn(
        "w", F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    )
    docs = curation.weighted_sample(weighted, "w", 300, "doc_id", seed=11).drop("w")
    print(f"   kept {docs.count()}")

    print("== 6. sequence packing into 512-token training bins (per source)")
    packed = curation.pack_sequences(docs, budget=512, keys=["source"])
    packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        (F.max("bin_id") + 1).alias("bins"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("source").show()

    print("== 7. token accounting under a trained unigram LM (r13)")
    vocab_df = unigram.unigram_learn(docs, vocab_size=40, rounds=1)
    vocab = [(r["piece"], r["lp_micro"]) for r in vocab_df.collect()]
    enc = unigram.unigram_encode(docs, vocab)
    enc.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("nll_micro").alias("total_nll_micro"),
    ).show()

    print(f"== final corpus: {docs.count()} documents (from {n0})")
    spark.stop()


if __name__ == "__main__":
    main()
