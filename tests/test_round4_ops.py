"""Unit tests for the round-4 operators (gate queries q95-q97):
Bloom filter build/merge/probe, bloom_decontaminate, weighted_sample,
and substring_duplicate_spans.

Focus: the sketch-theoretic invariants (no false negatives, lossless
merge) and the edge shapes the gate data never hits (touching spans,
within-doc repeats, zero/negative weights, empty inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import curation, dedup, sketch


# -- Bloom filter primitives ------------------------------------------------

def _values_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_bloom_no_false_negatives(spark):
    vals = [f"item_{i}" for i in range(200)]
    bloom = sketch.bloom_partial(_values_df(spark, vals), "v", num_bits=4096, num_hashes=3)
    probe = sketch.bloom_contains(
        _values_df(spark, vals), "v", bloom, ["v"], num_bits=4096, num_hashes=3
    )
    assert probe.filter(F.col("maybe_member") == 0).count() == 0


def test_bloom_rejects_most_absent_values(spark):
    present = [f"in_{i}" for i in range(50)]
    absent = [f"out_{i}" for i in range(500)]
    bloom = sketch.bloom_partial(_values_df(spark, present), "v", num_bits=8192, num_hashes=4)
    probe = sketch.bloom_contains(
        _values_df(spark, absent), "v", bloom, ["v"], num_bits=8192, num_hashes=4
    )
    fp = probe.filter(F.col("maybe_member") == 1).count()
    # 50 keys in 8192 bits at 4 hashes -> theoretical fp rate ~ (1-e^-200/8192)^4 ~ 3e-7
    assert fp <= 2


def test_bloom_merge_equals_single_build(spark):
    a = [f"x_{i}" for i in range(80)]
    b = [f"y_{i}" for i in range(80)]
    pa = sketch.bloom_partial(_values_df(spark, a), "v", num_bits=2048, num_hashes=3)
    pb = sketch.bloom_partial(_values_df(spark, b), "v", num_bits=2048, num_hashes=3)
    merged = sketch.bloom_merge(pa.union(pb))
    whole = sketch.bloom_partial(_values_df(spark, a + b), "v", num_bits=2048, num_hashes=3)
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, whole.collect()))
    assert got == want  # bitwise-identical state, not just equal verdicts


def test_bloom_decontaminate_superset_of_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox sat still"),
            (3, "completely unrelated words appear here instead now"),
            (4, "quick brown fox jumps high"),
        ],
        "doc_id bigint, text string",
    )
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    exact = {
        r["doc_id"]: r for r in curation.decontaminate(corpus, bench, k=3).collect()
    }
    bloomed = {
        r["doc_id"]: r
        for r in curation.bloom_decontaminate(
            corpus, bench, k=3, num_bits=8192, num_hashes=4
        ).collect()
    }
    assert set(bloomed) == set(exact)
    for d, ex in exact.items():
        assert bloomed[d]["n_shingles"] == ex["n_shingles"]
        # Bloom may add false positives but can never miss a true overlap
        assert bloomed[d]["n_bloom_hits"] >= ex["n_overlap"]
    assert bloomed[3]["n_bloom_hits"] <= 1  # unrelated doc ~never flagged


# -- weighted_sample --------------------------------------------------------

def _weights_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, w double")


def test_weighted_sample_size_and_determinism(spark):
    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df = _weights_df(spark, rows)
    a = sorted(r["doc_id"] for r in curation.weighted_sample(df, "w", 40, "doc_id", seed=3).collect())
    b = sorted(
        r["doc_id"]
        for r in curation.weighted_sample(df.repartition(7), "w", 40, "doc_id", seed=3).collect()
    )
    assert len(a) == 40 and a == b  # partition-layout independent


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = _weights_df(spark, [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)])
    got = {r["doc_id"] for r in curation.weighted_sample(df, "w", 10, "doc_id", seed=0).collect()}
    assert got == {1, 4}


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row carries ~99% of the total weight: over 20 independent
    # seeds it must virtually always be drawn into a k=5 sample
    rows = [(0, 10000.0)] + [(i, 1.0) for i in range(1, 100)]
    df = _weights_df(spark, rows)
    hits = sum(
        any(r["doc_id"] == 0 for r in curation.weighted_sample(df, "w", 5, "doc_id", seed=s).collect())
        for s in range(20)
    )
    assert hits >= 19


def test_weighted_sample_fewer_rows_than_n(spark):
    df = _weights_df(spark, [(1, 1.0), (2, 2.0)])
    assert curation.weighted_sample(df, "w", 10, "doc_id", seed=0).count() == 2


# -- substring_duplicate_spans ----------------------------------------------

def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_substring_spans_shared_quote_full_coverage(spark):
    quote = "a b c d e f g h i j"  # 10 tokens -> 3 overlapping 8-grams
    docs = _docs_df(
        spark,
        [
            (1, quote + " unique1 tail1 words1 here1 now1 x1 y1 z1"),
            (2, "lead2 intro2 other2 stuff2 " + quote),
            (3, "nothing shared in this document at all eight tokens"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup.substring_duplicate_spans(docs, n=8).collect()}
    # overlapping gram hits union into ONE 10-token span in both docs
    assert out[1]["n_dup_grams"] == 3 and out[1]["dup_tokens"] == 10
    assert out[2]["n_dup_grams"] == 3 and out[2]["dup_tokens"] == 10
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_tokens"] == 0
    assert out[3]["n_grams"] == 2  # 9 tokens -> 2 positions


def test_substring_spans_within_doc_repeat_not_cross_doc(spark):
    # the repeated 8-gram lives in ONE doc only -> not cross-doc dup
    eight = "p q r s t u v w"
    docs = _docs_df(
        spark,
        [
            (1, eight + " mid " + eight),
            (2, "totally different eight token text sits right here"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup.substring_duplicate_spans(docs, n=8).collect()}
    assert out[1]["n_dup_grams"] == 0 and out[1]["dup_tokens"] == 0


def test_substring_spans_short_docs_excluded(spark):
    docs = _docs_df(spark, [(1, "only four tokens here"), (2, "a b c d e f g h")])
    out = dedup.substring_duplicate_spans(docs, n=8)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_substring_spans_touching_spans_merge(spark):
    # doc 1 shares tokens 0-7 with doc 2 and tokens 8-15 with doc 3:
    # two disjoint-but-touching 8-token spans merge into 16 covered tokens
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = _docs_df(
        spark,
        [
            (1, a + " " + b),
            (2, a + " t2a t2b t2c t2d t2e t2f t2g t2h"),
            (3, "t3a t3b t3c t3d t3e t3f t3g t3h " + b),
        ],
    )
    out = {r["doc_id"]: r for r in dedup.substring_duplicate_spans(docs, n=8).collect()}
    assert out[1]["dup_tokens"] == 16 and out[1]["n_dup_grams"] == 2


# -- product quantization ----------------------------------------------------

def _clustered_vectors(spark):
    # two tight, well-separated clusters per subspace (dims 0-1 and 2-3)
    rows = []
    for i in range(8):
        a = 0.0 if i % 2 == 0 else 10.0
        b = 0.0 if i < 4 else 10.0
        rows.append((i, [a + 0.01 * i, a - 0.01 * i, b + 0.01 * i, b - 0.01 * i]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_pq_codes_recover_cluster_structure(spark):
    from aeon_mecha_spark.datapipe import similarity

    df = _clustered_vectors(spark)
    books = similarity.pq_train(df, m=2, k=2, iters=4)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    codes = {(r["vec_id"], r["sub"]): r["code"] for r in similarity.pq_assign(df, books).collect()}
    # subspace 0 separates even/odd ids; subspace 1 separates low/high ids
    for i in range(8):
        assert codes[(i, 0)] == codes[(i % 2, 0)]
        assert codes[(i, 1)] == codes[((0 if i < 4 else 4), 1)]
    assert codes[(0, 0)] != codes[(1, 0)]
    assert codes[(0, 1)] != codes[(4, 1)]


def test_pq_assign_deterministic_across_partitioning(spark):
    from aeon_mecha_spark.datapipe import similarity

    df = _clustered_vectors(spark)
    books = similarity.pq_train(df, m=2, k=2, iters=2)
    a = sorted(map(tuple, similarity.pq_assign(df, books).collect()))
    b = sorted(map(tuple, similarity.pq_assign(df.repartition(5), books).collect()))
    assert a == b


def test_pq_train_rejects_indivisible_dims(spark):
    from aeon_mecha_spark.datapipe import similarity

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(df, m=2, k=1, iters=1)


# -- kmv_jaccard -------------------------------------------------------------

def test_kmv_jaccard_exact_below_capacity(spark):
    # below sketch capacity the union sketch holds EVERY distinct hash,
    # so the "estimates" are exact set arithmetic
    rows = [("a", v) for v in range(20)] + [("b", v) for v in range(10, 25)]
    df = spark.createDataFrame(rows, "g string, v int")
    sk = sketch.kmv_partial(df, "v", ["g"], k=64)
    r = sketch.kmv_jaccard(sk, "g", k=64).collect()[0]
    assert (r["key_a"], r["key_b"]) == ("a", "b")
    assert r["n_l"] == 25          # |A ∪ B|
    assert r["n_common"] == 10     # |A ∩ B| (values 10..19)
    assert r["est_jaccard"] == 10 / 25
    assert r["est_union"] == 25.0


def test_kmv_jaccard_estimates_within_tolerance_above_capacity(spark):
    # two 600-element sets overlapping in 300: true J = 1/3, union 900
    rows = [("a", v) for v in range(600)] + [("b", v) for v in range(300, 900)]
    df = spark.createDataFrame(rows, "g string, v int")
    sk = sketch.kmv_partial(df, "v", ["g"], k=64)
    r = sketch.kmv_jaccard(sk, "g", k=64).collect()[0]
    assert r["n_l"] == 64
    assert abs(r["est_jaccard"] - 1 / 3) < 0.15   # ~1/sqrt(k) noise
    assert abs(r["est_union"] - 900) / 900 < 0.35


def test_kmv_jaccard_disjoint_sets(spark):
    rows = [("a", v) for v in range(30)] + [("b", v + 1000) for v in range(30)]
    df = spark.createDataFrame(rows, "g string, v int")
    r = sketch.kmv_jaccard(sketch.kmv_partial(df, "v", ["g"], k=64), "g", k=64).collect()[0]
    assert r["n_common"] == 0 and r["est_jaccard"] == 0.0 and r["est_union"] == 60.0


# -- token_entropy -----------------------------------------------------------

def test_token_entropy_values(spark):
    import math

    from aeon_mecha_spark.datapipe import textqc

    docs = _docs_df(
        spark,
        [
            (1, "a a a a"),            # single term -> H = 0
            (2, "a b c d"),            # uniform over 4 -> H = ln 4
            (3, "a a b"),              # H = -(2/3 ln 2/3 + 1/3 ln 1/3)
            (4, ""),                   # no tokens -> no row
        ],
    )
    out = {r["doc_id"]: r for r in textqc.token_entropy(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["entropy"] == 0.0 and out[1]["n_terms"] == 1
    assert abs(out[2]["entropy"] - math.log(4)) < 1e-5
    h3 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert abs(out[3]["entropy"] - h3) < 1e-5
    assert out[3]["n_tokens"] == 3 and out[3]["n_terms"] == 2


def test_token_entropy_partition_independent(spark):
    from aeon_mecha_spark.datapipe import textqc

    docs = _docs_df(
        spark, [(i, " ".join(f"w{j % (1 + i % 11)}" for j in range(40))) for i in range(60)]
    )
    a = sorted(map(tuple, textqc.token_entropy(docs).collect()))
    b = sorted(map(tuple, textqc.token_entropy(docs.repartition(13)).collect()))
    assert a == b  # integer-quantized sum => bit-identical on any layout


# -- bloom_dedup_batches -----------------------------------------------------

def test_bloom_dedup_batches_never_reemits(spark, tmp_path):
    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    state = str(tmp_path / "bloom_state")
    fn, emitted = bloom_dedup_batches(spark, state, "doc_id", num_bits=1 << 14)
    b1 = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    b2 = spark.createDataFrame(
        [(i,) for i in range(50, 150)] + [(60,)], "doc_id bigint"  # 50 dups + re-delivery
    )
    fn(b1, 0)
    fn(b2, 1)
    first = {r["doc_id"] for r in emitted[0]}
    second = {r["doc_id"] for r in emitted[1]}
    assert first == set(range(100))
    assert second & first == set()          # nothing ever re-emitted
    # fresh keys survive modulo (rare) bloom false positives
    assert len(second) >= 48 and second <= set(range(100, 150))


def test_bloom_dedup_batches_state_is_cumulative(spark, tmp_path):
    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    state = str(tmp_path / "bloom_state2")
    fn, emitted = bloom_dedup_batches(spark, state, "doc_id", num_bits=1 << 14)
    for b in range(3):
        df = spark.createDataFrame([(i,) for i in range(20 * b, 20 * b + 30)], "doc_id bigint")
        fn(df, b)
    # batch 3 re-sends EVERYTHING: nothing comes out
    fn(spark.createDataFrame([(i,) for i in range(70)], "doc_id bigint"), 3)
    assert emitted[3] == []


# -- table fingerprints ------------------------------------------------------

def test_fingerprint_equal_tables_match_any_layout(spark):
    from aeon_mecha_spark.pipeline import reconcile

    rows = [(i, f"v{i % 17}") for i in range(500)]
    a = spark.createDataFrame(rows, "k bigint, v string")
    b = spark.createDataFrame(list(reversed(rows)), "k bigint, v string").repartition(9)
    fa = reconcile.table_fingerprint(a, "k", ["k", "v"], num_buckets=16)
    fb = reconcile.table_fingerprint(b, "k", ["k", "v"], num_buckets=16)
    assert sorted(map(tuple, fa.collect())) == sorted(map(tuple, fb.collect()))
    assert reconcile.fingerprint_diff(fa, fb).count() == 0


def test_fingerprint_detects_single_row_change(spark):
    from aeon_mecha_spark.pipeline import reconcile

    rows = [(i, f"v{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "k bigint, v string")
    changed = [(i, "MUTATED" if i == 137 else f"v{i}") for i in range(500)]
    b = spark.createDataFrame(changed, "k bigint, v string")
    fa = reconcile.table_fingerprint(a, "k", ["k", "v"], num_buckets=16)
    fb = reconcile.table_fingerprint(b, "k", ["k", "v"], num_buckets=16)
    d = reconcile.fingerprint_diff(fa, fb).collect()
    assert len(d) == 1  # exactly the mutated row's bucket


def test_fingerprint_detects_duplicated_row(spark):
    # xor alone cancels duplicate pairs; the sum signature must catch it
    from aeon_mecha_spark.pipeline import reconcile

    rows = [(i, "x") for i in range(100)]
    a = spark.createDataFrame(rows, "k bigint, v string")
    b = spark.createDataFrame(rows + [(7, "x")], "k bigint, v string")
    fa = reconcile.table_fingerprint(a, "k", ["k", "v"], num_buckets=4)
    fb = reconcile.table_fingerprint(b, "k", ["k", "v"], num_buckets=4)
    assert reconcile.fingerprint_diff(fa, fb).count() == 1


# -- knn_recall --------------------------------------------------------------

def test_knn_recall_values(spark):
    from aeon_mecha_spark.datapipe import similarity

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id bigint, neighbor_id bigint",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12), (2, 77), (2, 88)],
        "query_id bigint, neighbor_id bigint",
    )
    out = {r["query_id"]: r for r in similarity.knn_recall(approx, exact).collect()}
    assert out[1]["n_exact"] == 3 and out[1]["n_hit"] == 2 and out[1]["recall"] == 2 / 3
    assert out[2]["n_exact"] == 2 and out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0


def test_knn_recall_perfect_when_identical(spark):
    from aeon_mecha_spark.datapipe import similarity

    res = spark.createDataFrame(
        [(q, n) for q in range(5) for n in range(3)],
        "query_id bigint, neighbor_id bigint",
    )
    out = similarity.knn_recall(res, res)
    assert out.filter(F.col("recall") != 1.0).count() == 0


# -- bpe_token_count ---------------------------------------------------------

def test_bpe_token_count_vs_whitespace(spark):
    from aeon_mecha_spark.functions import text as TX

    df = spark.createDataFrame(
        [
            (1, "plain words here"),          # 3 ws, 3 bpe
            (2, "don't stop"),                # 2 ws; bpe: don,'t, stop
            (3, "v1.2.3-rc4"),               # 1 ws word but many bpe tokens
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            TX.token_count(F.col("text")).alias("ws"),
            TX.bpe_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert out[1]["ws"] == 3 and out[1]["bpe"] == 3
    assert out[2]["ws"] == 2 and out[2]["bpe"] == 3
    assert out[3]["ws"] == 1 and out[3]["bpe"] == 9  # v,1,.,2,.,3,-,rc,4
    assert out[4]["ws"] == 0 and out[4]["bpe"] == 0


# -- remove_contaminated_spans -----------------------------------------------

def test_span_decontaminate_surgery(spark):
    quote = "q1 q2 q3 q4 q5 q6 q7 q8"  # exactly one 8-gram
    docs = _docs_df(
        spark,
        [
            (1, "keep1 keep2 " + quote + " keep3 keep4"),
            (2, "all original text stays here untouched fully verbatim"),
        ],
    )
    bench = _docs_df(spark, [(99, "lead " + quote + " tail")])
    out = {
        r["doc_id"]: r
        for r in curation.remove_contaminated_spans(docs, bench, n=8).collect()
    }
    assert out[1]["clean_text"] == "keep1 keep2 keep3 keep4"
    assert out[1]["n_tokens_removed"] == 8
    # untouched docs keep the ORIGINAL string (no re-tokenization)
    assert out[2]["clean_text"] == "all original text stays here untouched fully verbatim"
    assert out[2]["n_tokens_removed"] == 0


def test_span_decontaminate_full_doc_removal(spark):
    quote = "z1 z2 z3 z4 z5 z6 z7 z8"
    docs = _docs_df(spark, [(1, quote)])
    bench = _docs_df(spark, [(99, quote + " more words beyond")])
    r = curation.remove_contaminated_spans(docs, bench, n=8).collect()[0]
    assert r["clean_text"] == "" and r["n_tokens_removed"] == 8


def test_span_decontaminate_overlapping_spans_merge(spark):
    # 10-token quote -> 3 overlapping 8-grams -> one 10-token excision
    quote = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    docs = _docs_df(spark, [(1, "pre " + quote + " post")])
    bench = _docs_df(spark, [(99, quote)])
    r = curation.remove_contaminated_spans(docs, bench, n=8).collect()[0]
    assert r["clean_text"] == "pre post" and r["n_tokens_removed"] == 10


# -- zorder ------------------------------------------------------------------

def test_zorder_interleave_known_values(spark):
    from aeon_mecha_spark.functions.zorder import zorder_key

    df = spark.createDataFrame([(1, 1), (2, 3), (0, 0), (65535, 65535)], "a long, b long")
    out = [
        r["z"]
        for r in df.select(
            zorder_key([F.col("a"), F.col("b")], bits=16).alias("z")
        ).collect()
    ]
    def ref(a, b):
        z = 0
        for bit in range(16):
            z |= ((a >> bit) & 1) << (2 * bit)
            z |= ((b >> bit) & 1) << (2 * bit + 1)
        return z
    assert out == [ref(1, 1), ref(2, 3), 0, ref(65535, 65535)]
    assert out[3] == (1 << 32) - 1  # all 32 bits set


def test_zorder_quantize_bounds(spark):
    from aeon_mecha_spark.functions.zorder import quantize

    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "x double")
    got = [r["q"] for r in df.select(quantize(F.col("x"), 0.0, 100.0, bits=8).alias("q")).collect()]
    assert got[0] == 0          # clamped low
    assert got[1] == 0
    assert got[2] == 128        # midpoint of 256 cells
    assert got[4] == 255        # clamped high
    assert 0 <= got[3] <= 255


def test_zorder_locality_beats_single_column_sort(spark):
    # box query over a 32x32 grid: under z-order the box's rows occupy
    # far fewer distinct rank-blocks than under row-major (single-col) sort
    from aeon_mecha_spark.functions.zorder import zorder_key

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    keyed = df.select("x", "y", zorder_key([F.col("x"), F.col("y")], bits=5).alias("z"))
    ranked = keyed.orderBy("z").withColumn(
        "blk", (F.row_number().over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("z")) / 32).cast("int")
    )
    zblocks = ranked.filter((F.col("x") < 8) & (F.col("y") < 8)).select("blk").distinct().count()
    rowmajor = df.orderBy("x", "y").withColumn(
        "blk", (F.row_number().over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("x", "y")) / 32).cast("int")
    )
    rblocks = rowmajor.filter((F.col("x") < 8) & (F.col("y") < 8)).select("blk").distinct().count()
    assert zblocks < rblocks  # 2-D locality: fewer 32-row blocks touched


# -- vocab_encode ------------------------------------------------------------

def test_vocab_encode_ids_and_oov(spark):
    from aeon_mecha_spark.datapipe import textqc

    docs = _docs_df(
        spark,
        [
            (1, "cat cat cat dog dog bird"),
            (2, "cat rare1"),
        ],
    )
    out = textqc.vocab_encode(docs, vocab_size=2)
    rows = {(r["doc_id"], r["pos"]): r["token_id"] for r in out.collect()}
    # vocab: cat(4) -> 1, dog(2) -> 2; bird/rare1 OOV -> 0
    assert rows[(1, 0)] == 1 and rows[(1, 3)] == 2 and rows[(1, 5)] == 0
    assert rows[(2, 0)] == 1 and rows[(2, 1)] == 0
    assert len(rows) == 8


def test_vocab_encode_tie_break_deterministic(spark):
    from aeon_mecha_spark.datapipe import textqc

    docs = _docs_df(spark, [(1, "bb aa bb aa")])  # equal counts -> term asc
    out = {r["token_id"] for r in textqc.vocab_encode(docs, vocab_size=2).collect()}
    ids = {(r["pos"], r["token_id"]) for r in textqc.vocab_encode(docs, vocab_size=2).collect()}
    assert ids == {(0, 2), (1, 1), (2, 2), (3, 1)}  # aa -> 1, bb -> 2


def test_pq_assign_fixed_codebook_argmin(spark):
    # assignment against literal codebooks matches a numpy argmin
    import numpy as np

    import __spark_entry__ as m
    from aeon_mecha_spark.datapipe import similarity

    books = m._pq_fixed_codebooks(m=2, k=4, d_sub=2)
    vecs = [(i, [0.1 * i - 1.5, 0.3 * (i % 5) - 0.6, 0.2 * (i % 3), -0.1 * i + 0.4]) for i in range(24)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    got = {(r["vec_id"], r["sub"]): r["code"] for r in similarity.pq_assign(df, books).collect()}
    for vid, v in vecs:
        for s in range(2):
            sub_v = np.array(v[s * 2 : s * 2 + 2])
            dists = [float(np.sqrt(((sub_v - np.array(c)) ** 2).sum())) for c in books[s]]
            best = min(range(4), key=lambda i: (dists[i], i))  # first-wins ties
            assert got[(vid, s)] == best
