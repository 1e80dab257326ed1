"""Unit tests for the operators added in rounds 2-3 (gate queries
q66-q72): group_centroids, term/top/ngram counts, rank_distribution,
cohort_retention, rolling_rows_avg, near_duplicates_lsh.

Focus: the null/ragged/tie/empty-key edges the gate data never hits."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import curation, similarity, textqc
from aeon_mecha_spark.operators import analytics, windows


# -- group_centroids --------------------------------------------------------

def test_group_centroids_basic_mean(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [5.0, -1.0])],
        "label string, embedding array<double>",
    )
    rows = {r["label"]: r for r in similarity.group_centroids(df, dims=2).collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["c0"] == 2.0 and rows["a"]["c1"] == 4.0
    assert rows["b"]["n"] == 1 and rows["b"]["c0"] == 5.0 and rows["b"]["c1"] == -1.0


def test_group_centroids_ragged_and_null_use_avg_semantics(spark):
    # short vector: component 2 missing -> excluded from BOTH sum and
    # denominator (F.avg semantics, same as kmeans_train)
    df = spark.createDataFrame(
        [("a", [1.0, 10.0]), ("a", [3.0]), ("a", None)],
        "label string, embedding array<double>",
    )
    r = similarity.group_centroids(df, dims=3).collect()[0]
    assert r["n"] == 3                      # group size counts every row
    assert r["c0"] == 2.0                   # (1+3)/2, null vector excluded
    assert r["c1"] == 10.0                  # only one valid component
    assert r["c2"] is None                  # no valid component at all


def test_group_centroids_nan_component_excluded(spark):
    # NaN -> NULL under the decimal cast -> excluded, not propagated
    df = spark.createDataFrame(
        [("a", [1.0]), ("a", [float("nan")])], "label string, embedding array<double>"
    )
    r = similarity.group_centroids(df, dims=1).collect()[0]
    assert r["c0"] == 1.0


def test_group_centroids_rejects_unsafe_scale(spark):
    df = spark.createDataFrame([("a", [1.0])], "label string, embedding array<double>")
    with pytest.raises(ValueError, match="scale"):
        similarity.group_centroids(df, dims=1, scale=12)


def test_group_centroids_partition_invariant(spark):
    data = [("g", [float(i % 7) / 3.0, float(i) / 11.0]) for i in range(200)]
    df = spark.createDataFrame(data, "label string, embedding array<double>")
    one = similarity.group_centroids(df.coalesce(1), dims=2).collect()[0]
    many = similarity.group_centroids(df.repartition(13), dims=2).collect()[0]
    assert (one["c0"], one["c1"]) == (many["c0"], many["c1"])  # bit-identical


# -- term / top / ngram counts ---------------------------------------------

def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "en", "the cat the hat"),
            (2, "en", "the cat"),
            (3, "fr", "le chat"),
            (4, "fr", ""),
        ],
        "doc_id long, lang string, text string",
    )


def test_term_counts_grouped_and_global(spark):
    by_lang = {
        (r["lang"], r["term"]): r["n"]
        for r in textqc.term_counts(_docs(spark), keys=["lang"]).collect()
    }
    assert by_lang[("en", "the")] == 3
    assert by_lang[("fr", "chat")] == 1
    assert ("fr", "") not in by_lang  # empty doc contributes no tokens
    # empty keys -> one global vocabulary
    global_counts = {r["term"]: r["n"] for r in textqc.term_counts(_docs(spark)).collect()}
    assert global_counts["the"] == 3 and global_counts["le"] == 1


def test_top_terms_deterministic_tie_break(spark):
    out = textqc.top_terms(_docs(spark), k=2, keys=["lang"]).collect()
    en = sorted([(r["rank"], r["term"]) for r in out if r["lang"] == "en"])
    # 'the' x3 first; 'cat' x2 second (beats 'hat' x1)
    assert en == [(1, "the"), (2, "cat")]
    fr = sorted([(r["rank"], r["term"]) for r in out if r["lang"] == "fr"])
    # 'chat' and 'le' tie at 1 -> term asc breaks it
    assert fr == [(1, "chat"), (2, "le")]


def test_ngram_counts_drops_short_docs(spark):
    counts = {r["ngram"]: r["n"] for r in textqc.ngram_counts(_docs(spark), k=2).collect()}
    assert counts["the cat"] == 2   # doc1 + doc2
    assert counts["cat the"] == 1
    assert "le" not in counts and "" not in counts  # 1-token/empty docs dropped


# -- rank_distribution ------------------------------------------------------

def test_rank_distribution_bounds_and_ties(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0), ("b", 9.0)],
        "k string, v double",
    )
    rows = analytics.rank_distribution(df, ["k"], "v").collect()
    for r in rows:
        assert 0.0 <= r["pct_rank"] <= 1.0
        assert 0.0 < r["cume_dist"] <= 1.0
    ties = [r for r in rows if r["k"] == "a" and r["v"] == 2.0]
    assert len(ties) == 2
    # tied rows share identical rank stats (deterministic without a
    # unique ordering, unlike ntile)
    assert len({(r["pct_rank"], r["cume_dist"]) for r in ties}) == 1
    assert ties[0]["pct_rank"] == pytest.approx(1 / 3)
    solo = [r for r in rows if r["k"] == "b"][0]
    assert solo["pct_rank"] == 0.0 and solo["cume_dist"] == 1.0


# -- cohort_retention -------------------------------------------------------

def test_cohort_retention_offsets_and_null_ts(spark):
    t = dt.datetime
    df = spark.createDataFrame(
        [
            (1, t(2024, 1, 1)),   # Mon, cohort week 0
            (1, t(2024, 1, 10)),  # week 1
            (2, t(2024, 1, 3)),   # same cohort week
            (2, None),            # dropped
        ],
        "user_id long, ts timestamp",
    )
    out = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in analytics.cohort_retention(df, "user_id", "ts", "week").collect()
    }
    wk = dt.datetime(2024, 1, 1)
    assert out == {(wk, 0): 2, (wk, 1): 1}


def test_cohort_retention_offset0_is_max(spark):
    """Offset-0 counts the whole cohort, so no later offset exceeds it."""
    t0 = dt.datetime(2024, 3, 4)
    rows = [
        (u, t0 + dt.timedelta(days=3 * i))
        for u in range(20)
        for i in range(u % 5 + 1)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = analytics.cohort_retention(df, "user_id", "ts", "day").collect()
    base = {r["cohort"]: r["n_users"] for r in out if r["offset"] == 0}
    for r in out:
        assert r["n_users"] <= base[r["cohort"]]


def test_cohort_retention_rejects_unknown_unit(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="unit"):
        analytics.cohort_retention(df, "user_id", "ts", "month")


# -- rolling_rows_avg -------------------------------------------------------

def test_rolling_rows_avg_matches_pandas(spark):
    vals = [1.25, 2.5, None, 4.0, 10.0, -3.75, 0.0, None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v double"
    )
    out = (
        windows.rolling_rows_avg(
            df, F.col("v").cast("decimal(18,2)"), "i", [], n=3, alias="avg3"
        )
        .orderBy("i")
        .collect()
    )
    expected = pd.Series(vals, dtype="float64").rolling(3, min_periods=1).mean()
    for r, e in zip(out, expected):
        if math.isnan(e):
            assert r["avg3"] is None
        else:
            assert r["avg3"] == pytest.approx(e, abs=0, rel=0)  # exact


def test_rolling_rows_avg_all_null_frame_is_null(spark):
    df = spark.createDataFrame([(0, None), (1, None)], "i long, v double")
    out = windows.rolling_rows_avg(
        df, F.col("v").cast("decimal(18,2)"), "i", [], n=2, alias="a"
    ).collect()
    assert all(r["a"] is None for r in out)


def test_rolling_rows_avg_per_key(spark):
    df = spark.createDataFrame(
        [("x", 0, 2.0), ("x", 1, 4.0), ("y", 0, 100.0)], "k string, i long, v double"
    )
    out = {
        (r["k"], r["i"]): r["m"]
        for r in windows.rolling_rows_avg(
            df, F.col("v").cast("decimal(18,2)"), "i", ["k"], n=2, alias="m"
        ).collect()
    }
    assert out == {("x", 0): 2.0, ("x", 1): 3.0, ("y", 0): 100.0}


# -- near_duplicates_lsh ----------------------------------------------------

_PLANES = [[1.0, -0.5, 0.25], [-0.75, 1.0, -0.25], [0.5, 0.25, -1.0]]


def test_near_dup_lsh_subset_of_exact_with_equal_scores(spark):
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(3)]
        rows.append((2 * i, base))
        # a jittered twin: near-dup by construction
        rows.append((2 * i + 1, [v + rng.uniform(-0.01, 0.01) for v in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.embedding_near_duplicates(df, threshold=0.9).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_duplicates_lsh(df, _PLANES, threshold=0.9).collect()
    }
    assert set(approx) <= set(exact)          # no false positives, ever
    for pair, cos in approx.items():
        assert cos == exact[pair]             # identical scoring arithmetic
    # construction guarantees twins are near-dups; LSH must find most
    twins = {p for p in exact if p[1] == p[0] + 1 and p[0] % 2 == 0}
    found = twins & set(approx)
    assert len(found) >= 0.8 * len(twins)


def test_near_dup_lsh_plan_has_no_cartesian(spark):
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = similarity.near_duplicates_lsh(df, _PLANES, threshold=0.5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# -- tfidf ------------------------------------------------------------------

def test_tfidf_ratio_idf_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "c c d")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["term"]): r
        for r in textqc.tfidf(docs, log_idf=False).collect()
    }
    # n_docs=3; df: a=2, b=1, c=2, d=1
    assert rows[(1, "a")]["tf"] == 2 and rows[(1, "a")]["df"] == 2
    assert rows[(1, "a")]["tfidf"] == 2 * (3.0 / 2.0)
    assert rows[(1, "b")]["tfidf"] == 1 * (3.0 / 1.0)
    assert rows[(3, "c")]["tfidf"] == 2 * (3.0 / 2.0)
    assert len(rows) == 6  # distinct (doc, term) pairs


def test_tfidf_log_idf_monotone_in_rarity(spark):
    docs = spark.createDataFrame(
        [(1, "common rare"), (2, "common"), (3, "common")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in textqc.tfidf(docs, log_idf=True).collect()
    }
    # same tf=1: the rarer term must weigh strictly more
    assert rows[(1, "rare")] > rows[(1, "common")]
    # smoothed log idf: tf * (ln((n+1)/(df+1)) + 1)
    assert rows[(1, "rare")] == pytest.approx(math.log(4.0 / 2.0) + 1.0)
    assert rows[(1, "common")] == pytest.approx(math.log(4.0 / 4.0) + 1.0)


def test_tfidf_empty_text_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    out = textqc.tfidf(docs, log_idf=False).collect()
    assert [(r["doc_id"], r["term"]) for r in out] == [(1, "x")]
    # but n_docs counts the whole corpus, including empty docs
    assert out[0]["tfidf"] == 1 * (3.0 / 1.0)


# -- inverted_index ---------------------------------------------------------

def test_inverted_index_numeric_posting_order(spark):
    # doc ids 2 and 10 share a term: postings must sort numerically
    # ("2,10"), not lexicographically ("10,2")
    docs = spark.createDataFrame(
        [(10, "alpha beta"), (2, "alpha"), (7, "beta beta")],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in textqc.inverted_index(docs).collect()}
    assert rows["alpha"]["df"] == 2 and rows["alpha"]["postings"] == "2,10"
    assert rows["beta"]["df"] == 2 and rows["beta"]["postings"] == "7,10"


def test_inverted_index_dedupes_repeats_within_doc(spark):
    docs = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    rows = textqc.inverted_index(docs).collect()
    assert len(rows) == 1 and rows[0]["df"] == 1 and rows[0]["postings"] == "1"


# -- token_budget_select ----------------------------------------------------

def _naive_budget_select(pdf, budget):
    pdf = pdf.dropna(subset=["quality_score", "n_tokens"])
    pdf = pdf.sort_values(
        ["quality_score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    pdf["cum_tokens"] = pdf["n_tokens"].cumsum()
    return pdf[pdf["cum_tokens"] <= budget]


def test_token_budget_matches_naive_global_cumsum(spark):
    import random

    rng = random.Random(7)
    data = [
        (i, rng.randint(1, 50), round(rng.random(), 3)) for i in range(300)
    ]
    pdf = pd.DataFrame(data, columns=["doc_id", "n_tokens", "quality_score"])
    df = spark.createDataFrame(
        data, "doc_id long, n_tokens long, quality_score double"
    )
    for budget in (0, 37, 1000, 10**9):
        got = (
            curation.token_budget_select(df, budget)
            .orderBy("cum_tokens")
            .toPandas()
        )
        want = _naive_budget_select(pdf, budget)
        assert list(got["doc_id"]) == list(want["doc_id"]), budget
        assert list(got["cum_tokens"]) == list(want["cum_tokens"]), budget


def test_token_budget_score_ties_break_by_id(spark):
    df = spark.createDataFrame(
        [(5, 10, 0.5), (1, 10, 0.5), (3, 10, 0.5)],
        "doc_id long, n_tokens long, quality_score double",
    )
    got = curation.token_budget_select(df, 20).orderBy("cum_tokens").collect()
    assert [r["doc_id"] for r in got] == [1, 3]


def test_token_budget_excludes_null_rows(spark):
    df = spark.createDataFrame(
        [(1, 10, None), (2, None, 0.9), (3, 5, 0.8)],
        "doc_id long, n_tokens long, quality_score double",
    )
    got = curation.token_budget_select(df, 100).collect()
    assert [r["doc_id"] for r in got] == [3] and got[0]["cum_tokens"] == 5


# -- shuffle_shards ---------------------------------------------------------

def test_shuffle_shards_is_permutation(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(100)], "doc_id long, text string")
    out = curation.shuffle_shards(df, n_shards=4, seed=3).collect()
    assert len(out) == 100
    assert sorted(r["doc_id"] for r in out) == list(range(100))
    # positions are 1..n_k contiguous within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shuffle_shards_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in curation.shuffle_shards(df, 4, seed=1).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in curation.shuffle_shards(df, 4, seed=1).collect()}
    c = {(r["doc_id"], r["shard"], r["pos"]) for r in curation.shuffle_shards(df, 4, seed=2).collect()}
    assert a == b
    assert a != c


# -- embedding_covariance / pca_project -------------------------------------

def _toy_vectors(spark, n=40, d=6, seed=11):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_covariance_matches_numpy_on_quantized(spark):
    import numpy as np

    rows, df = _toy_vectors(spark)
    got = {(r["i"], r["j"]): r for r in similarity.embedding_covariance(df, dims=6).collect()}
    m = np.floor(np.array([v for _, v in rows]) * 10**4).astype("int64")
    n = len(m)
    for (i, j), r in got.items():
        assert r["n"] == n
        assert r["s_i"] == m[:, i].sum() and r["s_j"] == m[:, j].sum()
        assert r["s_ij"] == (m[:, i] * m[:, j]).sum()
        want = (m[:, i] * m[:, j]).sum() / n - (m[:, i].sum() / n) * (m[:, j].sum() / n)
        assert r["cov"] == pytest.approx(want / 1e8, rel=1e-12)
    assert len(got) == 6 * 7 // 2


def test_embedding_covariance_skips_null_and_ragged(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0]), (4, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    got = similarity.embedding_covariance(df, dims=2).collect()
    assert all(r["n"] == 2 for r in got)  # only the two well-formed rows


def test_embedding_covariance_partition_invariant(spark):
    _, df = _toy_vectors(spark)
    a = {(r["i"], r["j"]): (r["s_ij"], r["cov"])
         for r in similarity.embedding_covariance(df.repartition(7), dims=6).collect()}
    b = {(r["i"], r["j"]): (r["s_ij"], r["cov"])
         for r in similarity.embedding_covariance(df.coalesce(1), dims=6).collect()}
    assert a == b


def test_pca_project_matches_numpy(spark):
    import numpy as np

    rows, df = _toy_vectors(spark, n=60, d=5)
    got = similarity.pca_project(df, dims=5, k=2).orderBy("vec_id").toPandas()
    # reference PCA on the same quantized covariance the operator uses
    m = np.floor(np.array([v for _, v in rows]) * 10**4).astype("int64")
    n = len(m)
    c = (m.T @ m) / n - np.outer(m.sum(0) / n, m.sum(0) / n)
    c = c / 1e8
    w, v = np.linalg.eigh(c)
    comps = v[:, np.argsort(w)[::-1][:2]].copy()
    for k in range(2):
        if comps[np.argmax(np.abs(comps[:, k])), k] < 0:
            comps[:, k] = -comps[:, k]
    want = np.array([vec for _, vec in rows]) @ comps
    assert np.allclose(got[["pc0", "pc1"]].to_numpy(), want, atol=1e-9)


# -- quantize_embeddings ----------------------------------------------------

def test_quantize_embeddings_roundtrip_bound(spark):
    rows, df = _toy_vectors(spark, n=30, d=8)
    out = similarity.quantize_embeddings(df).collect()
    assert len(out) == 30 * 8
    vals = {(r["vec_id"], r["i"]): r for r in out}
    for vec_id, vec in rows:
        max_abs = max(abs(x) for x in vec)
        scale = max_abs / 127
        for i, x in enumerate(vec):
            r = vals[(vec_id, i)]
            assert abs(r["q"]) <= 127
            # dequantization error bounded by half a step
            assert abs(r["q"] * r["scale"] - x) <= scale / 2 + 1e-12


def test_quantize_embeddings_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    out = similarity.quantize_embeddings(df).collect()
    assert all(r["q"] == 0 and r["scale"] == 0.0 for r in out)
