"""Round-5 additions: fixed-components projection gate, the
bloom-dedup production sink + versioned atomic state, catalog alias
formats, library unpersist hygiene, and winnowing fingerprints."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# -- project_components (q110 backing) ---------------------------------------

def test_project_components_matches_numpy(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity

    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 8)
    comps = rng.randn(3, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["pc0"], r["pc1"], r["pc2"])
        for r in similarity.project_components(df, comps.tolist()).collect()
    }
    want = vecs @ comps.T
    for i in range(40):
        for c in range(3):
            assert abs(out[i][c] - want[i, c]) < 1e-9


def test_pca_project_unchanged_by_refactor(spark):
    """pca_project still matches numpy PCA after extracting the
    projection tail into project_components."""
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 6) * np.array([3.0, 2.0, 1.0, 0.5, 0.25, 0.1])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["pc0"], r["pc1"])
        for r in similarity.pca_project(df, dims=6, k=2).collect()
    }
    C = np.cov(vecs.T, bias=True)
    w, V = np.linalg.eigh(C)
    comps = V[:, np.argsort(w)[::-1][:2]]
    for c in range(2):
        if comps[np.argmax(np.abs(comps[:, c])), c] < 0:
            comps[:, c] = -comps[:, c]
    # covariance is estimated from quantized moments -> tolerance is the
    # quantization step, not machine eps
    want = (vecs - 0.0) @ comps
    for i in range(60):
        for c in range(2):
            assert abs(got[i][c] - want[i, c]) < 1e-2


# -- bloom_dedup_batches: production sink + atomic state ---------------------

def test_bloom_dedup_parquet_sink_no_driver_materialization(spark, tmp_path):
    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    state = str(tmp_path / "state")
    sink = str(tmp_path / "accepted")
    fn, emitted = bloom_dedup_batches(
        spark, state, "doc_id", num_bits=1 << 14, sink=sink
    )
    fn(spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint"), 0)
    fn(
        spark.createDataFrame([(i,) for i in range(50, 150)], "doc_id bigint"),
        1,
    )
    assert emitted == []  # nothing collect()ed on the driver
    ledger = spark.read.parquet(sink)
    got = {r["doc_id"] for r in ledger.collect()}
    assert set(range(100)) <= got <= set(range(150))
    # batch 1's duplicates (50..99) were dropped
    b1 = spark.read.parquet(os.path.join(sink, "batch_id=1"))
    b1_keys = {r["doc_id"] for r in b1.collect()}
    assert b1_keys & set(range(100)) == set()


def test_bloom_dedup_retried_batch_is_idempotent_in_sink(spark, tmp_path):
    """A foreachBatch retry re-runs the same batch_id: the per-batch
    sink directory is overwritten, not appended — no duplicate rows."""
    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    state = str(tmp_path / "state")
    sink = str(tmp_path / "accepted")
    fn, _ = bloom_dedup_batches(spark, state, "doc_id", num_bits=1 << 14, sink=sink)
    b0 = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    fn(b0, 0)
    fn(b0, 0)  # redelivery of the same epoch
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == len({r["doc_id"] for r in rows}) == 40


def test_bloom_dedup_state_commit_is_versioned_and_pruned(spark, tmp_path):
    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    state = str(tmp_path / "state")
    fn, emitted = bloom_dedup_batches(spark, state, "doc_id", num_bits=1 << 14)
    for b in range(3):
        fn(spark.createDataFrame([(i,) for i in range(10 * b, 10 * b + 15)], "doc_id bigint"), b)
    with open(os.path.join(state, "CURRENT")) as fh:
        assert fh.read().strip() == "v2"
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert versions == ["v2"]  # superseded versions pruned
    assert not os.path.exists(os.path.join(state, "CURRENT.tmp"))


def test_bloom_dedup_crash_before_pointer_flip_keeps_old_state(spark, tmp_path):
    """Simulate a crash after the new version directory is written but
    before the pointer flip: the filter still reads the OLD committed
    version, so the retried batch reproduces the same answer instead of
    losing the whole history (the pre-round-5 overwrite layout lost it)."""
    import shutil

    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    state = str(tmp_path / "state")
    fn, emitted = bloom_dedup_batches(spark, state, "doc_id", num_bits=1 << 14)
    fn(spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint"), 0)
    # fake the torn batch 1: version dir exists, pointer still at v0
    shutil.copytree(os.path.join(state, "v0"), os.path.join(state, "v1"))
    with open(os.path.join(state, "CURRENT")) as fh:
        assert fh.read().strip() == "v0"
    # retry of batch 1: everything from batch 0 must still be filtered
    fn(spark.createDataFrame([(i,) for i in range(30)] + [(99,)], "doc_id bigint"), 1)
    assert {r["doc_id"] for r in emitted[1]} == {99}


# -- catalog: alias formats on the explicit-fmt path -------------------------

def test_read_any_accepts_alias_formats(spark, tmp_path):
    from aeon_mecha_spark.catalog import read_any

    p = str(tmp_path / "data.txt")  # extension lies: content is TSV
    with open(p, "w") as fh:
        fh.write("a\tb\n1\tx\n2\ty\n")
    df = read_any(spark, p, fmt="tsv", header=True)
    assert sorted(df.columns) == ["a", "b"]
    assert df.count() == 2

    j = str(tmp_path / "data.log")
    with open(j, "w") as fh:
        fh.write('{"k": 1}\n{"k": 2}\n')
    for alias in ("jsonl", "ndjson"):
        df = read_any(spark, j, fmt=alias)
        assert df.count() == 2 and "k" in df.columns


# -- unpersist hygiene -------------------------------------------------------

def _cached_rdd_count(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def test_ivf_knn_release_cached_frees_all_blocks(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity
    from aeon_mecha_spark.util import release_cached

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(4)]) for i in range(80)],
        "vec_id bigint, embedding array<double>",
    )
    centroids = [[float(x) for x in rng.randn(4)] for _ in range(4)]
    spark.catalog.clearCache()
    before = _cached_rdd_count(spark)
    out = similarity.ivf_knn(df, centroids, k=2)
    assert out.count() > 0
    assert _cached_rdd_count(spark) > before  # assignment is cached while in use
    release_cached(out)
    assert _cached_rdd_count(spark) == before  # returns-and-consumes cycle is clean


def test_substring_spans_release_cached_frees_all_blocks(spark):
    from aeon_mecha_spark.datapipe import dedup
    from aeon_mecha_spark.util import release_cached

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(6)],
        "doc_id bigint, text string",
    )
    spark.catalog.clearCache()
    before = _cached_rdd_count(spark)
    out = dedup.substring_duplicate_spans(docs, n=4)
    # consume VALUES, not just row count: under pure column pruning the
    # outer join to the (unique-keyed) dup aggregate is eliminated and
    # the gram cache would never materialize
    rows = out.collect()
    assert len(rows) == 6
    assert _cached_rdd_count(spark) > before
    release_cached(out)
    assert _cached_rdd_count(spark) == before
    release_cached(out)  # idempotent


# -- winnowing fingerprints (q111 backing) -----------------------------------

def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a run of >= w + k - 1 tokens must share a
    fingerprint (the SIGMOD'03 winnowing guarantee), and disjoint docs
    must not."""
    from aeon_mecha_spark.datapipe import dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = w+k-1
    docs = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, "seven eight " + shared + " nine ten"),
            (3, "completely different words without any overlap here at all"),
        ],
        "doc_id bigint, text string",
    )
    fps = dedup.winnowing_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_density_and_short_docs(spark):
    from aeon_mecha_spark.datapipe import dedup

    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(100))), (2, "only three words"), (3, "x")],
        "doc_id bigint, text string",
    )
    out = dedup.winnowing_fingerprints(docs, k=5, w=4)
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    # density: 96 grams, windows of 4 -> expect ~2/(w+1)*96 ≈ 38 selected,
    # never more than the number of windows and at least m/w
    n1 = len(per_doc[1])
    assert 96 // 4 <= n1 <= 93
    # short docs (< k tokens) hash their whole text as one gram
    assert len(per_doc[2]) == 1 and per_doc[2][0][0] == 0
    assert len(per_doc[3]) == 1
    # fingerprints are a subset of the doc's gram hashes at their positions
    from aeon_mecha_spark.functions.hashing import md5_long
    from aeon_mecha_spark.functions.text import word_shingles
    g = (
        docs.filter(F.col("doc_id") == 1)
        .select(F.posexplode(word_shingles(F.col("text"), 5)).alias("pos", "gram"))
        .select("pos", md5_long(F.col("gram")).alias("gh"))
        .collect()
    )
    gmap = {r["pos"]: r["gh"] for r in g}
    for pos, fp in per_doc[1]:
        assert gmap[pos] == fp


# -- unigram LM log-prob (q112 backing) --------------------------------------

def test_unigram_logprob_matches_python_reference(spark):
    import math

    from aeon_mecha_spark.datapipe import textqc

    texts = {
        1: "the cat sat on the mat",
        2: "the dog the dog the dog",
        3: "zzz qqq xxx",  # rare -> mostly OOV under a tiny vocab
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    V, alpha = 4, 0.5
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["logprob_per_token"])
        for r in textqc.unigram_logprob(docs, vocab_size=V, alpha=alpha).collect()
    }
    # python reference with the same integer micro-nat pipeline
    toks = {d: t.split() for d, t in texts.items()}
    from collections import Counter
    cnt = Counter(tok for ts in toks.values() for tok in ts)
    N = sum(cnt.values())
    vocab = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    denom = N + alpha * (V + 1)
    lp = {t: math.floor(math.log((c + alpha) / denom) * 1e6 + 0.5) for t, c in vocab}
    lp_oov = math.floor(math.log(alpha / denom) * 1e6 + 0.5)
    for d, ts in toks.items():
        n = len(ts)
        S = sum(lp.get(t, lp_oov) for t in ts)
        n_oov = sum(1 for t in ts if t not in lp)
        mean = math.floor((2 * S + n) / (2 * n)) / 1e6
        assert got[d][0] == n
        assert got[d][1] == n_oov
        assert abs(got[d][2] - mean) < 1e-12, (d, got[d][2], mean)
    # ordering sanity: natural-ish text above the all-OOV doc
    assert got[1][2] > got[3][2]


# -- multi-probe IVF (q113 backing) ------------------------------------------

def test_ivf_probe_zero_matches_primary_assignment(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity

    rng = np.random.RandomState(7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(4)]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[float(x) for x in rng.randn(4)] for _ in range(5)]
    primary = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(df, cents).collect()}
    multi = similarity.ivf_probe_assign(df, cents, nprobe=3).collect()
    p0 = {r["vec_id"]: r["cell"] for r in multi if r["probe"] == 0}
    assert p0 == primary
    # each vector probes exactly 3 distinct cells
    by_vec = {}
    for r in multi:
        by_vec.setdefault(r["vec_id"], []).append(r["cell"])
    assert all(len(cs) == 3 and len(set(cs)) == 3 for cs in by_vec.values())


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity
    from aeon_mecha_spark.util import release_cached

    rng = np.random.RandomState(9)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(6)]) for i in range(120)],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[float(x) for x in rng.randn(6)] for _ in range(6)]
    exact = similarity.brute_force_knn(df, df, k=3, dim=6)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def hits(nprobe):
        out = similarity.ivf_knn(df, cents, k=3, nprobe=nprobe)
        got = {}
        for r in out.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        release_cached(out)
        return sum(len(got.get(q, set()) & t) for q, t in truth.items())

    h1, h2 = hits(1), hits(2)
    assert h2 >= h1  # more probes can only add candidates
    assert h2 > 0


# -- grouped discrete quantiles (q114 backing) -------------------------------

def test_grouped_quantiles_matches_numpy_type1(spark):
    import numpy as np

    from aeon_mecha_spark.operators import analytics

    rng = np.random.RandomState(13)
    rows = [(("a" if i % 3 else "b"), float(v)) for i, v in enumerate(rng.randn(101) * 50)]
    df = spark.createDataFrame(rows, "k string, v double")
    ps = (0.1, 0.5, 0.9, 0.95, 1.0)
    got = {
        (r["k"], r["p"]): r["q"]
        for r in analytics.grouped_quantiles(df, ["k"], "v", ps=ps).collect()
    }
    from fractions import Fraction
    for k in ("a", "b"):
        vals = sorted(v for kk, v in rows if kk == k)
        n = len(vals)
        for p in ps:
            fr = Fraction(str(p))
            rank = -((-fr.numerator * n) // fr.denominator)  # ceil(p*n)
            assert got[(k, p)] == vals[rank - 1], (k, p)
    assert len(got) == 2 * len(ps)


def test_grouped_quantiles_rejects_bad_p(spark):
    import pytest as _pytest

    from aeon_mecha_spark.operators import analytics

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with _pytest.raises(ValueError):
        analytics.grouped_quantiles(df, ["k"], "v", ps=(0.0,))
    with _pytest.raises(ValueError):
        analytics.grouped_quantiles(df, ["k"], "v", ps=(1.5,))


# -- deterministic range sharding (q115 backing) ------------------------------

def test_range_shard_balance_and_determinism(spark):
    from aeon_mecha_spark.datapipe import curation

    rows = [(i, float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, v double")
    out = curation.range_shard(df, "v", 4, key_col="doc_id", sample_fraction=0.5, seed=3)
    got = out.collect()
    assert len(got) == 2000
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r["v"])
    # 4 shards, roughly balanced (sampled boundaries: allow wide slack)
    assert set(by_shard) == {0, 1, 2, 3}
    for s, vals in by_shard.items():
        assert 2000 * 0.10 <= len(vals) <= 2000 * 0.40
    # range property: shards are totally ordered intervals
    for s in range(3):
        assert max(by_shard[s]) <= min(by_shard[s + 1])
    # deterministic: same seed -> identical assignment
    again = {r["doc_id"]: r["shard"] for r in
             curation.range_shard(df, "v", 4, key_col="doc_id", sample_fraction=0.5, seed=3).collect()}
    first = {r["doc_id"]: r["shard"] for r in got}
    assert again == first


def test_range_shard_null_values_get_null_shard(spark):
    from aeon_mecha_spark.datapipe import curation

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 2.0), (4, 3.0), (5, 4.0), (6, 5.0)],
        "doc_id bigint, v double",
    )
    out = {r["doc_id"]: r["shard"] for r in
           curation.range_shard(df, "v", 2, key_col="doc_id", sample_fraction=1.0).collect()}
    assert out[2] is None
    assert all(v is not None for k, v in out.items() if k != 2)


def test_grouped_quantiles_two_level_identical_to_single_window(spark):
    import random

    from aeon_mecha_spark.operators import analytics

    random.seed(21)
    rows = [((f"k{i % 4}"), random.uniform(-500, 500)) for i in range(3000)]
    df = spark.createDataFrame(rows, "k string, v double")
    ps = (0.1, 0.5, 0.9, 1.0)
    single = sorted(map(tuple, analytics.grouped_quantiles(df, ["k"], "v", ps=ps).collect()))
    for buckets in (2, 16):
        two = sorted(
            map(
                tuple,
                analytics.grouped_quantiles(
                    df, ["k"], "v", ps=ps, range_buckets=buckets, sample_fraction=0.2
                ).collect(),
            )
        )
        assert two == single
