"""Unit tests for the curation operators (datapipe/curation.py) and
connected-components dedup clustering (dedup.dedup_clusters): each is
checked against an independent pure-Python reference."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import curation, dedup


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "pack my box with five dozen liquor jugs", "en"),
    (2, "the quick brown fox naps all day long", "en"),
    (3, "short text", "fr"),
    (4, "", "fr"),
    (5, "five dozen liquor jugs were packed yesterday evening", "fr"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _py_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if not toks:
        return {""}
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_decontaminate_matches_python_reference(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high"), (101, "dozen liquor jugs")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in curation.decontaminate(_docs(spark), bench).collect()
    }
    bench_sh = _py_shingles("the quick brown fox jumps high") | _py_shingles(
        "dozen liquor jugs"
    )
    for doc_id, text, _ in DOCS:
        mine = _py_shingles(text)
        want_overlap = len(mine & bench_sh)
        r = out[doc_id]
        assert r["n_shingles"] == len(mine)
        assert r["n_overlap"] == want_overlap
        assert r["contamination"] == want_overlap / len(mine)
    # doc 0 shares 'the quick brown/quick brown fox' etc with bench doc 100
    assert out[0]["n_overlap"] > 0
    # doc 1 shares 'five dozen liquor'? bench has 'dozen liquor jugs' -> yes
    assert out[1]["n_overlap"] == 1
    assert out[3]["n_overlap"] == 0


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s10 = curation.hash_sample(df, "doc_id", 0.1)
    s30 = curation.hash_sample(df, "doc_id", 0.3)
    a = {r["doc_id"] for r in s10.collect()}
    b = {r["doc_id"] for r in s30.collect()}
    # same seed, larger fraction => superset (sample scaling keeps rows)
    assert a <= b
    # roughly proportional (hash uniformity; generous bounds)
    assert 100 < len(a) < 320
    assert 450 < len(b) < 780
    # repartitioning must not change membership
    a2 = {r["doc_id"] for r in curation.hash_sample(df.repartition(7), "doc_id", 0.1).collect()}
    assert a2 == a
    # a different seed draws a different (nearly independent) sample
    c = {r["doc_id"] for r in curation.hash_sample(df, "doc_id", 0.1, seed=1).collect()}
    assert c != a


def test_stratified_sample_fixed_size_per_stratum(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.stratified_sample(df, ["source"], 5, "doc_id").collect()
    by_stratum: dict[str, list[int]] = {}
    for r in out:
        by_stratum.setdefault(r["source"], []).append(r["doc_id"])
    assert {len(v) for v in by_stratum.values()} == {5}
    # deterministic: a second run returns the identical sample
    out2 = curation.stratified_sample(df, ["source"], 5, "doc_id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # a stratum smaller than n returns all of it
    small = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    assert curation.stratified_sample(small, ["source"], 5, "doc_id").count() == 2


def test_pack_sequences_matches_python_reference(spark):
    out = curation.pack_sequences(_docs(spark), budget=10).orderBy("doc_id").collect()
    offset = 0
    for r in out:
        toks = len(DOCS[r["doc_id"]][1].split())
        assert r["n_tokens"] == toks
        assert r["start_offset"] == offset
        assert r["bin_id"] == offset // 10
        offset += toks
    # keyed packing restarts offsets per key
    keyed = curation.pack_sequences(_docs(spark), budget=10, keys=["lang"])
    for lang in ("en", "fr"):
        offs = [
            r["start_offset"]
            for r in keyed.filter(F.col("lang") == lang).orderBy("doc_id").collect()
        ]
        assert offs[0] == 0
        assert offs == sorted(offs)


def test_merge_intervals_islands(spark):
    rows = [
        # key a: [0,10] [5,8] (nested) [10,15] (touching) [20,25] -> [0,15],[20,25]
        ("a", 0, 10), ("a", 5, 8), ("a", 10, 15), ("a", 20, 25),
        # key b: disjoint singles
        ("b", 1, 2), ("b", 4, 5),
    ]
    df = spark.createDataFrame(rows, "k string, start long, end long")
    out = sorted(
        map(tuple, curation.merge_intervals(df, "start", "end", ["k"]).collect())
    )
    assert out == [
        ("a", 0, 15, 3),
        ("a", 20, 25, 1),
        ("b", 1, 2, 1),
        ("b", 4, 5, 1),
    ]


def test_redact_pii_counts_and_text(spark):
    rows = [
        (0, "mail me at alice@example.com or bob.smith@sub.domain.org today"),
        (1, "server 10.0.255.1 and backup 192.168.0.17 are down"),
        (2, "call +44 7700-900 123 now"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curation.redact_pii(df).collect()}
    assert out[0]["n_email"] == 2 and "[REDACTED]" in out[0]["clean_text"]
    assert "alice@example.com" not in out[0]["clean_text"]
    assert out[1]["n_ipv4"] == 2
    assert "10.0.255.1" not in out[1]["clean_text"]
    assert out[2]["n_phone"] == 1
    assert not re.search(r"\d{3}", out[2]["clean_text"])
    assert out[3]["clean_text"] == "nothing sensitive here"
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11), (5, 6), (6, 7), (7, 5)],
        # long chain exercises multi-round propagation
        [(i, i + 1) for i in range(0, 12)],
        # star + bridge
        [(0, i) for i in range(1, 6)] + [(5, 100), (100, 101)],
    ],
)
def test_dedup_clusters_match_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert got == _py_components(edges)


def test_dedup_clusters_on_lsh_pairs(spark):
    """End-to-end: exact duplicate docs -> LSH candidate pairs ->
    clusters group the copies together."""
    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, text_a), (7, text_b), (8, text_b), (9, "unrelated words entirely different content here")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, num_hashes=8)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[8] == 7
    assert 9 not in got  # singleton never entered the pair table


def test_mixture_sample_per_stratum_fractions(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = curation.mixture_sample(
        df, "lang", {"a": 0.5, "b": 0.05}, "doc_id", default_fraction=0.0
    )
    by_lang: dict[str, int] = {}
    for r in out.collect():
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert 380 < by_lang.get("a", 0) < 620        # ~50% of 1000
    assert 15 < by_lang.get("b", 0) < 100         # ~5% of 1000
    assert "c" not in by_lang                      # default 0 drops the stratum
    # per-stratum membership must agree with hash_sample at the same fraction
    only_a = {r["doc_id"] for r in out.collect() if r["lang"] == "a"}
    ref = {
        r["doc_id"]
        for r in curation.hash_sample(
            df.filter(F.col("lang") == "a"), "doc_id", 0.5
        ).collect()
    }
    assert only_a == ref


def test_repetition_ratio_reference(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),       # 7 shingles, 3 distinct
            (1, "all words fully unique here now"),
            (2, "tiny"),                     # <k tokens -> 1 shingle, ratio 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.repetition_ratio(docs, k=3).collect()}
    assert out[0]["n_shingles"] == 7 and out[0]["n_distinct"] == 3
    assert out[0]["rep_ratio"] == 1.0 - 3.0 / 7.0
    assert out[1]["rep_ratio"] == 0.0
    assert out[2]["n_shingles"] == 1 and out[2]["rep_ratio"] == 0.0


def test_quality_filter_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, "this corpus document has enough good tokens to pass easily today"),
            (1, "too short"),
            (2, "!!! ??? ;;; ... !!! ??? ;;; ... !!! ???"),
            (3, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in curation.quality_filter(
            docs, min_tokens=5, max_rep_ratio=0.5, max_punct_ratio=0.3
        ).collect()
    }
    assert out[0]["passes"]
    assert not out[1]["ok_n_tokens"] and not out[1]["passes"]
    assert not out[2]["ok_punct"] and not out[2]["passes"]
    assert not out[3]["ok_repetition"] and not out[3]["passes"]


def test_chunk_documents_reference(spark):
    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, text), (1, "a b c"), (2, "")], "doc_id long, text string"
    )
    # no overlap: 10 tokens / 4 -> chunks [0:4],[4:8],[8:10]
    out = (
        curation.chunk_documents(docs, chunk_tokens=4)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    got = [(r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"]) for r in out]
    assert got == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (0, 1, 4, "w4 w5 w6 w7"),
        (0, 2, 2, "w8 w9"),
        (1, 0, 3, "a b c"),
        (2, 0, 0, ""),
    ]
    # overlap 2, stride 2: starts 0,2,4,6 over 10 tokens
    ov = (
        curation.chunk_documents(docs.filter("doc_id = 0"), chunk_tokens=4, overlap=2)
        .orderBy("chunk_id")
        .collect()
    )
    texts = [r["chunk_text"] for r in ov]
    assert texts == ["w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9"]
    # every adjacent pair shares exactly the overlap
    for a, b in zip(texts, texts[1:]):
        assert a.split()[2:] == b.split()[:2]
    with pytest.raises(ValueError):
        curation.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_dedup_clusters_raises_when_not_converged(spark):
    chain = [(i, i + 1) for i in range(0, 8)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup.dedup_clusters(pairs, max_iter=2)
