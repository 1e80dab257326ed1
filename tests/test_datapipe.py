"""Dedup / similarity / text-analysis operator semantics on planted
duplicates and vectors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import dedup, similarity, textqc


@pytest.fixture(scope="module")
def docs(spark):
    near = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        Row(doc_id=1, text="hello world one two three"),
        Row(doc_id=2, text="hello world one two three"),  # exact dup of 1
        Row(doc_id=3, text="Hello, World! one two three"),  # fingerprint dup of 1
        Row(doc_id=4, text=near),
        Row(doc_id=5, text=near.replace("dog", "cat")),  # near dup of 4
        Row(doc_id=6, text="completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows)


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    groups = {r.canonical_id: r.n_docs for r in out}
    assert groups[1] == 2
    assert sum(r.n_docs for r in out) == 6


def test_fingerprint_catches_case_punct(docs):
    out = dedup.fingerprint_duplicates(docs).collect()
    groups = {r.canonical_id: r.n_docs for r in out}
    assert groups[1] == 3  # docs 1,2,3 collapse


def test_minhash_identical_docs_equal_sigs(docs):
    sigs = {r.doc_id: tuple(r[f"mh_{i}"] for i in range(8)) for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    # near-dups share most minhashes; unrelated docs share almost none
    shared_near = sum(a == b for a, b in zip(sigs[4], sigs[5]))
    shared_far = sum(a == b for a, b in zip(sigs[4], sigs[6]))
    assert shared_near > shared_far


def test_lsh_pairs_and_jaccard(docs):
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dups always collide
    j = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard(docs, pairs).collect()}
    assert j[(1, 2)] == 1.0


def test_simhash_near_dup_small_hamming(docs):
    fps = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert fps[1] == fps[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fps[4], fps[5]) < ham(fps[4], fps[6])


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.99, 0.01, 0.0]),
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows)


def test_brute_force_knn(vectors):
    out = similarity.brute_force_knn(vectors, vectors, k=1)
    top = {r.query_id: r.neighbor_id for r in out.collect()}
    assert top[1] == 2 and top[2] == 1


def test_knn_excludes_self(vectors):
    out = similarity.brute_force_knn(vectors, vectors, k=3)
    assert all(r.query_id != r.neighbor_id for r in out.collect())


def test_lsh_knn_same_bucket_neighbors(vectors):
    planes = [[1.0, -1.0, 0.0], [0.5, 0.5, -1.0]]
    out = similarity.lsh_knn(vectors, planes, k=2)
    pairs = {(r.query_id, r.neighbor_id) for r in out.collect()}
    # 1 and 2 fall on the same side of both planes → bucket-mates
    assert (1, 2) in pairs


def test_embedding_near_duplicates(vectors):
    out = similarity.embedding_near_duplicates(vectors, threshold=0.99)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1, 2)}


def test_quality_features_ranges(docs):
    out = textqc.quality_features(docs).collect()
    for r in out:
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0
    by_id = {r.doc_id: r for r in out}
    assert by_id[4].stopword_ratio > 0  # contains 'the', 'and'
    assert by_id[3].punct_ratio > by_id[1].punct_ratio


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog of a house"),
            Row(doc_id=2, text="le chat et les chiens des maisons"),
            Row(doc_id=3, text="zzz qqq www"),
        ]
    )
    out = {r.doc_id: r.pred_lang for r in textqc.language_id(df).collect()}
    assert out == {1: "en", 2: "fr", 3: "und"}


def test_fingerprints_are_stable(docs):
    a = {r.doc_id: r.fingerprint_md5 for r in textqc.fingerprints(docs).collect()}
    b = {r.doc_id: r.fingerprint_md5 for r in textqc.fingerprints(docs).collect()}
    assert a == b
    assert a[1] == a[3]  # normalization collapses case/punct
