"""Property-based checks (hypothesis) over batched Spark jobs — one job
per property, many generated cases inside it, so runtime stays sane."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

words = st.lists(st.sampled_from("alpha beta gamma delta eps zeta".split()), min_size=1, max_size=12)


@settings(max_examples=12, deadline=None)
@given(a=words, b=words)
def test_jaccard_bounds_symmetry(spark, a, b):
    from aeon_mecha_spark.datapipe.dedup import ngram_jaccard

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(a)), Row(doc_id=2, text=" ".join(b))]
    )
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2)])
    j = ngram_jaccard(docs, pairs, k=2).collect()[0].jaccard
    assert 0.0 <= j <= 1.0
    # symmetry: swap sides
    pairs_r = spark.createDataFrame([Row(id_a=2, id_b=1)])
    jr = ngram_jaccard(docs, pairs_r, k=2).collect()[0].jaccard
    assert j == jr
    if a == b:
        assert j == 1.0


@settings(max_examples=8, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=30),
    threshold=st.integers(min_value=10, max_value=2000),
)
def test_session_count_equals_big_gaps_plus_one(spark, gaps, threshold):
    from aeon_mecha_spark.operators.sessionize import gap_sessionize

    base = dt.datetime(2024, 1, 1)
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(base + dt.timedelta(seconds=acc))
    df = spark.createDataFrame([Row(k="u", t=t) for t in ts])
    out = gap_sessionize(df, "t", ["k"], gap_us=threshold * 1_000_000)
    n_sessions = max(r.session_id for r in out.collect())
    expected = 1 + sum(1 for g in gaps[1:] if g > threshold)
    assert n_sessions == expected


@settings(max_examples=8, deadline=None)
@given(
    points=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True),
    lo=st.integers(min_value=0, max_value=10_000),
    span=st.integers(min_value=0, max_value=5_000),
)
def test_interval_join_matches_python_filter(spark, points, lo, span):
    from aeon_mecha_spark.operators.intervals import point_in_interval_join

    hi = lo + span
    pts = spark.createDataFrame([Row(k="a", t=p) for p in points])
    iv = spark.createDataFrame([Row(k="a", lo=lo, hi=hi)])
    got = sorted(r.t for r in point_in_interval_join(pts, iv, "t", "lo", "hi", on=["k"]).collect())
    assert got == sorted(p for p in points if lo <= p <= hi)


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40))
def test_lag_delta_telescopes(spark, vals):
    """Sum of deltas telescopes to last − first (any ordering key)."""
    from aeon_mecha_spark.operators.windows import lag_delta

    df = spark.createDataFrame([Row(k="a", o=i, v=v) for i, v in enumerate(vals)])
    out = lag_delta(df, "o", ["k"], ["v"]).collect()
    total = sum(r.v_delta for r in out if r.v_delta is not None)
    assert total == vals[-1] - vals[0]


@settings(max_examples=6, deadline=None)
@given(text=st.text(alphabet="abc XYZ,.!123", min_size=0, max_size=60))
def test_fingerprint_normalization_idempotent(spark, text):
    """normalize(normalize(x)) == normalize(x) — fingerprints stable."""
    from aeon_mecha_spark.functions.text import normalize_text

    df = spark.createDataFrame([Row(t=text)])
    row = df.select(
        normalize_text(F.col("t")).alias("n1"),
        normalize_text(normalize_text(F.col("t"))).alias("n2"),
    ).collect()[0]
    assert row.n1 == row.n2


def test_qc_registry_dispatch(spark):
    from aeon_mecha_spark.operators.qc import QC_ROUTINES, run_qc

    assert "camera_frame_qc" in QC_ROUTINES
    frames = spark.createDataFrame(
        [
            Row(dev="c", time=dt.datetime(2024, 1, 1, 0, 0, 0, i * 1000), hw_counter=i, hw_timestamp=i * 10**6)
            for i in range(5)
        ]
    )
    out = run_qc("camera_frame_qc", frames, ["dev"]).collect()[0]
    assert out.drop_count == 0
    with pytest.raises(KeyError):
        run_qc("nope", frames, ["dev"])


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_000),  # offset seconds
            st.integers(min_value=-50_000, max_value=50_000),  # value in cents
        ),
        min_size=2, max_size=40, unique_by=lambda t: t[0],
    )
)
def test_time_weighted_avg_matches_reference(spark, vals):
    """twa == Σ v·Δt / Σ Δt computed straightforwardly in Python, and is
    bounded by [min(v), max(v)] of the weighted observations."""
    from aeon_mecha_spark.operators.analytics import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = sorted(vals)
    df = spark.createDataFrame(
        [Row(k=1, ts=base + dt.timedelta(seconds=s), value=c / 100.0) for s, c in rows],
        "k int, ts timestamp, value double",
    )
    got = time_weighted_avg(df, "ts", "value", ["k"]).collect()[0]
    durs = [(rows[i + 1][0] - rows[i][0]) for i in range(len(rows) - 1)]
    vs = [c / 100.0 for _, c in rows[:-1]]
    want = sum(v * d for v, d in zip(vs, durs)) / sum(durs)
    assert got["span_us"] == sum(durs) * 1_000_000
    assert abs(got["twa"] - want) < 1e-9
    assert min(vs) - 1e-9 <= got["twa"] <= max(vs) + 1e-9


@settings(max_examples=8, deadline=None)
@given(
    hours=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=25, unique=True)
)
def test_gap_fill_dense_and_locf(spark, hours):
    """Output covers every hour in [min, max] exactly once; values only
    come from at-or-before observations (LOCF)."""
    from aeon_mecha_spark.operators.analytics import gap_fill_locf

    base = dt.datetime(2024, 1, 1)
    obs = sorted(hours)
    df = spark.createDataFrame(
        [Row(k=1, bucket=base + dt.timedelta(hours=h), value=float(h)) for h in obs],
        "k int, bucket timestamp, value double",
    )
    out = sorted(
        (r["bucket"], r["value"], r["filled"])
        for r in gap_fill_locf(df, "bucket", ["value"], ["k"]).collect()
    )
    assert len(out) == obs[-1] - obs[0] + 1
    expect_hour = obs[0]
    for b, v, filled in out:
        assert b == base + dt.timedelta(hours=expect_hour)
        # LOCF: value = the largest observed hour <= this hour
        last_obs = max(h for h in obs if h <= expect_hour)
        assert v == float(last_obs)
        assert filled == (expect_hour not in obs)
        expect_hour += 1


@settings(max_examples=8, deadline=None)
@given(n=st.integers(min_value=1, max_value=300), k=st.sampled_from([8, 16, 64]))
def test_kmv_exact_under_capacity_and_positive(spark, n, k):
    from aeon_mecha_spark.datapipe.sketch import kmv_distinct

    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = kmv_distinct(df, "v", ["g"], k=k).collect()[0]
    if n < k:
        assert r["est_distinct"] == float(n)
    else:
        assert r["est_distinct"] > 0


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.decimals(min_value=-999, max_value=999, places=2).map(float),
        ),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(min_value=1, max_value=6),
)
def test_rolling_rows_avg_matches_exact_reference(spark, vals, n):
    """rolling_rows_avg == an exact Decimal-sum reference on random
    frames with NULL holes — same arithmetic as the operator (exact
    frame sum → double → one IEEE division), which is *more* accurate
    than pandas' incremental float rolling mean, so pandas only gets an
    approx comparison."""
    import math
    from decimal import Decimal

    import pandas as pd

    from aeon_mecha_spark.operators.windows import rolling_rows_avg

    df = spark.createDataFrame(list(enumerate(vals)), "i long, v double")
    out = (
        rolling_rows_avg(df, F.col("v").cast("decimal(18,2)"), "i", [], n=n, alias="m")
        .orderBy("i")
        .collect()
    )
    approx = pd.Series(vals, dtype="float64").rolling(n, min_periods=1).mean()
    for i, (r, a) in enumerate(zip(out, approx)):
        frame = [v for v in vals[max(0, i - n + 1) : i + 1] if v is not None]
        assert (r["m"] is None) == (not frame) == math.isnan(a)
        if frame:
            exact = float(sum(Decimal(str(v)) for v in frame)) / len(frame)
            assert r["m"] == exact
            assert r["m"] == pytest.approx(a, rel=1e-12, abs=1e-12)


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),       # user
            st.integers(min_value=0, max_value=40),      # day offset
        ),
        min_size=1,
        max_size=50,
    )
)
def test_cohort_retention_counts_bounded_by_cohort_size(spark, events):
    """Every (cohort, offset) cell counts at most the cohort's size, the
    offset-0 cell counts exactly it, and offsets are non-negative."""
    from aeon_mecha_spark.operators.analytics import cohort_retention

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(days=d)) for u, d in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(df, "user_id", "ts", "week").collect()
    first_week = {}
    for u, d in events:
        wk = base + dt.timedelta(days=d)
        wk = (wk - dt.timedelta(days=wk.weekday())).replace(hour=0)
        if u not in first_week or wk < first_week[u]:
            first_week[u] = wk
    from collections import Counter

    cohort_sizes = Counter(first_week.values())
    for r in out:
        assert r["offset"] >= 0
        assert r["n_users"] <= cohort_sizes[r["cohort"]]
    zero = {r["cohort"]: r["n_users"] for r in out if r["offset"] == 0}
    assert zero == dict(cohort_sizes)


@settings(max_examples=8, deadline=None)
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=16),
    overlap=st.integers(min_value=0, max_value=8),
)
def test_chunk_documents_covers_exactly(spark, n_tokens, chunk, overlap):
    """Chunks reconstruct the document exactly: dropping each chunk's
    leading overlap (after the first) and concatenating yields the
    original token stream; every chunk except the last is full-size."""
    from aeon_mecha_spark.datapipe.curation import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    toks = [f"w{i}" for i in range(n_tokens)]
    docs = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).orderBy("chunk_id").collect()
    assert out[0]["chunk_id"] == 0
    rebuilt: list[str] = []
    for i, r in enumerate(out):
        ctoks = r["chunk_text"].split() if r["chunk_text"] else []
        assert r["n_chunk_tokens"] == len(ctoks)
        assert len(ctoks) <= chunk
        if i < len(out) - 1:
            assert len(ctoks) == chunk  # only the last chunk may be short
        rebuilt.extend(ctoks[overlap:] if i else ctoks)
    assert rebuilt == toks


@settings(max_examples=8, deadline=None)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)),
        min_size=1,
        max_size=30,
    )
)
def test_merge_intervals_matches_python_reference(spark, iv):
    """merge_intervals == a sequential sweep-line reference on random
    interval sets (closed intervals, touching merges)."""
    from aeon_mecha_spark.datapipe.curation import merge_intervals

    rows = [(s, s + d) for s, d in iv]
    df = spark.createDataFrame(rows, "start long, end long")
    got = sorted(
        (r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(df, "start", "end").collect()
    )
    want = []
    for s, e in sorted(rows):
        if want and s <= want[-1][1]:
            want[-1] = (want[-1][0], max(want[-1][1], e), want[-1][2] + 1)
        else:
            want.append((s, e, 1))
    assert got == [tuple(w) for w in want]


@settings(max_examples=6, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    budget=st.integers(min_value=5, max_value=64),
)
def test_pack_sequences_offsets_partition_the_stream(spark, sizes, budget):
    """start_offsets are the exclusive prefix sums of token counts, bins
    are contiguous non-decreasing, and the final offset+len equals the
    total stream length."""
    from aeon_mecha_spark.datapipe.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join("x" * 1 for _ in range(n))) for i, n in enumerate(sizes)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=budget).orderBy("doc_id").collect()
    run = 0
    prev_bin = 0
    for r, n in zip(out, sizes):
        assert r["n_tokens"] == n
        assert r["start_offset"] == run
        assert r["bin_id"] == run // budget
        assert r["bin_id"] >= prev_bin
        prev_bin = r["bin_id"]
        run += n
    assert run == sum(sizes)


# -- round-4 operators vs brute-force Python references ----------------------

def _substring_reference(doc_texts: dict, n: int):
    """Brute-force Python model of substring_duplicate_spans."""
    grams = {}  # gram -> set of doc ids
    positions = {}  # doc -> list of (pos, gram)
    for d, text in doc_texts.items():
        toks = text.split()
        if len(toks) < n:
            continue
        positions[d] = []
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            positions[d].append((i, g))
            grams.setdefault(g, set()).add(d)
    out = {}
    for d, plist in positions.items():
        dup = [(p, p + n) for p, g in plist if len(grams[g]) >= 2]
        cov = 0
        for s, e in sorted(dup):
            if cov == 0:
                cur_s, cur_e, cov = s, e, e - s
            elif s <= cur_e:
                cov += max(0, e - cur_e)
                cur_e = max(cur_e, e)
            else:
                cur_s, cur_e = s, e
                cov += e - s
        out[d] = (len(plist), len(dup), cov)
    return out


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("w1 w2 w3 w4 w5".split()), min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_substring_spans_match_python_reference(spark, texts):
    from aeon_mecha_spark.datapipe.dedup import substring_duplicate_spans

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs.items()])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_tokens"])
        for r in substring_duplicate_spans(df, n=3).collect()
    }
    assert got == _substring_reference(docs, 3)
    spark.catalog.clearCache()


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.sampled_from("a b c d e".split()), min_size=1, max_size=30)
)
def test_token_entropy_matches_direct_formula(spark, toks):
    import math
    from collections import Counter

    from aeon_mecha_spark.datapipe.textqc import token_entropy

    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    r = token_entropy(df).collect()[0]
    n = len(toks)
    cnt = Counter(toks)
    # the operator's quantized formula: H = ln n - (sum floor(c ln c 1e6 + .5))/1e6/n
    s = sum(math.floor(c * math.log(c) * 1e6 + 0.5) for c in cnt.values())
    want = round(math.log(n) - (s / 1e6) / n, 6)
    assert r["n_tokens"] == n and r["n_terms"] == len(cnt)
    assert abs(r["entropy"] - want) < 2e-6


@settings(max_examples=8, deadline=None)
@given(
    a=st.sets(st.integers(0, 200), min_size=1, max_size=40),
    b=st.sets(st.integers(0, 200), min_size=1, max_size=40),
)
def test_kmv_jaccard_exact_below_capacity_property(spark, a, b):
    from aeon_mecha_spark.datapipe import sketch

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = sketch.kmv_partial(df, "v", ["g"], k=64)
    r = sketch.kmv_jaccard(sk, "g", k=64).collect()[0]
    union, inter = a | b, a & b
    assert r["n_l"] == min(64, len(union))
    if len(union) <= 64:
        assert r["n_common"] == len(inter)
        assert r["est_union"] == float(len(union))


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=60
    ),
    pnum=st.integers(min_value=1, max_value=20),
)
def test_grouped_quantiles_is_type1_order_statistic(spark, vals, pnum):
    from fractions import Fraction

    from aeon_mecha_spark.operators.analytics import grouped_quantiles

    p = Fraction(pnum, 20)
    df = spark.createDataFrame([Row(k="g", v=float(v)) for v in vals])
    got = grouped_quantiles(df, ["k"], "v", ps=[p]).collect()
    assert len(got) == 1
    srt = sorted(vals)
    n = len(srt)
    rank = -((-p.numerator * n) // p.denominator)  # ceil(p*n)
    assert got[0]["q"] == srt[rank - 1]


@settings(max_examples=8, deadline=None)
@given(
    pre=words, shared=st.lists(
        st.sampled_from("s1 s2 s3 s4 s5 s6 s7 s8 s9 s10".split()),
        min_size=8, max_size=12, unique=True,
    ),
    post=words,
)
def test_winnowing_guarantee_holds_for_any_context(spark, pre, shared, post):
    """Any two docs embedding the same >= w+k-1-token run share a
    fingerprint, wherever the run sits."""
    from aeon_mecha_spark.datapipe.dedup import winnowing_fingerprints

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(pre + shared)),
            Row(doc_id=2, text=" ".join(shared + post)),
        ]
    )
    fps = winnowing_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(words, min_size=2, max_size=8),
    v=st.integers(min_value=1, max_value=6),
)
def test_unigram_logprob_bounds_and_oov_consistency(spark, texts, v):
    from aeon_mecha_spark.datapipe.textqc import unigram_logprob

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(texts)]
    )
    rows = unigram_logprob(docs, vocab_size=v, alpha=0.5).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert r["logprob_per_token"] < 0.0  # probabilities < 1
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        # a token set drawn from <= 6 distinct words with vocab >= 6
        # has no OOV at all
        if v >= 6:
            assert r["n_oov"] == 0


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(1, 5)),
        min_size=1, max_size=40,
    ),
    buckets=st.sampled_from([1, 2, 7, 1024]),
    p=st.sampled_from([(1, 2), (1, 4), (19, 20)]),
)
def test_grain_selection_quantile_matches_sorted_mirror(spark, vals, buckets, p):
    """The round-10 boundary-bucket selection quantile must equal the
    sorted-multiset type-1 quantile for ANY weighted grain, bucket
    count (including degenerate 1), and probability."""
    from aeon_mecha_spark.operators.analytics import _grain_type1_quantile
    from aeon_mecha_spark.util import release_cached

    # collapse duplicate values (a grain has one row per value)
    agg = {}
    for v, n in vals:
        agg[v] = agg.get(v, 0) + n
    grain = spark.createDataFrame(
        [("k", float(v), n) for v, n in agg.items()], "k string, v double, n long"
    ).persist()
    num, den = p
    out = _grain_type1_quantile(grain, ["k"], "v", "n", num, den, buckets)
    got = out.collect()
    release_cached(out)
    grain.unpersist()
    expanded = sorted(v for v, n in agg.items() for _ in range(n))
    rank = (num * len(expanded) + den - 1) // den
    assert len(got) == 1
    assert got[0]["q"] == float(expanded[rank - 1])
