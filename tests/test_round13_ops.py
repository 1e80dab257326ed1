"""Round-13 regression tests: the four judge-advice fixes (r12 ADVICE)
plus the new round-13 operators' unit pins."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ADVICE 1
def test_drop_pattern_no_cross_tag_match():
    # '<style>a</script>b</style>' must drop through '</style>', not
    # stop at the first '</script>' and leave 'b</style>' remnants.
    from aeon_mecha_spark.datapipe.extraction import DROP_PATTERN

    html = "keep1 <style>a</script>b</style> keep2"
    cleaned = re.sub(DROP_PATTERN, " ", html)
    assert "b" not in cleaned and "</style>" not in cleaned
    assert "keep1" in cleaned and "keep2" in cleaned
    # the ordinary cases still drop
    assert re.sub(DROP_PATTERN, " ", "<script>x</script>y").strip() == "y"
    assert re.sub(DROP_PATTERN, " ", "<style>x</style>y").strip() == "y"
    assert re.sub(DROP_PATTERN, " ", "<!--x-->y").strip() == "y"
    # RE2-safety: no backreferences or lookaround in the pattern
    assert "\\1" not in DROP_PATTERN and "(?=" not in DROP_PATTERN


def test_drop_pattern_matches_mirror_on_cross_tag_html(spark):
    # The differential-fuzz mirror (test_round12_ops._py_html_extract)
    # uses a backreference; the engine pattern uses per-tag
    # alternatives — assert they agree on the adversarial case too.
    from test_round12_ops import _py_html_extract

    from aeon_mecha_spark.datapipe.extraction import html_extract

    html = (
        "<p>alpha beta gamma delta epsilon zeta</p>"
        "<style>a</script>b</style>"
        "<p>keep this long enough sentence here ok</p>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id int, html string")
    got = html_extract(docs, min_chars=10).collect()[0]
    exp_text, exp_kept, exp_total = _py_html_extract(html, min_chars=10)
    assert got["text"] == exp_text
    assert got["n_blocks_kept"] == exp_kept
    assert got["n_blocks_total"] == exp_total
    assert "b</style>" not in got["text"]


# ---------------------------------------------------------------- ADVICE 2
def test_dsir_select_keeps_cache_handles(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe import curation as C

    docs = spark.createDataFrame(
        [(1, "the cat sat", "en"), (2, "le chat", "fr"), (3, "a dog ran", "en")],
        "doc_id int, text string, lang string",
    )
    sel = C.dsir_select(docs, F.col("lang") == "en", k=2, n_buckets=8)
    handles = getattr(sel, "_aeon_cached", ())
    assert handles, "orderBy/limit dropped the _aeon_cached release handles"
    assert len(sel.collect()) == 2
    from aeon_mecha_spark.util import release_cached

    release_cached(sel)


# ---------------------------------------------------------------- ADVICE 3
def test_stss_recovery_point_open_gop_is_not_an_error():
    # Spec-valid H.264 open GOP: stss may list a recovery-point
    # (non-IDR) sample as sync. stss is authoritative; only the reverse
    # disagreement (scan says IDR, stss says non-sync) is corruption.
    from test_round12_ops import _avc1_mp4

    from aeon_mecha_spark.datapipe import nalcodec as N

    open_gop, _ = _avc1_mp4(sync=[1, 2, 4])  # sample 2 is a P AU
    idx = N.mp4_keyframe_index(open_gop)
    assert [f["is_keyframe"] for f in idx] == [True, True, False, True]

    bad, _ = _avc1_mp4(sync=[2])  # omits the IDR samples 1 and 4
    with pytest.raises(ValueError, match="non-sync.*IDR"):
        N.mp4_keyframe_index(bad)


# ---------------------------------------------------------------- ADVICE 4
def test_sample_ranges_missing_stsz_raises_by_name():
    from test_round12_ops import _avc1_mp4

    from aeon_mecha_spark.datapipe import mp4codec as M

    payload, _ = _avc1_mp4()
    assert payload.count(b"stsz") == 1
    with pytest.raises(ValueError, match="stsz"):
        M.sample_ranges(payload.replace(b"stsz", b"free"))
    with pytest.raises(ValueError, match="stz2"):
        M.sample_ranges(payload.replace(b"stsz", b"stz2"))


# ------------------------------------------------------------- unigram LM
def _py_unigram_learn(texts, vocab_size=20, rounds=2, window=12, L=4):
    """Pure-Python mirror of unigram_learn (seed + hard-EM rounds)."""
    import math
    import re
    from collections import Counter

    from aeon_mecha_spark.datapipe.unigram import py_viterbi

    words = [w for t in texts for w in re.split(r"\s+", t.strip().lower()) if w]
    cc = Counter(w[k:k + window] for w in words for k in range(0, len(w), window))
    sub = Counter()
    for c, wc in cc.items():
        for i in range(1, len(c) + 1):
            for j in range(max(0, i - L), i):
                sub[c[j:i]] += wc
    chars = {p: n for p, n in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in sub.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:vocab_size]
    counts = dict(chars, **dict(multi))
    v_size = len(counts)

    def lp(c, t):
        return math.floor(
            math.log((2 * c + 1) / float(2 * t + v_size)) * 1e6 + 0.5
        )

    t_tot = sum(counts.values())
    vocab = {p: lp(c, t_tot) for p, c in counts.items()}
    for _ in range(rounds):
        usage = Counter()
        for c, wc in cc.items():
            pieces, _ = py_viterbi(c, vocab, L)
            for p in pieces:
                usage[p] += wc
        counts = {p: usage.get(p, 0) for p in vocab}
        t_tot = sum(counts.values())
        vocab = {p: lp(c, t_tot) for p, c in counts.items()}
    return {p: (counts[p], vocab[p]) for p in vocab}


def test_unigram_learn_matches_pure_python_mirror(spark):
    from aeon_mecha_spark.datapipe import unigram as U

    texts = [
        "the cat sat on the mat the cat",
        "catalog of the theocratic cats",
        "internationalization is long",
        "   ",
        "",
        "aaaa aaaa ab",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["piece"]: (r["cnt"], r["lp_micro"])
        for r in U.unigram_learn(docs, vocab_size=20, rounds=2).collect()
    }
    exp = _py_unigram_learn(texts, vocab_size=20, rounds=2)
    assert got == exp


def test_unigram_encode_matches_viterbi_mirror(spark):
    import re

    from aeon_mecha_spark.datapipe import unigram as U

    vocab = {"th": -100, "the": -150, "he": -100, "t": -500, "h": -500,
             "e": -500, "c": -400, "a": -400, "ca": -300, "cat": -250}
    texts = [
        "the cat thethethethecat catcatcatcat",  # >12-char words chunk
        "zzz the",                               # OOV chars hit UNK
        "tthhee",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in U.unigram_encode(docs, list(vocab.items())).collect()}
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        chunks = [w[k:k + 12] for w in words for k in range(0, len(w), 12)]
        nt = nll = 0
        for c in chunks:
            pieces, score = U.py_viterbi(c, vocab)
            assert "".join(pieces) == c  # segmentation covers the chunk
            nt += len(pieces)
            nll -= score
        r = got[i]
        assert (r["n_chunks"], r["n_tokens"], r["nll_micro"]) == (
            len(chunks), nt, nll)


def test_unigram_encode_shared_chunk_grain(spark):
    """r13 optimization pin: the Viterbi DP runs on the DISTINCT-chunk
    grain and broadcasts back — a chunk repeated across documents (and
    within one document at different multiplicities) must weight each
    document's totals by its own occurrence count."""
    from aeon_mecha_spark.datapipe import unigram as U

    vocab = [("ab", -100), ("a", -300), ("b", -300)]
    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab"), (3, "ab zq ab")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in U.unigram_encode(docs, vocab).collect()}
    unk = U.UNK_LP_MICRO
    assert (got[1]["n_chunks"], got[1]["n_tokens"], got[1]["nll_micro"]) == (3, 3, 300)
    assert (got[2]["n_chunks"], got[2]["n_tokens"], got[2]["nll_micro"]) == (1, 1, 100)
    # doc 3: two 'ab' chunks (100 each) + one 'zq' chunk (2 UNK chars)
    assert (got[3]["n_chunks"], got[3]["n_tokens"], got[3]["nll_micro"]) == (
        3, 4, 200 - 2 * unk)


def test_unigram_viterbi_tiebreak_prefers_longest_final_piece():
    from aeon_mecha_spark.datapipe.unigram import py_viterbi

    # 'ab' splits as [ab] (score -200) or [a, b] (-100 + -100 = -200):
    # equal scores -> smallest backpointer j=0 -> the single piece wins
    vocab = {"ab": -200, "a": -100, "b": -100}
    pieces, score = py_viterbi("ab", vocab)
    assert pieces == ["ab"] and score == -200


def test_unigram_oov_scores_unk(spark):
    from aeon_mecha_spark.datapipe import unigram as U
    from aeon_mecha_spark.datapipe.unigram import UNK_LP_MICRO

    docs = spark.createDataFrame([(1, "zq")], "doc_id int, text string")
    r = U.unigram_encode(docs, [("a", -1)]).collect()[0]
    assert (r["n_tokens"], r["nll_micro"]) == (2, -2 * UNK_LP_MICRO)


# ----------------------------------------------------------- url/domain
def test_url_canonicalize_edge_cases(spark):
    from aeon_mecha_spark.datapipe import urltools as UT

    rows = [
        (1, "HTTP://WWW.Example.COM:80/path?utm_source=x&id=7&REF=z#f"),
        (2, "https://Sub.Example.COM:443"),          # empty path -> /
        (3, "http://a.example.com:8080/x?gclid=1"),  # port kept, ?-dropped
        (4, "not a url"),                            # no scheme -> ''
        (5, "https://example.com/x?a=1&b=2"),        # params preserved in order
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    got = {r["doc_id"]: r for r in UT.url_canonicalize(df).collect()}
    assert got[1]["url_canon"] == "http://example.com/path?id=7"
    assert got[1]["host"] == "example.com"
    assert got[2]["url_canon"] == "https://sub.example.com/"
    assert got[3]["url_canon"] == "http://a.example.com:8080/x"
    assert got[4]["url_canon"] == ""
    assert got[5]["url_canon"] == "https://example.com/x?a=1&b=2"


def test_registrable_domain_and_blocklist(spark):
    from aeon_mecha_spark.datapipe import urltools as UT

    rules = spark.createDataFrame(
        [("com",), ("co.uk",), ("uk",), ("github.io",), ("io",)],
        "suffix string",
    )
    hosts = [
        (1, "a.b.example.com", "example.com"),   # longest = com (k=1)
        (2, "x.blog.co.uk", "blog.co.uk"),       # co.uk beats uk
        (3, "cdn.user.github.io", "user.github.io"),
        (4, "co.uk", "co.uk"),                   # suffix consumes host
        (5, "localhost", "localhost"),           # no rule matches
        (6, "com", "com"),                       # bestk >= nl fallback
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in hosts], "doc_id int, host string"
    )
    got = {r["doc_id"]: r["domain"] for r in UT.registrable_domain(df, rules).collect()}
    for i, _, want in hosts:
        assert got[i] == want, (i, got[i], want)

    dom = UT.registrable_domain(df, rules)
    bl = spark.createDataFrame([("blog.co.uk",)], "domain string")
    kept = {r["doc_id"] for r in UT.blocklist_filter(dom, bl).collect()}
    assert kept == {1, 3, 4, 5, 6}

    roll = {r["domain"]: (r["n_docs"], r["n_hosts"])
            for r in UT.domain_rollup(dom.withColumn("host", dom.host)).collect()}
    assert roll["example.com"] == (1, 1)


# ------------------------------------------------------- D4 diversity prune
def test_diversity_prune_matches_numpy_mirror(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity as S

    rng = np.random.RandomState(7)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    vecs = rng.randn(40, 4).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in
           S.diversity_prune(df, cents, keep_ppm=300_000).collect()}

    c = np.array(cents)
    d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1) ** 0.5
    cell = np.argmin(d, axis=1)  # first-wins argmin matches ivf_assign
    import math
    keep = {}
    for j in range(len(cents)):
        ids = [i for i in range(40) if cell[i] == j]
        proto = {
            i: float(vecs[i] @ c[j])
            / (math.sqrt(float(vecs[i] @ vecs[i]))
               * math.sqrt(float(c[j] @ c[j])))
            for i in ids
        }
        order = sorted(ids, key=lambda i: (proto[i], i))
        kn = max(1, (len(ids) * 300_000) // 1_000_000)
        for r, i in enumerate(order, 1):
            keep[i] = (j, math.floor(proto[i] * 1e6 + 0.5), r <= kn)
    for i in range(40):
        r = got[i]
        assert (r["cell"], r["proto_ppm"], r["is_kept"]) == keep[i], i
    # every cell keeps at least one vector
    for j in range(len(cents)):
        assert any(got[i]["is_kept"] for i in range(40) if keep[i][0] == j)


def test_d4_composition_semdedup_then_diversity(spark):
    # the full D4 recipe: drop ε-ball duplicates, then prune the
    # prototypical core of what survives
    from aeon_mecha_spark.datapipe import similarity as S

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(1, [1.0, 0.01]), (2, [1.0, 0.011]), (3, [0.4, 0.39]),
            (4, [0.01, 1.0]), (5, [0.39, 0.4])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    sd = S.semdedup(df, cents, threshold=0.999)
    kept_ids = [r["vec_id"] for r in sd.collect() if r["is_kept"]]
    assert 2 not in kept_ids and 1 in kept_ids  # 2 is 1's near-duplicate
    surv = df.filter(F.col("vec_id").isin(kept_ids))
    dp = S.diversity_prune(surv, cents, keep_ppm=500_000)
    out = {r["vec_id"]: r["is_kept"] for r in dp.collect()}
    assert set(out) == set(kept_ids)
    # the diverse (off-axis) vectors outrank the prototypical ones
    assert out[3] and out[5]


# --------------------------------------------------- multiclass IRLS head
def test_softmax_irls_matches_numpy_mirror(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe.classifier import (
        softmax_irls_train,
        softmax_score,
    )

    rng = np.random.default_rng(11)
    n, d, K = 300, 2, 3
    X = rng.normal(size=(n, d))
    true_b = np.array([[0.3, 2.0, -1.0], [-0.2, -1.5, 1.8], [0.0, 0.0, 0.0]])
    Z = np.column_stack([np.ones(n), X]) @ true_b.T
    P = np.exp(Z - Z.max(1, keepdims=True))
    P /= P.sum(1, keepdims=True)
    y = np.array([rng.choice(K, p=p) for p in P])
    classes = ["a", "b", "c"]

    def numpy_softmax_irls(iters=8, ridge=1e-6):
        Xd = np.column_stack([np.ones(n), X])
        km, dd = K - 1, d + 1
        beta = np.zeros((km, dd))
        Y = np.eye(K)[y][:, :km]
        for _ in range(iters):
            Zf = Xd @ beta.T                       # n x km
            E = np.exp(Zf)
            den = 1.0 + E.sum(1)
            Pm = E / den[:, None]                  # n x km
            g = ((Y - Pm).T @ Xd).reshape(-1) - ridge * beta.reshape(-1)
            m = km * dd
            H = np.zeros((m, m))
            for k in range(km):
                for l in range(km):
                    w = Pm[:, k] * ((1.0 if k == l else 0.0) - Pm[:, l])
                    H[k * dd:(k + 1) * dd, l * dd:(l + 1) * dd] = (
                        Xd.T @ (w[:, None] * Xd)
                    )
            H += ridge * np.eye(m)
            beta = beta + np.linalg.solve(H, g).reshape(km, dd)
        return beta

    expected = numpy_softmax_irls()
    df = spark.createDataFrame(
        [(classes[int(c)], float(a), float(b)) for (a, b), c in zip(X, y)],
        "lbl string, x1 double, x2 double",
    )
    got = np.array(softmax_irls_train(df, ["x1", "x2"], "lbl", classes, iters=8))
    assert np.allclose(got, expected, rtol=0, atol=1e-7), (got, expected)
    # recovered signs match the generator on the big coefficients
    assert np.sign(got[0, 1]) == 1 and np.sign(got[0, 2]) == -1
    assert np.sign(got[1, 1]) == -1 and np.sign(got[1, 2]) == 1

    # scoring twin: exact pred + ppm parity with a python mirror
    import math

    coefs = [[float(v) for v in row] for row in got]
    scored = {
        (round(r.x1, 9), round(r.x2, 9)): (r.pred, r.prob_ppm)
        for r in softmax_score(df, ["x1", "x2"], coefs, classes).collect()
    }
    for (a, b), c in zip(X, y):
        zs = [row[0] + row[1] * a + row[2] * b for row in coefs] + [0.0]
        den = 0.0
        for z in zs:
            den = den + math.exp(z) if den else math.exp(z)
        best, bz = classes[0], zs[0]
        for k in range(1, 3):
            if zs[k] > bz:
                best, bz = classes[k], zs[k]
        ppm = math.floor(math.exp(bz) / den * 1e6 + 0.5)
        assert scored[(round(a, 9), round(b, 9))] == (best, ppm)


# ------------------------------------------------- two-level IVF quantizer
def test_ivf_assign_bulk_bit_identical_to_flat(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity as S

    rng = np.random.RandomState(3)
    cents = [[float(x) for x in v] for v in rng.randn(20, 6).round(2)]
    cents[7] = list(cents[2])  # duplicate centroid: exact-tie case
    vecs = rng.randn(200, 6).round(3)
    vecs[0] = cents[2]  # lands exactly on the duplicated centroid
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    flat = {r["vec_id"]: r["cell"] for r in S.ivf_assign(df, cents).collect()}
    bulk = {r["vec_id"]: r["cell"] for r in S.ivf_assign_bulk(df, cents).collect()}
    assert flat == bulk
    assert bulk[0] == 2  # first-wins on the exact tie


def test_two_level_assign_matches_numpy_mirror(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe import similarity as S

    rng = np.random.RandomState(5)
    cents = [[float(x) for x in v] for v in rng.randn(16, 4).round(2)]
    vecs = rng.randn(120, 4).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    gc, members = S.build_two_level(cents, g=4)
    assert sorted(i for ms in members for i in ms) == list(range(16))

    got = {r["vec_id"]: (r["grp"], r["cell"])
           for r in S.ivf_assign_two_level(df, cents, index=(gc, members)).collect()}
    gca = np.array(gc)
    ca = np.array(cents)
    for i, v in enumerate(vecs):
        grp = int(((v - gca) ** 2).sum(1).argmin())
        ms = members[grp]
        cell = ms[int(((v - ca[ms]) ** 2).sum(1).argmin())]
        assert got[i] == (grp, cell), (i, got[i], (grp, cell))

    # g=1 degenerates to the exact flat argmin
    one = {r["vec_id"]: r["cell"]
           for r in S.ivf_assign_two_level(df, cents, g=1).collect()}
    flat = {r["vec_id"]: r["cell"] for r in S.ivf_assign_bulk(df, cents).collect()}
    assert one == flat


def test_semdedup_two_level_mode(spark):
    from aeon_mecha_spark.datapipe import similarity as S

    cents = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]]
    rows = [(1, [1.0, 0.02]), (2, [1.0, 0.021]), (3, [0.02, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r["is_kept"]
           for r in S.semdedup(df, cents, threshold=0.999,
                               two_level_groups=2).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_ordered_checkpoint_path_matches_plain_sort(spark, monkeypatch):
    """The checkpoint-before-sort wrapper (round-13 `_ordered`) must
    yield the identical ROW SEQUENCE as a plain orderBy — the sort keys
    are unique per row, so order is total under any physical plan —
    and its executed plan must truncate at the checkpoint (the whole
    point: the range exchange's sampling pass reads the one
    materialization instead of re-running the chain)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    name = "q149_cube_agg"
    monkeypatch.delenv("AEON_AUDIT_PLAIN_SORT", raising=False)
    wrapped = entry.queries()[name](spark, sf)
    got = [tuple(r) for r in wrapped.collect()]
    monkeypatch.setenv("AEON_AUDIT_PLAIN_SORT", "1")
    plain = [tuple(r) for r in entry.queries()[name](spark, sf).collect()]
    assert got == plain and len(got) > 0

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        wrapped.explain("formatted")
    assert "Scan ExistingRDD" in buf.getvalue()  # plan cut at the checkpoint
