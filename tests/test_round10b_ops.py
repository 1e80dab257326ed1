"""Round-10 wave-2 operator tests: the classical-stats additions
(welch_t2 / anova_f / brown_forsythe / kendall_tau / mcnemar /
permutation_entropy) and textqc.zipf_slope — each checked against an
independent small-data reference implementation, not against itself."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import Row, functions as F


def _two_groups(spark, a, b):
    rows = [Row(g="A", v=float(x)) for x in a] + [Row(g="B", v=float(x)) for x in b]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# welch_t2


def test_welch_t2_matches_direct_formula(spark):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, 200)
    b = rng.integers(5, 60, 150)
    df = _two_groups(spark, a, b)
    out = analytics.welch_t2(df, [], "v", F.col("g") == "A").collect()[0]
    ma, mb = a.mean(), b.mean()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    t2 = (ma - mb) ** 2 / (va / len(a) + vb / len(b))
    assert out["n_a"] == 200 and out["n_b"] == 150
    assert abs(out["mean_diff_micro"] / 1e6 - (ma - mb)) < 1e-5
    assert abs(out["t2_micro"] / 1e6 - t2) < 1e-4


def test_welch_t2_degenerate_groups_null(spark):
    from aeon_mecha_spark.operators import analytics

    df = _two_groups(spark, [3], [1, 2, 4])
    out = analytics.welch_t2(df, [], "v", F.col("g") == "A").collect()[0]
    assert out["t2_micro"] is None  # n_a < 2
    # equal constants -> zero pooled variance -> NULL, not div-by-zero
    df2 = _two_groups(spark, [5, 5, 5], [5, 5])
    out2 = analytics.welch_t2(df2, [], "v", F.col("g") == "A").collect()[0]
    assert out2["t2_micro"] is None


# ---------------------------------------------------------------------------
# anova_f / brown_forsythe


def _anova_f_ref(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    gm = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups)
    ssw = sum(sum((x - np.mean(g)) ** 2 for x in g) for g in groups)
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_f_matches_reference(spark):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(11)
    groups = {c: rng.integers(0, 40, 120 + 13 * i) + i for i, c in enumerate("ABC")}
    rows = [Row(g=c, v=float(x)) for c, xs in groups.items() for x in xs]
    out = analytics.anova_f(
        spark.createDataFrame(rows), [], "v", "g"
    ).collect()[0]
    ref = _anova_f_ref([list(map(float, xs)) for xs in groups.values()])
    assert out["k_groups"] == 3
    assert out["n"] == sum(len(x) for x in groups.values())
    assert abs(out["f_ppm"] / 1e6 - ref) < 1e-3
    # milli-rescaled SS terms track the float reference
    ssb = sum(
        len(xs) * (np.mean(xs) - np.concatenate(list(groups.values())).mean()) ** 2
        for xs in groups.values()
    )
    assert abs(out["ssb_milli"] / 1e3 - ssb) < 0.01 * max(ssb, 1)
    ssw = sum(
        sum((x - np.mean(xs)) ** 2 for x in map(float, xs))
        for xs in groups.values()
    )
    assert abs(out["eta2_ppm"] / 1e6 - ssb / (ssb + ssw)) < 1e-4


def test_brown_forsythe_matches_deviation_anova(spark):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(3)
    ga = rng.integers(0, 10, 101)  # tight
    gb = rng.integers(0, 60, 90)  # wide -> F should be large
    rows = [Row(g="A", v=float(x)) for x in ga] + [
        Row(g="B", v=float(x)) for x in gb
    ]
    out = analytics.brown_forsythe(
        spark.createDataFrame(rows), [], "v", "g"
    ).collect()[0]
    # reference: ANOVA on |x - group median| (type-1 low median = the
    # value at rank ceil(n/2), matching the operator's selection)
    def t1med(xs):
        s = sorted(xs)
        return s[(len(s) + 1) // 2 - 1]

    da = [abs(x - t1med(ga)) for x in map(float, ga)]
    db = [abs(x - t1med(gb)) for x in map(float, gb)]
    ref = _anova_f_ref([da, db])
    assert abs(out["f_ppm"] / 1e6 - ref) < 1e-2
    assert out["f_ppm"] > 10_000_000  # variance ratio is blatant


# ---------------------------------------------------------------------------
# kendall_tau


def _tau_b_ref(xy):
    c = d = 0
    n = len(xy)
    for i in range(n):
        for j in range(i + 1, n):
            dx = xy[j][0] - xy[i][0]
            dy = xy[j][1] - xy[i][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    t0 = n * (n - 1) // 2
    from collections import Counter

    tx = sum(v * (v - 1) // 2 for v in Counter(x for x, _ in xy).values())
    ty = sum(v * (v - 1) // 2 for v in Counter(y for _, y in xy).values())
    return (c - d) / math.sqrt((t0 - tx) * (t0 - ty)), c, d


def test_kendall_tau_matches_bruteforce_with_ties(spark):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(5)
    xy = [(int(rng.integers(0, 8)), int(rng.integers(0, 5))) for _ in range(300)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in xy])
    out = analytics.kendall_tau(df, [], "x", "y").collect()[0]
    ref, c, d = _tau_b_ref(xy)
    assert out["conc"] == c and out["disc"] == d and out["n"] == 300
    assert abs(out["tau_b_ppm"] / 1e6 - ref) < 1e-4


def test_kendall_tau_pins_perfect_and_null_degenerate(spark):
    from aeon_mecha_spark.operators import analytics

    perf = spark.createDataFrame([Row(x=i, y=2 * i) for i in range(20)])
    assert analytics.kendall_tau(perf, [], "x", "y").collect()[0][
        "tau_b_ppm"
    ] == 1_000_000
    anti = spark.createDataFrame([Row(x=i, y=-i) for i in range(20)])
    assert analytics.kendall_tau(anti, [], "x", "y").collect()[0][
        "tau_b_ppm"
    ] == -1_000_000
    const = spark.createDataFrame([Row(x=1, y=i) for i in range(5)])
    assert analytics.kendall_tau(const, [], "x", "y").collect()[0][
        "tau_b_ppm"
    ] is None


def test_kendall_tau_grain_guard_trips(spark):
    from aeon_mecha_spark.operators import analytics

    df = spark.createDataFrame([Row(x=i, y=i % 7) for i in range(50)])
    with pytest.raises(Exception, match="max_grain"):
        analytics.kendall_tau(df, [], "x", "y", max_grain=10).collect()


# ---------------------------------------------------------------------------
# mcnemar


def test_mcnemar_exact_cells(spark):
    from aeon_mecha_spark.operators import analytics

    rows = (
        [Row(a=1, b=1)] * 30
        + [Row(a=1, b=0)] * 12
        + [Row(a=0, b=1)] * 5
        + [Row(a=0, b=0)] * 40
    )
    out = analytics.mcnemar(
        spark.createDataFrame(rows), [], F.col("a") == 1, F.col("b") == 1
    ).collect()[0]
    assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (30, 12, 5, 40)
    assert out["stat_ppm"] == (12 - 5) ** 2 * 1_000_000 // (12 + 5)
    # no discordant pairs -> NULL statistic
    out2 = analytics.mcnemar(
        spark.createDataFrame([Row(a=1, b=1)] * 4), [], F.col("a") == 1, F.col("b") == 1
    ).collect()[0]
    assert out2["stat_ppm"] is None


# ---------------------------------------------------------------------------
# permutation_entropy


def test_permutation_entropy_reference_counts(spark):
    from aeon_mecha_spark.operators import analytics

    # series: 1 2 3 2 2 -> triples (1,2,3),(2,3,2),(3,2,2)
    # signatures: (1,1,1), (1,0,-1), (-1,-1,0) -> 3 distinct patterns
    rows = [Row(k="a", t=i, v=float(x)) for i, x in enumerate([1, 2, 3, 2, 2])]
    out = analytics.permutation_entropy(
        spark.createDataFrame(rows), ["k"], ["t"], "v"
    ).collect()[0]
    assert out["n_windows"] == 3 and out["n_patterns"] == 3
    assert abs(out["entropy"] - math.log(3)) < 1e-5
    # constant series -> a single all-ties pattern, entropy exactly 0
    rows2 = [Row(k="a", t=i, v=1.0) for i in range(6)]
    out2 = analytics.permutation_entropy(
        spark.createDataFrame(rows2), ["k"], ["t"], "v"
    ).collect()[0]
    assert out2["n_patterns"] == 1 and out2["entropy"] == 0.0


def test_permutation_entropy_short_series_absent(spark):
    from aeon_mecha_spark.operators import analytics

    rows = [Row(k="short", t=0, v=1.0), Row(k="short", t=1, v=2.0)]
    assert (
        analytics.permutation_entropy(
            spark.createDataFrame(rows), ["k"], ["t"], "v"
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# zipf_slope


def test_zipf_slope_recovers_planted_exponent(spark):
    from aeon_mecha_spark.datapipe import textqc

    # plant counts ~ round(1e6 * r^-0.8): OLS on the log pairs must
    # recover ~-0.8 (quantization moves it by << 0.01)
    words = [f"w{i:03d}" for i in range(120)]
    text = " ".join(
        " ".join([w] * int(round(1e6 * (r + 1) ** -0.8 / 1000)))
        for r, w in enumerate(words)
    )
    df = spark.createDataFrame([Row(doc_id=1, text=text, lang="xx")])
    out = textqc.zipf_slope(df, top_n=100, keys=["lang"]).collect()[0]
    assert out["n_terms"] == 100
    # independent float reference on the same floored micro-nat points
    ranks = np.arange(1, 101)
    counts = np.array(
        sorted(
            [int(round(1e6 * (r + 1) ** -0.8 / 1000)) for r in range(120)],
            reverse=True,
        )[:100]
    )
    lx = np.floor(np.log(ranks) * 1e6 + 0.5)
    ly = np.floor(np.log(counts) * 1e6 + 0.5)
    ref = np.polyfit(lx, ly, 1)[0]
    assert abs(out["slope_ppm"] / 1e6 - ref) < 1e-4
    assert -0.85 < out["slope_ppm"] / 1e6 < -0.75


# ---------------------------------------------------------------------------
# durbin_watson / cochran_armitage / runs_test / gamma


def test_kendall_gamma_matches_bruteforce(spark):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(9)
    xy = [(int(rng.integers(0, 6)), int(rng.integers(0, 6))) for _ in range(200)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in xy])
    out = analytics.kendall_tau(df, [], "x", "y").collect()[0]
    _, c, d = _tau_b_ref(xy)
    ref = (c - d) / (c + d)
    assert abs(out["gamma_ppm"] / 1e6 - ref) < 1e-5


def test_durbin_watson_matches_float_reference(spark):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(13)
    v = rng.integers(0, 100, 300).astype(float)
    rows = [Row(k="a", t=i, v=float(x)) for i, x in enumerate(v)]
    out = analytics.durbin_watson(
        spark.createDataFrame(rows), ["k"], ["t"], "v"
    ).collect()[0]
    ref = np.sum(np.diff(v) ** 2) / np.sum((v - v.mean()) ** 2)
    assert out["n"] == 300
    assert abs(out["dw_milli"] / 1e3 - ref) < 1e-2
    # iid uniform -> DW near 2
    assert 1.5 < out["dw_milli"] / 1e3 < 2.5
    # a strong positive-autocorrelation series -> DW near 0
    trend = np.cumsum(np.ones(100))
    rows2 = [Row(k="a", t=i, v=float(x)) for i, x in enumerate(trend)]
    out2 = analytics.durbin_watson(
        spark.createDataFrame(rows2), ["k"], ["t"], "v"
    ).collect()[0]
    assert out2["dw_milli"] / 1e3 < 0.1


def test_cochran_armitage_matches_float_reference(spark):
    from aeon_mecha_spark.operators import analytics

    # planted dose-response: success rate rises with the score
    rng = np.random.default_rng(17)
    rows = []
    cells = {}
    for s in range(5):
        n_s = 200
        p = 0.1 + 0.15 * s
        x_s = int(rng.binomial(n_s, p))
        cells[s] = (n_s, x_s)
        rows += [Row(s=s, y=1)] * x_s + [Row(s=s, y=0)] * (n_s - x_s)
    out = analytics.cochran_armitage(
        spark.createDataFrame(rows), [], "s", F.col("y") == 1
    ).collect()[0]
    N = sum(n for n, _ in cells.values())
    P = sum(x for _, x in cells.values())
    pbar = P / N
    t = sum(s * x for s, (_, x) in cells.items()) - pbar * sum(
        s * n for s, (n, _) in cells.items()
    )
    var = (
        pbar
        * (1 - pbar)
        * (
            sum(s * s * n for s, (n, _) in cells.items())
            - sum(s * n for s, (n, _) in cells.items()) ** 2 / N
        )
    )
    ref = t * t / var
    assert out["n"] == N and out["n_pos"] == P
    assert abs(out["z2_ppm"] / 1e6 - ref) < 1e-2
    assert out["z2_ppm"] > 10_000_000  # the trend is blatant


def test_runs_test_hand_case_and_direction(spark):
    from aeon_mecha_spark.operators import analytics

    # values 1..10 with median 5 (type-1 low): drop the at-median row,
    # signs of [1,2,3,4,6,7,8,9,10] -> 0,0,0,0,1,1,1,1,1 = 2 runs
    rows = [Row(k="a", t=i, v=float(i + 1)) for i in range(10)]
    out = analytics.runs_test(
        spark.createDataFrame(rows), ["k"], ["t"], "v"
    ).collect()[0]
    assert (out["n1"], out["n2"], out["runs"]) == (5, 4, 2)
    assert out["direction"] == -1  # far fewer runs than expected: clumping
    n1, n2, r = 5, 4, 2
    nn = n1 + n2
    mu = 2 * n1 * n2 / nn + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn**2 * (nn - 1))
    ref = (r - mu) ** 2 / var
    assert abs(out["z2_ppm"] / 1e6 - ref) < 1e-2
    # perfect alternation around an odd middle value -> maximal runs,
    # direction +1 (the median row itself is dropped per the two-
    # category reduction, so the series needs a third value at the
    # median — a pure two-value series degenerates by construction)
    vals = [1.0, 9.0] * 6
    vals.insert(6, 5.0)  # type-1 median of {1x6, 5, 9x6} is 5
    alt = [Row(k="a", t=i, v=v) for i, v in enumerate(vals)]
    out2 = analytics.runs_test(
        spark.createDataFrame(alt), ["k"], ["t"], "v"
    ).collect()[0]
    assert (out2["n1"], out2["n2"]) == (6, 6)
    assert out2["direction"] == 1 and out2["runs"] == out2["n1"] + out2["n2"]


# ---------------------------------------------------------------------------
# heaps_curve / vocab_coverage / centroid_silhouette / mood_median


def test_heaps_curve_hand_corpus(spark):
    from aeon_mecha_spark.datapipe import textqc

    # doc1: "a b a", doc2: "c a b d" -> 7 tokens; first positions:
    # a@1, b@2, c@4, d@7; checkpoints (7*j)//4 for j=1..4 = 1,3,5,7
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a"), Row(doc_id=2, text="c a b d")]
    )
    rows = {r["j"]: r for r in textqc.heaps_curve(docs, checkpoints=4).collect()}
    assert [rows[j]["checkpoint_pos"] for j in (1, 2, 3, 4)] == [1, 3, 5, 7]
    assert [rows[j]["vocab"] for j in (1, 2, 3, 4)] == [1, 2, 3, 4]


def test_heaps_curve_monotone_and_total(spark, sf_dir):
    from aeon_mecha_spark.datapipe import textqc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = textqc.heaps_curve(docs, checkpoints=8).orderBy("j").collect()
    assert len(rows) == 8
    vocab = [r["vocab"] for r in rows]
    assert vocab == sorted(vocab)  # V(c) is nondecreasing
    # the last checkpoint is the whole corpus: V = full vocabulary
    full = (
        docs.selectExpr(
            "explode(split(trim(lower(text)), '\\\\s+')) AS t"
        ).filter("t <> ''").distinct().count()
    )
    assert vocab[-1] == full


def test_vocab_coverage_hand_corpus(spark):
    from aeon_mecha_spark.datapipe import textqc

    # "a" x5, "b" x3, "c" x1, "d" x1 -> total 10
    text = " ".join(["a"] * 5 + ["b"] * 3 + ["c", "d"])
    docs = spark.createDataFrame([Row(doc_id=1, text=text)])
    rows = {r["k"]: r for r in textqc.vocab_coverage(docs, ks=[1, 2, 3]).collect()}
    assert rows[1]["covered"] == 5 and rows[1]["coverage_ppm"] == 500000
    assert rows[2]["covered"] == 8 and rows[2]["coverage_ppm"] == 800000
    assert rows[3]["covered"] == 9 and rows[3]["coverage_ppm"] == 900000


def test_centroid_silhouette_separated_clusters(spark):
    from aeon_mecha_spark.datapipe import similarity

    # two tight, well-separated 2-cluster blobs in 4 dims -> s near +1
    rng = np.random.default_rng(23)
    rows = []
    for i in range(60):
        lab = i % 2
        center = np.array([0.0, 0.0, 0.0, 0.0]) if lab == 0 else np.array(
            [10.0, 10.0, 10.0, 10.0]
        )
        v = center + rng.normal(0, 0.05, 4)
        rows.append(Row(vec_id=i, label=lab, embedding=[float(x) for x in v]))
    out = similarity.centroid_silhouette(
        spark.createDataFrame(rows), "vec_id", "label", "embedding", dims=4
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_points"] == 30
        assert r["mean_s_ppm"] > 990_000  # essentially perfect separation
        assert r["n_negative"] == 0
    # scrambled labels -> silhouette collapses toward/below zero
    scrambled = [
        Row(vec_id=r.vec_id, label=(r.vec_id // 15) % 2, embedding=r.embedding)
        for r in rows
    ]
    out2 = similarity.centroid_silhouette(
        spark.createDataFrame(scrambled), "vec_id", "label", "embedding", dims=4
    ).collect()
    assert all(r["mean_s_ppm"] < 500_000 for r in out2)


def test_mood_median_reference(spark):
    from aeon_mecha_spark.operators import analytics

    # group A centered low, group B centered high -> large chi2
    rng = np.random.default_rng(29)
    rows = [Row(g="A", v=float(x)) for x in rng.integers(0, 20, 150)] + [
        Row(g="B", v=float(x)) for x in rng.integers(15, 40, 150)
    ]
    out = analytics.mood_median(
        spark.createDataFrame(rows), [], "v", "g"
    ).collect()[0]
    # python mirror with the same conventions (type-1 pooled median,
    # drop at-median rows, per-cell floor terms)
    vals = sorted(float(r.v) for r in rows)
    med = vals[(len(vals) + 1) // 2 - 1]
    cells = {}
    for r in rows:
        if r.v == med:
            continue
        a, b = cells.get(r.g, (0, 0))
        cells[r.g] = (a + (r.v > med), b + (r.v < med))
    ta = sum(a for a, _ in cells.values())
    tb = sum(b for _, b in cells.values())
    nn = ta + tb
    chi = 0
    for a, b in cells.values():
        ng = a + b
        if nn > 0 and ng > 0 and ta > 0:
            chi += (a * nn - ng * ta) ** 2 * 1_000_000 // (nn * ng * ta)
        if nn > 0 and ng > 0 and tb > 0:
            chi += (b * nn - ng * tb) ** 2 * 1_000_000 // (nn * ng * tb)
    assert out["k_groups"] == 2 and out["n"] == nn
    assert out["chi2_ppm"] == chi
    assert out["chi2_ppm"] > 50_000_000  # the separation is blatant


# ---------------------------------------------------------------------------
# friedman


def test_friedman_matches_python_mirror(spark):
    from aeon_mecha_spark.operators import analytics

    # 5 blocks x 3 treatments with ties; values integral
    rng = np.random.default_rng(31)
    data = {}
    rows = []
    for b in range(5):
        for j, t in enumerate("XYZ"):
            v = int(rng.integers(0, 6)) + (2 * j if b % 2 else 0)
            data[(b, t)] = v
            rows.append(Row(b=b, t=t, v=v))
    out = analytics.friedman(
        spark.createDataFrame(rows), [], "b", "t", "v"
    ).collect()[0]

    # python mirror: average ranks within block, classic tie-corrected Q
    from fractions import Fraction

    treatments = sorted({t for _, t in data})
    k, n = len(treatments), 5
    ranks = {t: Fraction(0) for t in treatments}
    dsq = Fraction(0)
    for b in range(n):
        vals = sorted(data[(b, t)] for t in treatments)
        for t in treatments:
            v = data[(b, t)]
            lo = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            r = Fraction(2 * lo + ties + 1, 2)  # average rank
            ranks[t] += r
            dsq += (r - Fraction(k + 1, 2)) ** 2
    num = sum((ranks[t] - Fraction(n * (k + 1), 2)) ** 2 for t in treatments)
    q = Fraction(k - 1) * num / dsq
    assert out["k"] == k and out["n_blocks"] == n
    assert abs(out["q_ppm"] / 1e6 - float(q)) < 2e-6
    # doubled Page L: sum of s_j * (2 * rank-sum)
    l2 = sum((i + 1) * 2 * ranks[t] for i, t in enumerate(treatments))
    assert out["page_l2"] == int(l2)


def test_friedman_drops_incomplete_blocks(spark):
    from aeon_mecha_spark.operators import analytics

    rows = [
        Row(b=b, t=t, v=b + len(t))
        for b in range(4)
        for t in ("X", "YY", "ZZZ")
    ] + [Row(b=99, t="X", v=1)]  # block 99 lacks Y/Z -> excluded
    out = analytics.friedman(
        spark.createDataFrame(rows), [], "b", "t", "v"
    ).collect()[0]
    assert out["n_blocks"] == 4
    # every block ranks the treatments identically (v = b + len) ->
    # maximal concordance: Q = (k-1)*n exactly (2 * 4 = 8) in ppm
    assert out["q_ppm"] == 8_000_000


# ---------------------------------------------------------------------------
# AVI container demux (avicodec)


def _mjpeg_frames(n=4, w=16, h=8):
    from aeon_mecha_spark.datapipe.jpegcodec import encode_jpeg

    rng = np.random.default_rng(41)
    frames, imgs = [], []
    for _ in range(n):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        imgs.append(img)
        frames.append(encode_jpeg(img, quality=90))
    return frames, imgs


def test_avi_roundtrip_and_probe():
    from aeon_mecha_spark.datapipe import avicodec

    frames, _ = _mjpeg_frames()
    avi = avicodec.build_avi_mjpeg(frames, 16, 8, fps=5)
    assert avicodec.is_avi(avi)
    info = avicodec.probe_avi(avi)
    assert info["codec"] == "MJPG"
    assert (info["width"], info["height"]) == (16, 8)
    assert info["usec_per_frame"] == 200_000
    out = avicodec.split_avi_frames(avi)
    assert out == frames  # byte-exact frame recovery
    assert avicodec.split_avi_frames(avi, max_frames=2) == frames[:2]


def test_avi_non_mjpeg_codec_raises():
    from aeon_mecha_spark.datapipe import avicodec

    frames, _ = _mjpeg_frames(n=1)
    avi = bytearray(avicodec.build_avi_mjpeg(frames, 16, 8))
    i = bytes(avi).find(b"vidsMJPG")
    avi[i + 4 : i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="h264"):
        avicodec.split_avi_frames(bytes(avi))
    with pytest.raises(ValueError, match="RIFF"):
        avicodec.split_avi_frames(b"\x00" * 32)


def test_decode_video_frames_from_avi_container(spark):
    from aeon_mecha_spark.datapipe import avicodec, multimodal
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg

    frames, _ = _mjpeg_frames(n=3)
    avi = avicodec.build_avi_mjpeg(frames, 16, 8)
    media = spark.createDataFrame(
        [
            Row(
                media_id=1,
                modality="video",
                width=16,
                height=8,
                duration_ms=600,
                payload=bytearray(avi),
            )
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.decode_video_frames(media).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2]
    for r, f in zip(out, frames):
        img = decode_jpeg(f)
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["pixel_sum"] == int(img.astype(np.int64).sum())
    # feature extraction takes the AVI path too (real, not fake)
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF) container demux (mp4codec)


def test_mp4_roundtrip_and_probe():
    from aeon_mecha_spark.datapipe import mp4codec

    frames, _ = _mjpeg_frames(n=5)
    mp4 = mp4codec.build_mp4_mjpeg(frames, 16, 8, fps=4)
    assert mp4codec.is_mp4(mp4)
    info = mp4codec.probe_mp4(mp4)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (16, 8)
    assert info["n_samples"] == 5 and info["timescale"] == 4
    out = mp4codec.split_mp4_frames(mp4)
    assert out == frames  # byte-exact sample recovery via stsc/stco/stsz
    assert mp4codec.split_mp4_frames(mp4, max_frames=3) == frames[:3]


def test_mp4_non_jpeg_codec_and_fragmented_raise():
    from aeon_mecha_spark.datapipe import mp4codec

    frames, _ = _mjpeg_frames(n=1)
    mp4 = bytearray(mp4codec.build_mp4_mjpeg(frames, 16, 8))
    i = bytes(mp4).find(b"jpeg", bytes(mp4).find(b"stsd"))
    mp4[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4codec.split_mp4_frames(bytes(mp4))
    with pytest.raises(ValueError, match="ftyp"):
        mp4codec.probe_mp4(b"\x00" * 32)


def test_decode_video_frames_from_mp4_container(spark):
    from aeon_mecha_spark.datapipe import mp4codec, multimodal
    from aeon_mecha_spark.datapipe.jpegcodec import decode_jpeg

    frames, _ = _mjpeg_frames(n=3)
    mp4 = mp4codec.build_mp4_mjpeg(frames, 16, 8)
    media = spark.createDataFrame(
        [
            Row(
                media_id=7,
                modality="video",
                width=16,
                height=8,
                duration_ms=750,
                payload=bytearray(mp4),
            )
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.decode_video_frames(media).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2]
    for r, f in zip(out, frames):
        img = decode_jpeg(f)
        assert r["pixel_sum"] == int(img.astype(np.int64).sum())
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8


# ---------------------------------------------------------------------------
# link_prediction


def test_link_prediction_hand_graph(spark):
    from aeon_mecha_spark.operators import graph

    # path graph 1-2-3-4 plus edge 2-5: non-edges sharing neighbors:
    # (1,3) via 2; (2,4) via 3; (1,5),(3,5) via 2; (2,4) etc.
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(1, 2), (2, 3), (3, 4), (2, 5)]]
    )
    out = {
        (r["u"], r["v"]): r
        for r in graph.link_prediction(edges, top_k=10).collect()
    }
    # deg: 1->1, 2->3, 3->2, 4->1, 5->1
    assert set(out) == {(1, 3), (1, 5), (3, 5), (2, 4)}
    import math

    aa_via_2 = int(math.floor(1e6 / math.log(3) + 0.5))
    aa_via_3 = int(math.floor(1e6 / math.log(2) + 0.5))
    assert out[(1, 3)]["cn"] == 1 and out[(1, 3)]["aa_micro"] == aa_via_2
    assert out[(2, 4)]["aa_micro"] == aa_via_3
    assert out[(1, 5)]["ra_micro"] == 1_000_000 // 3
    # jaccard of (1,3): cn=1, deg1+deg3-cn = 1+2-1 = 2 -> 500000
    assert out[(1, 3)]["jaccard_ppm"] == 500_000
    # existing edges never appear
    assert (1, 2) not in out and (2, 3) not in out


def test_link_prediction_degree_cap_drops_hub_wedges(spark):
    from aeon_mecha_spark.operators import graph

    # star around hub 0 (degree 4): capping below 4 removes the hub as
    # a carrier, so no candidate pairs survive
    edges = spark.createDataFrame(
        [Row(src=0, dst=i) for i in range(1, 5)]
    )
    assert graph.link_prediction(edges, top_k=10).count() == 6  # C(4,2)
    assert graph.link_prediction(edges, top_k=10, max_degree=3).count() == 0
