"""Round-8 operators: Spearman, Mann-Whitney U, ROC points,
Jensen-Shannon divergence, HHI concentration — hand-computed or
exact-Python-mirror expectations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# -- Spearman ------------------------------------------------------------------


def _dranks(vals):
    """Doubled average ranks: 2*rank + tie_count - 1 (integral)."""
    from collections import Counter

    cnt = Counter(vals)
    smaller, s = {}, 0
    for v in sorted(cnt):
        smaller[v] = s
        s += cnt[v]
    return [2 * (smaller[v] + 1) + cnt[v] - 1 for v in vals]


def _spearman_ref(pairs):
    """Exact Python mirror of spearman_by_group's integer convention."""
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    drx, dry = _dranks(xs), _dranks(ys)
    n = len(pairs)
    sx, sy = sum(drx), sum(dry)
    sxx = sum(a * a for a in drx)
    syy = sum(a * a for a in dry)
    sxy = sum(a * b for a, b in zip(drx, dry))
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    rx, ry = math.isqrt(dx), math.isqrt(dy)
    sign = (num > 0) - (num < 0)
    return sign * min(1_000_000, abs(num) * 1_000_000 // (rx * ry))


def test_spearman_perfect_monotone_is_one(spark):
    from aeon_mecha_spark.operators.analytics import spearman_by_group

    rows = [("g", float(i), float(i * i)) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = spearman_by_group(df, ["k"], "x", "y").collect()[0]
    assert got.rho_ppm == 1_000_000
    assert got.n == 19


def test_spearman_anti_monotone_is_minus_one(spark):
    from aeon_mecha_spark.operators.analytics import spearman_by_group

    rows = [("g", float(i), float(-i)) for i in range(1, 12)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = spearman_by_group(df, ["k"], "x", "y").collect()[0]
    assert got.rho_ppm == -1_000_000


def test_spearman_with_ties_matches_exact_mirror(spark):
    from aeon_mecha_spark.operators.analytics import spearman_by_group

    pairs = [(1.0, 2.0), (1.0, 5.0), (2.0, 5.0), (3.0, 4.0),
             (3.0, 1.0), (4.0, 9.0), (5.0, 9.0), (5.0, 0.0)]
    rows = [("g", x, y) for x, y in pairs]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = spearman_by_group(df, ["k"], "x", "y").collect()[0]
    assert got.rho_ppm == _spearman_ref(pairs)


def test_spearman_constant_column_is_null(spark):
    from aeon_mecha_spark.operators.analytics import spearman_by_group

    rows = [("g", 1.0, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = spearman_by_group(df, ["k"], "x", "y").collect()[0]
    assert got.rho_ppm is None


# -- Mann-Whitney U ------------------------------------------------------------


def _mwu_ref(values_a, values_b):
    """Exact doubled-U mirror: u2 = sum of doubled ranks - n*(n+1)."""
    both = [(v, 1) for v in values_a] + [(v, 0) for v in values_b]
    dr = _dranks([v for v, _ in both])
    ra = sum(d for d, (_, a) in zip(dr, both) if a == 1)
    rb = sum(d for d, (_, a) in zip(dr, both) if a == 0)
    na, nb = len(values_a), len(values_b)
    return ra - na * (na + 1), rb - nb * (nb + 1)


def test_mwu_hand_computed_no_ties(spark):
    from aeon_mecha_spark.operators.analytics import mann_whitney_u

    # A = {1,3,5}, B = {2,4}: ranks A={1,3,5}, B={2,4}
    # U_A = 9 - 6 = 3 -> u2_a = 6;  U_B = 6 - 3 = 3 -> u2_b = 6? no:
    # R_A = 1+3+5 = 9, U_A = 9 - 3*4/2 = 3; R_B = 6, U_B = 6 - 2*3/2 = 3
    rows = [("g", 1.0, 1), ("g", 3.0, 1), ("g", 5.0, 1),
            ("g", 2.0, 0), ("g", 4.0, 0)]
    df = spark.createDataFrame(rows, "k string, v double, a int")
    got = mann_whitney_u(df, ["k"], "v", F.col("a") == 1).collect()[0]
    assert (got.n_a, got.n_b) == (3, 2)
    assert got.u2_a == 6 and got.u2_b == 6
    assert got.u2_a + got.u2_b == 2 * got.n_a * got.n_b


def test_mwu_ties_match_exact_mirror(spark):
    from aeon_mecha_spark.operators.analytics import mann_whitney_u

    a = [1.0, 2.0, 2.0, 7.0]
    b = [2.0, 3.0, 7.0]
    rows = [("g", v, 1) for v in a] + [("g", v, 0) for v in b]
    df = spark.createDataFrame(rows, "k string, v double, a int")
    got = mann_whitney_u(df, ["k"], "v", F.col("a") == 1).collect()[0]
    assert (got.u2_a, got.u2_b) == _mwu_ref(a, b)
    assert got.u2_a + got.u2_b == 2 * len(a) * len(b)


def test_mwu_disjoint_dominant_sample_takes_all(spark):
    from aeon_mecha_spark.operators.analytics import mann_whitney_u

    a = [10.0, 11.0, 12.0]
    b = [1.0, 2.0]
    rows = [("g", v, 1) for v in a] + [("g", v, 0) for v in b]
    df = spark.createDataFrame(rows, "k string, v double, a int")
    got = mann_whitney_u(df, ["k"], "v", F.col("a") == 1).collect()[0]
    assert got.u2_a == 2 * len(a) * len(b)  # every A beats every B
    assert got.u2_b == 0


# -- ROC points ----------------------------------------------------------------


def test_roc_points_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import roc_points
    from aeon_mecha_spark.util import release_cached

    # scores desc: 4(+), 3(-), 2(+), 1(-); P=2, N=2
    rows = [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = roc_points(df, F.col("y") == 1, "s")
    got = {r.score: (r.n_ge, r.tpr_ppm, r.fpr_ppm) for r in out.collect()}
    assert got == {
        4.0: (1, 500_000, 0),
        3.0: (2, 500_000, 500_000),
        2.0: (3, 1_000_000, 500_000),
        1.0: (4, 1_000_000, 1_000_000),
    }
    release_cached(out)


def test_roc_points_ties_collapse_to_one_threshold(spark):
    from aeon_mecha_spark.operators.analytics import roc_points
    from aeon_mecha_spark.util import release_cached

    rows = [(2.0, 1), (2.0, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = roc_points(df, F.col("y") == 1, "s")
    got = {r.score: (r.n_ge, r.tpr_ppm, r.fpr_ppm) for r in out.collect()}
    assert got == {2.0: (2, 500_000, 1_000_000), 1.0: (3, 1_000_000, 1_000_000)}
    release_cached(out)


def test_roc_matches_single_window_formulation(spark):
    """The two-level bucketed path must equal the naive global-window
    cumulative on a value-dense input (the refinement-argument check)."""
    from pyspark.sql import Window as W

    from aeon_mecha_spark.operators.analytics import roc_points
    from aeon_mecha_spark.util import release_cached

    rows = [(float(i % 37) + (i % 3) * 0.5, 1 if i % 5 == 0 else 0)
            for i in range(400)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = roc_points(df, F.col("y") == 1, "s", score_buckets=8)
    got = sorted((r.score, r.n_ge, r.tpr_ppm, r.fpr_ppm) for r in out.collect())

    g = df.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    w = W.orderBy(F.col("s").desc()).rowsBetween(W.unboundedPreceding, 0)
    tot = g.agg(F.sum("n").alias("nt"), F.sum("p").alias("pt")).collect()[0]
    naive = (
        g.withColumn("cumn", F.sum("n").over(w))
        .withColumn("cump", F.sum("p").over(w))
        .select(
            "s",
            "cumn",
            F.expr(f"CAST((CAST(cump AS DECIMAL(38,0)) * 1000000) div {tot.pt} AS BIGINT)"),
            F.expr(
                f"CAST((CAST(cumn - cump AS DECIMAL(38,0)) * 1000000) div {tot.nt - tot.pt} AS BIGINT)"
            ),
        )
        .collect()
    )
    assert got == sorted(tuple(r) for r in naive)
    release_cached(out)


# -- Jensen-Shannon ------------------------------------------------------------


def test_jsd_identical_populations_near_zero(spark):
    from aeon_mecha_spark.operators.analytics import jensen_shannon

    rows = [(c, i % 2) for i in range(200) for c in ("a", "b")]
    df = spark.createDataFrame(rows, "cat string, half int")
    out = jensen_shannon(df, "cat", F.col("half") == 0).collect()
    # identical category counts on both sides -> p == q -> every term 0
    assert all(r.term_unat == 0 for r in out)


def test_jsd_symmetric_under_population_swap(spark):
    from aeon_mecha_spark.operators.analytics import jensen_shannon

    rows = [("a", 0)] * 30 + [("a", 1)] * 5 + [("b", 0)] * 10 + [("b", 1)] * 25
    df = spark.createDataFrame(rows, "cat string, grp int")
    one = {r.category: r.term_unat
           for r in jensen_shannon(df, "cat", F.col("grp") == 0).collect()}
    two = {r.category: r.term_unat
           for r in jensen_shannon(df, "cat", F.col("grp") == 1).collect()}
    assert one == two  # JSD is symmetric in (P, Q)


def test_jsd_bounded_by_ln2(spark):
    from aeon_mecha_spark.operators.analytics import jensen_shannon

    rows = [("only_p", 0)] * 50 + [("only_q", 1)] * 50
    df = spark.createDataFrame(rows, "cat string, grp int")
    out = jensen_shannon(df, "cat", F.col("grp") == 0).collect()
    total = sum(r.term_unat for r in out)
    assert 0 < total <= 693_148  # ln 2 in micro-nats, rounding slack


def test_jsd_matches_float_reference(spark):
    from aeon_mecha_spark.operators.analytics import jensen_shannon

    counts = {"a": (30, 5), "b": (10, 25), "c": (7, 7)}
    rows = []
    for c, (np_, nq_) in counts.items():
        rows += [(c, 0)] * np_ + [(c, 1)] * nq_
    df = spark.createDataFrame(rows, "cat string, grp int")
    out = {r.category: r.term_unat
           for r in jensen_shannon(df, "cat", F.col("grp") == 0).collect()}
    NP = sum(v[0] for v in counts.values())
    NQ = sum(v[1] for v in counts.values())
    K = len(counts)
    for c, (cp, cq) in counts.items():
        p = (2 * cp + 1) / (2 * NP + K)
        q = (2 * cq + 1) / (2 * NQ + K)
        m = (p + q) / 2
        ref = 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        assert abs(out[c] / 1e6 - ref) < 3e-6  # floor/rounding slack


# -- HHI -----------------------------------------------------------------------


def test_hhi_monopoly_is_full_scale(spark):
    from aeon_mecha_spark.operators.analytics import hhi_concentration

    rows = [("m", "e1")] * 40
    df = spark.createDataFrame(rows, "k string, e string")
    got = hhi_concentration(df, ["k"], "e").collect()[0]
    assert (got.n, got.n_entities, got.hhi_ppm) == (40, 1, 1_000_000)


def test_hhi_even_split_is_reciprocal(spark):
    from aeon_mecha_spark.operators.analytics import hhi_concentration

    rows = [("m", f"e{i}") for i in range(8) for _ in range(5)]
    df = spark.createDataFrame(rows, "k string, e string")
    got = hhi_concentration(df, ["k"], "e").collect()[0]
    assert got.hhi_ppm == 1_000_000 // 8  # 125000 exactly

def test_hhi_hand_computed_uneven(spark):
    from aeon_mecha_spark.operators.analytics import hhi_concentration

    # counts 6, 3, 1 over N=10: (36+9+1)*1e6 // 100 = 460000
    rows = [("m", "a")] * 6 + [("m", "b")] * 3 + [("m", "c")]
    df = spark.createDataFrame(rows, "k string, e string")
    got = hhi_concentration(df, ["k"], "e").collect()[0]
    assert got.hhi_ppm == 460_000


# -- machine-checked window bounds (plan-audit allowlist enforcement) ----------


def test_grouped_quantiles_guard_fires_on_oversized_window(spark):
    """assert_max_rows turns the documented bound into a runtime
    failure: a global-window quantile over more rows than claimed must
    raise, not silently single-task-sort."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from aeon_mecha_spark.operators.analytics import grouped_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    q = grouped_quantiles(df, [], "v", ps=[0.5], assert_max_rows=10)
    with pytest.raises(Exception) as ei:
        q.collect()
    assert "documented bound" in str(ei.value)


def test_grouped_quantiles_guard_quiet_when_within_bound(spark):
    from aeon_mecha_spark.operators.analytics import grouped_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    got = grouped_quantiles(df, [], "v", ps=[0.5], assert_max_rows=50).collect()
    # type-1: rank ceil(0.5*50)=25 in ascending 0..49 -> value 24.0
    assert len(got) == 1 and got[0].q == 24.0


def test_grouped_quantiles_scale_path_guard_fires_on_fat_sample(spark):
    """The boundary-sample bound fails at build time (the boundary
    collect) when an explicit fraction lets the sample exceed it."""
    from aeon_mecha_spark.operators.analytics import grouped_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(200)], "v double")
    with pytest.raises(Exception) as ei:
        grouped_quantiles(
            df, [], "v", ps=[0.5], range_buckets=4,
            sample_fraction=1.0, assert_max_rows=20,
        )
    assert "documented bound" in str(ei.value)


def test_compaction_plan_guard_fires_past_max_files(spark):
    from aeon_mecha_spark.datapipe.curation import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i}", 100 + i) for i in range(20)], "id string, size long"
    )
    plan = compaction_plan(files, "id", "size", target_size=500, max_files=5)
    with pytest.raises(Exception) as ei:
        plan.collect()
    assert "max_files" in str(ei.value)


def test_compaction_plan_guard_quiet_within_bound(spark):
    from aeon_mecha_spark.datapipe.curation import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i}", 100 + i) for i in range(20)], "id string, size long"
    )
    got = compaction_plan(files, "id", "size", target_size=500, max_files=1000)
    assert got.count() == 20


# -- ACF -------------------------------------------------------------------


def _pearson_ppm(pairs):
    n = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    sign = (num > 0) - (num < 0)
    return sign * min(
        1_000_000, abs(num) * 1_000_000 // (math.isqrt(dx) * math.isqrt(dy))
    )


def test_acf_linear_series_is_one_at_every_lag(spark):
    from aeon_mecha_spark.operators.analytics import acf_by_group

    rows = [("g", i, 3 * i + 7) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = {r.lag: r.r_ppm for r in acf_by_group(df, ["k"], "t", "v", 3).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}


def test_acf_alternating_series_matches_mirror(spark):
    from aeon_mecha_spark.operators.analytics import acf_by_group

    vals = [(-1) ** i * 5 + (i % 3) for i in range(25)]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = {r.lag: (r.n_pairs, r.r_ppm)
           for r in acf_by_group(df, ["k"], "t", "v", 2).collect()}
    for lag in (1, 2):
        pairs = list(zip(vals, vals[lag:]))
        assert got[lag] == (len(pairs), _pearson_ppm(pairs))
    assert got[1][1] < 0 < got[2][1]  # alternation: anti at 1, pro at 2


def test_acf_multi_column_ordering(spark):
    from aeon_mecha_spark.operators.analytics import acf_by_group

    # primary order collides; the (t, i) tie-break must fix the pairing
    rows = [("g", 0, 0, 1), ("g", 0, 1, 2), ("g", 1, 0, 3), ("g", 1, 1, 4)]
    df = spark.createDataFrame(rows, "k string, t int, i int, v long")
    got = acf_by_group(df, ["k"], ["t", "i"], "v", 1).collect()[0]
    assert (got.n_pairs, got.r_ppm) == (3, 1_000_000)


# -- Kruskal-Wallis ----------------------------------------------------------


def test_kruskal_wallis_textbook_three_groups(spark):
    from aeon_mecha_spark.operators.analytics import kruskal_wallis

    # groups {1,2,3},{4,5,6},{7,8,9}: H = 12/(9*10)*(36+225+576)/3 - 30
    #   = 0.13333*279 - 30 = 7.2 exactly; no ties
    rows = [("k", float(v), g)
            for g, vs in [("a", [1, 2, 3]), ("b", [4, 5, 6]), ("c", [7, 8, 9])]
            for v in vs]
    df = spark.createDataFrame(rows, "k string, v double, g string")
    got = kruskal_wallis(df, ["k"], "v", "g").collect()[0]
    assert (got.n, got.n_groups, got.h_milli, got.tie_ppm) == (9, 3, 7200, 1_000_000)


def test_kruskal_wallis_identical_groups_near_zero(spark):
    from aeon_mecha_spark.operators.analytics import kruskal_wallis

    rows = [("k", float(v), g) for g in ("a", "b") for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "k string, v double, g string")
    got = kruskal_wallis(df, ["k"], "v", "g").collect()[0]
    # symmetric groups: true H = 0; floor terms may undershoot by <= 2/1000
    assert -2 <= got.h_milli <= 0
    # ties: every value duplicated once -> tie_ppm < 1e6
    assert got.tie_ppm < 1_000_000


def test_kruskal_wallis_tie_correction_exact(spark):
    from aeon_mecha_spark.operators.analytics import kruskal_wallis

    # N=4, values (1,1,2,3): one tie block t=2 -> C = 1 - (8-2)/(64-4)
    #   = 1 - 6/60 = 0.9 -> 900000 ppm
    rows = [("k", 1.0, "a"), ("k", 1.0, "b"), ("k", 2.0, "a"), ("k", 3.0, "b")]
    df = spark.createDataFrame(rows, "k string, v double, g string")
    got = kruskal_wallis(df, ["k"], "v", "g").collect()[0]
    assert got.tie_ppm == 900_000


# -- Calibration / ECE --------------------------------------------------------


def test_calibration_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import calibration_table

    rows = [(950000, 1), (900000, 1), (100000, 0), (50000, 0),
            (500000, 1), (450000, 0)]
    df = spark.createDataFrame(rows, "s long, y int")
    got = {r.bucket: (r.n, r.n_pos, r.conf_ppm, r.acc_ppm, r.ece_term)
           for r in calibration_table(df, F.col("y") == 1, "s", 4).collect()}
    assert got == {
        0: (2, 0, 75_000, 0, 150_000),
        1: (2, 1, 475_000, 500_000, 50_000),
        3: (2, 2, 925_000, 1_000_000, 150_000),
    }


def test_calibration_top_edge_lands_in_last_bucket(spark):
    from aeon_mecha_spark.operators.analytics import calibration_table

    df = spark.createDataFrame([(1_000_000, 1), (0, 0)], "s long, y int")
    got = {r.bucket for r in
           calibration_table(df, F.col("y") == 1, "s", 10).collect()}
    assert got == {0, 9}


# -- Benjamini-Hochberg -------------------------------------------------------


def _bh_ref(ps, alpha_num, alpha_den):
    m = len(ps)
    s = sorted(ps)
    kstar, thr = 0, None
    for k, p in enumerate(s, 1):
        if p * m * alpha_den <= k * 1_000_000 * alpha_num:
            kstar, thr = k, p
    return thr


def test_bh_partial_rejection_matches_mirror(spark):
    from aeon_mecha_spark.operators.analytics import bh_select

    ps = [1000, 8000, 12_000, 40_000, 200_000, 320_000, 420_000,
          600_000, 750_000, 900_000]
    rows = [(i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "id long, p long")
    out = bh_select(df, "p", alpha_num=5, alpha_den=100).collect()
    thr = _bh_ref(ps, 5, 100)
    for r in out:
        assert r.threshold_ppm == thr
        assert r.bh_rejected == (thr is not None and r.p <= thr)
    assert 0 < sum(r.bh_rejected for r in out) < len(ps)


def test_bh_nothing_passes(spark):
    from aeon_mecha_spark.operators.analytics import bh_select

    rows = [(i, 900_000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, p long")
    out = bh_select(df, "p", alpha_num=1, alpha_den=1000).collect()
    assert all(not r.bh_rejected and r.threshold_ppm is None for r in out)


def test_bh_everything_passes(spark):
    from aeon_mecha_spark.operators.analytics import bh_select

    rows = [(i, i) for i in range(10)]  # all p ~ 0
    df = spark.createDataFrame(rows, "id long, p long")
    out = bh_select(df, "p", alpha_num=5, alpha_den=100).collect()
    assert all(r.bh_rejected for r in out)


# -- Information gain ---------------------------------------------------------


def _unat(x):
    return math.floor(x * 1_000_000 + 0.5)


def test_info_gain_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import info_gain

    rows = ([("x1", "pos")] * 8 + [("x1", "neg")] * 2
            + [("x2", "pos")] * 3 + [("x2", "neg")] * 7)
    df = spark.createDataFrame(rows, "f string, y string")
    got = {r.value: r for r in info_gain(df, "f", "y").collect()}
    h1 = _unat(math.log(10)) - (_unat(8 * math.log(8)) + _unat(2 * math.log(2))) // 10
    h2 = _unat(math.log(10)) - (_unat(3 * math.log(3)) + _unat(7 * math.log(7))) // 10
    hl = _unat(math.log(20)) - (_unat(11 * math.log(11)) + _unat(9 * math.log(9))) // 20
    assert got["x1"].h_cond_unat == h1 and got["x2"].h_cond_unat == h2
    assert got["x1"].term_unat == 10 * h1 // 20
    assert got["x1"].h_label_unat == hl
    ig = hl - sum(r.term_unat for r in got.values())
    assert 0 < ig < hl  # informative but not fully determining


def test_info_gain_perfect_feature_recovers_label_entropy(spark):
    from aeon_mecha_spark.operators.analytics import info_gain

    rows = [("a", "pos")] * 5 + [("b", "neg")] * 5
    df = spark.createDataFrame(rows, "f string, y string")
    got = info_gain(df, "f", "y").collect()
    assert all(r.h_cond_unat == 0 and r.term_unat == 0 for r in got)
    assert got[0].h_label_unat == _unat(math.log(2) * 1) or got[0].h_label_unat == _unat(math.log(10)) - (2 * _unat(5 * math.log(5))) // 10


# -- line dedup ----------------------------------------------------------------


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from aeon_mecha_spark.datapipe.dedup import line_dedup

    docs = spark.createDataFrame([
        (1, "hello\nCOOKIE BANNER\nworld"),
        (2, "foo\nCOOKIE BANNER\nbar"),
        (3, "COOKIE BANNER\nunique line"),
        (4, "all mine\n\nhere"),
    ], "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_lines, r.n_dropped)
           for r in line_dedup(docs, max_doc_freq=2).collect()}
    assert got == {
        1: ("hello\nworld", 3, 1),
        2: ("foo\nbar", 3, 1),
        3: ("unique line", 2, 1),
        4: ("all mine\n\nhere", 3, 0),  # blank lines kept (structure)
    }


def test_line_dedup_trim_grain_and_threshold(spark):
    from aeon_mecha_spark.datapipe.dedup import line_dedup

    # '  spam  ' and 'spam' are the SAME line grain (trimmed); df=2
    # does NOT exceed max_doc_freq=2, so nothing drops
    docs = spark.createDataFrame(
        [(1, "  spam  \nx"), (2, "spam\ny")], "doc_id long, text string"
    )
    got = line_dedup(docs, max_doc_freq=2).collect()
    assert all(r.n_dropped == 0 for r in got)
    # at max_doc_freq=1 the shared line drops from BOTH docs
    got2 = {r.doc_id: r.text
            for r in line_dedup(docs, max_doc_freq=1).collect()}
    assert got2 == {1: "x", 2: "y"}


def test_line_dedup_all_lines_dropped_yields_empty_text(spark):
    from aeon_mecha_spark.datapipe.dedup import line_dedup

    docs = spark.createDataFrame(
        [(i, "same") for i in range(4)], "doc_id long, text string"
    )
    got = line_dedup(docs, max_doc_freq=2).collect()
    assert all(r.text == "" and r.n_dropped == 1 for r in got)


# -- Kaplan-Meier --------------------------------------------------------------


def test_kaplan_meier_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import kaplan_meier

    rows = [("g", 5, 1), ("g", 5, 0), ("g", 8, 1), ("g", 8, 1),
            ("g", 10, 0), ("g", 12, 1)]
    df = spark.createDataFrame(rows, "k string, dur int, e int")
    got = {r.t: (r.n_risk, r.d, r.ln_s_unat)
           for r in kaplan_meier(df, ["k"], "dur", F.col("e") == 1)
           .collect()}
    u = lambda x: math.floor(x * 1e6 + 0.5)  # noqa: E731
    assert got[5] == (6, 1, u(math.log(5 / 6)))
    assert got[8] == (4, 2, u(math.log(5 / 6)) + u(math.log(2 / 4)))
    assert got[12] == (1, 1, None)  # d = n_risk -> S hits 0 -> NULL log


def test_kaplan_meier_censoring_only_shifts_at_risk(spark):
    from aeon_mecha_spark.operators.analytics import kaplan_meier

    # censored rows consume at-risk mass but never create output rows
    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 1)]
    df = spark.createDataFrame(rows, "k string, dur int, e int")
    got = kaplan_meier(df, ["k"], "dur", F.col("e") == 1).collect()
    assert len(got) == 1 and got[0].t == 3 and got[0].n_risk == 1
    assert got[0].ln_s_unat is None  # the only at-risk subject fails


# -- cohort retention ----------------------------------------------------------


def test_cohort_retention_daily_triangle(spark):
    import datetime as dt

    from aeon_mecha_spark.operators.analytics import cohort_retention_table

    ev = spark.createDataFrame([
        (1, dt.datetime(2024, 1, 1, 5)), (1, dt.datetime(2024, 1, 3, 6)),
        (2, dt.datetime(2024, 1, 1, 9)), (3, dt.datetime(2024, 1, 2, 1)),
        (3, dt.datetime(2024, 1, 3, 2)),
    ], "u long, ts timestamp")
    got = {(str(r.cohort_period)[:10], r.age_periods):
           (r.n_active, r.n_cohort, r.retention_ppm)
           for r in cohort_retention_table(ev, "u", "ts", "day").collect()}
    assert got == {
        ("2024-01-01", 0): (2, 2, 1_000_000),
        ("2024-01-01", 2): (1, 2, 500_000),
        ("2024-01-02", 0): (1, 1, 1_000_000),
        ("2024-01-02", 1): (1, 1, 1_000_000),
    }


def test_cohort_retention_rejects_bad_granularity(spark):
    from aeon_mecha_spark.operators.analytics import cohort_retention_table

    df = spark.createDataFrame([(1,)], "u long")
    with pytest.raises(ValueError):
        cohort_retention_table(df, "u", "ts", "hour")


# -- HITS ----------------------------------------------------------------------


def _hits_ref(edges, iters=3, scale=1_000_000):
    nodes = sorted({x for e in edges for x in e})
    h = {n: scale for n in nodes}
    a = {}
    for _ in range(iters):
        raw = {}
        for s, d in edges:
            raw[d] = raw.get(d, 0) + h.get(s, 0)
        mx = max(raw.values(), default=0) or 1
        a = {n: raw.get(n, 0) * scale // mx for n in nodes}
        raw = {}
        for s, d in edges:
            raw[s] = raw.get(s, 0) + a.get(d, 0)
        mx = max(raw.values(), default=0) or 1
        h = {n: raw.get(n, 0) * scale // mx for n in nodes}
    return {n: (h[n], a[n]) for n in nodes}


def test_hits_matches_exact_mirror(spark):
    from aeon_mecha_spark.operators.graph import hits_int
    from aeon_mecha_spark.util import release_cached

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
             ("a", "c")]  # duplicate edge counts with multiplicity
    df = spark.createDataFrame(edges, "src string, dst string")
    out = hits_int(df, iters=3)
    got = {r.node: (r.hub_score, r.auth_score) for r in out.collect()}
    assert got == _hits_ref(edges, iters=3)
    release_cached(out)


def test_hits_star_graph_extremes(spark):
    from aeon_mecha_spark.operators.graph import hits_int
    from aeon_mecha_spark.util import release_cached

    # star: everyone points at z -> z is THE authority with no hub
    # score; all spokes are maximal hubs
    edges = [(s, "z") for s in ("a", "b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = hits_int(df, iters=2)
    got = {r.node: (r.hub_score, r.auth_score) for r in out.collect()}
    assert got["z"] == (0, 1_000_000)
    assert all(got[s] == (1_000_000, 0) for s in ("a", "b", "c"))
    release_cached(out)


def test_hits_plan_stays_linear_in_iters(spark):
    import contextlib
    import io
    import re

    from aeon_mecha_spark.operators.graph import hits_int
    from aeon_mecha_spark.util import release_cached

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = hits_int(df, iters=6)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    n_nodes = len(set(re.findall(r"\((\d+)\)", plan)))
    # ~63 plan nodes per round, linear — the 2^iters lineage unroll
    # this guards against would be in the thousands by 6 rounds
    assert n_nodes <= 80 * 6
    assert "InMemoryTableScan" in plan
    release_cached(out)


# -- odds ratio ----------------------------------------------------------------


def test_odds_ratio_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import odds_ratio_by_group

    rows = ([("k", 1, 1)] * 30 + [("k", 1, 0)] * 10
            + [("k", 0, 1)] * 15 + [("k", 0, 0)] * 45)
    df = spark.createDataFrame(rows, "k string, e int, y int")
    r = odds_ratio_by_group(df, ["k"], F.col("e") == 1, F.col("y") == 1).collect()[0]
    num, den = (2 * 30 + 1) * (2 * 45 + 1), (2 * 10 + 1) * (2 * 15 + 1)
    assert (r.a, r.b, r.c, r.d) == (30, 10, 15, 45)
    assert r.or_ppm == num * 1_000_000 // den
    assert r.ln_or_unat == math.floor(math.log(num / den) * 1e6 + 0.5)


def test_odds_ratio_empty_cells_never_divide_by_zero(spark):
    from aeon_mecha_spark.operators.analytics import odds_ratio_by_group

    rows = [("k", 1, 1)] * 5  # only the a cell is populated
    df = spark.createDataFrame(rows, "k string, e int, y int")
    r = odds_ratio_by_group(df, ["k"], F.col("e") == 1, F.col("y") == 1).collect()[0]
    assert (r.b, r.c, r.d) == (0, 0, 0)
    assert r.or_ppm == 11 * 1 * 1_000_000 // 1  # (2*5+1)(1)/(1)(1)


# -- G-test --------------------------------------------------------------------


def test_g_test_matches_float_reference_within_cell_floors(spark):
    from aeon_mecha_spark.operators.analytics import g_test_cells

    cells = [("x", "p", 8), ("x", "q", 2), ("y", "p", 3), ("y", "q", 7)]
    rows = [(a, b) for a, b, n in cells for _ in range(n)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = sum(r.g_term_unat for r in g_test_cells(df, "a", "b").collect())
    true_g = 2 * sum(
        o * math.log(o * 20 / (rt * ct))
        for o, rt, ct in [(8, 10, 11), (2, 10, 9), (3, 10, 11), (7, 10, 9)]
    )
    assert abs(got / 1e6 - true_g) < 4 * 2 * 8 / 1e6 + 1e-9  # per-cell floor bound


def test_g_test_independence_is_near_zero(spark):
    from aeon_mecha_spark.operators.analytics import g_test_cells

    rows = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = sum(r.g_term_unat for r in g_test_cells(df, "a", "b").collect())
    assert got == 0  # perfectly independent: every ratio is exactly 1


# -- Theil ---------------------------------------------------------------------


def test_theil_equal_distribution_is_zero(spark):
    from aeon_mecha_spark.operators.analytics import theil_index

    df = spark.createDataFrame([("k", 10)] * 5, "k string, v long")
    assert theil_index(df, ["k"], "v").collect()[0].theil_unat == 0


def test_theil_matches_float_reference(spark):
    from aeon_mecha_spark.operators.analytics import theil_index

    vals = [100, 1, 1, 1]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    r = theil_index(df, ["k"], "v").collect()[0]
    S = sum(vals)
    mirror = sum(
        x * math.floor(math.log(x * len(vals) / S) * 1e6 + 0.5) for x in vals
    )
    sign = (mirror > 0) - (mirror < 0)
    assert r.theil_unat == sign * (abs(mirror) // S)
    assert r.sum_value == S


def test_theil_excludes_nonpositive_rows(spark):
    from aeon_mecha_spark.operators.analytics import theil_index

    df = spark.createDataFrame(
        [("k", 10), ("k", 10), ("k", 0), ("k", -5)], "k string, v long"
    )
    r = theil_index(df, ["k"], "v").collect()[0]
    assert (r.n, r.theil_unat) == (2, 0)


# -- burstiness ----------------------------------------------------------------


def test_burstiness_paced_stream_is_zero(spark):
    import datetime as dt

    from aeon_mecha_spark.operators.analytics import burstiness_by_group

    base = dt.datetime(2024, 1, 1)
    rows = [("k", base + dt.timedelta(seconds=10 * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    r = burstiness_by_group(df, ["k"], "ts").collect()[0]
    assert (r.n_gaps, r.mean_gap_us, r.fano_ppm) == (4, 10_000_000, 0)


def test_burstiness_exact_mirror(spark):
    import datetime as dt

    from aeon_mecha_spark.operators.analytics import burstiness_by_group

    secs = [0, 1, 2, 3, 100]
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", base + dt.timedelta(seconds=s)) for s in secs],
        "k string, ts timestamp",
    )
    r = burstiness_by_group(df, ["k"], "ts").collect()[0]
    g = [(b - a) * 1_000_000 for a, b in zip(secs, secs[1:])]
    m, S, SS = len(g), sum(g), sum(x * x for x in g)
    assert r.fano_ppm == ((m * SS - S * S) * 1_000_000) // ((m - 1) * S)


def test_burstiness_single_event_key_is_absent(spark):
    import datetime as dt

    from aeon_mecha_spark.operators.analytics import burstiness_by_group

    df = spark.createDataFrame(
        [("solo", dt.datetime(2024, 1, 1))], "k string, ts timestamp"
    )
    assert burstiness_by_group(df, ["k"], "ts").count() == 0


# -- exact integer sqrt edge cases ----------------------------------------------


def test_exact_isqrt_boundary_values(spark):
    """The double-seed + 2-Newton-step + clamp construction must be
    EXACT at the values where a float sqrt seed is least trustworthy:
    perfect squares ±1, just past 2^53 (doubles lose integer
    resolution), and the 10^26 Wilson-bound magnitude."""
    from aeon_mecha_spark.operators.analytics import _with_exact_isqrt

    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17,
            2**53 - 1, 2**53, 2**53 + 1,
            (10**13 - 1) ** 2, (10**13) ** 2 - 1, (10**13) ** 2,
            10**26, 10**26 + 10**13]
    from decimal import Decimal

    df = spark.createDataFrame([(Decimal(v),) for v in vals], "r decimal(38,0)")
    out = _with_exact_isqrt(df, "r", "s").select("r", "s").collect()
    for row in out:
        assert int(row.s) == math.isqrt(int(row.r)), f"isqrt({row.r})"


# -- containment ----------------------------------------------------------------


def test_containment_short_doc_inside_long(spark):
    from aeon_mecha_spark.datapipe.dedup import ngram_containment

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f g h i j k l")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = ngram_containment(docs, pairs, k=3).collect()[0]
    # doc1 has 2 distinct 3-shingles, both inside doc2's 10
    assert (r.n_common, r.n_a, r.n_b) == (2, 2, 10)
    assert r.containment_a_ppm == 1_000_000  # fully contained
    assert r.containment_b_ppm == 200_000
    assert r.containment_max_ppm == 1_000_000


def test_containment_disjoint_is_zero(spark):
    from aeon_mecha_spark.datapipe.dedup import ngram_containment

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z w")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = ngram_containment(docs, pairs, k=3).collect()[0]
    assert (r.n_common, r.containment_max_ppm) == (0, 0)


# -- RBO -------------------------------------------------------------------------


def test_rbo_identical_rankings_hit_weight_total(spark):
    from aeon_mecha_spark.operators.analytics import (
        rbo_by_group,
        rbo_weights_micro,
    )

    ra = spark.createDataFrame(
        [("q", f"i{r}", r) for r in range(1, 11)], "k string, item string, rank int"
    )
    out = rbo_by_group(ra, ra, ["k"], "item", "rank", k=10, p=0.9).collect()[0]
    w = rbo_weights_micro(10, 0.9)
    assert out.rbo_micro == sum(w[r - 1] for r in range(1, 11))
    assert out.n_common == 10


def test_rbo_disjoint_rankings_are_zero(spark):
    from aeon_mecha_spark.operators.analytics import rbo_by_group

    ra = spark.createDataFrame(
        [("q", f"a{r}", r) for r in range(1, 6)], "k string, item string, rank int"
    )
    rb = spark.createDataFrame(
        [("q", f"b{r}", r) for r in range(1, 6)], "k string, item string, rank int"
    )
    assert rbo_by_group(ra, rb, ["k"], "item", "rank", k=5).count() == 0


def test_rbo_head_agreement_outweighs_tail(spark):
    from aeon_mecha_spark.operators.analytics import rbo_by_group

    base = [(f"i{r}", r) for r in range(1, 11)]
    ra = spark.createDataFrame([("q", i, r) for i, r in base],
                               "k string, item string, rank int")
    # swap ranks 1<->2 vs swap 9<->10: head swap must cost more
    def swapped(x, y):
        m = dict(base)
        m[f"i{x}"], m[f"i{y}"] = y, x
        return spark.createDataFrame([("q", i, r) for i, r in m.items()],
                                     "k string, item string, rank int")
    head = rbo_by_group(ra, swapped(1, 2), ["k"], "item", "rank", k=10).collect()[0]
    tail = rbo_by_group(ra, swapped(9, 10), ["k"], "item", "rank", k=10).collect()[0]
    assert head.rbo_micro < tail.rbo_micro


# -- OLS2 ------------------------------------------------------------------------


def test_ols2_recovers_exact_plane(spark):
    from aeon_mecha_spark.operators.analytics import ols2_by_group

    rows = [("k", x1, x2, 5 + 2 * x1 - 3 * x2)
            for x1 in range(6) for x2 in range(6)]
    df = spark.createDataFrame(rows, "k string, x1 long, x2 long, y long")
    r = ols2_by_group(df, ["k"], "x1", "x2", "y").collect()[0]
    assert (r.b0_milli, r.b1_milli, r.b2_milli) == (5000, 2000, -3000)


def test_ols2_collinear_is_null(spark):
    from aeon_mecha_spark.operators.analytics import ols2_by_group

    rows = [("k", x, 2 * x, x + 1) for x in range(8)]  # x2 = 2*x1
    df = spark.createDataFrame(rows, "k string, x1 long, x2 long, y long")
    r = ols2_by_group(df, ["k"], "x1", "x2", "y").collect()[0]
    assert r.b0_milli is None and r.b1_milli is None and r.b2_milli is None


# -- MASE ------------------------------------------------------------------------


def test_mase_linear_series_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import mase_by_group

    rows = [("k", i, i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    r = mase_by_group(df, ["k"], ["t"], "v", season=3).collect()[0]
    # |e1| = 1 x9; |e3| = 3 x7 -> (9*7*1e6) // (9*21) = 333333
    assert (r.n_naive, r.n_seasonal, r.mase_ppm) == (9, 7, 333_333)


def test_mase_short_series_is_null(spark):
    from aeon_mecha_spark.operators.analytics import mase_by_group

    rows = [("k", i, i * i) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    r = mase_by_group(df, ["k"], ["t"], "v", season=7).collect()[0]
    assert r.n_seasonal == 0 and r.mase_ppm is None


# -- diff-in-diff ----------------------------------------------------------------


def test_did_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import diff_in_diff

    rows = ([("k", 1, 0, 100)] * 4 + [("k", 1, 1, 110)] * 4
            + [("k", 0, 0, 50)] * 4 + [("k", 0, 1, 50)] * 4)
    df = spark.createDataFrame(rows, "k string, t int, p int, v long")
    r = diff_in_diff(df, ["k"], F.col("t") == 1, F.col("p") == 1, "v").collect()[0]
    assert r.did_micro == 10_000_000
    assert (r.n_t0, r.n_t1, r.n_c0, r.n_c1) == (4, 4, 4, 4)


def test_did_missing_cell_is_null(spark):
    from aeon_mecha_spark.operators.analytics import diff_in_diff

    rows = [("k", 1, 1, 10)] * 3 + [("k", 0, 0, 5)] * 3  # no t0/c1 cells
    df = spark.createDataFrame(rows, "k string, t int, p int, v long")
    r = diff_in_diff(df, ["k"], F.col("t") == 1, F.col("p") == 1, "v").collect()[0]
    assert r.did_micro is None


# -- PR curve ------------------------------------------------------------------


def test_pr_points_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import pr_points
    from aeon_mecha_spark.util import release_cached

    rows = [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = pr_points(df, F.col("y") == 1, "s")
    got = {r.score: (r.n_ge, r.precision_ppm, r.recall_ppm) for r in out.collect()}
    assert got == {
        4.0: (1, 1_000_000, 500_000),
        3.0: (2, 500_000, 500_000),
        2.0: (3, 666_666, 1_000_000),
        1.0: (4, 500_000, 1_000_000),
    }
    release_cached(out)


def test_pr_matches_single_window_formulation(spark):
    from pyspark.sql import Window as W

    from aeon_mecha_spark.operators.analytics import pr_points
    from aeon_mecha_spark.util import release_cached

    rows = [(float(i % 29) + (i % 2) * 0.5, 1 if i % 4 == 0 else 0)
            for i in range(300)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = pr_points(df, F.col("y") == 1, "s", score_buckets=8)
    got = sorted((r.score, r.n_ge, r.precision_ppm, r.recall_ppm)
                 for r in out.collect())
    g = df.groupBy("s").agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("p"))
    w = W.orderBy(F.col("s").desc()).rowsBetween(W.unboundedPreceding, 0)
    pt = g.agg(F.sum("p")).collect()[0][0]
    naive = sorted(
        (r[0], r[1], r[2], r[3])
        for r in g.withColumn("cumn", F.sum("n").over(w))
        .withColumn("cump", F.sum("p").over(w))
        .select(
            "s",
            "cumn",
            F.expr("CAST((CAST(cump AS DECIMAL(38,0)) * 1000000) div cumn AS BIGINT)"),
            F.expr(f"CAST((CAST(cump AS DECIMAL(38,0)) * 1000000) div {pt} AS BIGINT)"),
        )
        .collect()
    )
    assert got == naive
    release_cached(out)


# -- Lorenz --------------------------------------------------------------------


def test_lorenz_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import lorenz_points
    from aeon_mecha_spark.util import release_cached

    df = spark.createDataFrame([(1,), (1,), (2,), (6,)], "v long")
    out = lorenz_points(df, "v")
    got = [(r.value, r.n_le, r.cum_pop_ppm, r.cum_value_ppm)
           for r in out.collect()]
    assert got == [(1, 2, 500_000, 200_000), (2, 3, 750_000, 400_000),
                   (6, 4, 1_000_000, 1_000_000)]
    release_cached(out)


def test_lorenz_equality_tracks_diagonal(spark):
    from aeon_mecha_spark.operators.analytics import lorenz_points
    from aeon_mecha_spark.util import release_cached

    df = spark.createDataFrame([(7,)] * 10, "v long")
    out = lorenz_points(df, "v")
    r = out.collect()[0]
    assert (r.cum_pop_ppm, r.cum_value_ppm) == (1_000_000, 1_000_000)
    release_cached(out)


# -- Nelson-Aalen ----------------------------------------------------------------


def test_nelson_aalen_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import nelson_aalen

    rows = [("g", 5, 1), ("g", 5, 0), ("g", 8, 1), ("g", 8, 1),
            ("g", 10, 0), ("g", 12, 1)]
    df = spark.createDataFrame(rows, "k string, dur int, e int")
    got = {r.t: (r.n_risk, r.d, r.cumhaz_ppm)
           for r in nelson_aalen(df, ["k"], "dur", F.col("e") == 1).collect()}
    assert got == {
        5: (6, 1, 166_666),                 # 1/6
        8: (4, 2, 166_666 + 500_000),       # + 2/4
        12: (1, 1, 666_666 + 1_000_000),    # + 1/1
    }


# -- log-rank --------------------------------------------------------------------


def test_logrank_hand_computed(spark):
    from aeon_mecha_spark.operators.analytics import logrank_test

    # A events at t=1,2 (A also censored at 5); B events at 3,4,
    # B censored at 6
    rows = [("k", 1, 1, 1), ("k", 2, 1, 1), ("k", 3, 1, 0),
            ("k", 4, 1, 0), ("k", 5, 0, 1), ("k", 6, 0, 0)]
    df = spark.createDataFrame(rows, "k string, dur int, e int, a int")
    r = logrank_test(df, ["k"], "dur", F.col("e") == 1, F.col("a") == 1).collect()[0]
    assert (r.n_times, r.o_a) == (4, 2)
    # E = 3/6 + 2/5 + 1/4 + 1/3 floored per time in micro
    assert r.e_a_micro == 500_000 + 400_000 + 250_000 + 333_333
    # V terms: d=1 each -> na*(n-na)*(n-1) / (n^2*(n-1)) = na*(n-na)/n^2
    v = ((3 * 3 * 5 * 1_000_000) // (6 * 6 * 5)
         + (2 * 3 * 4 * 1_000_000) // (5 * 5 * 4)
         + (1 * 3 * 3 * 1_000_000) // (4 * 4 * 3)
         + (1 * 2 * 2 * 1_000_000) // (3 * 3 * 2))
    assert r.v_micro == v


def test_logrank_identical_arms_zero_excess(spark):
    from aeon_mecha_spark.operators.analytics import logrank_test

    # perfectly mirrored arms: O_A should equal ~E_A
    rows = [("k", t, 1, a) for t in (1, 2, 3, 4) for a in (0, 1)]
    df = spark.createDataFrame(rows, "k string, dur int, e int, a int")
    r = logrank_test(df, ["k"], "dur", F.col("e") == 1, F.col("a") == 1).collect()[0]
    assert r.o_a == 4
    assert abs(r.o_a * 1_000_000 - r.e_a_micro) <= 4  # floor slack only


# -- Cramer's V ------------------------------------------------------------------


def test_cramers_v_extremes(spark):
    from aeon_mecha_spark.operators.analytics import cramers_v

    perfect = spark.createDataFrame(
        [("x", "p")] * 10 + [("y", "q")] * 10, "a string, b string"
    )
    r = cramers_v(perfect, "a", "b").collect()[0]
    assert r.v_ppm == 1_000_000
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string",
    )
    r2 = cramers_v(indep, "a", "b").collect()[0]
    assert (r2.chi2_ppm, r2.v_ppm) == (0, 0)
