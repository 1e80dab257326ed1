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
