"""Seeded fuzz tier for the classical-test operators: random small
frames (ties, empty groups, negatives, degenerate shapes) checked
against exact Fraction/brute-force Python mirrors — the composition
space the hand-picked gate datasets can't enumerate.

Each operator's mirror recomputes the EXACT integer convention (floors,
doubled ranks, sign·abs divisions), so any drift — not just gross bugs —
fails. 12 seeds per operator keep the tier under a minute; crank
FUZZ_STATS_SEEDS for a nightly deep run.
"""

from __future__ import annotations

import math
import os
from collections import Counter
from fractions import Fraction

import numpy as np
import pytest

from pyspark.sql import Row, functions as F

SEEDS = int(os.environ.get("FUZZ_STATS_SEEDS", "12"))


def _frame(rng, n, v_lo=-5, v_hi=8, k_groups=3):
    rows = [
        Row(
            g=chr(65 + int(rng.integers(0, k_groups))),
            v=float(int(rng.integers(v_lo, v_hi))),
            b=int(rng.integers(0, 6)),
        )
        for _ in range(n)
    ]
    return rows


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_welch_t2(spark, seed):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(1000 + seed)
    rows = _frame(rng, int(rng.integers(4, 60)), k_groups=2)
    df = spark.createDataFrame(rows)
    out = analytics.welch_t2(df, [], "v", F.col("g") == "A").collect()[0]
    a = [r.v for r in rows if r.g == "A"]
    b = [r.v for r in rows if r.g == "B"]
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    if len(a) < 2 or len(b) < 2:
        assert out["t2_micro"] is None
        return
    va = np.var(a, ddof=1)
    vb = np.var(b, ddof=1)
    se2 = va / len(a) + vb / len(b)
    if se2 <= 0:
        assert out["t2_micro"] is None
        return
    t2 = (np.mean(a) - np.mean(b)) ** 2 / se2
    assert abs(out["t2_micro"] / 1e6 - t2) < 1e-3


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_kendall_tau(spark, seed):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(3, 80))
    xy = [(int(rng.integers(0, 5)), int(rng.integers(-3, 4))) for _ in range(n)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in xy])
    out = analytics.kendall_tau(df, [], "x", "y").collect()[0]
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (xy[j][0] - xy[i][0]) * (xy[j][1] - xy[i][1])
            c += p > 0
            d += p < 0
    assert out["conc"] == c and out["disc"] == d
    t0 = n * (n - 1) // 2
    tx = sum(v * (v - 1) // 2 for v in Counter(x for x, _ in xy).values())
    ty = sum(v * (v - 1) // 2 for v in Counter(y for _, y in xy).values())
    rad = (t0 - tx) * (t0 - ty)
    if rad == 0:
        assert out["tau_b_ppm"] is None
        return
    den = math.isqrt(rad)
    expect = (1 if c > d else -1 if c < d else 0) * min(
        10**6, abs(c - d) * 10**6 // den
    )
    assert out["tau_b_ppm"] == expect
    if c + d:
        g = (1 if c > d else -1 if c < d else 0) * (abs(c - d) * 10**6 // (c + d))
        assert out["gamma_ppm"] == g


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_mood_median(spark, seed):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(3000 + seed)
    rows = _frame(rng, int(rng.integers(6, 80)))
    df = spark.createDataFrame(rows)
    res = analytics.mood_median(df, [], "v", "g").collect()
    vals = sorted(r.v for r in rows)
    med = vals[(len(vals) + 1) // 2 - 1]
    cells = {}
    for r in rows:
        if r.v == med:
            continue
        a, b = cells.get(r.g, (0, 0))
        cells[r.g] = (a + (r.v > med), b + (r.v < med))
    if not cells:
        assert res == [] or res[0]["n"] == 0
        return
    out = res[0]
    ta = sum(a for a, _ in cells.values())
    tb = sum(b for _, b in cells.values())
    nn = ta + tb
    chi = 0
    for a, b in cells.values():
        ng = a + b
        if nn > 0 and ng > 0 and ta > 0:
            chi += (a * nn - ng * ta) ** 2 * 10**6 // (nn * ng * ta)
        if nn > 0 and ng > 0 and tb > 0:
            chi += (b * nn - ng * tb) ** 2 * 10**6 // (nn * ng * tb)
    assert out["k_groups"] == len(cells) and out["n"] == nn
    assert out["chi2_ppm"] == chi


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_friedman(spark, seed):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(4000 + seed)
    n_blocks = int(rng.integers(2, 10))
    k = int(rng.integers(2, 5))
    treatments = [chr(88 + j) for j in range(k)]  # X, Y, Z, ...
    rows, data = [], {}
    for b in range(n_blocks):
        for t in treatments:
            v = int(rng.integers(0, 4))  # heavy ties on purpose
            data[(b, t)] = v
            rows.append(Row(b=b, t=t, v=v))
    # one extra incomplete block must be ignored
    rows.append(Row(b=999, t=treatments[0], v=1))
    out = analytics.friedman(
        spark.createDataFrame(rows), [], "b", "t", "v"
    ).collect()[0]
    ranks = {t: Fraction(0) for t in treatments}
    dsq = Fraction(0)
    for b in range(n_blocks):
        vals = [data[(b, t)] for t in treatments]
        for t in treatments:
            v = data[(b, t)]
            lo = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            r = Fraction(2 * lo + ties + 1, 2)
            ranks[t] += r
            dsq += (r - Fraction(k + 1, 2)) ** 2
    assert out["k"] == k and out["n_blocks"] == n_blocks
    if dsq == 0:
        assert out["q_ppm"] is None
    else:
        num = sum(
            (ranks[t] - Fraction(n_blocks * (k + 1), 2)) ** 2 for t in treatments
        )
        q = Fraction(k - 1) * num / dsq
        # operator floors at ppm over the DOUBLED integers; the /2 of
        # ranks and /4 of both squares cancel, so the integer mirror is
        # floor((k-1) * 4*num * 1e6 / (4*dsq))
        num_i, den_i = 4 * num, 4 * dsq  # integer-valued Fractions
        assert num_i.denominator == 1 and den_i.denominator == 1
        expect = (k - 1) * num_i.numerator * 10**6 // den_i.numerator
        assert out["q_ppm"] == expect
        assert abs(out["q_ppm"] / 1e6 - float(q)) < 2e-6
    l2 = sum((i + 1) * 2 * ranks[t] for i, t in enumerate(sorted(treatments)))
    assert out["page_l2"] == int(l2)


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_runs_test(spark, seed):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(5000 + seed)
    n = int(rng.integers(4, 60))
    vals = [float(int(rng.integers(0, 6))) for _ in range(n)]
    rows = [Row(k="a", t=i, v=v) for i, v in enumerate(vals)]
    res = analytics.runs_test(
        spark.createDataFrame(rows), ["k"], ["t"], "v"
    ).collect()
    svals = sorted(vals)
    med = svals[(len(svals) + 1) // 2 - 1]
    signs = [1 if v > med else 0 for v in vals if v != med]
    if not signs:
        assert res == [] or res[0]["runs"] == 1  # degenerate: no rows
        return
    out = res[0]
    runs = 1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
    n1, n2 = sum(signs), len(signs) - sum(signs)
    assert (out["n1"], out["n2"], out["runs"]) == (n1, n2, runs)
    nn = n1 + n2
    var_num = 2 * n1 * n2 * (2 * n1 * n2 - nn)
    if n1 == 0 or n2 == 0 or var_num <= 0:
        assert out["z2_ppm"] is None
        return
    dev = runs * nn - 2 * n1 * n2 - nn
    expect = dev * dev * (nn - 1) * 10**6 // var_num
    assert out["z2_ppm"] == expect


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_anova_f_exact_integer_mirror(spark, seed):
    """Exact mirror of the floor-sum discipline (not a float
    approximation): per-group bg floors, ssb/ssw, sign·abs rescale and
    f/eta divisions replicated in Python ints — pins the pmod-exact
    decimal floor division end to end."""
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(6000 + seed)
    rows = _frame(rng, int(rng.integers(6, 120)), v_lo=-20, v_hi=900)
    df = spark.createDataFrame(rows)
    out = analytics.anova_f(df, [], "v", "g").collect()[0]
    groups = {}
    for r in rows:
        n, s, q = groups.get(r.g, (0, 0, 0))
        v = int(r.v)
        groups[r.g] = (n + 1, s + v, q + v * v)
    k = len(groups)
    n = sum(g[0] for g in groups.values())
    ts = sum(g[1] for g in groups.values())
    tq = sum(g[2] for g in groups.values())
    tbg = sum((s * s * 10**6) // gn for gn, s, _ in groups.values())
    ssb = tbg - (ts * ts * 10**6) // n
    ssw = tq * 10**6 - tbg

    def sgnabs(x, d):
        return (1 if x > 0 else -1 if x < 0 else 0) * (abs(x) // d)

    assert out["k_groups"] == k and out["n"] == n
    assert out["ssb_milli"] == sgnabs(ssb, 1000)
    assert out["ssw_milli"] == sgnabs(ssw, 1000)
    if k > 1 and n > k and ssw > 0:
        # mirror the 2^62-1 saturation guard for near-zero SSW
        sgn = 1 if ssb > 0 else -1 if ssb < 0 else 0
        quot = min((abs(ssb) * (n - k) * 10**6) // (ssw * (k - 1)), 2**62 - 1)
        assert out["f_ppm"] == sgn * quot
    else:
        assert out["f_ppm"] is None
    if ssb + ssw > 0:
        assert out["eta2_ppm"] == sgnabs(ssb * 10**6, ssb + ssw)


@pytest.mark.parametrize("seed", range(SEEDS))
def test_fuzz_cochran_armitage_exact_integer_mirror(spark, seed):
    from aeon_mecha_spark.operators import analytics

    rng = np.random.default_rng(7000 + seed)
    rows = [
        Row(s=int(rng.integers(0, 5)), y=int(rng.integers(0, 2)))
        for _ in range(int(rng.integers(4, 120)))
    ]
    out = analytics.cochran_armitage(
        spark.createDataFrame(rows), [], "s", F.col("y") == 1
    ).collect()[0]
    N = len(rows)
    P = sum(r.y for r in rows)
    sx = sum(r.s * r.y for r in rows)
    sn = sum(r.s for r in rows)
    ssn = sum(r.s * r.s for r in rows)
    assert out["n"] == N and out["n_pos"] == P
    den = P * (N - P) * (N * ssn - sn * sn)
    if 0 < P < N and N * ssn - sn * sn > 0:
        t = N * sx - P * sn
        assert out["z2_ppm"] == (t * t * N * 10**6) // den
    else:
        assert out["z2_ppm"] is None
