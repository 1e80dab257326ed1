"""Round-9 tests: ADVICE fixes (hits validation, bh_select NULL rows,
quantile_map tie determinism, non-numeric fallback), the shared
two-level grain-prefix helper and its cardinality-adaptive fast path,
and the de-serialized rank statistics (spearman / mann-whitney /
kruskal-wallis on the distinct-value grain)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ADVICE

def test_hits_rejects_zero_iters(spark):
    from aeon_mecha_spark.operators.graph import hits_int

    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    with pytest.raises(ValueError, match="iters"):
        hits_int(df, iters=0)


def test_bh_select_keeps_null_p_rows(spark):
    from aeon_mecha_spark.operators.analytics import bh_select

    rows = [(1, 100), (2, 900_000), (3, None), (4, 50)]
    df = spark.createDataFrame(rows, "id int, p bigint")
    out = bh_select(df, "p", alpha_num=5, alpha_den=100).collect()
    assert len(out) == 4  # NULL-p row retained
    by_id = {r["id"]: r for r in out}
    assert by_id[3]["bh_rejected"] is False
    # the m used for the test excludes the NULL row: with m=3 the two
    # small p's pass (100 <= (1/3)*50000ppm etc.)
    assert by_id[1]["bh_rejected"] and by_id[4]["bh_rejected"]
    assert not by_id[2]["bh_rejected"]


# ------------------------------------------------- grain-prefix helper

def _lift_rows(spark, scores_labels, **kw):
    from aeon_mecha_spark.operators.analytics import lift_table
    from aeon_mecha_spark.util import release_cached

    df = spark.createDataFrame(scores_labels, "s double, y int")
    out = lift_table(df, F.col("y") == 1, "s", **kw)
    rows = [r.asDict() for r in out.collect()]
    release_cached(out)
    return rows


def test_lift_table_paths_identical(spark):
    data = [(float(i % 17) / 4.0, 1 if (i * 7) % 3 == 0 else 0) for i in range(300)]
    fast = _lift_rows(spark, data, score_buckets=1024)   # 17 distinct <= 1024
    slow = _lift_rows(spark, data, score_buckets=2)      # forced two-level
    assert sorted(map(tuple, (r.values() for r in fast))) == sorted(
        map(tuple, (r.values() for r in slow))
    )


def test_roc_pr_lorenz_paths_identical(spark):
    from aeon_mecha_spark.operators.analytics import (
        lorenz_points,
        pr_points,
        roc_points,
    )
    from aeon_mecha_spark.util import release_cached

    df = spark.createDataFrame(
        [(float(i % 23), 1 if (i * 5) % 4 == 0 else 0, (i * 13) % 97)
         for i in range(400)],
        "s double, y int, v long",
    )
    for fn, col in ((roc_points, "s"), (pr_points, "s")):
        a = fn(df, F.col("y") == 1, col, score_buckets=4096)
        b = fn(df, F.col("y") == 1, col, score_buckets=3)
        ra, rb = (sorted(map(tuple, x.collect())) for x in (a, b))
        release_cached(a)
        release_cached(b)
        assert ra == rb, fn.__name__
    a = lorenz_points(df, "v", value_buckets=4096)
    b = lorenz_points(df, "v", value_buckets=3)
    ra, rb = (sorted(map(tuple, x.collect())) for x in (a, b))
    release_cached(a)
    release_cached(b)
    assert ra == rb


def test_curve_ops_reject_non_numeric_scores(spark):
    # ADVICE: a string score column casts non-monotonically ('10' < '9')
    # — the grain helper must fall back to the single-window path, not
    # silently corrupt the cumulative sums
    from aeon_mecha_spark.operators.analytics import roc_points
    from aeon_mecha_spark.util import release_cached

    rows = [(str(i), 1 if i % 2 == 0 else 0) for i in range(1, 15)]
    df = spark.createDataFrame(rows, "s string, y int")
    out = roc_points(df, F.col("y") == 1, "s", score_buckets=3)
    got = {r["score"]: r["n_ge"] for r in out.collect()}
    # string order: '9' is the maximum, so n_ge('9') == 1
    assert got["9"] == 1
    # full sweep ends at 14 rows regardless of order
    assert max(got.values()) == 14
    release_cached(out)


def test_quantile_map_tie_break_is_min_ref_value(spark):
    # ADVICE (medium): two distinct reference values sharing one cdf_ppm
    # must map to the MINIMUM (type-1 'min u' convention), regardless of
    # row order. Construct a collision: ref group with ties so two
    # values share a cdf boundary at ppm resolution is hard at small n,
    # so instead verify the pre-reduced refs path: duplicate values at
    # one cdf are impossible, but equal-cdf ties resolve deterministically
    # across repeated runs and partition counts.
    from aeon_mecha_spark.operators.analytics import quantile_map
    from aeon_mecha_spark.util import release_cached

    rows = [("ref", float(v)) for v in range(1, 101)] + [
        ("q", float(v) * 2.0) for v in range(1, 51)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    outs = []
    for parts in (7, 32):
        out = quantile_map(
            df.repartition(parts), "g", "v", "ref", value_buckets=8, ppm_buckets=8
        )
        outs.append(sorted(map(tuple, out.collect())))
        release_cached(out)
    assert outs[0] == outs[1]
    # type-1 inverse CDF: a query at cdf c maps to min{u: cdf_ref(u) >= c}
    m = {(g, v): mv for g, v, p, mv in outs[0]}
    assert m[("q", 2.0)] == 2.0  # cdf_q(2)=20000ppm -> ref value 2
    assert m[("q", 100.0)] == 100.0


# ------------------------------------------- de-serialized rank stats

def _spearman_py(pairs):
    """Exact doubled-rank Spearman mirror (ints, floor isqrt)."""
    def dranks(vals):
        s = sorted(vals)
        first = {}
        cnt = {}
        for i, v in enumerate(s):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        return {v: 2 * first[v] + cnt[v] - 1 for v in first}

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    dx_, dy_ = dranks(xs), dranks(ys)
    drx = [dx_[x] for x in xs]
    dry = [dy_[y] for y in ys]
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
    den = math.isqrt(dx) * math.isqrt(dy)
    v = abs(num) * 1_000_000 // den
    return (1 if num >= 0 else -1) * min(1_000_000, v)


def test_spearman_matches_python_mirror(spark):
    from aeon_mecha_spark.operators.analytics import spearman_by_group

    pairs = [((i * 17) % 29, ((i * 17) % 29) * 3 + (i % 7)) for i in range(200)]
    rows = [("k", float(x), float(y)) for x, y in pairs]
    # second key: anti-correlated with heavy ties
    pairs2 = [((i % 10), -(i % 10) + (1 if i % 4 == 0 else 0)) for i in range(120)]
    rows += [("j", float(x), float(y)) for x, y in pairs2]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in spearman_by_group(df, ["k"], "x", "y").collect()}
    assert out["k"]["rho_ppm"] == _spearman_py(pairs)
    assert out["j"]["rho_ppm"] == _spearman_py(pairs2)
    assert out["k"]["n"] == 200 and out["j"]["n"] == 120


def test_spearman_perfect_and_constant(spark):
    from aeon_mecha_spark.operators.analytics import spearman_by_group

    rows = [("a", float(i), float(2 * i)) for i in range(50)]
    rows += [("c", float(i), 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r["rho_ppm"] for r in spearman_by_group(df, ["k"], "x", "y").collect()}
    assert out["a"] == 1_000_000
    assert out["c"] is None


def test_mann_whitney_grain_identities(spark):
    from aeon_mecha_spark.operators.analytics import mann_whitney_u

    rows = [("k", float(i % 13), i % 3 == 0) for i in range(150)]
    df = spark.createDataFrame(rows, "k string, v double, a boolean")
    r = mann_whitney_u(df, ["k"], "v", F.col("a")).collect()[0]
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]
    assert r["n_a"] == 50 and r["n_b"] == 100


def test_kruskal_wallis_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import kruskal_wallis

    # scipy-checkable case without ties: groups [1,2,3],[4,5,6],[7,8,9]
    rows = [("k", float(v), g) for g, vs in
            (("a", [1, 2, 3]), ("b", [4, 5, 6]), ("c", [7, 8, 9]))
            for v in vs]
    df = spark.createDataFrame(rows, "k string, v double, g string")
    r = kruskal_wallis(df, ["k"], "v", "g").collect()[0]
    # H = 12/(9*10) * (6^2+15^2+24^2)/3 - 3*10 = 7.2; per-group floors
    assert r["h_milli"] == 7200 or 7197 <= r["h_milli"] <= 7200
    assert r["tie_ppm"] == 1_000_000
    assert r["n"] == 9 and r["n_groups"] == 3


def test_rank_ops_partition_invariant(spark):
    from aeon_mecha_spark.operators.analytics import (
        kruskal_wallis,
        mann_whitney_u,
        spearman_by_group,
    )

    rows = [
        ("k%d" % (i % 3), float((i * 7) % 19), float((i * 11) % 23), "g%d" % (i % 4))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double, g string")
    for parts in (3, 17):
        d = df.repartition(parts)
        s = sorted(map(tuple, spearman_by_group(d, ["k"], "x", "y").collect()))
        u = sorted(map(tuple, mann_whitney_u(d, ["k"], "x", F.col("g") == "g0").collect()))
        kw = sorted(map(tuple, kruskal_wallis(d, ["k"], "x", "g").collect()))
        if parts == 3:
            base = (s, u, kw)
        else:
            assert (s, u, kw) == base


def test_trimmed_mean_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import trimmed_mean
    from aeon_mecha_spark.util import release_cached

    # n=10, 10% per tail -> k=1: drop one 0 and one 100 -> mean of
    # [1..8] = 4.5 -> 4500 milli
    rows = [("k", v) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 100]]
    df = spark.createDataFrame(rows, "k string, v long")
    out = trimmed_mean(df, ["k"], "v", trim_ppm=100_000)
    r = out.collect()[0]
    release_cached(out)
    assert (r["n"], r["n_kept"], r["trimmed_mean_milli"]) == (10, 8, 4500)


def test_trimmed_mean_matches_python_mirror(spark):
    import random

    from aeon_mecha_spark.operators.analytics import trimmed_mean
    from aeon_mecha_spark.util import release_cached

    rng = random.Random(42)
    rows = [("k%d" % (i % 2), rng.randint(-500, 500)) for i in range(337)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = trimmed_mean(df, ["k"], "v", trim_ppm=50_000, value_buckets=8)
    got = {r["k"]: r for r in out.collect()}
    release_cached(out)
    for key in ("k0", "k1"):
        vals = sorted(v for k, v in rows if k == key)
        n = len(vals)
        kk = n * 50_000 // 1_000_000
        kept = vals[kk : n - kk]
        ts = sum(kept)
        exp = (1 if ts >= 0 else -1) * (abs(ts) * 1000 // len(kept))
        assert got[key]["n"] == n and got[key]["n_kept"] == n - 2 * kk
        assert got[key]["trimmed_mean_milli"] == exp, key


def test_trimmed_mean_rejects_half_trim(spark):
    from aeon_mecha_spark.operators.analytics import trimmed_mean

    df = spark.createDataFrame([("k", 1)], "k string, v long")
    with pytest.raises(ValueError, match="trim_ppm"):
        trimmed_mean(df, ["k"], "v", trim_ppm=500_000)


# --------------------------------------------------- PNG decode (S17)

def test_png_roundtrip_all_filters_and_colortypes():
    import numpy as np

    from aeon_mecha_spark.datapipe.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for channels in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(9, 7, channels), dtype=np.uint8)
        for filters in (None, [1] * 9, [2] * 9, [3] * 9, [4] * 9,
                        [0, 1, 2, 3, 4, 3, 2, 1, 0]):
            enc = encode_png(img, filters=filters)
            out = decode_png(enc)
            np.testing.assert_array_equal(out, img), (channels, filters)


def test_png_decoder_guards():
    import numpy as np
    import pytest as _pytest

    from aeon_mecha_spark.datapipe.multimodal import decode_png, encode_png

    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    enc = bytearray(encode_png(img))
    # IHDR data starts at offset 16; bit depth is byte 8 of IHDR data.
    # A raw mutation now trips the CRC check first (round 10) …
    corrupt = bytearray(enc)
    corrupt[16 + 8] = 16
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    # … so re-sign the chunk to reach the depth guard itself
    import struct as _struct
    import zlib as _zlib

    enc[16 + 8] = 16
    crc = _zlib.crc32(b"IHDR" + bytes(enc[16 : 16 + 13])) & 0xFFFFFFFF
    enc[16 + 13 : 16 + 17] = _struct.pack(">I", crc)
    with _pytest.raises(NotImplementedError, match="depth"):
        decode_png(bytes(enc))
    # tRNS transparency is an explicit unsupported subset, not a silent
    # opaque decode: splice a signed tRNS chunk before IDAT
    base = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    ihdr_end = 16 + 13 + 4
    trns_data = b"\x00\x00\x00\x00\x00\x00"
    trns = (
        _struct.pack(">I", len(trns_data))
        + b"tRNS"
        + trns_data
        + _struct.pack(">I", _zlib.crc32(b"tRNS" + trns_data) & 0xFFFFFFFF)
    )
    spliced = base[:ihdr_end] + trns + base[ihdr_end:]
    with _pytest.raises(NotImplementedError, match="tRNS"):
        decode_png(spliced)


def test_decode_images_distributed(spark):
    import numpy as np

    from aeon_mecha_spark.datapipe.multimodal import decode_images, encode_png

    rng = np.random.default_rng(11)
    rows = []
    expected = {}
    for mid in range(6):
        img = rng.integers(0, 256, size=(8 + mid, 5, 3), dtype=np.uint8)
        rows.append((mid, "image", 5, 8 + mid, 0, bytearray(encode_png(img))))
        expected[mid] = (5, 8 + mid, 3, int(img.astype(np.int64).sum()))
    media = spark.createDataFrame(
        rows,
        "media_id bigint, modality string, width int, height int, "
        "duration_ms int, payload binary",
    )
    got = {r["media_id"]: r for r in decode_images(media).collect()}
    for mid, (w, h, c, s) in expected.items():
        r = got[mid]
        assert (r["width"], r["height"], r["channels"], r["pixel_sum"]) == (w, h, c, s)
