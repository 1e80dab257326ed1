"""Unit tests for datapipe/sketch.py, operators/skew.py, and
Table.upsert (pipeline/orchestrator.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aeon_mecha_spark.datapipe import sketch
from aeon_mecha_spark.operators.skew import salted_join
from aeon_mecha_spark.pipeline.orchestrator import Table


def test_kmv_exact_below_capacity(spark):
    rows = [("g", i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v int")
    r = sketch.kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert r["n_hashes"] == 10
    assert r["est_distinct"] == 10.0


def test_kmv_estimate_within_tolerance(spark):
    # 2000 distinct values, k=64 => relative error ~ 1/sqrt(k-2) ~ 13%
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = sketch.kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert r["n_hashes"] == 64
    assert abs(r["est_distinct"] - 2000) / 2000 < 0.4


def test_kmv_partition_invariant(spark):
    df = spark.range(500).select((F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v"))
    a = sketch.kmv_distinct(df.coalesce(1), "v", ["g"], k=16).collect()
    b = sketch.kmv_distinct(df.repartition(7), "v", ["g"], k=16).collect()
    assert {(r["g"], r["est_distinct"]) for r in a} == {
        (r["g"], r["est_distinct"]) for r in b
    }


def test_quantile_summary_interpolates(spark):
    df = spark.createDataFrame([("g", float(v)) for v in range(1, 5)], "g string, v double")
    r = sketch.quantile_summary(df, "v", ["g"], (0.5,)).collect()[0]
    assert r["q50"] == 2.5


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of left rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    plain = left.join(right, ["k"]).select("k", "lid", "rv")
    salted = salted_join(left, right, ["k"], salt_from=["lid"], salt=8).select("k", "lid", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched skewed rows exactly once
    right_sparse = right.filter(F.col("k") < 10)
    pl = left.join(right_sparse, ["k"], "left").select("k", "lid", "rv")
    sl = salted_join(left, right_sparse, ["k"], salt_from=["lid"], how="left", salt=8).select("k", "lid", "rv")
    assert sorted(map(tuple, pl.collect())) == sorted(map(tuple, sl.collect()))


def test_upsert_replaces_and_appends(spark, tmp_path):
    t = Table("t_upsert", pk=["k"], root=str(tmp_path))
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    t.insert(base)
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    n = t.upsert(incoming)
    assert n == 2
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_pivot_table_preserves_fractional_aggregates(spark):
    df = spark.createDataFrame([(1, "x", 2.5), (1, "x", 0.4)], "k int, t string, v double")
    out = analytics_pivot(spark, df)
    r = out.collect()[0]
    assert r["x"] == 2.9 and r["y"] == 0.0


def analytics_pivot(spark, df):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators.analytics import pivot_table

    return pivot_table(df, ["k"], "t", ["x", "y"], F.sum("v"))


def test_upsert_rejects_duplicate_incoming_pks(spark, tmp_path):
    import pytest

    t = Table("t_dupes", pk=["k"], root=str(tmp_path))
    t.insert(spark.createDataFrame([(1, "a")], "k int, v string"))
    dup = spark.createDataFrame([(2, "b"), (2, "c")], "k int, v string")
    with pytest.raises(ValueError, match="duplicate PK"):
        t.upsert(dup)


def test_salted_join_rejects_salt_collision(spark):
    import pytest

    df = spark.createDataFrame([(1, 0)], "k int, _salt int")
    other = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, other, ["k"], salt_from=["k"])


def test_quantile_labels_rounded(spark):
    from aeon_mecha_spark.datapipe.sketch import quantile_summary

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    out = quantile_summary(df, "v", ["g"], (0.57,))
    assert "q57" in out.columns


def test_kmv_merge_is_lossless(spark):
    """Merging per-bucket partials must equal sketching the raw union."""
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe.sketch import (
        kmv_distinct, kmv_estimate, kmv_merge, kmv_partial,
    )

    df = spark.range(3000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 24).alias("bucket"),
        (F.col("id") % 700).alias("v"),
    )
    direct = {
        r["g"]: (r["n_hashes"], r["est_distinct"])
        for r in kmv_distinct(df, "v", ["g"], k=16).collect()
    }
    partials = kmv_partial(df, "v", ["g", "bucket"], k=16)
    merged = kmv_estimate(kmv_merge(partials, ["g"], k=16), k=16)
    got = {r["g"]: (r["n_hashes"], r["est_distinct"]) for r in merged.collect()}
    assert got == direct


def test_cm_sketch_overcounts_only_and_merges_losslessly(spark):
    """CM estimates are >= exact counts (min-over-rows never
    under-counts), exact when collision-free, and per-shard partials
    merged with cm_merge give the identical grid (and therefore
    identical estimates) as one global sketch."""
    rows = [(f"t{i % 23}", f"s{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "term string, shard string")
    exact = {r["term"]: r["n"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}

    sk = sketch.cm_partial(df, "term", depth=2, width=256)
    items = df.select(F.col("term").alias("item")).distinct()
    est = {
        r["item"]: r["est_count"]
        for r in sketch.cm_estimate(sk, items, depth=2, width=256).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert est[t] >= n  # never under-counts
    # 23 distinct terms in 2x256 buckets: collisions possible per row but
    # min-over-2-rows is exact unless both rows collide — assert overall
    assert sum(est.values()) <= sum(exact.values()) * 2

    # mergeability: per-shard partials -> cm_merge == global grid
    per_shard = sketch.cm_partial(df, "term", keys=["shard"], depth=2, width=256)
    merged = sketch.cm_merge(per_shard, keys=[])
    a = sorted(map(tuple, merged.select("row", "bucket", "n").collect()))
    b = sorted(map(tuple, sk.select("row", "bucket", "n").collect()))
    assert a == b


def test_cm_estimate_missing_item_is_lower_bounded_by_zero(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "term string")
    sk = sketch.cm_partial(df, "term", depth=2, width=64)
    probe = spark.createDataFrame([("zzz-never-seen",)], "item string")
    [r] = sketch.cm_estimate(sk, probe, depth=2, width=64).collect()
    assert r["est_count"] >= 0  # may over-count via collision, never negative


def test_hist_sketch_merge_equals_direct_and_bounds_error(spark):
    """Partials over an arbitrary split merge to the same state as one
    direct pass, and quantile estimates are within one bin width of the
    exact percentile (the sketch's error bound by construction)."""
    import random

    rng = random.Random(7)
    vals = [rng.uniform(0.0, 100.0) for _ in range(4000)]
    df = spark.createDataFrame(
        [("g", v, i % 3) for i, v in enumerate(vals)], "k string, v double, s int"
    )
    lo, hi, bins = 0.0, 100.0, 200

    direct = sketch.hist_partial(df, "v", ["k"], lo, hi, bins)
    parts = [
        sketch.hist_partial(df.filter(F.col("s") == i), "v", ["k"], lo, hi, bins)
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = sketch.hist_merge(u, ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    [r] = sketch.hist_quantiles(merged, ["k"], lo, hi, bins).collect()
    assert r["n"] == 4000
    width = (hi - lo) / bins
    svals = sorted(vals)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        exact = svals[max(0, -(-int(q * 4000)) - 1)]
        assert abs(r[col] - exact) <= width + 1e-9, (q, r[col], exact)


def test_hist_sketch_clamps_out_of_range_and_drops_nulls(spark):
    df = spark.createDataFrame(
        [("g", -5.0), ("g", 0.5), ("g", 99.0), ("g", 250.0), ("g", None)],
        "k string, v double",
    )
    h = {r["bin"]: r["cnt"] for r in sketch.hist_partial(df, "v", ["k"], 0.0, 100.0, 10).collect()}
    assert h[0] == 2          # -5 clamps into bin 0 alongside 0.5
    assert h[9] == 2          # 250 clamps into the top bin alongside 99
    assert sum(h.values()) == 4  # NULL dropped


def test_hist_quantile_label_collision_safe(spark):
    df = spark.createDataFrame([("g", float(i)) for i in range(100)], "k string, v double")
    sk = sketch.hist_partial(df, "v", ["k"], 0.0, 100.0, 100)
    out = sketch.hist_quantiles(sk, ["k"], 0.0, 100.0, 100, quantiles=(0.99, 0.999))
    assert {"p99", "p999000"} <= set(out.columns)
