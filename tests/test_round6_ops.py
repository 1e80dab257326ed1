"""Round-6 hardening tests: live global-window detection in the plan
audit, the LSH vector-width contract, target-row boundary sampling, and
the unkeyed pack_sequences guard."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


# -- plan-audit global-window detector ---------------------------------------


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_gwindow_detector_global_vs_keyed(spark):
    from tools.plan_audit import count_global_window_specs

    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("k"), (F.col("id") * 2).alias("v")
    )
    keyed = df.withColumn("rn", F.row_number().over(W.partitionBy("k").orderBy("v")))
    glob = df.withColumn("rn", F.row_number().over(W.orderBy("v")))
    assert count_global_window_specs(_plan_text(keyed)) == 0
    assert count_global_window_specs(_plan_text(glob)) > 0
    # a keyed and a global window in the same plan: only the global counts
    both = keyed.withColumn("g", F.sum("v").over(W.orderBy("v")))
    assert count_global_window_specs(_plan_text(both)) > 0


def test_gwindow_detector_frame_only_spec(spark):
    from tools.plan_audit import count_global_window_specs

    # no partition AND no order: spec starts with specifiedwindowframe
    df = spark.range(10).withColumn("t", F.sum("id").over(W.partitionBy()))
    assert count_global_window_specs(_plan_text(df)) > 0


def test_gwindow_q115_flags_bounded_sample_window(spark):
    """q115's boundary-sample window is global by design (bounded rows);
    the detector must SEE it — r5's regex never could."""
    import __spark_entry__ as entry

    from tools.plan_audit import audit_plan

    df = entry.queries()["q115_range_shard"](spark, "/root/testdata/sf0.001")
    assert audit_plan(df)["gwindow"] > 0


def test_plan_audit_allowlist_names_are_real():
    import __spark_entry__ as entry

    from tools.plan_audit import TINY_GLOBAL_WINDOW_OK

    assert TINY_GLOBAL_WINDOW_OK <= set(entry.queries())


# -- LSH width contract ------------------------------------------------------


def test_lsh_width_mismatch_raises(spark):
    from aeon_mecha_spark.datapipe.similarity import hyperplane_lsh_buckets

    wide = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id int, embedding array<double>"
    )
    planes = [[1.0, 0.0], [0.0, 1.0]]
    with pytest.raises(Exception) as ei:
        hyperplane_lsh_buckets(wide, planes).collect()
    assert "width contract" in str(ei.value)


def test_lsh_width_match_still_buckets(spark):
    from aeon_mecha_spark.datapipe.similarity import hyperplane_lsh_buckets

    ok = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [-1.0, -2.0])], "vec_id int, embedding array<double>"
    )
    rows = hyperplane_lsh_buckets(ok, [[1.0, 0.0], [0.0, 1.0]]).collect()
    got = {r["vec_id"]: r["bucket"] for r in rows}
    assert got == {1: "11", 2: "00"}


def test_lsh_ragged_planes_rejected(spark):
    from aeon_mecha_spark.datapipe.similarity import hyperplane_lsh_buckets

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError):
        hyperplane_lsh_buckets(df, [[1.0, 0.0], [0.0, 1.0, 2.0]])


# -- target-row boundary sampling --------------------------------------------


def test_derive_sample_fraction_bounds_sample(spark):
    from aeon_mecha_spark.operators.analytics import derive_sample_fraction

    big = spark.range(2_000_000)
    fr = derive_sample_fraction(big, 100_000)
    assert fr == pytest.approx(0.05)
    small = spark.range(50)
    assert derive_sample_fraction(small, 100_000) == 1.0
    with pytest.raises(ValueError):
        derive_sample_fraction(small, 0)


def test_grouped_quantiles_derived_fraction_exact(spark):
    """range_buckets path with the DEFAULT (derived) fraction must still
    equal the single-window path exactly."""
    from aeon_mecha_spark.operators.analytics import grouped_quantiles

    df = spark.range(3_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        ((F.col("id") * 37) % 1000).cast("double").alias("v"),
    )
    ps = (0.25, 0.5, 0.95)
    base = {
        (r["k"], r["p"]): r["q"]
        for r in grouped_quantiles(df, ["k"], "v", ps=ps).collect()
    }
    two = {
        (r["k"], r["p"]): r["q"]
        for r in grouped_quantiles(
            df, ["k"], "v", ps=ps, range_buckets=8, target_sample_rows=200
        ).collect()
    }
    assert base == two


def test_range_shard_derived_fraction_matches_explicit(spark):
    from aeon_mecha_spark.datapipe.curation import range_shard

    df = spark.range(1_000).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 13) % 500).cast("double").alias("v")
    )
    derived = range_shard(df, "v", 4)  # fraction derived (1.0 here: n <= target)
    explicit = range_shard(df, "v", 4, sample_fraction=1.0)
    assert sorted((r["doc_id"], r["shard"]) for r in derived.collect()) == sorted(
        (r["doc_id"], r["shard"]) for r in explicit.collect()
    )
    # shards are contiguous in value order and all used at fraction 1.0
    shards = derived.groupBy("shard").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).orderBy("shard").collect()
    assert [r["shard"] for r in shards] == [0, 1, 2, 3]
    for a, b in zip(shards, shards[1:]):
        assert a["hi"] <= b["lo"]


# -- unkeyed pack_sequences guard --------------------------------------------


def test_pack_sequences_unkeyed_over_limit_raises(spark):
    from aeon_mecha_spark.datapipe.curation import pack_sequences

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    with pytest.raises(Exception) as ei:
        pack_sequences(docs, budget=10, unkeyed_row_limit=10).collect()
    assert "unkeyed_row_limit" in str(ei.value)


def test_pack_sequences_unkeyed_under_limit_ok(spark):
    from aeon_mecha_spark.datapipe.curation import pack_sequences

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    rows = pack_sequences(docs, budget=6, unkeyed_row_limit=100).orderBy("doc_id").collect()
    assert [r["start_offset"] for r in rows] == [0, 3, 6, 9, 12]
    assert [r["bin_id"] for r in rows] == [0, 0, 1, 1, 2]


def test_pack_sequences_keyed_unaffected_by_guard(spark):
    from aeon_mecha_spark.datapipe.curation import pack_sequences

    docs = spark.range(40).select(
        (F.col("id") % 4).alias("shard"),
        F.col("id").alias("doc_id"),
        F.lit("x y").alias("text"),
    )
    # guard only applies unkeyed: a tiny limit must NOT trip keyed packing
    rows = pack_sequences(
        docs, budget=4, keys=["shard"], unkeyed_row_limit=1
    ).collect()
    assert len(rows) == 40


# -- new round-6 operators ---------------------------------------------------


def test_cross_corpus_duplicates_finds_planted_dup(spark):
    from aeon_mecha_spark.datapipe.dedup import cross_corpus_duplicates

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "an entirely different reference document text here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 100
         (2, "completely unrelated corpus content with no overlap at all")],
        "doc_id long, text string",
    )
    out = cross_corpus_duplicates(corpus, ref, k=3, threshold=0.5).collect()
    assert [(r["doc_id"], r["ref_id"]) for r in out] == [(1, 100)]
    assert out[0]["jaccard"] == 1.0


def test_cross_corpus_duplicates_never_pairs_within_corpus(spark):
    from aeon_mecha_spark.datapipe.dedup import cross_corpus_duplicates

    # two identical corpus docs, reference shares nothing: a SELF-join
    # dedup would pair (1, 2); the cross join must return nothing
    corpus = spark.createDataFrame(
        [(1, "same text repeated across corpus documents"),
         (2, "same text repeated across corpus documents")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, "reference side holds wholly distinct material")],
        "doc_id long, text string",
    )
    assert cross_corpus_duplicates(corpus, ref, k=3, threshold=0.1).count() == 0


def test_cross_corpus_candidates_without_threshold(spark):
    from aeon_mecha_spark.datapipe.dedup import cross_corpus_duplicates

    ref = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    out = cross_corpus_duplicates(corpus, ref, k=3)
    assert out.columns == ["doc_id", "ref_id"]
    assert out.collect()[0].asDict() == {"doc_id": 1, "ref_id": 9}


def test_iqr_outliers_exact_fences(spark):
    from aeon_mecha_spark.operators.analytics import iqr_outliers

    # group a: values 1..8 plus an outlier 100
    rows = [("a", float(v)) for v in range(1, 9)] + [("a", 100.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["k"]: r for r in iqr_outliers(df, ["k"], "v").collect()}
    a = out["a"]
    # n=9: q1 = value at ceil(9/4)=rank 3 -> 3.0; q3 = ceil(27/4)=rank 7 -> 7.0
    assert (a["q1"], a["q3"]) == (3.0, 7.0)
    assert (a["lo"], a["hi"]) == (3.0 - 1.5 * 4.0, 7.0 + 1.5 * 4.0)
    assert (a["n"], a["n_outliers"]) == (9, 1)
    b = out["b"]
    assert (b["q1"], b["q3"], b["n_outliers"]) == (5.0, 5.0, 0)


def test_iqr_outliers_keyless(spark):
    from aeon_mecha_spark.operators.analytics import iqr_outliers

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)] + [(1000.0,)], "v double"
    )
    r = iqr_outliers(df, [], "v").collect()
    assert len(r) == 1
    assert r[0]["n"] == 9 and r[0]["n_outliers"] == 1


# -- interpolate_linear / key_skew_stats / bloom ledger gate ------------------


def test_interpolate_linear_values(spark):
    from aeon_mecha_spark.operators.analytics import interpolate_linear

    rows = [
        ("a", 0, 10.0),
        ("a", 10, None),   # between 10.0 and 40.0, 1/3 of the way -> 20.0
        ("a", 30, 40.0),
        ("a", 40, None),   # after last obs -> LOCF 40.0
        ("b", 0, None),    # before first obs -> backfill 7.0
        ("b", 10, 7.0),
        ("c", 5, None),    # key with no obs -> stays NULL
    ]
    df = spark.createDataFrame(
        [(k, __import__("datetime").datetime(2024, 1, 1, 0, 0, s), v) for k, s, v in rows],
        "k string, ts timestamp, v double",
    )
    out = {
        (r["k"], r["ts"].second): (r["value_interp"], r["was_null"])
        for r in interpolate_linear(df, ["k"], "ts", "v").collect()
    }
    assert out[("a", 0)] == (10.0, False)
    assert out[("a", 10)] == (20.0, True)
    assert out[("a", 30)] == (40.0, False)
    assert out[("a", 40)] == (40.0, True)
    assert out[("b", 0)] == (7.0, True)
    assert out[("c", 5)] == (None, True)


def test_interpolate_linear_single_sort(spark):
    """Both window frames must share one partitioning+sort: exactly one
    Exchange, one Sort in the plan."""
    import re

    from aeon_mecha_spark.operators.analytics import interpolate_linear

    df = spark.createDataFrame(
        [("a", __import__("datetime").datetime(2024, 1, 1), 1.0)],
        "k string, ts timestamp, v double",
    )
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interpolate_linear(df, ["k"], "ts", "v").explain("formatted")
    p = buf.getvalue()
    tree = p.split("(1) ")[0]
    assert tree.count("Exchange") - tree.count("BroadcastExchange") <= 1
    assert len(re.findall(r"\(\d+\) Sort\b", p)) <= 1


def test_key_skew_stats_ranks_hot_key(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators.skew import key_skew_stats

    df = spark.range(100).select(
        F.when(F.col("id") < 60, F.lit("hot")).otherwise((F.col("id") % 4).cast("string")).alias("k")
    )
    out = key_skew_stats(df, ["k"], top_n=2).collect()
    assert out[0]["k"] == "hot" and out[0]["n"] == 60 and out[0]["rank"] == 1
    assert out[0]["share"] == 0.6
    assert len(out) == 2 and out[1]["rank"] == 2


def test_key_skew_stats_plan_is_take_ordered(spark):
    import contextlib, io

    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators.skew import key_skew_stats

    df = spark.range(1000).select((F.col("id") % 7).alias("k"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        key_skew_stats(df, ["k"], top_n=3).explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p  # orderBy+limit, not a global sort


def test_bloom_ledger_gate_replay_safe(spark):
    """q122 at sf0.001: replayed keys never re-emit; ledger batch_id is
    first-appearance."""
    import __spark_entry__ as m

    rows = m.queries()["q122_bloom_ledger"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == len({r["doc_id"] for r in rows})  # no dup emission
    for r in rows:
        assert r["batch_id"] == r["doc_id"] % 3


# -- record linkage / SCD2 ----------------------------------------------------


def test_blocked_fuzzy_pairs_dist1(spark):
    from aeon_mecha_spark.datapipe.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgex"),   # dist 1 from 1, same block (red:2)
            (3, "red widgetxyz"),  # same first token, length band differs
            (4, "blue widget"),  # different block
            (5, "red widget"),   # exact dup of 1
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["dist"] for r in blocked_fuzzy_pairs(df, "text").collect()}
    assert out == {(1, 2): 1, (1, 5): 0, (2, 5): 1}


def test_blocked_fuzzy_join_two_tables(spark):
    from aeon_mecha_spark.datapipe.linkage import blocked_fuzzy_join

    master = spark.createDataFrame([(100, "acme corp")], "id_b long, text string")
    feed = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corpx"), (3, "emca corp")],
        "id_a long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           blocked_fuzzy_join(feed, master, "text").collect()}
    # id 3's first token differs -> blocked away even though dist is 2
    assert got == {(1, 100): 0, (2, 100): 1}


def test_blocked_fuzzy_pairs_no_cartesian(spark):
    import contextlib, io

    from aeon_mecha_spark.datapipe.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        blocked_fuzzy_pairs(df, "text").explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _scd_dim(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [
            (1, 10.0, "seg", "2024-01-01 00:00:00", None, True),
            (1, 5.0, "seg", "2023-01-01 00:00:00", "2024-01-01 00:00:00", False),
            (2, 20.0, "seg", "2024-01-01 00:00:00", None, True),
            (3, 30.0, "seg", "2024-01-01 00:00:00", None, True),
        ],
        "k long, bal double, seg string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "bal", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )


def test_scd2_apply_branches(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from aeon_mecha_spark.pipeline.scd import scd2_apply

    dim = _scd_dim(spark)
    updates = spark.createDataFrame(
        [
            (1, 11.0, "2024-06-01 00:00:00"),  # changed
            (2, 20.0, "2024-06-01 00:00:00"),  # no-op (same value)
            (9, 99.0, "2024-06-01 00:00:00"),  # brand new
        ],
        "k long, bal double, effective_ts string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(dim, updates, ["k"], ["bal"]).collect()
    eff = dt.datetime(2024, 6, 1)
    rows = {(r["k"], r["valid_from"]): r for r in out}
    assert len(out) == 6  # 1 closed-history + 3 open-ish + 1 newly-closed + 1 fresh
    # key 1: old open row closed at eff, new open row with 11.0
    closed = rows[(1, dt.datetime(2024, 1, 1))]
    assert closed["valid_to"] == eff and closed["is_current"] is False and closed["bal"] == 10.0
    reopened = rows[(1, eff)]
    assert reopened["bal"] == 11.0 and reopened["is_current"] is True and reopened["valid_to"] is None
    # key 2 no-op: still the original open row
    assert rows[(2, dt.datetime(2024, 1, 1))]["is_current"] is True
    # key 3 untouched; key 9 fresh with null carried attrs
    assert rows[(3, dt.datetime(2024, 1, 1))]["is_current"] is True
    fresh = rows[(9, eff)]
    assert fresh["bal"] == 99.0 and fresh["seg"] is None and fresh["is_current"] is True
    # history row passed through bit-unchanged
    assert rows[(1, dt.datetime(2023, 1, 1))]["is_current"] is False


def test_scd2_apply_idempotent_on_replay(spark):
    """Re-applying the SAME batch to the merged dimension is a no-op on
    open rows (values already match) — the property that makes the merge
    safe under at-least-once delivery."""
    from pyspark.sql import functions as F

    from aeon_mecha_spark.pipeline.scd import scd2_apply

    dim = _scd_dim(spark)
    updates = spark.createDataFrame(
        [(1, 11.0, "2024-06-01 00:00:00")], "k long, bal double, effective_ts string"
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    once = scd2_apply(dim, updates, ["k"], ["bal"])
    twice = scd2_apply(once, updates, ["k"], ["bal"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_fuzzy_duplicate_stats_matches_pairwise(spark):
    """Collapsed census must equal counting the naive pairwise output."""
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe.linkage import (
        blocked_fuzzy_pairs,
        fuzzy_duplicate_stats,
    )

    rows = [
        (1, "red widget"), (2, "red widget"), (3, "red widget"),  # m=3 -> C(3,2)=3
        (4, "red widgex"), (5, "red widgex"),                     # m=2 -> 1; x3 near = 6
        (6, "blue bolt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    naive = blocked_fuzzy_pairs(df, "text", max_dist=1).groupBy("dist").agg(
        F.count(F.lit(1)).alias("n_row_pairs")
    )
    naive_m = {r["dist"]: r["n_row_pairs"] for r in naive.collect()}
    stats = {r["dist"]: (r["n_text_pairs"], r["n_row_pairs"])
             for r in fuzzy_duplicate_stats(df, "text", max_dist=1).collect()}
    assert stats[0] == (2, 3 + 1)        # two duplicated texts; C(3,2)+C(2,2)
    assert stats[1] == (1, 6)            # one near name-pair, 3*2 row pairs
    assert naive_m == {0: 4, 1: 6}
    assert {d: s[1] for d, s in stats.items()} == naive_m


# -- graph / temporal join ----------------------------------------------------


def test_transition_edges(spark):
    import datetime as dt

    from aeon_mecha_spark.operators.graph import transition_edges

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 10),
        (2, "a", dt.datetime(2024, 1, 1, 0, 0, 1), 11),
        (2, "a", dt.datetime(2024, 1, 1, 0, 0, 2), 12),  # self-loop dropped
        (3, "a", dt.datetime(2024, 1, 1, 0, 0, 3), 13),
        (7, "b", dt.datetime(2024, 1, 1, 0, 0, 0), 14),  # other stream
        (8, "b", dt.datetime(2024, 1, 1, 0, 0, 1), 15),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    got = sorted((r["src"], r["dst"]) for r in transition_edges(df).collect())
    assert got == [(1, 2), (2, 3), (7, 8)]


def test_pagerank_int_star_graph(spark):
    """Star a->c, b->c: after 1 iter, c holds base + 85% of two full
    contributions; a and b (no in-edges) hold base."""
    from aeon_mecha_spark.operators.graph import pagerank_int

    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    r = {x["node"]: x["rank_micro"] for x in pagerank_int(edges, iters=1).collect()}
    assert r[1] == r[2] == 150_000
    assert r[3] == 150_000 + (85 * 2_000_000) // 100


def test_pagerank_int_deterministic_across_partitioning(spark):
    from aeon_mecha_spark.operators.graph import pagerank_int

    edges = [(i % 17, (i * 7) % 17) for i in range(200) if i % 17 != (i * 7) % 17]
    one = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(edges, "src long, dst long").repartition(16)
    ra = sorted(map(tuple, pagerank_int(one, iters=3).collect()))
    rb = sorted(map(tuple, pagerank_int(many, iters=3).collect()))
    assert ra == rb


def test_temporal_join_picks_covering_version(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from aeon_mecha_spark.pipeline.scd import temporal_join

    dim = spark.createDataFrame(
        [
            (1, 10.0, "2020-01-01 00:00:00", "2022-01-01 00:00:00", False),
            (1, 20.0, "2022-01-01 00:00:00", None, True),
        ],
        "k long, bal double, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "bal",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    facts = spark.createDataFrame(
        [(100, 1, "2021-06-01 00:00:00"), (101, 1, "2022-01-01 00:00:00"),
         (102, 1, "2019-01-01 00:00:00"), (103, 2, "2021-01-01 00:00:00")],
        "fid long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["fid"]: r["bal"] for r in temporal_join(facts, dim, ["k"], "ts").collect()}
    # 100 -> old version; 101 exactly at the boundary -> NEW version
    # (valid_from inclusive, valid_to exclusive); 102 pre-history and
    # 103 unknown key -> no match under inner join
    assert got == {100: 10.0, 101: 20.0}
    left = temporal_join(facts, dim, ["k"], "ts", how="left")
    assert left.count() == 4


# -- temperature sampling / BM25 / split assignment ---------------------------


def test_temperature_sample_upsamples_rare_domains(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe.curation import temperature_sample

    df = spark.range(1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit("big")).otherwise(F.lit("small")).alias("d"),
    )
    out = temperature_sample(df, "d", base_fraction=0.3, alpha=0.5)
    rates = {r["d"]: r["n"] for r in out.groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()}
    # big domain keeps ~30%; small (10x rarer) keeps ~min(1, 0.3*sqrt(10))~95%
    assert 0.2 < rates["big"] / 1000 < 0.4
    assert rates["small"] / 100 > 0.8
    # alpha=1 reproduces the plain fraction for every domain
    flat = temperature_sample(df, "d", base_fraction=0.3, alpha=1.0)
    fr = {r["d"]: r["n"] for r in flat.groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.2 < fr["small"] / 100 < 0.45
    with __import__("pytest").raises(ValueError):
        temperature_sample(df, "d", alpha=0.0)


def test_temperature_sample_nested_in_base_fraction(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe.curation import temperature_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("d")
    )
    small = {r["doc_id"] for r in temperature_sample(df, "d", base_fraction=0.2).collect()}
    big = {r["doc_id"] for r in temperature_sample(df, "d", base_fraction=0.5).collect()}
    assert small <= big


def test_bm25_ranks_term_dense_docs(spark):
    from aeon_mecha_spark.datapipe.textqc import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark join join join plan"),
            (2, "spark join plan"),
            (3, "nothing relevant here at all"),
            (4, "join " * 2 + "filler " * 50),  # long doc: length-normalized down
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["join"]).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["score"] > out[2]["score"] > out[4]["score"] > 0
    assert out[1]["n_terms_hit"] == 1


def test_split_assign_deterministic_and_stable(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe.curation import split_assign

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = split_assign(df).groupBy("split").agg(F.count(F.lit(1)).alias("n"))
    n = {r["split"]: r["n"] for r in out.collect()}
    assert abs(n["train"] - 1600) < 120 and abs(n["val"] - 200) < 60 and abs(n["test"] - 200) < 60
    # stability: a doc's split is unchanged when the corpus doubles
    sub = {r["doc_id"]: r["split"] for r in split_assign(df.filter(F.col("doc_id") < 500)).collect()}
    full = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    assert all(full[k] == v for k, v in sub.items())
    with __import__("pytest").raises(ValueError):
        split_assign(df, weights=(0.5, 0.2), labels=("a", "b", "c"))
    with __import__("pytest").raises(ValueError):
        split_assign(df, weights=(0.5, 0.2, 0.2))


def test_table_profile_one_pass(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators.stats import table_profile

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "a"), (3, 8.0, None), (3, 8.0, "b")],
        "k long, v double, s string",
    )
    out = {r["column"]: r for r in table_profile(df, ["k", "v"], ["s"]).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 3
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert (out["v"]["min_val"], out["v"]["max_val"]) == (2.0, 8.0)
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_val"] is None
    # one aggregation -> a single job over the table (no per-column scans)
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        table_profile(df, ["k", "v"], ["s"]).explain("formatted")
    p = buf.getvalue()
    # one numbered Scan operator (formatted output mentions each node
    # twice — tree + detail — so count the numbered tree entries)
    import re
    assert len(re.findall(r"\(\d+\) Scan", p)) == 1


def test_asof_nearest_picks_closer_side_and_tolerance(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators.intervals import asof_join_nearest

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, "u", ts(10)), (2, "u", ts(95)), (3, "u", ts(500)), (4, "v", ts(10))],
        "fid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(0), 1.0), ("u", ts(100), 2.0)], "k string, ts timestamp, v double"
    )
    out = {r["fid"]: r for r in asof_join_nearest(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_us=120_000_000
    ).collect()}
    assert out[1]["v"] == 1.0 and out[1]["asof_gap_us"] == -10_000_000  # closer backward
    assert out[2]["v"] == 2.0 and out[2]["asof_gap_us"] == 5_000_000    # closer forward
    assert out[3]["v"] is None and out[3]["asof_gap_us"] is None        # beyond tolerance
    assert out[4]["v"] is None                                          # key with no marks


def test_asof_nearest_distance_tie_prefers_backward(spark):
    import datetime as dt

    from aeon_mecha_spark.operators.intervals import asof_join_nearest

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u", base + dt.timedelta(seconds=50))], "fid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", base, 1.0), ("u", base + dt.timedelta(seconds=100), 2.0)],
        "k string, ts timestamp, v double",
    )
    r = asof_join_nearest(left, right, ["k"], "ts", "ts", ["v"]).collect()[0]
    assert r["v"] == 1.0 and r["asof_gap_us"] == -50_000_000


def test_asof_nearest_single_sort_plan(spark):
    import contextlib, io, re
    import datetime as dt

    from aeon_mecha_spark.operators.intervals import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1))], "fid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), 1.0)], "k string, ts timestamp, v double"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join_nearest(left, right, ["k"], "ts", "ts", ["v"]).explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p  # union-merge, never a join
    assert len(re.findall(r"\(\d+\) Sort\b", p)) <= 1  # both frames share one sort


def test_table_diff_classifies_and_skips_unchanged(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.pipeline.reconcile import table_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0), Row(k=2, v="b", w=2.0), Row(k=3, v="c", w=None)]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0),       # unchanged -> dropped
         Row(k=2, v="B", w=2.0),       # changed
         Row(k=4, v="d", w=4.0)]       # added; k=3 removed
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_table_diff_null_vs_value_is_a_change(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.pipeline.reconcile import table_diff

    old = spark.createDataFrame([Row(k=1, v=None)], "k int, v string")
    new = spark.createDataFrame([Row(k=1, v="")], "k int, v string")
    [r] = table_diff(old, new, ["k"]).collect()
    assert r["change_type"] == "changed"  # NULL encodes distinctly from ''


def test_pmi_collocations_exact_scores_and_tiebreak(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.textqc import pmi_collocations

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(["a b", "a b", "a c", "d d"])]
    )
    rows = pmi_collocations(docs, min_count=1, top_n=10).collect()
    # N=8 tokens, M=4 bigrams; linearized-PMI ppm, hand-computed
    got = [(r["ngram"], r["c12"], r["c1"], r["c2"], r["score"]) for r in rows]
    assert got == [
        ("a b", 2, 3, 2, 5333333),   # (2*64e6)//(4*3*2)
        ("a c", 1, 3, 1, 5333333),   # tie on score -> ngram ascending
        ("d d", 1, 2, 2, 4000000),
    ]


def test_pmi_collocations_min_count_filters(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.textqc import pmi_collocations

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(["x y", "x y", "p q"])]
    )
    rows = pmi_collocations(docs, min_count=2, top_n=10).collect()
    assert [r["ngram"] for r in rows] == ["x y"]


# -- repetition signals (Gopher-style) ---------------------------------------


def test_repetition_signals_hand_computed(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.textqc import repetition_signals

    docs = spark.createDataFrame(
        [
            # 6 tokens, 4 distinct -> dup_tok 2/6; g2: 5 occ, 4 distinct
            # ("a b" twice); g3: 4 occ, all distinct; top bigram "a b" x2
            Row(doc_id=0, text="a b a b c d"),
            # all distinct
            Row(doc_id=1, text="p q r"),
            # single token: no bigrams at all
            Row(doc_id=2, text="solo"),
            # empty text
            Row(doc_id=3, text="   "),
        ]
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 6
    assert r0["dup_token_frac_ppm"] == (2 * 1000000) // 6
    assert r0["dup_2gram_frac_ppm"] == (1 * 1000000) // 5
    assert r0["dup_3gram_frac_ppm"] == 0
    assert (r0["top_bigram"], r0["top_bigram_count"]) == ("a b", 2)
    assert r0["top_bigram_frac_ppm"] == (2 * 2000000) // 6
    r1 = got[1]
    assert (r1["dup_token_frac_ppm"], r1["dup_2gram_frac_ppm"]) == (0, 0)
    assert r1["top_bigram_count"] == 1  # any bigram; tie -> lexicographic
    assert r1["top_bigram"] == "p q"
    r2 = got[2]
    assert (r2["n_tokens"], r2["top_bigram"], r2["top_bigram_count"]) == (1, "", 0)
    assert r2["top_bigram_frac_ppm"] == 0
    r3 = got[3]
    assert (r3["n_tokens"], r3["dup_token_frac_ppm"], r3["top_bigram"]) == (0, 0, "")


def test_repetition_signals_tie_breaks_lexicographic(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.textqc import repetition_signals

    # "z a z a" -> bigrams "z a","a z","z a": top is "z a" x2
    docs = spark.createDataFrame([Row(doc_id=0, text="z a z a")])
    r = repetition_signals(docs).collect()[0]
    assert (r["top_bigram"], r["top_bigram_count"]) == ("z a", 2)


# -- constraint checking (Deequ-style) ---------------------------------------


def test_check_constraints_counts_and_status(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.pipeline import validate as V

    df = spark.createDataFrame(
        [
            Row(k=1, sub=1, v=10, flag="A"),
            Row(k=1, sub=1, v=200, flag="B"),   # dup key, v out of range
            Row(k=2, sub=1, v=None, flag="A"),  # null v
            Row(k=3, sub=2, v=50, flag="Z"),    # bad flag
        ]
    )
    parent = spark.createDataFrame([Row(k=1), Row(k=2)])
    out = V.check_constraints(
        df,
        checks=[
            V.not_null("v"),
            V.in_range("v", 0, 100),
            V.accepted_values("flag", ["A", "B"]),
            V.satisfies("v_times_ten", F.col("v") % 10 == 0),
        ],
        unique=[["k", "sub"]],
        foreign_keys=[("fk_parent", ["k"], parent, ["k"])],
    )
    got = {r["constraint"]: (r["n_rows"], r["violations"], r["status"]) for r in out.collect()}
    assert got["not_null(v)"] == (4, 1, "fail")
    assert got["in_range(v,0,100)"] == (4, 2, "fail")  # 200 + NULL
    assert got["accepted_values(flag,[A,B])"] == (4, 1, "fail")
    assert got["satisfies(v_times_ten)"] == (4, 1, "fail")  # NULL counts
    assert got["unique(k,sub)"] == (4, 1, "fail")
    assert got["fk_parent"] == (4, 1, "fail")  # k=3 has no parent


def test_check_constraints_all_pass_and_single_pass_plan(spark):
    import contextlib
    import io

    from pyspark.sql import Row

    from aeon_mecha_spark.pipeline import validate as V

    df = spark.createDataFrame([Row(k=i, v=i * 10) for i in range(5)])
    out = V.check_constraints(
        df,
        checks=[V.not_null("k"), V.in_range("v", 0, 100)],
        unique=[["k"]],
    )
    # all row-level + uniqueness checks fold into ONE pass over df: a
    # single scan feeding the (count-distinct-expanded) aggregate chain.
    # Explain BEFORE acting: post-run AQE explain repeats the plan text.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().lower()
    # formatted explain lists each node twice (tree + detail): one scan = 2
    assert plan.count("scan existingrdd") == 2
    assert "cartesianproduct" not in plan
    rows = out.collect()
    assert {r["status"] for r in rows} == {"pass"}
    assert {r["violations"] for r in rows} == {0}


# -- chi-squared association -------------------------------------------------


def test_chi_square_cells_hand_computed(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import chi_square_cells

    # 2x2: a=x: (10, 20); a=y: (30, 40). N=100, R_x=30, R_y=70,
    # C_1=40, C_2=60.
    rows = []
    rows += [Row(a="x", b="1")] * 10 + [Row(a="x", b="2")] * 20
    rows += [Row(a="y", b="1")] * 30 + [Row(a="y", b="2")] * 40
    out = {
        (r["a"], r["b"]): r.asDict()
        for r in chi_square_cells(spark.createDataFrame(rows), "a", "b").collect()
    }
    assert len(out) == 4
    c = out[("x", "1")]
    assert (c["observed"], c["row_total"], c["col_total"]) == (10, 30, 40)
    assert c["expected_milli"] == (30 * 40 * 1000) // 100          # 12.000
    assert c["term_ppm"] == ((10 * 100 - 30 * 40) ** 2 * 10**6) // (100 * 30 * 40)
    # chi2 = sum(term)/1e6 ~ 0.7937 for this table
    total = sum(v["term_ppm"] for v in out.values())
    assert abs(total / 1e6 - 0.79365) < 1e-4


def test_chi_square_cells_includes_zero_cells(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import chi_square_cells

    df = spark.createDataFrame(
        [Row(a="x", b="1"), Row(a="x", b="1"), Row(a="y", b="2")]
    )
    out = {(r["a"], r["b"]): r for r in chi_square_cells(df, "a", "b").collect()}
    assert len(out) == 4  # full grid: (x,2) and (y,1) are zero cells
    assert out[("x", "2")]["observed"] == 0
    assert out[("x", "2")]["term_ppm"] > 0  # zero cells still contribute


# -- n-gram novelty ----------------------------------------------------------


def test_ngram_novelty_keep_first_ownership(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c d"),        # grams: abc, bcd -> all novel
            Row(doc_id=1, text="a b c e"),        # abc owned by 0; bce novel
            Row(doc_id=2, text="a b c d"),        # exact rehash -> novelty 0
        ]
    )
    got = {r["doc_id"]: r.asDict() for r in ngram_novelty(docs, k=3).collect()}
    assert got[0]["n_grams"] == 2 and got[0]["novelty_ppm"] == 1000000
    assert got[1] == {"doc_id": 1, "n_grams": 2, "n_novel": 1, "novelty_ppm": 500000}
    assert got[2]["n_novel"] == 0 and got[2]["novelty_ppm"] == 0


def test_ngram_novelty_short_docs_whole_text(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.dedup import ngram_novelty

    # shorter than k: the whole text is the single gram (decontaminate
    # semantics); identical short docs dedupe by ownership
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="hi there"), Row(doc_id=1, text="hi there")]
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, k=3).collect()}
    assert got[0]["novelty_ppm"] == 1000000
    assert got[1]["novelty_ppm"] == 0


# -- reciprocal-rank fusion --------------------------------------------------


def test_rrf_fuse_exact_contributions(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.similarity import rrf_fuse

    a = spark.createDataFrame(
        [Row(id=1, s=30), Row(id=2, s=20), Row(id=3, s=10)]
    )
    b = spark.createDataFrame(
        [Row(id=3, s=5), Row(id=2, s=4), Row(id=1, s=3)]
    )
    out = {
        r["id"]: r.asDict()
        for r in rrf_fuse(
            [(a, [F.col("s").desc()]), (b, [F.col("s").desc()])],
            id_cols=["id"],
            k=60,
        ).collect()
    }
    # id=1: rank 1 in a, rank 3 in b; id=2: rank 2 twice; id=3: 3 then 1
    c = lambda r: 1_000_000_000 // (60 + r)
    assert out[1]["rrf_ppb"] == c(1) + c(3)
    assert out[2]["rrf_ppb"] == c(2) + c(2)
    assert out[3]["rrf_ppb"] == c(3) + c(1)
    assert {v["n_lists"] for v in out.values()} == {2}


def test_rrf_fuse_limit_cuts_each_list(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.similarity import rrf_fuse

    a = spark.createDataFrame([Row(id=i, s=100 - i) for i in range(10)])
    b = spark.createDataFrame([Row(id=i, s=i) for i in range(10)])
    out = rrf_fuse(
        [(a, [F.col("s").desc()]), (b, [F.col("s").desc()])],
        id_cols=["id"],
        k=60,
        limit=3,
    ).collect()
    # a keeps ids 0,1,2; b keeps ids 9,8,7 -> 6 fused rows, each 1 list
    assert len(out) == 6
    assert {r["n_lists"] for r in out} == {1}


def test_rrf_fuse_per_query_partitioned(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.datapipe.similarity import rrf_fuse

    a = spark.createDataFrame(
        [Row(q="q1", id=1, s=2), Row(q="q1", id=2, s=1), Row(q="q2", id=1, s=1)]
    )
    out = {
        (r["q"], r["id"]): r["rrf_ppb"]
        for r in rrf_fuse([(a, [F.col("s").desc()])], id_cols=["id"], by=["q"]).collect()
    }
    # ranks restart per query
    assert out[("q1", 1)] == out[("q2", 1)] == 1_000_000_000 // 61
    assert out[("q1", 2)] == 1_000_000_000 // 62


# -- sequence pattern (A then B within dt) -----------------------------------


def test_sequence_match_within_and_strictly_after(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import sequence_match

    ev = spark.createDataFrame(
        [
            Row(u=1, t=100, ty="view"),   # click at 150 -> matched
            Row(u=1, t=150, ty="click"),
            Row(u=1, t=400, ty="view"),   # next click at 1000 > 400+200 -> no
            Row(u=1, t=1000, ty="click"),
            Row(u=2, t=10, ty="view"),    # click at SAME ts -> not strictly after
            Row(u=2, t=10, ty="click"),
            Row(u=3, t=5, ty="view"),     # no click at all
            Row(u=4, t=7, ty="click"),    # click only: no 'view' row emitted
        ]
    )
    got = {
        r["u"]: (r["n_first"], r["n_matched"], r["match_ppm"])
        for r in sequence_match(ev, ["u"], "t", "ty", "view", "click", within=200).collect()
    }
    assert got[1] == (2, 1, 500000)
    assert got[2] == (1, 0, 0)
    assert got[3] == (1, 0, 0)
    assert 4 not in got


def test_sequence_match_boundary_inclusive(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import sequence_match

    # B exactly at t + within is IN the frame (rangeBetween is inclusive)
    ev = spark.createDataFrame(
        [Row(u=1, t=0, ty="a"), Row(u=1, t=50, ty="b")]
    )
    r = sequence_match(ev, ["u"], "t", "ty", "a", "b", within=50).collect()[0]
    assert (r["n_first"], r["n_matched"]) == (1, 1)
    r2 = sequence_match(ev, ["u"], "t", "ty", "a", "b", within=49).collect()[0]
    assert (r2["n_first"], r2["n_matched"]) == (1, 0)


# -- imputation --------------------------------------------------------------


def test_impute_median_mean_mode(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import impute

    df = spark.createDataFrame(
        [
            Row(k="a", v=1.0), Row(k="a", v=3.0), Row(k="a", v=None),
            Row(k="b", v=10.0), Row(k="b", v=10.0), Row(k="b", v=20.0),
            Row(k="b", v=None),
        ]
    )
    med = {(r["k"], r["v"]): r["v_imputed"] for r in impute(df, ["k"], "v", "median").collect()}
    # type-1 median of [1,3] = rank ceil(2/2)=1 -> 1.0
    assert med[("a", None)] == 1.0
    assert med[("b", None)] == 10.0
    mean = {(r["k"], r["v"]): r["v_imputed"] for r in impute(df, ["k"], "v", "mean").collect()}
    assert mean[("a", None)] == 2.0
    mode = {(r["k"], r["v"]): r["v_imputed"] for r in impute(df, ["k"], "v", "mode").collect()}
    assert mode[("b", None)] == 10.0  # most frequent
    assert mode[("a", None)] == 1.0   # tie 1 vs 3 -> smallest value
    # non-null rows pass through unchanged everywhere
    assert med[("a", 3.0)] == 3.0 and mean[("b", 20.0)] == 20.0


def test_impute_global_mean_and_median_guard(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import impute

    df = spark.createDataFrame([Row(v=1.0), Row(v=3.0), Row(v=None)])
    got = {r["v"]: r["v_imputed"] for r in impute(df, [], "v", "mean").collect()}
    assert got[None] == 2.0
    with _pytest.raises(ValueError):
        impute(df, [], "v", "median")


# -- winsorization -----------------------------------------------------------


def test_winsorize_clips_to_group_quantiles(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import winsorize

    rows = [Row(k="a", v=float(i)) for i in range(1, 101)]  # 1..100
    rows += [Row(k="b", v=1000.0), Row(k="b", v=2000.0), Row(k="b", v=None)]
    out = winsorize(
        spark.createDataFrame(rows), ["k"], "v", p_lo=0.05, p_hi=0.95
    ).collect()
    a = {r["v"]: r["v_winsorized"] for r in out if r["k"] == "a"}
    # group a: p05 = rank ceil(5)=5 -> 5.0; p95 = rank 95 -> 95.0
    assert a[1.0] == 5.0 and a[4.0] == 5.0 and a[5.0] == 5.0
    assert a[100.0] == 95.0 and a[95.0] == 95.0
    assert a[50.0] == 50.0  # interior untouched
    b = {r["v"]: r["v_winsorized"] for r in out if r["k"] == "b"}
    # n=2: p05 rank ceil(0.1)=1 -> 1000; p95 rank ceil(1.9)=2 -> 2000
    assert b[1000.0] == 1000.0 and b[2000.0] == 2000.0
    assert b[None] is None  # NULLs pass through unclipped


# -- cube aggregation --------------------------------------------------------


def test_cube_agg_all_subsets_and_levels(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import cube_agg

    df = spark.createDataFrame(
        [Row(a="x", b="1", v=1), Row(a="x", b="2", v=2), Row(a="y", b="1", v=4)]
    )
    out = cube_agg(df, ["a", "b"], [F.sum("v").cast("long").alias("s")])
    rows = {(r["a"], r["b"], r["level"]): r["s"] for r in out.collect()}
    assert rows[("x", "1", 0)] == 1
    assert rows[("x", None, 1)] == 3      # b rolled up -> bit 0 (LSB)
    assert rows[(None, "1", 2)] == 5      # a rolled up -> bit 1 (MSB)
    assert rows[(None, None, 3)] == 7     # grand total
    assert len(rows) == 3 + 2 + 2 + 1


def test_cube_agg_single_pass_plan(spark):
    import contextlib
    import io

    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import cube_agg

    df = spark.createDataFrame([Row(a="x", b="1", v=1)])
    out = cube_agg(df, ["a", "b"], [F.count(F.lit(1)).alias("n")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().lower()
    # Catalyst expands the 4 grouping sets via Expand, not a union of scans
    assert plan.count("scan existingrdd") == 2  # tree + detail = one scan
    assert "expand" in plan


# -- target encoding ---------------------------------------------------------


def test_target_encode_shrinks_toward_prior(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import target_encode

    # global mean = 4.0 -> prior_u = 4_000_000
    df = spark.createDataFrame(
        [Row(k="rare", y=100.0)]
        + [Row(k="common", y=2.0)] * 31
    )
    out = {r["k"]: r for r in target_encode(df, ["k"], "y", m=10).collect()}
    # rare: (100e6 + 10*prior)/(1+10); global mean = (100+62)/32 = 5.0625
    prior = (100_000_000 + 31 * 2_000_000) // 32
    assert out["rare"]["enc_micro"] == (100_000_000 + 10 * prior) // 11
    assert out["common"]["enc_micro"] == (31 * 2_000_000 + 10 * prior) // 41
    # shrinkage: rare sits far from its raw mean, common barely moves
    assert out["rare"]["enc_micro"] < 100_000_000
    assert abs(out["common"]["enc_micro"] - 2_000_000) < 1_500_000


# -- MAD outliers ------------------------------------------------------------


def test_mad_outliers_flags_wild_value(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import mad_outliers

    rows = [Row(k="a", v=float(v)) for v in [10, 11, 12, 13, 14, 1000]]
    out = {r["v"]: r for r in mad_outliers(spark.createDataFrame(rows), ["k"], "v").collect()}
    # median of 6 values = rank ceil(3)=3 -> 12; dev = [2,1,0,1,2,988];
    # MAD = median(sorted devs)[3] = 1; fence = 3
    assert out[1000.0]["is_outlier"] is True
    assert out[14.0]["is_outlier"] is False
    assert out[12.0]["_median"] == 12.0 and out[12.0]["_mad"] == 1.0


def test_mad_outliers_robust_vs_mean_fence(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import mad_outliers

    # the wild value does NOT drag the fence: all normal points stay in
    rows = [Row(k="a", v=float(v)) for v in range(100)] + [Row(k="a", v=1e9)]
    out = mad_outliers(spark.createDataFrame(rows), ["k"], "v").collect()
    flagged = [r["v"] for r in out if r["is_outlier"]]
    assert flagged == [1e9]


# -- basket rules ------------------------------------------------------------


def test_basket_rules_exact_stats(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import basket_rules

    # 4 baskets: {x,y} {x,y} {x} {y,z}; multiplicity inside a basket
    # must not count (presence semantics)
    rows = [
        Row(b=1, i="x"), Row(b=1, i="y"), Row(b=1, i="y"),
        Row(b=2, i="x"), Row(b=2, i="y"),
        Row(b=3, i="x"),
        Row(b=4, i="y"), Row(b=4, i="z"),
    ]
    out = {
        (r["item_a"], r["item_b"]): r.asDict()
        for r in basket_rules(spark.createDataFrame(rows), "b", "i", min_support=1).collect()
    }
    xy = out[("x", "y")]
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (2, 3, 3)
    assert xy["support_ppm"] == (2 * 1000000) // 4
    assert xy["confidence_ppm"] == (2 * 1000000) // 3
    assert xy["lift_ppm"] == (2 * 4 * 1000000) // (3 * 3)
    yz = out[("y", "z")]
    assert (yz["n_ab"], yz["n_a"], yz["n_b"]) == (1, 3, 1)
    assert ("x", "z") not in out  # never co-occur


def test_basket_rules_min_support_cuts(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import basket_rules

    rows = [Row(b=1, i="x"), Row(b=1, i="y"), Row(b=2, i="y"), Row(b=2, i="z")]
    out = basket_rules(spark.createDataFrame(rows), "b", "i", min_support=2).collect()
    assert out == []


# -- event paths -------------------------------------------------------------


def test_event_paths_prefix_and_topn(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import event_paths

    rows = [
        # user 1 and 2: view > click > buy (4th event ignored)
        Row(u=1, t=1, e=10, ty="view"), Row(u=1, t=2, e=11, ty="click"),
        Row(u=1, t=3, e=12, ty="buy"), Row(u=1, t=4, e=13, ty="view"),
        Row(u=2, t=1, e=20, ty="view"), Row(u=2, t=2, e=21, ty="click"),
        Row(u=2, t=3, e=22, ty="buy"),
        # user 3: short journey, 1 event
        Row(u=3, t=9, e=30, ty="view"),
    ]
    out = event_paths(
        spark.createDataFrame(rows), ["u"], "t", "ty",
        order_cols=["t", "e"], depth=3, top_n=10,
    ).collect()
    got = [(r["path"], r["n_keys"]) for r in out]
    assert got == [("view>click>buy", 2), ("view", 1)]


def test_event_paths_tie_order_deterministic(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import event_paths

    # same timestamp: event_id breaks the tie
    rows = [Row(u=1, t=5, e=2, ty="b"), Row(u=1, t=5, e=1, ty="a")]
    out = event_paths(
        spark.createDataFrame(rows), ["u"], "t", "ty",
        order_cols=["t", "e"], depth=3,
    ).collect()
    assert out[0]["path"] == "a>b"


# -- triangle stats ----------------------------------------------------------


def test_triangle_stats_k4_graph(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.graph import triangle_stats

    # complete graph K4: every node has degree 3, 4 triangles total,
    # 3 per node, clustering 1.0
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    out = {r["node"]: r for r in triangle_stats(df).collect()}
    assert len(out) == 4
    for n in range(4):
        assert out[n]["degree"] == 3
        assert out[n]["triangles"] == 3
        assert out[n]["clustering_ppm"] == 1000000


def test_triangle_stats_normalizes_direction_and_dupes(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.graph import triangle_stats

    # triangle 1-2-3 given with mixed directions, duplicates, a self
    # loop, and a pendant node 4
    rows = [
        Row(src=1, dst=2), Row(src=2, dst=1), Row(src=2, dst=3),
        Row(src=3, dst=1), Row(src=1, dst=3), Row(src=3, dst=3),
        Row(src=4, dst=1),
    ]
    out = {r["node"]: r for r in triangle_stats(spark.createDataFrame(rows)).collect()}
    assert out[1]["degree"] == 3 and out[1]["triangles"] == 1
    # node 1: d=3, T=1 -> 2*1e6/(3*2) = 333333
    assert out[1]["clustering_ppm"] == 333333
    assert out[2]["triangles"] == 1 and out[2]["clustering_ppm"] == 1000000
    assert out[4]["degree"] == 1 and out[4]["triangles"] == 0
    assert out[4]["clustering_ppm"] == 0  # degree < 2


def test_triangle_stats_no_triangles(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.graph import triangle_stats

    # path graph 1-2-3: open wedge at 2, no closure
    df = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=3)])
    out = {r["node"]: r for r in triangle_stats(df).collect()}
    assert all(r["triangles"] == 0 for r in out.values())
    assert out[2]["degree"] == 2 and out[2]["clustering_ppm"] == 0


# -- weighted quantiles ------------------------------------------------------


def test_grouped_weighted_quantiles_hand_computed(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import grouped_weighted_quantiles

    # values 1..4 with weights 1,1,1,7 (W=10): p=0.5 -> threshold 5,
    # running weights 1,2,3,10 -> q=4 (mass-weighted, NOT the row median 2)
    df = spark.createDataFrame(
        [Row(k="a", v=1.0, w=1), Row(k="a", v=2.0, w=1),
         Row(k="a", v=3.0, w=1), Row(k="a", v=4.0, w=7)]
    )
    got = {
        r["p"]: (r["q"], r["w_total"])
        for r in grouped_weighted_quantiles(df, ["k"], "v", "w", ps=(0.5, 0.9, 0.2)).collect()
    }
    assert got[0.5] == (4.0, 10)
    assert got[0.9] == (4.0, 10)
    assert got[0.2] == (2.0, 10)   # threshold 2 -> second row crosses


def test_grouped_weighted_quantiles_tie_values_stable(spark):
    from pyspark.sql import Row

    from aeon_mecha_spark.operators.analytics import grouped_weighted_quantiles

    # threshold lands inside a run of equal values: answer is that value
    df = spark.createDataFrame(
        [Row(k="a", v=5.0, w=3), Row(k="a", v=5.0, w=3), Row(k="a", v=9.0, w=4)]
    )
    got = {r["p"]: r["q"] for r in grouped_weighted_quantiles(df, ["k"], "v", "w", ps=(0.5,)).collect()}
    assert got[0.5] == 5.0


# -- exact AUC / KS -----------------------------------------------------------


def test_auc_perfect_separation(spark):
    from aeon_mecha_spark.operators.analytics import auc_by_group

    rows = [("g", 1, s) for s in (10, 11, 12)] + [("g", 0, s) for s in (1, 2, 3)]
    df = spark.createDataFrame(rows, "k string, y int, s int")
    out = auc_by_group(df, ["k"], F.col("y") == 1, "s").collect()[0]
    assert out.n_pos == 3 and out.n_neg == 3
    assert out.auc_ppm == 1_000_000  # every pos outranks every neg


def test_auc_random_and_ties(spark):
    from aeon_mecha_spark.operators.analytics import auc_by_group

    # all scores identical -> every pair is a tie -> AUC = 1/2 exactly
    rows = [("g", 1, 5)] * 4 + [("g", 0, 5)] * 6
    df = spark.createDataFrame(rows, "k string, y int, s int")
    out = auc_by_group(df, ["k"], F.col("y") == 1, "s").collect()[0]
    assert out.auc_ppm == 500_000
    assert out.u2 == 4 * 6  # each tied pair contributes 1 to the doubled sum


def test_auc_matches_sklearn_formula_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import auc_by_group

    # pos scores [3, 1], neg scores [2, 1]:
    # pairs: (3,2)w (3,1)w (1,2)l (1,1)tie -> AUC = (2 + 0.5)/4 = 0.625
    rows = [("g", 1, 3), ("g", 1, 1), ("g", 0, 2), ("g", 0, 1)]
    df = spark.createDataFrame(rows, "k string, y int, s int")
    out = auc_by_group(df, ["k"], F.col("y") == 1, "s").collect()[0]
    assert out.auc_ppm == 625_000


def test_ks_disjoint_distributions(spark):
    from aeon_mecha_spark.operators.analytics import ks_statistic

    rows = [("g", 1, s) for s in (10, 11)] + [("g", 0, s) for s in (1, 2)]
    df = spark.createDataFrame(rows, "k string, y int, s int")
    out = ks_statistic(df, ["k"], F.col("y") == 1, "s").collect()[0]
    assert out.ks_ppm == 1_000_000


def test_ks_identical_distributions(spark):
    from aeon_mecha_spark.operators.analytics import ks_statistic

    rows = [("g", y, s) for y in (0, 1) for s in (1, 2, 3)]
    df = spark.createDataFrame(rows, "k string, y int, s int")
    out = ks_statistic(df, ["k"], F.col("y") == 1, "s").collect()[0]
    assert out.ks_ppm == 0


def test_ks_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import ks_statistic

    # pos [1, 2], neg [2, 3]: CDF gaps at 1: |2*1-2*0|=2; at 2: |2*2-2*1|=2;
    # at 3: 0 -> max 2 -> D = 2/(2*2) = 0.5
    rows = [("g", 1, 1), ("g", 1, 2), ("g", 0, 2), ("g", 0, 3)]
    df = spark.createDataFrame(rows, "k string, y int, s int")
    out = ks_statistic(df, ["k"], F.col("y") == 1, "s").collect()[0]
    assert out.d_scaled_max == 2 and out.ks_ppm == 500_000


# -- skyline ------------------------------------------------------------------


def test_skyline_dominance(spark):
    from aeon_mecha_spark.operators.analytics import skyline2d

    rows = [
        ("b", 1.0, 5),   # skyline (cheapest)
        ("b", 2.0, 9),   # skyline (bigger than everything cheaper)
        ("b", 3.0, 9),   # dominated by (2.0, 9): same size, cheaper
        ("b", 2.5, 7),   # dominated by (2.0, 9)
        ("b", 4.0, 10),  # skyline (largest)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y int")
    got = {(r.x, r.y) for r in skyline2d(df, ["k"], "x", "y").collect()}
    assert got == {(1.0, 5), (2.0, 9), (4.0, 10)}


def test_skyline_duplicates_collapse_with_count(spark):
    from aeon_mecha_spark.operators.analytics import skyline2d

    rows = [("k", 1.0, 5), ("k", 1.0, 5), ("k", 2.0, 4)]
    df = spark.createDataFrame(rows, "k string, x double, y int")
    out = skyline2d(df, ["k"], "x", "y").collect()
    assert len(out) == 1 and out[0].n_rows == 2  # dup point kept once, counted


def test_skyline_equal_x_keeps_only_max_y(spark):
    from aeon_mecha_spark.operators.analytics import skyline2d

    rows = [("k", 1.0, 5), ("k", 1.0, 7)]
    df = spark.createDataFrame(rows, "k string, x double, y int")
    out = skyline2d(df, ["k"], "x", "y").collect()
    assert [(r.x, r.y) for r in out] == [(1.0, 7)]


def test_skyline_matches_not_exists_oracle(spark):
    from aeon_mecha_spark.operators.analytics import skyline2d

    import itertools
    import random

    rnd = random.Random(7)
    rows = [
        (f"k{i % 2}", float(rnd.randint(0, 9)), rnd.randint(0, 9))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y int")
    got = {(r.k, r.x, r.y) for r in skyline2d(df, ["k"], "x", "y").collect()}
    pts = {(k, x, y) for k, x, y in rows}
    want = {
        (k, x, y)
        for (k, x, y) in pts
        if not any(
            qk == k and qx <= x and qy >= y and (qx < x or qy > y)
            for (qk, qx, qy) in pts
        )
    }
    assert got == want


# -- attribution --------------------------------------------------------------


def test_attribution_first_last_touch(spark):
    from aeon_mecha_spark.operators.analytics import touch_attribution

    rows = [
        (1, 1, "view", 0.0),
        (1, 2, "click", 0.0),
        (1, 3, "buy", 10.0),   # first=view last=click
        (1, 4, "email", 0.0),
        (1, 5, "buy", 20.0),   # first=view last=email
        (2, 6, "buy", 5.0),    # no touch -> (none)
    ]
    df = spark.createDataFrame(rows, "u int, t int, ty string, v double")
    out = touch_attribution(
        df, ["u"], "t", "ty", "v", F.col("ty") == "buy", order_cols=["t"]
    )
    got = {(r.touch, r.channel): (r.n_conversions, r.value_cents) for r in out.collect()}
    assert got == {
        ("first", "view"): (2, 3000),
        ("first", "(none)"): (1, 500),
        ("last", "click"): (1, 1000),
        ("last", "email"): (1, 2000),
        ("last", "(none)"): (1, 500),
    }


def test_attribution_conversion_not_a_touch(spark):
    from aeon_mecha_spark.operators.analytics import touch_attribution

    # a preceding conversion must never be credited as a touch
    rows = [(1, 1, "buy", 1.0), (1, 2, "buy", 2.0)]
    df = spark.createDataFrame(rows, "u int, t int, ty string, v double")
    out = touch_attribution(
        df, ["u"], "t", "ty", "v", F.col("ty") == "buy", order_cols=["t"]
    )
    assert {r.channel for r in out.collect()} == {"(none)"}


# -- canonical selection ------------------------------------------------------


def test_canonical_select_elects_longest_then_min_id(spark):
    from aeon_mecha_spark.datapipe.dedup import canonical_select

    rows = [
        (1, "Hello, World"),
        (2, "hello world"),       # same fingerprint, shorter raw text
        (3, "hello  world!!"),    # same fingerprint, longest raw text
        (4, "unique doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in canonical_select(df).collect()}
    assert out[1].canonical_id == 3 and not out[1].is_canonical
    assert out[2].canonical_id == 3
    assert out[3].is_canonical and out[3].rank == 1
    assert out[4].is_canonical and out[4].canonical_id == 4


def test_canonical_select_rank_dense_within_cluster(spark):
    from aeon_mecha_spark.datapipe.dedup import canonical_select

    rows = [(i, "same text") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = canonical_select(df).orderBy("rank").collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert all(r.canonical_id == 0 for r in out)  # equal length -> min id


# -- sparse cosine join -------------------------------------------------------


def test_sparse_cosine_exact_hand_case(spark):
    from aeon_mecha_spark.datapipe.similarity import sparse_cosine_join

    rows = [
        (1, "apple banana apple"),   # tf: apple 2, banana 1
        (2, "apple banana banana"),  # tf: apple 1, banana 2
        (3, "cherry cherry"),        # hapax doc -> no kept terms
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sparse_cosine_join(df, max_df=10, min_df=2).collect()
    assert len(out) == 1
    r = out[0]
    # dot = 2*1 + 1*2 = 4; norms 5, 5 -> cos2 = 16/25 = 0.64
    assert (r.id_a, r.id_b, r.dot, r.cos2_ppm) == (1, 2, 4, 640_000)


def test_sparse_cosine_max_df_prunes_pairs(spark):
    from aeon_mecha_spark.datapipe.similarity import sparse_cosine_join

    rows = [(i, "common rare%d" % (i % 2)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 'common' has df=6 > max_df=5 -> only the rare terms (df=3) pair up
    out = sparse_cosine_join(df, max_df=5, min_df=2).collect()
    pair_space = {(r.id_a, r.id_b) for r in out}
    assert pair_space == {(0, 2), (0, 4), (2, 4), (1, 3), (1, 5), (3, 5)}
    assert all(r.cos2_ppm == 1_000_000 for r in out)  # identical kept vectors


def test_sparse_cosine_threshold_filters(spark):
    from aeon_mecha_spark.datapipe.similarity import sparse_cosine_join

    rows = [(1, "a a b"), (2, "a b b"), (3, "a c c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sparse_cosine_join(df, max_df=10, min_df=2, min_cos2_ppm=600_000)
    got = {(r.id_a, r.id_b): r.cos2_ppm for r in out.collect()}
    # kept terms: a (df 3), b (df 2); c is hapax so doc3's kept vector is [a].
    # (1,2): dot=4, n=5,5 -> 640000; (1,3): dot=2, n=5,1 -> 800000;
    # (2,3): dot=1, n=5,1 -> 200000 cut by the threshold
    assert got == {(1, 2): 640_000, (1, 3): 800_000}


# -- BPE ----------------------------------------------------------------------


def test_bpe_learn_sennrich_example(spark):
    from aeon_mecha_spark.datapipe.bpe import bpe_learn

    df = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    got = [(r.rank, r.left, r.right, r.pair_count) for r in bpe_learn(df, 5).collect()]
    # hand-derived: (l,o)x4, (lo,w)x4, then 3-way tie (e,w)/(n,e) -> left asc,
    # then (n,ew)x3, then count-2 tie broken by (left, right) asc -> (e,r)
    assert got == [
        (1, "l", "o", 4),
        (2, "lo", "w", 4),
        (3, "e", "w", 3),
        (4, "n", "ew", 3),
        (5, "e", "r", 2),
    ]


def test_bpe_learn_stops_below_min_count(spark):
    from aeon_mecha_spark.datapipe.bpe import bpe_learn

    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    got = bpe_learn(df, 10, min_count=2).collect()
    assert [(r.left, r.right) for r in got] == [("a", "b")]  # (c,d) count 1 stops


def test_bpe_apply_exact_token_counts(spark):
    from aeon_mecha_spark.datapipe.bpe import apply_bpe_merges

    df = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in apply_bpe_merges(
            df, [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
        ).collect()
    }
    # doc1: low=1, low|e|r=3, low|est=2, low=1 -> 7 tokens over 17 chars
    assert (out[1].n_words, out[1].n_chars, out[1].n_bpe_tokens) == (4, 17, 7)
    # doc2: n|e|w=3, n|e|w|e|r=5, n|e|w|est=4 -> 12 over 14
    assert (out[2].n_words, out[2].n_chars, out[2].n_bpe_tokens) == (3, 14, 12)
    assert out[1].ratio_ppm == (7 * 1_000_000) // 17


def test_bpe_apply_greedy_left_to_right_non_overlapping(spark):
    from aeon_mecha_spark.datapipe.bpe import apply_bpe_merges

    # 'aaa' with merge (a,a): greedy left-to-right -> (aa)(a) = 2 tokens
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    out = apply_bpe_merges(df, [("a", "a")]).collect()[0]
    assert out.n_bpe_tokens == 2


def test_bpe_apply_merges_adjacent_repeated_pairs(spark):
    # Regression (round-7 ADVICE): a single-space symbol encoding
    # under-merges runs because consecutive matches share the boundary
    # space — 'aaaa' came out [aa, a, a]. Greedy reference BPE
    # (Sennrich/HuggingFace) yields [aa, aa]; the double-space
    # encoding must reproduce that, including across stacked rules.
    from aeon_mecha_spark.datapipe.bpe import apply_bpe_merges, bpe_learn

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaa"), (3, "aaaaaa")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_bpe_tokens for r in apply_bpe_merges(df, [("a", "a")]).collect()}
    assert out == {1: 2, 2: 3, 3: 3}  # [aa,aa], [aa,aa,a], [aa,aa,aa]
    out2 = {
        r.doc_id: r.n_bpe_tokens
        for r in apply_bpe_merges(df, [("a", "a"), ("aa", "aa")]).collect()
    }
    assert out2 == {1: 1, 2: 2, 3: 2}  # [aaaa], [aaaa,a], [aaaa,aa]
    # learning on a run-heavy corpus rewrites words the same way:
    # 'aaaa' x3 -> (a,a) count 9 (3 adjacent pairs per word), then the
    # rewritten word is 'aa aa' so round 2 sees (aa,aa) count 3.
    learned = [
        (r.left, r.right, r.pair_count)
        for r in bpe_learn(
            spark.createDataFrame(
                [(i, "aaaa") for i in range(3)], "doc_id long, text string"
            ),
            2,
        ).collect()
    ]
    assert learned == [("a", "a", 9), ("aa", "aa", 3)]


def test_bpe_merges_never_cross_word_boundaries(spark):
    from aeon_mecha_spark.datapipe.bpe import apply_bpe_merges

    df = spark.createDataFrame([(1, "ab a b")], "doc_id long, text string")
    out = apply_bpe_merges(df, [("a", "b")]).collect()[0]
    # 'ab' -> merged 1 token; 'a' 'b' are separate words -> 1 + 1
    assert out.n_bpe_tokens == 3


# -- exact split quotas -------------------------------------------------------


def test_exact_split_quota_largest_remainder(spark):
    from aeon_mecha_spark.datapipe.curation import exact_split_quota

    df = spark.range(34).selectExpr("id AS doc_id", "'s' AS lang")
    out = exact_split_quota(
        df, ["lang"], "doc_id", [("train", 8), ("val", 1), ("test", 1)]
    )
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    # n=34: base (27,3,3), leftover 1 -> val (rem 4) beats test (rem 4) by order
    assert counts == {"train": 27, "val": 4, "test": 3}


def test_exact_split_quota_total_and_disjoint(spark):
    from aeon_mecha_spark.datapipe.curation import exact_split_quota

    df = spark.range(101).selectExpr("id AS doc_id", "CAST(id % 3 AS STRING) AS lang")
    out = exact_split_quota(
        df, ["lang"], "doc_id", [("a", 1), ("b", 1)], seed=3
    ).collect()
    assert len(out) == 101  # every row assigned exactly once
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r.split)
    for lang, splits in per.items():
        n = len(splits)
        assert abs(splits.count("a") - splits.count("b")) <= 1  # exact halves


def test_exact_split_quota_deterministic_across_runs(spark):
    from aeon_mecha_spark.datapipe.curation import exact_split_quota

    df = spark.range(50).selectExpr("id AS doc_id", "'x' AS lang").repartition(7)
    a = {(r.doc_id, r.split) for r in exact_split_quota(df, ["lang"], "doc_id", [("t", 4), ("v", 1)]).collect()}
    b = {(r.doc_id, r.split) for r in exact_split_quota(df.repartition(3), ["lang"], "doc_id", [("t", 4), ("v", 1)]).collect()}
    assert a == b


# -- corr_pairs / woe ---------------------------------------------------------


def test_corr_pairs_perfect_and_none(spark):
    from aeon_mecha_spark.operators.analytics import corr_pairs

    rows = [(i, 3 * i + 7, 5) for i in range(50)]
    df = spark.createDataFrame(rows, "x long, y long, c long")
    got = {(r.col_a, r.col_b): r for r in corr_pairs(df, ["x", "y", "c"]).collect()}
    assert got[("x", "y")].sign == 1 and got[("x", "y")].r2_ppm == 1_000_000
    assert got[("x", "c")].r2_ppm is None  # constant column -> undefined


def test_corr_pairs_matches_numpy(spark):
    import numpy as np

    from aeon_mecha_spark.operators.analytics import corr_pairs

    import random

    rnd = random.Random(5)
    rows = [(rnd.randint(0, 99), rnd.randint(0, 99)) for _ in range(300)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = corr_pairs(df, ["x", "y"]).collect()[0]
    r = np.corrcoef([a for a, _ in rows], [b for _, b in rows])[0, 1]
    assert got.sign == (1 if r > 0 else -1)
    assert abs(got.r2_ppm - int(r * r * 1e6)) <= 1


def test_corr_pairs_negative_correlation_sign(spark):
    from aeon_mecha_spark.operators.analytics import corr_pairs

    rows = [(i, 100 - i) for i in range(40)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = corr_pairs(df, ["x", "y"]).collect()[0]
    assert got.sign == -1 and got.r2_ppm == 1_000_000


def test_woe_hand_computed(spark):
    import math

    from aeon_mecha_spark.operators.analytics import woe_encode

    rows = [("a", 1)] * 30 + [("a", 0)] * 10 + [("b", 1)] * 10 + [("b", 0)] * 30
    df = spark.createDataFrame(rows, "c string, y int")
    got = {r.category: r for r in woe_encode(df, "c", F.col("y") == 1).collect()}
    want_a = math.floor(math.log(((30 + 0.5) / 40) / ((10 + 0.5) / 40)) * 1e6 + 0.5)
    assert got["a"].woe_unat == want_a
    assert got["a"].n_good == 30 and got["a"].n_bad == 10
    # iv term: (g*B - b*G) * woe / (G*B) with G=B=40
    want_iv = (30 * 40 - 10 * 40) * want_a // (40 * 40)
    assert got["a"].iv_micro == want_iv
    # symmetric category contributes equal positive IV
    assert got["b"].iv_micro == want_iv and got["b"].woe_unat == -want_a


# -- cdf / lift / gini / seasonal --------------------------------------------


def test_cdf_transform_ties_share_value(spark):
    from aeon_mecha_spark.operators.analytics import cdf_transform

    df = spark.createDataFrame([("a", v) for v in [1, 2, 2, 3, 10]], "k string, v long")
    got = {(r.v, r.cdf_ppm) for r in cdf_transform(df, ["k"], "v").collect()}
    assert got == {(1, 200_000), (2, 600_000), (3, 800_000), (10, 1_000_000)}


def test_cdf_transform_partition_invariant(spark):
    from aeon_mecha_spark.operators.analytics import cdf_transform

    df = spark.range(100).selectExpr("CAST(id % 3 AS STRING) AS k", "id % 7 AS v")
    a = sorted((r.k, r.v, r.cdf_ppm) for r in cdf_transform(df.repartition(13), ["k"], "v").collect())
    b = sorted((r.k, r.v, r.cdf_ppm) for r in cdf_transform(df.coalesce(1), ["k"], "v").collect())
    assert a == b


def test_lift_table_perfect_classifier(spark):
    from aeon_mecha_spark.operators.analytics import lift_table

    df = spark.createDataFrame([(i, i >= 70) for i in range(100)], "s long, y boolean")
    got = {r.bucket: r for r in lift_table(df, F.col("y"), "s", 10).collect()}
    # top 3 deciles hold all 30 positives; base rate 0.3 -> lift 10/3
    assert got[0].rate_ppm == 1_000_000 and got[0].lift_ppm == 3_333_333
    assert got[2].cum_capture_ppm == 1_000_000
    assert got[9].n_pos == 0 and got[9].lift_ppm == 0
    assert sum(r.n for r in got.values()) == 100


def test_lift_table_heavy_tie_stays_whole(spark):
    from aeon_mecha_spark.operators.analytics import lift_table

    # 50 rows share score 5 -> one bucket holds the whole tie
    rows = [(5, True)] * 50 + [(i, False) for i in range(50)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = lift_table(df, F.col("y"), "s", 10).collect()
    big = [r for r in got if r.n >= 50]
    # scores 49..6 (44 rows) precede the tie; cum_before=44 -> bucket 4,
    # which holds the WHOLE 51-row tie (50 pos + the score-5 negative)
    assert len(big) == 1 and big[0].n_pos == 50 and big[0].n == 55
    assert all(r.n_pos == 0 for r in got if r.bucket != big[0].bucket)


def test_gini_extremes_and_hand_value(spark):
    from aeon_mecha_spark.operators.analytics import gini_by_group

    eq = spark.createDataFrame([("a", 5)] * 4, "k string, v long")
    assert gini_by_group(eq, ["k"], "v").collect()[0].gini_ppm == 0
    # [1,2,2,3,10]: G = (2*73 - 6*18)/(5*18) = 38/90
    df = spark.createDataFrame([("a", v) for v in [1, 2, 2, 3, 10]], "k string, v long")
    assert gini_by_group(df, ["k"], "v").collect()[0].gini_ppm == 38 * 1_000_000 // 90
    # all mass on one row of n: G -> (n-1)/n
    conc = spark.createDataFrame([("a", 0)] * 9 + [("a", 100)], "k string, v long")
    assert gini_by_group(conc, ["k"], "v").collect()[0].gini_ppm == 900_000


def test_seasonal_anomalies_finds_phase_shifted_outlier(spark):
    import datetime

    from aeon_mecha_spark.operators.analytics import seasonal_anomalies

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for day in range(10):
        for hod, v in ((3, 10), (15, 1000)):  # night low, day high
            rows.append(("t", base + datetime.timedelta(days=day, hours=hod), v))
    # a 'normal-at-3pm' value occurring at 3am: flat fences would pass it
    rows.append(("t", base + datetime.timedelta(days=3, hours=3, minutes=30), 1000))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, cents long")
    got = {r.hod: r for r in seasonal_anomalies(df, ["event_type"], "ts", "cents").collect()}
    assert got[3].n_anomalies == 1  # the shifted spike
    assert got[15].n_anomalies == 0


# -- kappa / benford / runs / vocab overlap -----------------------------------


def test_cohens_kappa_perfect_and_chance(spark):
    from aeon_mecha_spark.operators.analytics import cohens_kappa

    perfect = spark.createDataFrame([("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string")
    r = cohens_kappa(perfect, "a", "b").collect()[0]
    assert r.po_ppm == 1_000_000 and r.kappa_ppm == 1_000_000
    # independent marginals at 50/50 -> po = pe = 0.5 -> kappa 0
    chance = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")], "a string, b string"
    )
    assert cohens_kappa(chance, "a", "b").collect()[0].kappa_ppm == 0


def test_cohens_kappa_worse_than_chance_is_negative(spark):
    from aeon_mecha_spark.operators.analytics import cohens_kappa

    anti = spark.createDataFrame([("x", "y")] * 5 + [("y", "x")] * 5, "a string, b string")
    r = cohens_kappa(anti, "a", "b").collect()[0]
    assert r.po_ppm == 0 and r.kappa_ppm == -1_000_000


def test_cohens_kappa_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import cohens_kappa

    # classic 2x2: diag 45, N=60, pe_num = 30*25 + 30*35 = 1800
    rows = [("p", "p")] * 20 + [("p", "n")] * 10 + [("n", "p")] * 5 + [("n", "n")] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    # num = 60*45 - 1800 = 900; den = 3600 - 1800 = 1800 -> 0.5
    assert r.kappa_ppm == 500_000


def test_benford_grid_complete_and_uniform_data(spark):
    from aeon_mecha_spark.operators.analytics import BENFORD_PPM, benford_deviation

    assert sum(BENFORD_PPM.values()) == 1_000_000
    df = spark.range(1, 1000).selectExpr("id AS v")  # 1..999 uniform
    out = benford_deviation(df, "v").collect()
    assert [r.digit for r in out] == list(range(1, 10))
    got = {r.digit: r for r in out}
    # each leading digit owns 111 of 999 values; expected under Benford
    # for digit 1 is ~300.7 -> big deviation term
    assert got[1].observed == 111
    assert got[1].term_milli > got[9].term_milli
    assert sum(r.observed for r in out) == 999


def test_benford_digit_from_string_not_log(spark):
    from aeon_mecha_spark.operators.analytics import benford_deviation

    # exact powers of ten must land on digit 1 (float log10 can misbin)
    df = spark.createDataFrame([(10,), (100,), (1000,), (10**12,)], "v long")
    out = {r.digit: r.observed for r in benford_deviation(df, "v").collect()}
    assert out[1] == 4 and all(out[d] == 0 for d in range(2, 10))


def test_constant_runs_islands(spark):
    from aeon_mecha_spark.operators.analytics import constant_runs

    vals = [5, 5, 5, 2, 5, 5, 7]  # runs: 5x3, 2x1, 5x2, 7x1
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    r = constant_runs(df, ["k"], ["t"], "v", min_len=2).collect()[0]
    assert (r.n_rows, r.n_runs, r.max_run, r.n_stuck_runs) == (7, 4, 3, 2)


def test_constant_runs_separated_equal_values_are_distinct_runs(spark):
    from aeon_mecha_spark.operators.analytics import constant_runs

    rows = [("k", 0, 1), ("k", 1, 2), ("k", 2, 1)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    r = constant_runs(df, ["k"], ["t"], "v", min_len=2).collect()[0]
    assert r.n_runs == 3 and r.max_run == 1


def test_group_term_jaccard_hand_case(spark):
    from aeon_mecha_spark.datapipe.textqc import group_term_jaccard

    rows = [
        (1, "en", "cat dog bird"),
        (2, "en", "dog fish"),
        (3, "de", "dog fish wolf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    r = group_term_jaccard(df, "lang").collect()[0]
    # en vocab {cat,dog,bird,fish}, de vocab {dog,fish,wolf}: inter 2, union 5
    assert (r.g_a, r.g_b, r.inter, r.union_n) == ("de", "en", 2, 5)
    assert r.jaccard_ppm == 400_000


# -- decompose / rolling median / cusum --------------------------------------


def test_decompose_identity_and_seasonality(spark):
    import datetime

    from aeon_mecha_spark.operators.analytics import decompose_seasonal

    base = datetime.datetime(2024, 1, 1)
    # 4 days, value = 100 + 50 when hod == 6 (pure seasonal signal)
    rows = [
        ("k", base + datetime.timedelta(days=d, hours=h), 100 + (50 if h == 6 else 0))
        for d in range(4)
        for h in range(24)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = decompose_seasonal(df, ["k"], "ts", "v", half_window=24).orderBy("ts").collect()
    # exact additive identity in milli units
    assert all(1000 * r.value == r.trend_milli + r.seasonal_milli + r.residual_milli for r in out)
    mid = [r for r in out if 24 <= out.index(r) < 72]
    spikes = [r for r in mid if r.ts.hour == 6]
    flats = [r for r in mid if r.ts.hour != 6]
    # the seasonal component absorbs the hod-6 bump, not the residual
    assert all(r.seasonal_milli > 40_000 for r in spikes)
    assert all(abs(r.residual_milli) < 10_000 for r in spikes + flats)


def test_rolling_median_resists_spike(spark):
    from aeon_mecha_spark.operators.analytics import rolling_median

    rows = [("k", i, 100 if i != 5 else 99999) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    out = rolling_median(df, ["k"], ["t"], "v", window=3).orderBy("t").collect()
    assert all(r.rolling_median == 100 for r in out)  # spike never wins a 3-frame


def test_rolling_median_shrinking_head_frames(spark):
    from aeon_mecha_spark.operators.analytics import rolling_median

    rows = [("k", i, v) for i, v in enumerate([1, 9, 5])]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = [r.rolling_median for r in rolling_median(df, ["k"], ["t"], "v", 3).orderBy("t").collect()]
    # frames: [1] -> 1; [1,9] -> type-1 at ceil(2/2)=1 -> 1; [1,9,5] -> 5
    assert got == [1, 1, 5]


def test_cusum_finds_mean_shift(spark):
    from aeon_mecha_spark.operators.analytics import cusum_changepoint

    rows = [("k", i, 100 if i < 10 else 200) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    r = cusum_changepoint(df, ["k"], ["t"], "v").collect()[0]
    # D_i = |20*S_i - i*3000| peaks at i=10: |20*1000 - 10*3000| = 10000
    assert r.cp_index == 10 and r.dev_scaled == 10_000
    assert r.dev_ppm == 10_000 * 1_000_000 // (20 * 3000)


def test_cusum_uniform_series_scores_zero(spark):
    from aeon_mecha_spark.operators.analytics import cusum_changepoint

    rows = [("k", i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    r = cusum_changepoint(df, ["k"], ["t"], "v").collect()[0]
    assert r.dev_scaled == 0 and r.dev_ppm == 0 and r.cp_index == 1  # earliest tie


# -- confusion / KL / ndcg ----------------------------------------------------


def test_confusion_metrics_sklearn_hand_case(spark):
    from aeon_mecha_spark.operators.analytics import confusion_metrics

    rows = (
        [("a", "a")] * 8 + [("a", "b")] * 2 + [("b", "b")] * 5
        + [("b", "c")] * 1 + [("c", "a")] * 1
    )
    df = spark.createDataFrame(rows, "act string, pred string")
    got = {r.label: r for r in confusion_metrics(df, "act", "pred").collect()}
    a = got["a"]  # tp 8, fp 1 (c->a), fn 2
    assert (a.tp, a.fp, a.fn) == (8, 1, 2)
    assert a.precision_ppm == 8_000_000 // 9 and a.recall_ppm == 800_000
    assert a.f1_ppm == 16_000_000 // 19
    c = got["c"]  # never predicted correctly
    assert (c.tp, c.fp, c.fn) == (0, 1, 1) and c.f1_ppm == 0


def test_confusion_metrics_class_only_predicted(spark):
    from aeon_mecha_spark.operators.analytics import confusion_metrics

    df = spark.createDataFrame([("x", "y"), ("x", "x")], "act string, pred string")
    got = {r.label: r for r in confusion_metrics(df, "act", "pred").collect()}
    # 'y' exists only on the predicted side: recall undefined -> NULL
    assert got["y"].fp == 1 and got["y"].fn == 0
    assert got["y"].recall_ppm is None


def test_categorical_kl_identical_distributions_zero(spark):
    from aeon_mecha_spark.operators.analytics import categorical_kl

    rows = [("x", s) for s in (0, 1) for _ in range(30)] + [
        ("y", s) for s in (0, 1) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "c string, s int")
    out = categorical_kl(df, "c", F.col("s") == 1).collect()
    assert all(r.term_unat == 0 and r.log_ratio_unat == 0 for r in out)


def test_categorical_kl_matches_hand_formula(spark):
    import math

    from aeon_mecha_spark.operators.analytics import categorical_kl

    rows = [("x", 1)] * 50 + [("y", 1)] * 50 + [("x", 0)] * 90 + [("y", 0)] * 10
    df = spark.createDataFrame(rows, "c string, s int")
    got = {r.category: r for r in categorical_kl(df, "c", F.col("s") == 1).collect()}
    lx = math.floor(math.log((50.5 / 101.0) / (90.5 / 101.0)) * 1e6 + 0.5)
    assert got["x"].log_ratio_unat == lx
    # term = sign * abs((2*50+1)*lx) // (2*100+2)
    assert got["x"].term_unat == -(abs(101 * lx) // 202)
    assert got["y"].term_unat > 0  # overrepresented in P


def test_ndcg_perfect_and_tail_ranking(spark):
    from aeon_mecha_spark.operators.analytics import _dcg_discount_micro, ndcg_at_k

    rows = [("g", i, i >= 7) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, s long, rel boolean")
    top = ndcg_at_k(df, ["k"], F.col("rel"), [F.col("s").desc()], 5).collect()[0]
    assert top.ndcg_ppm == 1_000_000  # relevant items rank 1-3
    worst = ndcg_at_k(df, ["k"], F.col("rel"), [F.col("s").asc()], 5).collect()[0]
    assert worst.dcg_micro == 0 and worst.ndcg_ppm == 0  # pushed past k


def test_ndcg_partial_hand_value(spark):
    from aeon_mecha_spark.operators.analytics import _dcg_discount_micro, ndcg_at_k

    rows = [("g", i, i in (0, 5)) for i in range(10)]  # rel at desc-ranks 10, 5
    df = spark.createDataFrame(rows, "k string, s long, rel boolean")
    r = ndcg_at_k(df, ["k"], F.col("rel"), [F.col("s").desc()], 5).collect()[0]
    d = _dcg_discount_micro(5)
    assert r.dcg_micro == d[4]  # only the rank-5 hit lands inside k
    assert r.idcg_micro == d[0] + d[1]
    assert r.ndcg_ppm == d[4] * 1_000_000 // (d[0] + d[1])


def test_ndcg_key_with_no_relevant_is_null(spark):
    from aeon_mecha_spark.operators.analytics import ndcg_at_k

    df = spark.createDataFrame([("g", 1, False), ("g", 2, False)], "k string, s long, rel boolean")
    r = ndcg_at_k(df, ["k"], F.col("rel"), [F.col("s").desc()], 5).collect()[0]
    assert r.n_relevant == 0 and r.idcg_micro is None and r.ndcg_ppm is None


# -- ewma / bootstrap / compaction -------------------------------------------


def test_ewma_weights_exact_geometric(spark):
    from aeon_mecha_spark.operators.windows import ewma_weights_micro

    ws = ewma_weights_micro(1, 4, 4)
    assert ws == [250000, 187500, 140625, 105468]  # floor(1e6*0.25*0.75^i)


def test_ewma_converges_to_step(spark):
    from aeon_mecha_spark.operators.windows import ewma

    rows = [("k", i, 100 if i < 5 else 200) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = [r.ewma_milli for r in ewma(df, ["k"], ["t"], "v").orderBy("t").collect()]
    assert got[0] == 100_000  # head renormalization keeps level exact
    assert got[4] == 100_000
    assert 100_000 < got[5] < 200_000  # step response
    assert got[-1] > 195_000  # converged near the new level


def test_ewma_head_renormalizes_like_adjust(spark):
    from aeon_mecha_spark.operators.windows import ewma

    # constant series must be EXACTLY constant at every prefix length
    df = spark.createDataFrame([("k", i, 77) for i in range(6)], "k string, t int, v long")
    got = {r.t: r.ewma_milli for r in ewma(df, ["k"], ["t"], "v", depth=4).collect()}
    assert all(v == 77_000 for v in got.values())


def test_bootstrap_se_deterministic_and_sane(spark):
    from aeon_mecha_spark.operators.analytics import bootstrap_se

    df = spark.range(1000).selectExpr("'g' AS k", "id", "id % 100 AS v")
    a = bootstrap_se(df.repartition(7), ["k"], "id", "v", replicates=16).collect()[0]
    b = bootstrap_se(df.coalesce(1), ["k"], "id", "v", replicates=16).collect()[0]
    assert tuple(a) == tuple(b)  # partitioning-invariant
    assert a.mean_micro == 49_500_000  # exact mean of 0..99
    # analytic Var(mean) ~ 0.833 micro2*1e12; 16 replicates -> loose band
    assert 0.2e12 < a.var_micro2 < 3e12


def test_bootstrap_se_seed_changes_replicates_not_mean(spark):
    from aeon_mecha_spark.operators.analytics import bootstrap_se

    df = spark.range(500).selectExpr("'g' AS k", "id", "id % 50 AS v")
    a = bootstrap_se(df, ["k"], "id", "v", replicates=8, seed=0).collect()[0]
    b = bootstrap_se(df, ["k"], "id", "v", replicates=8, seed=1).collect()[0]
    assert a.mean_micro == b.mean_micro
    assert a.var_micro2 != b.var_micro2  # different draws


def test_compaction_plan_bin_balance(spark):
    from aeon_mecha_spark.datapipe.curation import compaction_plan

    # 100 files of 30 -> total 3000, target 300 -> 10 bins of 10 files
    df = spark.range(100).selectExpr("id", "30 AS sz")
    out = compaction_plan(df, "id", "sz", 300).collect()
    bins = {}
    for r in out:
        bins.setdefault(r.bin_id, []).append(r.size)
    assert len(bins) == 10
    assert all(sum(v) == 300 and len(v) == 10 for v in bins.values())
    assert all(r.bin_total == 300 and r.bin_files == 10 for r in out)


def test_compaction_plan_skewed_sizes_spread(spark):
    from aeon_mecha_spark.datapipe.curation import compaction_plan

    # one huge file + many tiny: nbins from the total, big file alone-ish
    rows = [(0, 1000)] + [(i, 10) for i in range(1, 51)]
    df = spark.createDataFrame(rows, "id long, sz long")
    out = compaction_plan(df, "id", "sz", 500)  # total 1500 -> 3 bins
    stats = {r.bin_id: r.bin_total for r in out.collect()}
    assert len(stats) == 3
    big_bin = [r.bin_id for r in out.collect() if r.id == 0][0]
    # round-robin puts the huge file in bin 0 with ~1/3 of the tinies
    assert stats[big_bin] >= 1000


# -- quantile map / temporal 2hop / pps ---------------------------------------


def test_quantile_map_matches_ref_scale(spark):
    from aeon_mecha_spark.operators.analytics import quantile_map

    rows = [("en", v) for v in (10, 20, 30, 40, 50)] + [("de", v) for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame([(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g string, v long")
    got = {(r.g, r.v): r.mapped_value for r in quantile_map(df, "g", "v", "en").collect()}
    assert got == {
        ("de", 1): 10, ("de", 2): 20, ("de", 3): 30, ("de", 4): 40, ("de", 5): 50,
        ("en", 10): 10, ("en", 20): 20, ("en", 30): 30, ("en", 40): 40, ("en", 50): 50,
    }


def test_quantile_map_skewed_sizes_inclusive_lookup(spark):
    from aeon_mecha_spark.operators.analytics import quantile_map

    # de has 2 values (cdf 50/100), en has 4 (25/50/75/100):
    # de@500000 -> smallest en value with cdf >= 500000 -> the 2nd
    rows = [("en", v) for v in (1, 2, 3, 4)] + [("de", 100), ("de", 200)]
    df = spark.createDataFrame([(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g string, v long")
    got = {(r.g, r.v): r.mapped_value for r in quantile_map(df, "g", "v", "en").collect()}
    assert got[("de", 100)] == 2 and got[("de", 200)] == 4


def test_temporal_two_hop_causal_only(spark):
    import datetime

    from aeon_mecha_spark.operators.graph import temporal_two_hop

    b = datetime.datetime(2024, 1, 1)

    def ts(m):
        return b + datetime.timedelta(minutes=m)

    edges = spark.createDataFrame(
        [("a", "b", ts(0)), ("b", "c", ts(5)), ("b", "d", ts(120)), ("x", "b", ts(10))],
        "src string, dst string, ts timestamp",
    )
    got = {(r.src, r.dst2): (r.n_paths, r.n_mids) for r in temporal_two_hop(edges, max_gap_s=3600).collect()}
    # a->b(0) then b->c(5) ok; b->d(120min) outside gap; x->b(10) has no
    # later b-outgoing edge inside the gap except b->d (outside)
    assert got == {("a", "c"): (1, 1)}


def test_temporal_two_hop_rejects_same_timestamp(spark):
    import datetime

    from aeon_mecha_spark.operators.graph import temporal_two_hop

    t0 = datetime.datetime(2024, 1, 1)
    edges = spark.createDataFrame(
        [("a", "b", t0), ("b", "c", t0)], "src string, dst string, ts timestamp"
    )
    assert temporal_two_hop(edges).count() == 0  # strict >


def test_pps_uniform_weights_evenly_spaced(spark):
    from aeon_mecha_spark.datapipe.curation import pps_systematic_sample

    df = spark.range(100).selectExpr("'s' AS g", "id", "1 AS w")
    out = sorted(r.id for r in pps_systematic_sample(df, ["g"], "id", "w", 10).collect())
    # uniform weights -> exactly every 10th row (cum = id+1; boundary
    # multiples of 10 land on ids 9, 19, ..., 99)
    assert out == [9, 19, 29, 39, 49, 59, 69, 79, 89, 99]


def test_pps_heavy_row_counted_once_with_boundary_count(spark):
    from aeon_mecha_spark.datapipe.curation import pps_systematic_sample

    # one row carries half the mass -> it contains ~k/2 boundaries
    rows = [(0, 100)] + [(i, 2) for i in range(1, 51)]
    df = spark.createDataFrame(rows, "id long, w long")
    df = df.selectExpr("'s' AS g", "id", "w")
    out = {r.id: r.n_boundaries for r in pps_systematic_sample(df, ["g"], "id", "w", 10).collect()}
    assert out[0] == 5  # 100/200 of the mass -> 5 of 10 boundaries
    assert sum(out.values()) == 10  # boundaries conserved


# -- relational composition gates (Q8/Q13/funnel latency) ---------------------


def test_market_share_exact_partition(spark):
    import __spark_entry__ as m

    out = m.queries()["q187_market_share"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.nation_volume <= r.total_volume
        assert r.share_ppm == r.nation_volume * 1_000_000 // r.total_volume


def test_custdist_counts_all_customers(spark):
    import duckdb

    import __spark_entry__ as m

    out = m.queries()["q188_custdist"](spark, "/root/testdata/sf0.001").collect()
    total = sum(r.custdist for r in out)
    n_cust = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/customer.parquet'"
    ).fetchone()[0]
    assert total == n_cust  # zero-order customers included


def test_funnel_latency_positive_and_ordered(spark):
    import __spark_entry__ as m

    out = m.queries()["q189_funnel_latency"](spark, "/root/testdata/sf0.001").collect()
    by_pair = {}
    for r in out:
        by_pair.setdefault(r.step_pair, {})[r.p] = r.q
    for pair, qs in by_pair.items():
        assert qs[0.5] >= 0 and qs[0.9] >= qs[0.5]  # p90 >= median


# -- HLL / k-core -------------------------------------------------------------


def test_hll_small_range_exact_via_linear_counting(spark):
    from aeon_mecha_spark.datapipe.sketch import hll_distinct

    df = spark.range(10).selectExpr("'g' AS g", "CAST(id AS STRING) AS v")
    r = hll_distinct(df, ["g"], "v").collect()[0]
    assert r.v_zeros == 54  # 10 distinct hashes landed in 10 buckets
    assert abs(r.estimate - 10) <= 2  # LC regime: 64*ln(64/54) ~ 10.9


def test_hll_error_within_bounds(spark):
    from aeon_mecha_spark.datapipe.sketch import hll_distinct

    for n in (1000, 20000):
        df = spark.range(n).selectExpr("'g' AS g", "CAST(id AS STRING) AS v")
        r = hll_distinct(df, ["g"], "v").collect()[0]
        # 3 sigma at m=64: 3*1.04/8 = 39%
        assert abs(r.estimate - n) / n < 0.39


def test_hll_partition_invariant(spark):
    from aeon_mecha_spark.datapipe.sketch import hll_distinct

    df = spark.range(5000).selectExpr("CAST(id % 3 AS STRING) AS g", "CAST(id AS STRING) AS v")
    a = sorted(tuple(r) for r in hll_distinct(df.repartition(13), ["g"], "v").collect())
    b = sorted(tuple(r) for r in hll_distinct(df.coalesce(1), ["g"], "v").collect())
    assert a == b


def test_hll_rank_case_thresholds(spark):
    from aeon_mecha_spark.datapipe.sketch import hll_rank_case

    rows = spark.sql(
        "SELECT " + hll_rank_case("w") + " AS r FROM VALUES "
        + ", ".join(f"({v})" for v in [2**53, 2**53 - 1, 1, 0]) + " AS t(w)"
    ).collect()
    # 2^53 -> rank 1; 2^53-1 -> rank 2 (float log2 would say 1); 1 -> 54; 0 -> 55
    assert [r.r for r in rows] == [1, 2, 54, 55]


def test_kcore_triangle_with_tail(spark):
    from aeon_mecha_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = sorted((r.node, r.degree) for r in kcore(edges, 2).collect())
    assert got == [("a", 2), ("b", 2), ("c", 2)]  # tail peeled


def test_kcore_clique_survives_its_own_k(spark):
    from aeon_mecha_spark.operators.graph import kcore

    k4 = [(x, y) for i, x in enumerate("wxyz") for y in "wxyz"[i + 1 :]]
    edges = spark.createDataFrame(k4, "src string, dst string")
    got = sorted((r.node, r.degree) for r in kcore(edges, 3).collect())
    assert got == [("w", 3), ("x", 3), ("y", 3), ("z", 3)]
    assert kcore(edges, 4).count() == 0  # no 4-core in a 4-clique


def test_kcore_cascade_peel_needs_multiple_rounds(spark):
    from aeon_mecha_spark.operators.graph import kcore

    # path graph: peeling ends at empty for k=2, one endpoint per round
    path = [(str(i), str(i + 1)) for i in range(6)]
    edges = spark.createDataFrame(path, "src string, dst string")
    assert kcore(edges, 2, max_rounds=20).count() == 0
    # a FIXED 1-round peel keeps the interior (partial peel semantics)
    assert kcore(edges, 2, max_rounds=1).count() > 0


def test_auc_ks_single_class_key_is_null_not_error(spark):
    from aeon_mecha_spark.operators.analytics import auc_by_group, ks_statistic

    # a key with only positives must yield NULL metrics, not DIVIDE_BY_ZERO
    rows = [("only_pos", 1, s) for s in (1, 2, 3)] + [("both", y, y) for y in (0, 1)]
    df = spark.createDataFrame(rows, "k string, y int, s int")
    auc = {r.k: r.auc_ppm for r in auc_by_group(df, ["k"], F.col("y") == 1, "s").collect()}
    ks = {r.k: r.ks_ppm for r in ks_statistic(df, ["k"], F.col("y") == 1, "s").collect()}
    assert auc["only_pos"] is None and ks["only_pos"] is None
    assert auc["both"] is not None and ks["both"] is not None


def test_bpe_gate_constants_match_training(spark):
    """The fixed _BPE_MERGES literals that hash-gate q162 must be exactly
    what q163's trainer produces on its slice — the trained-model pair
    stays self-consistent if either side changes."""
    import __spark_entry__ as m

    learned = [
        (r.left, r.right)
        for r in m.queries()["q163_bpe_learn"](spark, "/root/testdata/sf0.01").collect()
    ]
    assert learned == list(m._BPE_MERGES)


# -- feature hashing / position attribution -----------------------------------


def test_feature_hash_fixed_space_and_signs(spark):
    from aeon_mecha_spark.datapipe.textqc import feature_hash

    df = spark.createDataFrame([(1, "a b a c"), (2, "b b d")], "doc_id long, text string")
    out = feature_hash(df, 16).collect()
    assert all(0 <= r.feature < 16 for r in out)
    # the same token always lands in the same signed bucket: doc1 has
    # 'a' twice -> one bucket holds |value| == 2
    assert any(abs(r.value) == 2 for r in out if r.doc_id == 1)


def test_feature_hash_partition_invariant(spark):
    from aeon_mecha_spark.datapipe.textqc import feature_hash

    df = spark.range(50).selectExpr("id AS doc_id", "concat('tok', CAST(id % 7 AS STRING), ' x y') AS text")
    a = sorted(tuple(r) for r in feature_hash(df.repartition(9), 32).collect())
    b = sorted(tuple(r) for r in feature_hash(df.coalesce(1), 32).collect())
    assert a == b


def test_position_attribution_u_shape_and_conservation(spark):
    from aeon_mecha_spark.operators.analytics import position_attribution

    rows = [
        (1, 1, "view", 0.0), (1, 2, "email", 0.0), (1, 3, "click", 0.0), (1, 4, "buy", 10.0),
        (2, 5, "view", 0.0), (2, 6, "buy", 5.0),
    ]
    df = spark.createDataFrame(rows, "u int, t int, ty string, v double")
    got = {r.channel: r.credit_cents for r in position_attribution(
        df, ["u"], "t", "ty", "v", F.col("ty") == "buy", order_cols=["t"]
    ).collect()}
    assert got == {"view": 400 + 500, "email": 200, "click": 400}
    assert sum(got.values()) == 1500  # every cent conserved


def test_position_attribution_remainder_to_last(spark):
    from aeon_mecha_spark.operators.analytics import position_attribution

    # 10.01 over 4 touches: fc=400, lc=400, mt=201 -> middles 100+100,
    # last gets 400 + (201 - 200) = 401
    rows = [(1, i, f"ch{i}", 0.0) for i in range(4)] + [(1, 9, "buy", 10.01)]
    df = spark.createDataFrame(rows, "u int, t int, ty string, v double")
    got = {r.channel: r.credit_cents for r in position_attribution(
        df, ["u"], "t", "ty", "v", F.col("ty") == "buy", order_cols=["t"]
    ).collect()}
    assert got == {"ch0": 400, "ch1": 100, "ch2": 100, "ch3": 401}
    assert sum(got.values()) == 1001


# -- TPC-H Q15/Q17/Q18/Q21/Q22 shapes ----------------------------------------


def test_top_supplier_tie_inclusive(spark):
    import __spark_entry__ as m

    out = m.queries()["q194_top_supplier"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 1
    assert len({r.total_revenue for r in out}) == 1  # all rows share the max


def test_small_qty_filter_cross_multiplied(spark):
    import __spark_entry__ as m

    r = m.queries()["q195_small_qty_revenue"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r.avg_yearly_milli == r.total_cents * 1000 // 7


def test_large_orders_threshold_and_ordering(spark):
    import __spark_entry__ as m

    out = m.queries()["q196_large_orders"](spark, "/root/testdata/sf0.001").collect()
    assert all(r.sum_qty > 150 for r in out)
    qtys = [r.sum_qty for r in out]
    assert qtys == sorted(qtys, reverse=True)


def test_waiting_supplier_exactly_one_blamed(spark):
    from pyspark.sql import functions as F

    import __spark_entry__ as m

    # hand graph: order 1 has suppliers A (all late) and B (on time)
    # -> A blamed; order 2 single-supplier late -> nobody blamed
    spark.createDataFrame(
        [(1, 10, "1998-01-01"), (2, 20, "1998-01-01")],
        "o_orderkey long, o_custkey long, d string",
    ).selectExpr("o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate").createOrReplaceTempView("_ord")
    spark.createDataFrame(
        [
            (1, 100, "1998-06-01"),  # A late
            (1, 200, "1998-01-15"),  # B on time
            (2, 100, "1998-06-01"),  # single-supplier order
        ],
        "l_orderkey long, l_suppkey long, d string",
    ).selectExpr("l_orderkey", "l_suppkey", "CAST(d AS TIMESTAMP) AS l_shipdate").createOrReplaceTempView("_li")
    li = spark.table("_li")
    orders = spark.table("_ord")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.unix_micros("l_shipdate") > F.unix_micros("o_orderdate") + 60 * 86400 * 1_000_000)
        .cast("int").alias("_late"),
    )
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(F.min("_late").alias("_all_late"))
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"), F.sum("_all_late").alias("_n_late")
    )
    blamed = per_os.filter(F.col("_all_late") == 1).join(
        per_o.filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)), "l_orderkey"
    )
    assert [(r.l_suppkey) for r in blamed.collect()] == [100]


def test_idle_customers_cross_multiplied_avg(spark):
    import duckdb

    import __spark_entry__ as m

    out = m.queries()["q198_idle_customers"](spark, "/root/testdata/sf0.01").collect()
    total = sum(r.numcust for r in out)
    want = duckdb.sql("""
        WITH b AS (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal
                   FROM '/root/testdata/sf0.01/customer.parquet'),
        t AS (SELECT sum(CAST(bal AS HUGEINT)) sb, count(*) nb FROM b WHERE bal > 0),
        rich AS (SELECT b.* FROM b CROSS JOIN t WHERE CAST(bal AS HUGEINT)*nb > sb)
        SELECT count(*) FROM rich WHERE NOT EXISTS (
          SELECT 1 FROM '/root/testdata/sf0.01/orders.parquet' o
          WHERE o.o_custkey = rich.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-08-01')
    """).fetchone()[0]
    assert total == want and total > 0


def test_rolling_distinct_hand_sequence(spark):
    import __spark_entry__ as m
    from pyspark.sql import functions as F, Window as W

    rows = [("t", i, i, u) for i, u in enumerate([1, 1, 2, 1, 3])]
    df = spark.createDataFrame(rows, "event_type string, ts long, event_id long, user_id long")
    w = W.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-2, 0)
    out = df.withColumn(
        "rd", F.size(F.array_distinct(F.collect_list("user_id").over(w)))
    ).orderBy("ts").collect()
    assert [r.rd for r in out] == [1, 1, 2, 2, 3]


def test_snapshot_fingerprint_detects_one_row_change(spark):
    import __spark_entry__ as m

    base = m.queries()["q200_snapshot_fingerprint"](spark, "/root/testdata/sf0.001")
    a = {r.table_name: (r.n_rows, r.xor_sig, r.sum_sig) for r in base.collect()}
    assert set(a) == {"customer", "documents", "lineitem", "orders", "part"}
    # recompute with one mutated document: digest must differ ONLY there
    from aeon_mecha_spark.pipeline.reconcile import row_hash
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumn(
        "n_chars", F.when(F.col("doc_id") == 0, F.col("n_chars") + 1).otherwise(F.col("n_chars"))
    )
    rh = row_hash(F.col("doc_id"), F.col("lang"), F.col("n_chars")).alias("_rh")
    mut = docs.select(rh).agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor("_rh").alias("x"),
        F.sum(F.col("_rh") % F.lit(1 << 30)).alias("s"),
    ).collect()[0]
    assert (mut.n, mut.x, mut.s) != a["documents"]
    assert mut.n == a["documents"][0]  # same row count, different content


def test_hll_merge_lossless_vs_direct(spark):
    from aeon_mecha_spark.datapipe.sketch import (
        hll_distinct,
        hll_estimate_registers,
        hll_merge,
        hll_partial,
    )

    df = spark.range(3000).selectExpr(
        "CAST(id % 2 AS STRING) AS g", "CAST(id % 5 AS STRING) AS sub",
        "CAST(id AS STRING) AS v",
    )
    direct = sorted(tuple(r) for r in hll_distinct(df, ["g"], "v").collect())
    rolled = sorted(
        tuple(r)
        for r in hll_estimate_registers(
            hll_merge(hll_partial(df, ["g", "sub"], "v"), ["g"]), ["g"]
        ).collect()
    )
    assert direct == rolled  # register max is associative
