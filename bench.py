"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "runs": {name: [sec, ...]}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full materialization of
every output column — ``count()`` would let Catalyst prune the computed
columns and under-report).

Load robustness: every query runs $SPARK_GRAFT_BENCH_REPS times (default
3) and reports the BEST run — concurrent machine load only ever slows a
run down, so min is the low-noise estimator of the code's cost; all raw
runs are emitted under "runs" so variance is visible. The Spark cache is
cleared between reps (queries that .cache() intermediates would otherwise
get a warm-cache rep 2+).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward scale-sensitive
# plans (shuffles, windows, interval joins, explode-heavy text ops).
# Capped so the one-line JSON stays inside the driver's ~2000-char
# capture (test_driver_contract pins this): when a new gate joins the
# set, a family-redundant older entry leaves (its plan shape must stay
# represented by a named sibling; BENCH_DETAIL.json still names all).
# Round-9 rotation (stdout gained sentinel/norm_total keys): q13 lag
# window -> q181 ewma; q47 hyperplane-LSH -> q48 IVF + q72 LSH dedup;
# q120 IQR fences -> q151 MAD grain medians; q162 BPE apply -> q163 learn;
# q174 pairwise vocab -> q159 sparse cosine; q179 KL -> q204 PSI +
# q210 JSD. Second wave (q243-q247 joined): q34 minhash -> q35
# (includes the minhash stage); q143 chi2 -> q242 (cells + isqrt);
# q148 winsorize -> q151 (quantile fences broadcast back); q167
# per-key CDF window -> q170 (same one-sort-per-key shape); q195
# avg-threshold filter -> q237 (same cross-multiplied shape).
# Round-10 rotation (q248-q250 joined): q238 PR curve -> q209 (identical
# prefix-sum machinery); q239 lorenz -> q209 (same ascending family);
# q214 calibration -> q250 (same bucket pipeline, superset terms).
# Round-11 rotation: q48 IVF -> q271 (the composed IVF-PQ search
# CONTAINS q48's routing stage plus ADC + re-rank); q237 Q20
# threshold -> q269 Q11 (same scalar-threshold family; q269 adds
# the persisted self-rollup broadcast). q270 Q16 stays gate-only
# (count-distinct family already represented by q199/q245).
# Round-10 wave-2 (q251-q259 joined): q244 Q7 snowflake -> q251 Q5
# (same 6-table dim-broadcast shape + the compound join condition);
# q208 MWU -> q255 kendall (q248 cliffs keeps the grain-prefix rank
# family; kendall adds the grain self-join shape); q88 tfidf -> q256
# zipf (q131 BM25 keeps the tf-df-broadcast family; zipf adds the
# topN-head + integer-OLS tail); q147 impute-median -> q254
# brown-forsythe (q151 keeps the fill/fence family; BF adds the
# selection-median -> integer-ANOVA chain).
# Round-13 (optimization round): the r13 build's 5 rotations are kept
# as ADDITIONS — the rotated-out entries (q159, q163, q205, q217,
# q279) are restored so BENCH_r13's "queries" is a strict superset of
# BENCH_r12's (the optimization driver diffs per-query seconds across
# rounds; a removed key breaks that comparison).
HEADLINE = [
    "q01_pricing_summary",   # scan + groupBy agg
    "q06_revenue_by_nation", # multi-join + agg
    "q15_rolling_1h",        # range-frame rolling window
    "q17_hourly_rollup",     # tumbling window agg
    "q18_asof_join",         # as-of union-merge join
    "q19_interval_count",    # point-in-interval join
    "q22_sync_regression",   # closed-form OLS moments
    "q35_lsh_jaccard",       # LSH band self-join + verify
    "q46_bucketed_range_join",  # big-big range join (no broadcast)
    "q271_ivf_pq_search",    # composed IVF-PQ ANN (route+ADC+re-rank)
    "q72_near_dup_lsh",      # LSH-bucketed near-dup (scale-safe default)
    "q73_decontaminate",     # broadcast benchmark-shingle overlap
    "q90_token_budget",      # distributed two-level prefix sum
    "q92_embedding_covariance",  # mapInPandas outer-product reduce
    "q97_substring_dedup",   # gram explode + span merge (persist reuse)
    "q106_curation_pipeline",  # 4-stage composed curation chain
    "q111_winnowing",        # MOSS frame-min fingerprints
    "q276_perplexity_buckets",  # CCNet buckets (rotated in r12 for q112: same LM family, heavier plan)
    "q114_grouped_quantiles",  # exact type-1 quantiles, one window
    "q115_range_shard",      # sampled-boundary deterministic range shard
    "q116_semantic_dedup",   # LSH pairs -> components -> canonical
    "q118_bucketed_join",    # bucketed write + shuffle-free merge join
    "q119_continuous_rollup",  # two-step incremental rollup refresh
    "q121_crosscorpus_dedup",  # two-corpus band-bucket join + verify
    # (q122_bloom_ledger is deliberately NOT in the headline set: its
    # cost is three micro-batch parquet sink+state writes, an ingest
    # shape the correctness gate covers; timing it here would measure
    # disk, not plans)
    "q123_interpolate_linear",  # 4 window exprs, 2 frames, one sort
    "q126_scd2_merge",       # SCD2 open-slice merge (4-branch union)
    "q127_pagerank",         # 5-iteration integer PageRank (join+agg per iter)
    # (q129_stateful_dropcount is NOT in the headline set for the same
    # reason as q122: it drains a Structured Streaming query whose cost
    # is dominated by stream setup/checkpointing, not the plan)
    "q131_bm25",             # query-restricted BM25 (broadcast df/stats)
    "q135_sliding_window",   # hopping windows: map-side explode + partial agg
    # (q136_stream_stream_join is NOT in the headline set for the same
    # reason as q122/q129: stream setup + memory-sink drain dominate)
    # (q138_streaming_sessions is NOT in the headline set for the same
    # reason as q122/q129/q136: the AvailableNow drain dominates)
    "q139_table_diff",       # CDC diff: digest-width full-outer join
    "q140_pmi_collocations",  # exact linearized-PMI collocation mining
    "q141_repetition_signals",  # Gopher repetition: map-side + doc-keyed mode
    "q144_ngram_novelty",    # keep-first gram ownership, gram/doc-keyed
    "q145_rrf_fusion",       # RRF blend over TakeOrdered top-200 lists
    "q146_sequence_pattern",  # A-then-B via value-based RANGE frame
    "q149_cube_agg",         # 2-dim CUBE in one Expand+aggregate
    "q150_target_encode",    # integral micro-unit smoothed encoding
    "q151_mad_outliers",     # grain-side selection medians + broadcast fences
    "q152_basket_rules",     # basket-keyed pair join, exact ppm stats
    "q153_event_paths",      # rank-cut journeys + TakeOrdered top-20
    "q154_triangle_stats",   # ordered-wedge triangles, exact ppm CC
    "q156_auc",              # exact Mann-Whitney AUC over score grain
    "q157_ks",               # exact KS: cross-multiplied CDF gaps
    "q158_canonical_select",  # keep-best election per fingerprint cluster
    "q288_diversity_prune",  # per-cell prototypicality rank (r13)
    "q159_sparse_cosine",    # inverted-index df-capped cosine pairs
    "q284_unigram_learn",    # unigram hard-EM learn (r13)
    "q163_bpe_learn",        # 8-round weighted pair-argmax over word table
    "q164_exact_split",      # largest-remainder quotas + hash ranks
    "q277_keyframe_index",   # NAL access-unit parse, map-side bytes (r12)
    "q165_corr_pairs",       # 15 exact moments in one aggregate pass
    "q289_trained_router",   # softmax literal scoring (r13)
    "q279_quality_classifier",  # trained logistic scoring
    "q168_seasonal_anomaly",  # phase medians + residual Tukey fences
    "q169_lift_table",       # distinct-score-grain decile gains
    "q170_gini",             # ranked-sum concentration per key
    "q173_stuck_runs",       # gaps-and-islands frozen-value QC
    "q175_decompose",        # STL-lite trend/seasonal/residual, milli ints
    "q177_cusum",            # argmax mean-shift statistic, one sort
    "q178_confusion",        # per-class P/R/F1, class-sized joins
    "q180_ndcg",             # literal-discount NDCG@10, rank cut at k
    "q181_ewma",             # 16 literal-weight lags, one window
    "q182_bootstrap_se",     # x32 Poisson replicates, map-side collapse
    "q183_compaction",       # balanced round-robin bin packing
    "q184_quantile_map",     # CDF-axis union-merge distribution matching
    "q185_temporal_2hop",    # mid-keyed causal 2-hop reachability
    "q186_pps_sample",       # systematic PPS boundary selection
    "q187_market_share",     # Q8 snowflake: six tables, exact ppm share
    "q189_funnel_latency",   # first-touch deltas, type-1 median/p90
    "q190_hll_distinct",     # float-free HLL registers + literal tables
    "q191_kcore",            # 3-round semi-join peel (fixed, unrollable)
    "q278_dsir_select",      # DSIR hashed-ngram selection (r12, rotated for q192: hashed-feature family)
    "q193_position_attribution",  # U-shaped credit, one window + explode
    "q194_top_supplier",     # Q15: scalar max broadcast, tie-inclusive
    "q196_large_orders",     # Q18: HAVING + join-back, det. top-100
    "q197_waiting_supplier",  # Q21: EXISTS-free double aggregate
    "q198_idle_customers",   # Q22: scalar avg + anti-join
    "q199_rolling_distinct",  # 20-row exact rolling distinct per key
    "q200_snapshot_fingerprint",  # 5-table commutative acceptance digest
    "q201_hll_rollup",       # register partials merged up, direct-equal
    "q202_bradley_terry",    # 3 MM rounds, integer strengths, join-shaped
    "q203_fleiss_kappa",     # multi-rater agreement, one exact rational
    "q204_psi",              # reference-decile drift, micro-nat terms
    "q285_unigram_encode",   # Viterbi fold encode (r13)
    "q205_bigram_logprob",   # interpolated bigram LM, micro-nat mean
    "q206_wilson_lb",        # integer-exact Wilson bound (Newton isqrt)
    "q207_spearman",         # doubled-rank Spearman, exact isqrt, clamped
    "q209_roc_points",       # full ROC curve, two-level bucketed prefix sum
    "q210_jsd",              # symmetric drift, micro-nat mixture ratios
    "q211_hhi",              # concentration, one decimal div
    "q212_acf",              # lag-1..3 autocorrelation, one window pass
    "q213_kruskal_wallis",   # k-group rank ANOVA, floor terms + tie ppm
    "q215_bh_fdr",           # bucket-ranked BH selection, all-integer test
    "q216_info_gain",        # micro-nat IG decomposition
    "q286_url_canonicalize", # map-side URL regex + eTLD+1 (r13)
    "q217_line_dedup",       # line-grain boilerplate removal + reassembly
    "q218_kaplan_meier",     # micro-nat log-survival, reverse-cum at-risk
    "q219_cohort_retention",  # daily cohort triangle, integer ages
    "q220_hits",             # fixed-round integer hubs/authorities
    "q221_split_leakage",    # near-dup pairs x split assignment audit
    "q222_odds_ratio",       # Haldane 2x2, exact rational ppm
    "q223_g_test",           # entropy-side contingency terms
    "q224_theil",            # decomposable inequality, one div
    "q225_returned_items",   # TPC-H Q10 shape, centi-cent top-20
    "q226_burstiness",       # Fano factor of integer-us gaps
    "q227_containment",      # asymmetric shingle containment on LSH pairs
    "q228_rbo",              # literal-weight rank-biased overlap
    "q229_ols2",             # Cramer 3x3 normal equations per key
    "q230_mase",             # naive vs seasonal-naive MAE ratio
    "q231_did",              # 2x2 conditional-cell effect estimate
    "q232_late_orders",      # Q4: EXISTS as semi-join
    "q233_product_profit",   # Q9: multi-dim profit rollup
    "q234_shipping_lag_classes",  # Q12: conditional pivot
    "q235_promo_share",      # Q14: conditional share, exact ppm
    "q236_bracket_revenue",  # Q19: OR-of-ANDs predicate pushdown
    "q269_important_stock",  # Q11: decorrelated scalar threshold
    "q240_nelson_aalen",     # cumulative hazard, ppm floors
    "q241_logrank",          # two-sample survival O/E/V sums
    "q242_cramers_v",        # chi2 effect size, exact isqrt
    "q243_shipping_priority", # Q3: 3-table join, det. top-10
    "q245_customer_distribution",  # Q13: left-join count histogram
    "q246_forecast_revenue", # Q6: pure pushed scan-filter-agg
    "q247_trimmed_mean",     # mass-exact trim on the grain-prefix path
    "q248_cliffs_delta",     # grain-side cross-pair dominance counts
    "q249_markov_transitions",  # lead-window pairs + smoothed ppm
    "q250_brier_decomposition",  # rel/res/unc integer Murphy terms
    "q251_local_supplier_volume",  # Q5: 6-table snowflake, compound join
    "q254_brown_forsythe",   # selection medians -> integer ANOVA core
    "q255_kendall_tau",      # joint-grain self-join concordance
    "q256_zipf_slope",       # term head + integer micro-nat OLS
]


def sentinel_runs(spark, reps: int) -> list[float]:
    """Host-throughput sentinel: a fixed synthetic aggregation (range →
    modulo groupBy) that exercises codegen + shuffle but touches NO repo
    code and NO input files. Its runtime moves with hypervisor weather
    exactly like the real queries (same JVM, same cores), so
    ``queries[q] / sentinel_sec`` is comparable ACROSS rounds even when
    the host's absolute throughput drifts ±30 % (SCALE.md).

    Round-9 methodology fix: a single block of runs taken once (after
    the sweep) proved too noisy to be the cross-round drift corrector —
    in round 8 the sentinel sped up 17 % while the queries slowed 4 %,
    making the normalized view unreadable. The caller now INTERLEAVES
    blocks before and after the sweep and uses the MEDIAN of ≥ 6 runs,
    so one lucky/unlucky JVM moment can't move the normalizer."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .groupBy((F.col("id") % 9973).alias("k"))
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite").format("noop").save()
        )
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def main() -> None:
    from aeon_mecha_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()
    # warmup: exercise the parquet reader, shuffle machinery, window exec
    # and whole-stage codegen once so the first timed query doesn't absorb
    # JVM/codegen init (~8 s of fixed cost at this tiny scale)
    for wname in ("q17_hourly_rollup", "q13_qc_deltas", "q06_revenue_by_nation"):
        qs[wname](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # sentinel block 1 of 2: interleaved BEFORE the sweep (post-warmup,
    # same JVM state the first queries see)
    sent_pre = sentinel_runs(spark, max(3, reps))
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            # plan construction runs INSIDE the timer: several operators
            # legitimately act at build time (boundary-sample collects,
            # incremental refreshes, iterative components) and that work
            # is part of the query's cost — timing only the final sink
            # would report a near-zero for them (q116/q119 showed 0.1 s
            # while their refresh/fixpoint ran untimed)
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        all_runs[name] = runs
        timings[name] = min(runs)
    total = round(sum(timings.values()), 3)
    # sentinel block 2 of 2: AFTER the sweep (post-session JVM/GC
    # state); the normalizer is the MEDIAN of both blocks (>= 6 runs)
    sent_post = sentinel_runs(spark, max(3, reps))
    import statistics

    all_sent = sent_pre + sent_post
    sentinel = round(statistics.median(all_sent), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Per-run detail goes to a side file, NOT stdout: the driver parses
    # the single printed JSON line and chokes past ~2 KB (BENCH_r03 was
    # recorded as parsed:null when "runs" pushed the line to ~3 KB).
    # Keep stdout to exactly the five spec keys, compact separators.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    normalized = {q: round(t / sentinel, 3) for q, t in timings.items()}
    with open(detail_path, "w") as f:
        json.dump(
            {
                "runs": all_runs,
                "reps": reps,
                "sf": sf,
                "sentinel_sec": sentinel,
                # min over all runs: the estimator rounds r1-r8 used —
                # kept for cross-round comparisons that span the
                # round-9 median switch
                "sentinel_min_sec": round(min(all_sent), 3),
                "sentinel_runs_pre": sent_pre,
                "sentinel_runs_post": sent_post,
                "normalized": normalized,
                "normalized_total": round(total / sentinel, 3),
            },
            f,
            indent=1,
        )
    # short qNNN keys on stdout: 60+ full names would push the line past
    # the driver's ~2 KB capture (full names live in BENCH_DETAIL.json)
    short = {n.split("_", 1)[0]: t for n, t in timings.items()}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": short,
                "sentinel_sec": sentinel,
                "norm_total": round(total / sentinel, 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
