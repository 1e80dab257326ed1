"""Partition-independence check: every gate query must produce
BIT-IDENTICAL results regardless of the shuffle plan.

This is the property that makes results reproducible between local[32]
and a 1000-executor cluster: float aggregates routed through exact
decimal/integer moments are associative, window orderings are unique,
and nothing depends on partition iteration order. Verified empirically
here by running each query under two very different shuffle-partition
counts and comparing fully-sorted collected outputs.

Usage: python tools/check_determinism.py [sf_dir] [query ...]
       (no query args = the full gate surface; ``--core`` = the
       historical float/window-heavy subset for a quick pass)
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    # float-aggregate and window-heavy queries: the ones where a
    # partition-order dependence would actually show up
    "q01_pricing_summary",
    "q20_column_stats",
    "q21_timestamp_stats",
    "q22_sync_regression",
    "q35_lsh_jaccard",
    "q36_knn_cosine",
    "q57_granularity_rollup",
    "q59_time_weighted_avg",
    "q60_gap_fill",
    "q63_kmv_distinct",
    "q64_quantile_summary",
    # curation layer: float-ratio + window + iterative ops
    "q73_decontaminate",
    "q76_pack_sequences",
    "q77_merge_intervals",
    "q79_dedup_clusters",
    "q81_repetition_ratio",
    # round-3 additions: prefix sums, mapInPandas reduce, eigen path
    "q88_tfidf",
    "q90_token_budget",
    "q91_shuffle_shards",
    "q92_embedding_covariance",
    "q93_pca_project",
    "q94_int8_quant",
    # round-4 additions: bloom verdicts, ln-keyed top-n, span merges,
    # sketch-state pairwise estimates, micro-nat entropy sums
    "q95_bloom_decontaminate",
    "q96_weighted_sample",
    "q97_substring_dedup",
    "q100_kmv_jaccard",
    "q101_token_entropy",
    "q102_table_fingerprint",
    "q103_knn_recall",
    "q104_bpe_tokens",
    "q105_span_decontaminate",
    "q106_curation_pipeline",
    "q107_zorder_key",
    "q108_vocab_encode",
    "q110_pca_project_fixed",
    "q111_winnowing",
    "q112_unigram_logprob",
    "q113_ivf_multiprobe",
    "q114_grouped_quantiles",
    "q115_range_shard",
    # round-10 additions: the selection-based grain medians and the
    # re-plumbed rank statistics
    "q151_mad_outliers",
    "q207_spearman",
    "q213_kruskal_wallis",
    "q247_trimmed_mean",
]


def canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]

    def key(row):
        return tuple(
            (x is None, "" if x is None else str(type(x)), str(x)) for x in row
        )

    return sorted(rows, key=key)


def eq(a: list[tuple], b: list[tuple]) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for xa, xb in zip(ra, rb):
            if isinstance(xa, float) and isinstance(xb, float):
                if math.isnan(xa) and math.isnan(xb):
                    continue
                if xa != xb:  # BIT-identical, no tolerance
                    return False
            elif xa != xb:
                return False
    return True


def main() -> None:
    from aeon_mecha_spark.session import get_spark

    import __spark_entry__ as entry_mod

    dirs = [a for a in sys.argv[1:] if os.path.isdir(a)]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.01"
    rest = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    use_core = "--core" in rest
    only = [a for a in rest if a != "--core"]
    if use_core and not only:
        names = DEFAULT_QUERIES  # the historical float/window-heavy subset
    else:
        # default: the FULL gate surface — re-run after adding gates so
        # the shuffle-plan-independence property stays verified end to end
        names = only or list(entry_mod.queries())
    spark = get_spark("determinism")
    qs = entry_mod.queries()
    failed = 0
    for name in names:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = canon(qs[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = canon(qs[name](spark, sf_dir))
        ok = eq(a, b)
        failed += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(a)} rows, 32 vs 7 partitions)")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(f"\n{len(names) - failed} passed, {failed} failed, sf_dir={sf_dir}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
