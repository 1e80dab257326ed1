"""Physical-plan audit over every gate query: counts the plan features
that matter at 100 TB and flags the ones that hurt.

For each query in ``__spark_entry__.queries()`` (at sf0.001 — plan
shape, not data) it records:

- ``exch``      shuffle exchanges (hashpartitioning / rangepartitioning)
- ``bhj/smj/bnl`` broadcast-hash / sort-merge / broadcast-nested-loop joins
- ``cartesian`` CartesianProduct nodes (always a red flag)
- ``gwindow``   windows with NO partition keys (single-partition sorts;
                only acceptable over provably tiny inputs)
- ``wsc``       WholeStageCodegen spans (bigger = more of the plan is
                compiled; interpreted islands sit between spans)
- ``pyudf``     Python evaluation nodes (ArrowEvalPython / BatchEvalPython /
                mapInPandas) — the deliberate Arrow-batched exceptions

Writes a markdown table to stdout; ``--write`` saves PLAN_AUDIT.md.
Red flags (cartesian > 0, or an unpartitioned window in a query not on
the documented-tiny allowlist) exit non-zero so CI can gate on it.

Usage: python tools/plan_audit.py [--write] [--check-unique] [query ...]

r14 additions: every gate wrapped by ``__spark_entry__._ordered``
(detected via its ``_aeon_ordered_cols`` annotation) also gets its
EXECUTED plan tail asserted (Sort <- Exchange <- Scan ExistingRDD — the
checkpoint actually truncates the sampling re-run), and with
``--check-unique`` the wrapper's sort-key-uniqueness precondition is
executed against SF_DIR data.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")

# queries whose single-partition windows are documented as bounded-size.
# Keep this list MINIMAL — exactly the queries the live detector finds a
# global window in today, each with its bound — so any NEW global window
# anywhere else is a red flag, not an allowlisted surprise.
TINY_GLOBAL_WINDOW_OK = {
    "q90_token_budget",  # <=1024-row bucket-offset table (two-level prefix sum)
    "q108_vocab_encode",  # vocab ranking after limit(V)
    "q115_range_shard",  # boundary quantiles over the bounded hash sample
    "q124_key_skew_stats",  # rank window over the already-limited <= top_n rows
    "q145_rrf_fusion",  # rank windows over TakeOrdered-cut top-200 lists
    "q169_lift_table",  # two regimes, both bounded: the adaptive fast
    # path (a counted <=score_buckets-row distinct grain in one window —
    # the count() check IS the machine guard) or the two-level path whose
    # only global window reads the clamped <=score_buckets-row bucket
    # table
    "q209_roc_points",  # same adaptive/two-level regimes as q169
    "q215_bh_fdr",  # the global windows read the <=ppm_buckets-row p-bucket
    # count table (bucket id = p div step with p in [0, 1e6] — bounded BY
    # CONSTRUCTION); row ranking is per-bucket
    "q238_pr_points",  # same adaptive/two-level regimes as q169
    "q239_lorenz",  # q169's regimes, ascending
    "q183_compaction",  # planner rank over the FILE LISTING (metadata rows)
    "q184_quantile_map",  # <=ppm_buckets+1-row spine (spark.range literal) —
    # per-group CDF and the union-merge as-of are both bucket-partitioned;
    # remaining global windows read only the bounded spine/bucket tables
    "q204_psi",  # single-distribution quantile path: the constant group key is
    # constant-folded out of the partition specs, so the bounded windows
    # (boundary sample <= target_sample_rows; 32-row bucket offsets) read
    # as unpartitioned; per-(bucket) ranking keeps 32-way parallelism
    "q263_heaps_curve",  # doc-offset two-level prefix sum: the only global
    # window reads the <=1024-row bucket-offset table (q90's construction)
    "q264_vocab_coverage",  # rank window reads the TakeOrderedAndProject
    # head — <= max(ks) rows BY the preceding limit()
    "q267_friedman",  # treatment-index rank over the DISTINCT-treatment
    # table (k rows — a repeated-measures design has a handful); the
    # per-BLOCK rank windows are partitioned by (key, block)
    "q276_perplexity_buckets",  # _grain_prefix over the mean-log-prob
    # grain: adaptive fast path (counted <=1024-row grain in one window)
    # or the two-level path whose global window reads the clamped
    # <=1024-row bucket-offset table — q169's regimes
}


def count_global_window_specs(plan_text: str) -> int:
    """Count ``windowspecdefinition(...)`` occurrences with an EMPTY
    partition spec (single-partition window sorts).

    The spec's argument list is ``partCol, ..., ordCol ASC/DESC ...,
    specifiedwindowframe(...)``: partition columns come first and are
    plain expressions, order columns carry an ``ASC``/``DESC`` marker,
    and the frame is last.  A spec is GLOBAL iff its FIRST top-level
    argument is already an order column (contains ``ASC``/``DESC``) or
    the frame itself (no partition AND no order columns).
    """
    n = 0
    for m in re.finditer(r"windowspecdefinition\(", plan_text):
        start = m.end()
        depth, i = 1, start
        first_arg = None
        while i < len(plan_text) and depth > 0:
            c = plan_text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and first_arg is None:
                    first_arg = plan_text[start:i]
            elif c == "," and depth == 1 and first_arg is None:
                first_arg = plan_text[start:i]
            i += 1
        if first_arg is None:
            continue
        first_arg = first_arg.strip()
        if (
            first_arg.startswith("specifiedwindowframe(")
            or re.search(r"\b(ASC|DESC)\b", first_arg)
        ):
            n += 1
    return n


def _drop_initial_plan_echoes(tree: str) -> str:
    """Remove AQE ``== Initial Plan ==`` blocks: a materialized adaptive
    stage prints BOTH its final and its initial plan, so every exchange
    in it would count twice. Block scope = lines more indented than the
    marker."""
    out, skip_indent = [], None
    for ln in tree.splitlines():
        stripped = ln.replace(":", " ").replace("+-", "  ")
        indent = len(stripped) - len(stripped.lstrip())
        if skip_indent is not None:
            if stripped.strip() and indent <= skip_indent:
                skip_indent = None
            else:
                continue
        if "== Initial Plan ==" in ln:
            skip_indent = indent
            continue
        out.append(ln)
    return "\n".join(out)


def _unique_nodes(tree: str, name: str) -> int:
    """Count RUNTIME-distinct plan nodes: formatted explain re-prints a
    persisted subtree at every InMemoryTableScan reference but reuses
    the same operator ids, so counting distinct ``Name (n)`` ids
    de-duplicates shared cached subtrees (which execute once at cache
    build). Text-occurrence counting overstated nested-persist plans
    combinatorially (q207 round-9 reading: 40 text vs 10 runtime)."""
    return len(set(re.findall(rf"(?<![A-Za-z]){name} \((\d+)\)", tree)))


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    tree = p.split("(1) ")[0] if "(1) " in p else p
    tree = _drop_initial_plan_echoes(tree)
    bex = set(re.findall(r"BroadcastExchange \((\d+)\)", tree))
    ex = set(re.findall(r"Exchange \((\d+)\)", tree))
    return {
        # shuffle exchanges only: broadcast exchanges move a dim table,
        # not the data, and are counted via the join columns instead
        "exch": len(ex - bex),
        "bhj": _unique_nodes(tree, "BroadcastHashJoin [A-Za-z ]*"),
        "smj": _unique_nodes(tree, "SortMergeJoin [A-Za-z ]*"),
        "bnl": _unique_nodes(tree, "BroadcastNestedLoopJoin [A-Za-z ]*"),
        "cartesian": _unique_nodes(tree, "CartesianProduct[A-Za-z ]*"),
        # count in the numbered-operator tree only so each Window node's
        # spec is seen once (the summary tree elides argument detail)
        "gwindow": count_global_window_specs(p),
        # distinct codegen ids = whole-stage codegen spans
        "wsc": len(set(re.findall(r"codegen id : (\d+)", p))),
        "pyudf": sum(
            _unique_nodes(tree, n)
            for n in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ),
    }


def main() -> None:
    # Audit the upstream plan shape, not the checkpoint wrapper: the
    # round-13 presentation-sort helper (`__spark_entry__._ordered`)
    # compiles its child behind a LogicalRDD, which would hide every
    # upstream operator from explain. Same operators execute either
    # way; this flag only restores their visibility to the audit.
    os.environ["AEON_AUDIT_PLAIN_SORT"] = "1"

    from aeon_mecha_spark.session import get_spark

    import __spark_entry__ as entry_mod

    write = "--write" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if write and args:
        # PLAN_AUDIT.md is the FULL-surface artifact; writing a subset
        # would silently truncate it to the named queries
        sys.exit("--write only works with the full surface (drop the query names)")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = args or list(qs)
    rows, flags = [], []
    wrapped: list[str] = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            a = audit_plan(df)
        except Exception as e:  # pragma: no cover - audit robustness
            rows.append((name, f"ERROR {type(e).__name__}: {e}"))
            continue
        if getattr(df, "_aeon_ordered_cols", None):
            wrapped.append(name)
        rows.append((name, a))
        if a["cartesian"]:
            flags.append(f"{name}: CartesianProduct in plan")
        if a["gwindow"] and name not in TINY_GLOBAL_WINDOW_OK:
            flags.append(f"{name}: unpartitioned window not on the tiny allowlist")

    # Executed-tail assertion (r14, VERDICT r13 item 3/6): for every
    # gate that used the checkpoint-before-sort helper, re-plan WITHOUT
    # the audit flag and pin the shape that actually executes — the
    # final sort must read the single checkpoint materialization
    # (Sort <- Exchange rangepartitioning <- Scan ExistingRDD), i.e. no
    # operator re-entered the plan between the checkpoint and the sort.
    os.environ.pop("AEON_AUDIT_PLAIN_SORT", None)
    for name in wrapped:
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            p = _drop_initial_plan_echoes(buf.getvalue())
            body = p.split("(1) ", 1)[0]
            ok = (
                re.search(r"Sort", body)
                and re.search(r"Exchange", body)
                and "Scan ExistingRDD" in body
                and body.count("Exchange") == 1
            )
            if not ok:
                flags.append(
                    f"{name}: wrapped-sort executed tail is not "
                    f"Sort <- Exchange <- Scan ExistingRDD"
                )
        except Exception as e:  # pragma: no cover - audit robustness
            flags.append(f"{name}: executed-tail check ERROR {type(e).__name__}: {e}")

    # Sort-key uniqueness precondition (r14, ADVICE r13): the wrapper is
    # only row-order-safe when the sort column set is unique per row
    # (total order => any physical plan yields the same sequence).
    # --check-unique EXECUTES each wrapped gate at SF_DIR and fails on
    # any duplicate sort-key tuple. Off by default (it runs 40+ queries).
    if "--check-unique" in sys.argv:
        from pyspark.sql import functions as F

        for name in wrapped:
            spark.catalog.clearCache()
            try:
                df = qs[name](spark, SF_DIR)
                cols = df._aeon_ordered_cols
                dups = (
                    df.groupBy(*[F.col(c) for c in cols])
                    .count()
                    .filter(F.col("count") > 1)
                    .count()
                )
                if dups:
                    flags.append(
                        f"{name}: sort keys {cols} are NOT unique per row "
                        f"({dups} duplicated tuples) — wrapper unsafe"
                    )
            except Exception as e:  # pragma: no cover - audit robustness
                flags.append(f"{name}: unique-key check ERROR {type(e).__name__}: {e}")
    os.environ["AEON_AUDIT_PLAIN_SORT"] = "1"
    out = io.StringIO()
    out.write("# Physical-plan audit (auto-generated by tools/plan_audit.py)\n\n")
    out.write(f"Plans built at `{SF_DIR}` — shape only, data size irrelevant.\n")
    out.write("`gwindow` counts unpartitioned window specs; allowlisted ones are\n")
    out.write("documented bounded-size inputs (vocab limits, bucket tables,\n")
    out.write("boundary rows). See tools/plan_audit.py for column meanings.\n\n")
    out.write("Counting fix (round 10): nodes are counted by DISTINCT operator\n")
    out.write("id, and AQE `== Initial Plan ==` echoes are dropped — formatted\n")
    out.write("explain re-prints a persisted subtree at every InMemoryTableScan\n")
    out.write("reference, so the old text-occurrence counts overstated\n")
    out.write("nested-persist plans combinatorially (q207 round 9: 40 text\n")
    out.write("occurrences, 10 runtime-distinct exchanges). `smj` includes\n")
    out.write("static-plan sort-merge joins that AQE converts to broadcast at\n")
    out.write("runtime once the keys-sized build side materializes.\n\n")
    out.write("Round-13 note: gates wrapped in the checkpoint-before-sort\n")
    out.write("helper are audited with `AEON_AUDIT_PLAIN_SORT=1` so the\n")
    out.write("upstream operators stay visible (the wrapper compiles them\n")
    out.write("behind a LogicalRDD); at execution time the same operators\n")
    out.write("run, minus the range-sampling re-execution of the tail.\n\n")
    out.write("| query | exch | bhj | smj | bnl | cartesian | gwindow | wsc | pyudf |\n")
    out.write("|---|---|---|---|---|---|---|---|---|\n")
    for name, a in rows:
        if isinstance(a, str):
            out.write(f"| {name} | {a} |\n")
        else:
            bad = a["cartesian"] or (a["gwindow"] and name not in TINY_GLOBAL_WINDOW_OK)
            out.write(
                f"| {name} | {a['exch']} | {a['bhj']} | {a['smj']} | {a['bnl']} "
                f"| {a['cartesian']} | {a['gwindow']} | {a['wsc']} | {a['pyudf']} |"
                f"{' RED' if bad else ''}\n"
            )
    if flags:
        out.write("\n## RED FLAGS\n\n")
        for f in flags:
            out.write(f"- {f}\n")
    text = out.getvalue()
    print(text)
    if write:
        with open(os.path.join(REPO, "PLAN_AUDIT.md"), "w") as fh:
            fh.write(text)
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
