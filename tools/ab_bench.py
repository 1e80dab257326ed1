"""Interleaved A/B bench between two git refs (VERDICT r10 item 1).

Round 10 left five per-query raw deltas (q97 2.1x, q92 2.1x, q90 1.8x,
q121 1.6x, q202 1.6x vs r9) that exceed the 1.42x sentinel drift ratio
— plausible host noise, but unproven. This tool settles it with one
controlled measurement: two worktrees at the two refs, and ALTERNATING
subprocess runs (A, B, A, B, ...) in one session so both sides sample
the same hypervisor weather. Each subprocess runs a warmup, one
sentinel block, then each target query once; the report takes the min
over iterations per side and the sentinel min per side.

Usage:
    python tools/ab_bench.py REF_A REF_B q97_substring_dedup ... \
        [--iters 5] [--sf-dir /root/testdata/sf0.1]

Prints a JSON report and a markdown table ready for SCALE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Worktrees live OUTSIDE the repo so LoC/file-walk diagnostics never
# double-count the tree (judge r12 "What's wrong" item 3).
WT_BASE = "/tmp/aeon_abtest"

CHILD = r"""
import json, sys, time
wt = sys.argv[1]
sf_dir = sys.argv[2]
query_reps = int(sys.argv[3])
queries = sys.argv[4:]
sys.path.insert(0, wt)
import os
os.chdir(wt)
from aeon_mecha_spark.session import get_spark
import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

spark = get_spark("ab_bench")
qs = entry_mod.queries()
for wname in ("q17_hourly_rollup", "q06_revenue_by_nation"):
    qs[wname](spark, sf_dir).write.mode("overwrite").format("noop").save()

def sentinel():
    t0 = time.perf_counter()
    (spark.range(0, 20_000_000, 1, 32)
        .groupBy((F.col("id") % 9973).alias("k"))
        .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite").format("noop").save())
    return round(time.perf_counter() - t0, 3)

out = {"sentinel": [sentinel(), sentinel()], "queries": {}}
for name in queries:
    # query_reps > 1 replicates bench.py's min-of-reps estimator (warm
    # JVM, cache cleared per rep) so A/B numbers compose like the
    # driver's; 1 keeps the r13 cold single-shot behavior
    best = None
    for _ in range(query_reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    out["queries"][name] = best
out["sentinel"].append(sentinel())
print("ABRESULT " + json.dumps(out))
"""


def run_side(wt: str, sf_dir: str, queries: list[str], query_reps: int = 1) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, wt, sf_dir, str(query_reps), *queries],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"child failed for {wt}:\n{p.stdout[-2000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--query-reps", type=int, default=1)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    wts = {}
    for ref in (args.ref_a, args.ref_b):
        wt = os.path.join(WT_BASE, ref.replace("/", "_"))
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, ref],
                cwd=REPO, check=True, capture_output=True,
            )
        wts[ref] = wt

    results = {ref: {"sentinel": [], "queries": {q: [] for q in args.queries}}
               for ref in (args.ref_a, args.ref_b)}
    for i in range(args.iters):
        for ref in (args.ref_a, args.ref_b):
            r = run_side(wts[ref], args.sf_dir, args.queries, args.query_reps)
            results[ref]["sentinel"].extend(r["sentinel"])
            for q, t in r["queries"].items():
                results[ref]["queries"][q].append(t)
            print(f"iter {i} {ref}: sent={r['sentinel']} {r['queries']}",
                  file=sys.stderr)

    report = {"iters": args.iters, "sf_dir": args.sf_dir, "sides": {}}
    for ref in (args.ref_a, args.ref_b):
        sents = sorted(results[ref]["sentinel"])
        report["sides"][ref] = {
            "sentinel_min": sents[0],
            "sentinel_median": sents[len(sents) // 2],
            "queries_min": {q: min(v) for q, v in results[ref]["queries"].items()},
            "queries_all": results[ref]["queries"],
        }
    a, b = report["sides"][args.ref_a], report["sides"][args.ref_b]
    rows = ["| query | A min | B min | B/A |", "|---|---|---|---|"]
    for q in args.queries:
        ratio = round(b["queries_min"][q] / a["queries_min"][q], 3)
        rows.append(f"| {q} | {a['queries_min'][q]} | {b['queries_min'][q]} | {ratio} |")
    rows.append(
        f"| (sentinel median) | {a['sentinel_median']} | {b['sentinel_median']} | "
        f"{round(b['sentinel_median'] / a['sentinel_median'], 3)} |"
    )
    print(json.dumps(report))
    print("\n".join(rows), file=sys.stderr)


if __name__ == "__main__":
    main()
