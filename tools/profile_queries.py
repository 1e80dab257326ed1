"""Optimization profiler (r13+): time chosen queries with the noop
sink and dump ``explain("formatted")`` to <plans-dir>/<q>_<tag>.txt.

Usage: python tools/profile_queries.py [--tag before|after] [--reps N]
           [--sf sf_dir] [--no-plans] query [query ...]

Timing methodology matches bench.py exactly (plan construction inside
the timer, cache cleared between reps, min of reps) so numbers are
comparable with BENCH_*.json entries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r14"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from aeon_mecha_spark.session import get_spark

    spark = get_spark("profile_queries")
    qs = entry_mod.queries()
    plans_dir = args.plans_dir
    os.makedirs(plans_dir, exist_ok=True)

    # warmup (same trio as bench.py)
    for wname in ("q17_hourly_rollup", "q13_qc_deltas", "q06_revenue_by_nation"):
        qs[wname](spark, args.sf).write.mode("overwrite").format("noop").save()

    out = {}
    for name in args.queries:
        if name not in qs:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        runs = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{args.tag}:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(runs), "runs": runs}
        if not args.no_plans:
            spark.catalog.clearCache()
            df = qs[name](spark, args.sf)
            import contextlib, io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        print(f"{name}: min={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
