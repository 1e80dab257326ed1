"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, sorted column names, and
order-insensitive values (exact where possible; float deviations
reported with max abs diff so rounding gaps are visible before the real
driver sees them).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
ONLY = [a for a in sys.argv[1:] if not os.path.isdir(a)]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    return "obj"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    # the DRIVER hashes the pandas representation, so a column whose
    # dtype KIND differs between the two frames (e.g. oracle HUGEINT ->
    # float64 vs spark bigint -> int64, the q155 red) hash-mismatches
    # even when every value is equal — flag it before canon() coerces
    # the difference away
    for c in sdf.columns:
        sk, ok = _kind(sdf[c]), _kind(odf[c])
        if sk != ok:
            problems.append(
                f"dtype kind differs on {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                " (driver value-hash diverges on representation)"
            )
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                diff = (av - bv).abs().max()
                n_bad = int((~eq).sum())
                problems.append(f"float col {c}: {n_bad} mismatched, max abs diff {diff!r}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                n_bad = int((~eq).sum())
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {n_bad} mismatched, first: spark={av[idx]!r} oracle={bv[idx]!r}"
                )
    return problems


def main() -> None:
    import __spark_entry__ as entry_mod
    from aeon_mecha_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("check_correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = ONLY or list(qs)
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        # operators that persist internally (k-core, Bradley-Terry,
        # lift/ROC/quantile-map, q194) ride their handles on the result;
        # clear wholesale so 200+ queries don't accumulate executor cache
        spark.catalog.clearCache()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "rows": None, "problems": [f"spark raised {e}"]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            results[name] = {"status": "rows_only", "rows": len(sdf), "problems": []}
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "rows": len(sdf), "problems": [f"duckdb raised {e}"]}
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        results[name] = {
            "status": "fail" if problems else "pass",
            "rows": len(sdf),
            "problems": problems,
        }
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_pass} passed, {n_fail} failed, sf_dir={SF_DIR}")
    # full-surface provenance artifact (VERDICT r06 task 5): with a
    # 201-gate registry and a 50-row official window, the out-of-window
    # gates need a machine-checkable record each round — set
    # CHECK_JSON_OUT=CHECK_FULL_r07.json to write one
    out_path = os.environ.get("CHECK_JSON_OUT")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_path}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
