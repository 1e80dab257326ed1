"""Scaling probe: replicate the sf0.1 testdata N× (PK-offset, FK-consistent)
into a scratch dir and time headline queries at 1× vs N×.

Purpose: empirical evidence for SCALE.md — a plan whose runtime grows
~linearly in input (ratio ≈ N on a fixed-core box, often < N when a fixed
overhead dominates at 1×) will keep scaling on a cluster; a superlinear
ratio flags a plan that degenerates (cross product, spill, skew).

Writes only under /tmp. Usage:
    python tools/scale_probe.py [N] [--organic] [query ...]

Two replication modes:

- default (PK-offset): replicas are byte-identical universes with
  shifted keys. Right for keyed/grouped/windowed plans (value columns
  keep 1x cardinality). WRONG for near-dup/LSH plans: every document
  is copied N-fold, so TRUE near-dup pairs grow ~N^2 by construction
  of the corpus and any correct dedup plan must report them --
  superlinear output is the data's fault, not the plan's.
- --organic: additionally perturbs each replica deterministically so
  near-dup structure WITHIN a replica is preserved exactly while
  replicas are mutually novel -- the near-dup rate stays constant as
  the corpus grows, the realistic web-scale regime. Documents pass
  through a seeded per-replica substitution cipher (bijective char
  map); embeddings through a seeded per-replica dimension sign-flip
  (an orthogonal map: within-replica cosines/norms are EXACTLY
  preserved, cross-replica cosines scramble to ~N(0, 1/sqrt(d)) --
  far below any near-dup threshold). LSH candidate pairs (reported
  as rows_out) should then grow ~linearly.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/spark_graft_scale"

DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q06_revenue_by_nation",
    "q12_dedupe_first",
    "q17_hourly_rollup",
    "q18_asof_join",
    "q21_timestamp_stats",
    "q31_fingerprint_dedup",
    "q35_lsh_jaccard",
    "q57_granularity_rollup",
    "q59_time_weighted_avg",
    "q73_decontaminate",
    "q77_merge_intervals",
    "q81_repetition_ratio",
]

# per-table PK/FK columns that must shift together so replica i stays a
# self-consistent universe (dims are shared lookup tables: copy once)
OFFSETS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "customer", "supplier", "part"]


_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_scaled(
    spark,
    n: int,
    organic: bool = False,
    base_dir: str | None = None,
    out_root: str | None = None,
    tables: list[str] | None = None,
) -> str:
    """Replicate ``base_dir`` (default $SPARK_GRAFT_SF_DIR) N× into
    ``out_root`` (default the /tmp scratch). Parameterized (round 10)
    so the pinned organic-linearity regression test can build a tiny
    sf0.001 corpus in pytest's tmp dir instead of the shared scratch.
    ``tables`` restricts which fact tables replicate (round 11: the 64×
    capstone only needs documents; dims still copy)."""
    from pyspark.sql import functions as F

    base = base_dir or BASE
    scratch = out_root or SCRATCH
    offsets = (
        {t: k for t, k in OFFSETS.items() if t in tables}
        if tables is not None
        else OFFSETS
    )

    # events stores TIMESTAMP(NANOS): read/write it as a ns bigint so the
    # replica keeps the exact on-disk semantics the queries expect.
    # inferTimestampNTZ must be OFF (exactly as __spark_entry__._t sets
    # it) or Spark 4 reads the nanos column as TIMESTAMP_NTZ instead of
    # the legacy long — the replica would then be written as a true NTZ
    # column and unix_micros-based queries break on the scaled copy
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out_dir = os.path.join(scratch, f"x{n}")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for t in COPY:
        shutil.copy(os.path.join(base, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet"))
    for t, keys in offsets.items():
        src = os.path.join(base, f"{t}.parquet")
        df = spark.read.parquet(src)
        span = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        parts = []
        for i in range(n):
            d = df
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * span[k]))
            if organic and t == "embeddings" and i > 0:
                # per-replica dimension sign-flip (seeded, orthogonal):
                # within-replica cosines and norms are EXACTLY
                # preserved; cross-replica cosines scramble to
                # ~N(0, 1/sqrt(d)) — below any near-dup threshold
                import random as _random

                dim = df.select(F.size("embedding").alias("d")).limit(1).collect()[0]["d"]
                rnd = _random.Random(40_127 + i)
                signs = [1.0 if rnd.random() < 0.5 else -1.0 for _ in range(dim)]
                sign_arr = F.array(*[F.lit(x) for x in signs])
                d = d.withColumn(
                    "embedding",
                    F.zip_with(
                        "embedding", sign_arr, lambda e, s: (e * s).cast("float")
                    ),
                )
            if organic and t == "documents" and i > 0:
                # bijective per-replica char map (seeded substitution
                # cipher — NOT a Caesar rotation, which cycles at 25
                # and made replicas i and i+25 exact near-dups at 32x):
                # shingle sets within the replica keep their exact
                # overlap structure; across replicas every shingle is
                # novel
                import random as _random

                perm = list(_ALPHA)
                _random.Random(9176 + i).shuffle(perm)
                to = "".join(perm)
                d = d.withColumn(
                    "text",
                    F.translate(
                        F.col("text"), _ALPHA + _ALPHA.upper(), to + to.upper()
                    ),
                )
            parts.append(d)
        union = parts[0]
        for d in parts[1:]:
            union = union.unionByName(d)
        # one flat parquet dir per table, like the testdata layout
        union.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}._dir"))
        # queries read <dir>/<table>.parquet as a path; a directory works too
        os.rename(os.path.join(out_dir, f"{t}._dir"), os.path.join(out_dir, f"{t}.parquet"))
    return out_dir


def time_queries(spark, qs, names, sf_dir, count_out=False):
    out, nrows = {}, {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        if count_out:
            nrows[name] = df.count()
    return out, nrows


def main() -> None:
    args = sys.argv[1:]
    organic = "--organic" in args
    args = [a for a in args if a != "--organic"]
    n = int(args[0]) if args else 8
    names = args[1:] or DEFAULT_QUERIES

    from aeon_mecha_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("scale_probe")
    qs = entry_mod.queries()
    scaled_dir = build_scaled(spark, n, organic=organic)

    # warmup both datasets (JVM/codegen init out of the measurement)
    for d in (BASE, scaled_dir):
        qs["q17_hourly_rollup"](spark, d).write.format("noop").mode("overwrite").save()

    base_t, base_rows = time_queries(spark, qs, names, BASE, count_out=organic)
    scaled_t, scaled_rows = time_queries(
        spark, qs, names, scaled_dir, count_out=organic
    )
    rows = {
        t: {
            "base": spark.read.parquet(os.path.join(BASE, f"{t}.parquet")).count(),
            "scaled": spark.read.parquet(os.path.join(scaled_dir, f"{t}.parquet")).count(),
        }
        for t in ("lineitem", "events", "documents")
    }
    report = {
        "n": n,
        "mode": "organic" if organic else "pk-offset",
        "rows": rows,
        "queries": {
            q: {
                "base_s": base_t[q],
                "scaled_s": scaled_t[q],
                "ratio": round(scaled_t[q] / base_t[q], 2) if base_t[q] else None,
                **(
                    {
                        "rows_out_base": base_rows[q],
                        "rows_out_scaled": scaled_rows[q],
                        "rows_out_ratio": round(scaled_rows[q] / base_rows[q], 2)
                        if base_rows[q]
                        else None,
                    }
                    if organic
                    else {}
                ),
            }
            for q in names
        },
    }
    print(json.dumps(report))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
