"""Organic (power-law) scaling probe for link prediction (VERDICT r10
item 7): q268's PK-offset probe showed a 0.62× ratio that SCALE.md
attributes to disjoint replicated subgraphs — replication cannot say
how the hub cap behaves when growth is ORGANIC (hubs keep absorbing new
edges). This probe generates preferential-attachment graphs at 1× and
8× edges (deterministic Barabási–Albert-style: each new node attaches
to ``m`` endpoints sampled from the existing edge-endpoint multiset via
a seeded hash — sampling endpoints IS degree-proportional sampling, no
float RNG), and measures:

  - wedge count (the candidate fan-out Σ_z deg(z)·(deg(z)−1)/2 over
    carriers ≤ max_degree) — the quantity the hub cap bounds
  - link_prediction wall time at top_k=50, max_degree=256

The claim under test: with the cap, wedge work grows ~linearly in
edges even though uncapped wedges grow superlinearly on a power-law
graph. Writes nothing outside /tmp. Usage:
    python tools/graph_organic_probe.py [n_base_nodes] [m]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pa_edges(n_nodes: int, m: int = 2) -> list[tuple[int, int]]:
    """Deterministic preferential attachment: node i attaches to m
    distinct endpoints drawn from the endpoint multiset by seeded-hash
    index — multiset draws are degree-proportional by construction."""
    edges = [(0, 1)]
    endpoints = [0, 1]
    for i in range(2, n_nodes):
        chosen = set()
        t = 0
        while len(chosen) < min(m, len(set(endpoints))):
            h = int.from_bytes(
                hashlib.md5(f"{i}:{t}".encode()).digest()[:8], "big"
            )
            chosen.add(endpoints[h % len(endpoints)])
            t += 1
        for tgt in sorted(chosen):
            edges.append((tgt, i))
            endpoints.extend((tgt, i))
    return edges


def measure(spark, edges, max_degree=256, top_k=50):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.operators import graph

    df = spark.createDataFrame(edges, "src long, dst long").repartition(32)
    und = df.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    wedges = (
        deg.filter(F.col("deg") <= max_degree)
        .agg(F.sum(F.expr("deg * (deg - 1) / 2")).cast("long"))
        .collect()[0][0]
    )
    wedges_uncapped = deg.agg(
        F.sum(F.expr("deg * (deg - 1) / 2")).cast("long")
    ).collect()[0][0]
    best = None
    for _ in range(3):
        t0 = time.time()
        graph.link_prediction(df, top_k=top_k, max_degree=max_degree).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return {
        "edges": len(edges),
        "wedges_capped": int(wedges),
        "wedges_uncapped": int(wedges_uncapped),
        "time_s": round(best, 3),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from aeon_mecha_spark.session import get_spark

    spark = get_spark("graph-organic-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = measure(spark, pa_edges(n, m))
    big = measure(spark, pa_edges(8 * n, m))
    report = {
        "n_base_nodes": n,
        "m": m,
        "base": base,
        "x8": big,
        "edge_ratio": round(big["edges"] / base["edges"], 2),
        "capped_wedge_ratio": round(
            big["wedges_capped"] / max(1, base["wedges_capped"]), 2
        ),
        "uncapped_wedge_ratio": round(
            big["wedges_uncapped"] / max(1, base["wedges_uncapped"]), 2
        ),
        "time_ratio": round(big["time_s"] / base["time_s"], 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
