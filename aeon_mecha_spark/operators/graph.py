"""Iterative graph algorithms as relational plans.

Connected components already live in ``datapipe/dedup.py``
(min-label propagation for near-dup clusters); this module adds the
other workhorse, PageRank, in an INTEGER-EXACT form: ranks are
micro-units (longs), per-edge contributions are ``rank div out_degree``
and the damping step is ``(85 · Σ) div 100`` — every operation is
integer arithmetic, so a fixed iteration count yields bit-identical
ranks on any engine, any partitioning, any cluster shape (the q127 gate
unrolls the same iterations as nested SQL CTEs in DuckDB). Floating
PageRank cannot make that promise: per-partition summation order
changes low bits.

Scale: each iteration is one equi-join of the edge list with the
current rank table plus one groupBy(dst) with map-side partial sums —
the standard Pregel-as-joins shape. The plan here stays LAZY across
iterations (no actions), which is what makes the whole computation
oracle-checkable; for many more iterations at 100 TB, insert
``localCheckpoint()`` every few rounds to truncate lineage, exactly as
``dedup_clusters`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def transition_edges(
    events: DataFrame,
    actor_col: str = "user_id",
    session_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Actor-transition edges: within each ``session_col`` stream
    ordered by ``order_cols``, an edge connects each actor to the next
    DIFFERENT actor — the interaction/handoff graph of an event log.
    Multi-edges are kept (they weight repeated transitions)."""
    w = W.partitionBy(session_col).orderBy(*[F.col(c).asc() for c in order_cols])
    nxt = F.lead(actor_col).over(w)
    return (
        events.select(F.col(actor_col).alias("src"), nxt.alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank over ``(src, dst)`` multi-edges.

    Per node: ``r₀ = scale``;
    ``rₖ₊₁ = base + (damping_pct · Σ_in (rₖ div out_deg)) div 100``
    with ``base = scale·(100−damping_pct) div 100`` — the standard
    unnormalized per-node formulation. Dangling mass (nodes with no
    out-edges) is dropped, deterministically, like most production
    implementations. Output: ``(node, rank_micro)`` for every node
    that appears in an edge.

    All-integer → engine-exact for any fixed ``iters``; the returned
    plan is fully lazy (iterations are nested joins, no actions).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    base = scale * (100 - damping_pct) // 100
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_c"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("rank_micro", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("rank_micro div _c").alias("_m"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("_m").alias("_m"))
        ranks = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base} + ({damping_pct} * coalesce(_m, 0)) div 100 AS LONG)"
                ).alias("rank_micro"),
            )
        )
    return ranks
