"""SemDeDup + diversity-prune capstone (VERDICT r12 next-round item 5):
the q280/q288 cell structure at 64× corpus under the production rule
(centroids ∝ N), with stage-level shuffle metrics.

q280's 8× probe measured both regimes at one octave; this verifies the
cells ∝ N law three octaves up, exactly like the ivf_pq capstone
(tools/ivfpq_capstone.py): pair work is Σ|cell|², so constant expected
cell size ⇒ per-vector work flat ⇒ total ≈ linear. The 64× corpus is
the ORGANIC replication (seeded orthogonal sign-flips: within-replica
cosines exact, cross-replica cosines ~N(0, 1/√d) — so the duplicate
structure does not degenerate into everything-matches-everything).
Centroids come from the repo's distributed k-means on the 8-dim coarse
prefix (cells = 4·N, constant expected cell size ≈ 500).

Writes only under /tmp. Usage: python tools/semdedup_capstone.py [N]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.capstone_64x import stage_totals  # noqa: E402
from tools.ivfpq_scale_probe import COARSE_DIMS, emb_table  # noqa: E402


def timed(fn, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    two_level = "--two-level" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--two-level"]
    n = int(argv[0]) if argv else 64

    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe import similarity
    from aeon_mecha_spark.session import get_spark

    from tools.scale_probe import BASE, build_scaled

    import __spark_entry__ as entry_mod

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
    spark = get_spark("semdedup-capstone", extra_conf={
        "spark.ui.enabled": "true",
        # the 256-cell plans are huge interpreted strings; the SQL UI
        # retains one plan graph PER EXECUTION by default (1000) and
        # OOMs the driver — keep only what stage_totals needs
        "spark.sql.ui.retainedExecutions": "5",
        "spark.ui.retainedJobs": "50",
        "spark.ui.retainedStages": "100",
        "spark.ui.retainedTasks": "2000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled(
        spark, n, organic=True, tables=["embeddings"]
    )

    base = emb_table(spark, BASE)
    scaled = emb_table(spark, scaled_dir)
    cents4 = entry_mod._IVF_CENTROIDS
    cells_scaled = len(cents4) * n

    phases: dict[str, dict] = {}

    def phase(name, fn):
        before = stage_totals()
        t0 = time.time()
        out = fn()
        wall = time.time() - t0
        after = stage_totals()
        phases[name] = {
            "wall_s": round(wall, 2),
            "input_mb": round((after["input"] - before["input"]) / 1e6, 1),
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 1e6, 1
            ),
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 1e6, 1
            ),
            "stages": after["stages"] - before["stages"],
        }
        return out

    def sd(emb, cents, tl=False):
        g = 16 if tl else None
        return lambda: similarity.semdedup(
            emb, cents, threshold=0.30, coarse_dims=COARSE_DIMS, dim=64,
            two_level_groups=g,
        )

    def dp(emb, cents, tl=False):
        g = 16 if tl else None
        return lambda: similarity.diversity_prune(
            emb, cents, keep_ppm=250_000, coarse_dims=COARSE_DIMS,
            two_level_groups=g,
        )

    # warmup (JVM/codegen), untimed
    sd(base, cents4)().write.format("noop").mode("overwrite").save()

    cent_big = phase(
        f"train_{cells_scaled}_cells",
        lambda: similarity.kmeans_train(
            scaled.select(
                "vec_id", F.slice("embedding", 1, COARSE_DIMS).alias("embedding")
            ),
            k=cells_scaled,
            iters=5,
        ),
    )
    sd_base = phase("semdedup_1x_4cells", lambda: timed(sd(base, cents4)))
    sd_scaled = phase(
        f"semdedup_{n}x_{cells_scaled}cells",
        lambda: timed(sd(scaled, cent_big, tl=two_level)),
    )
    dp_base = phase("divprune_1x_4cells", lambda: timed(dp(base, cents4)))
    dp_scaled = phase(
        f"divprune_{n}x_{cells_scaled}cells",
        lambda: timed(dp(scaled, cent_big, tl=two_level)),
    )
    print(json.dumps({
        "n": n,
        "two_level": two_level,
        "cells_scaled": cells_scaled,
        "semdedup": {
            "base_s": sd_base,
            "scaled_cells_prop_s": sd_scaled,
            "ratio_cells_prop": round(sd_scaled / sd_base, 2),
        },
        "diversity_prune": {
            "base_s": dp_base,
            "scaled_cells_prop_s": dp_scaled,
            "ratio_cells_prop": round(dp_scaled / dp_base, 2),
        },
        "phases": phases,
    }))


if __name__ == "__main__":
    main()
