"""ANN capstone (VERDICT r11 item 6): ivf_pq_search at 64× corpus under
the production rule (cells ∝ N), with stage-level shuffle metrics —
verifying the 2.11×-at-8× law holds another three octaves.

This deliberately does NOT run the degenerate fixed-cells config at
64×: with cells pinned at the gate's 4 literals, candidate pairs grow
as N²·nprobe/cells (≈ 2·10¹¹ pairs at 64×) — that shape is quadratic
BY CONSTRUCTION and was already measured at 8× (ivfpq_scale_probe.py,
SCALE.md r11). The production question is the other one: does per-query
work stay flat when the index is sized to the corpus? Here cells = 4·N
(constant expected cell size), trained by the repo's distributed
k-means on the coarse prefix, then one timed ivf_pq_search pass over
the replicated corpus, with Spark-UI REST per-phase deltas of input /
shuffle bytes (the capstone_64x.py methodology).

Writes only under /tmp. Usage: python tools/ivfpq_capstone.py [N]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.capstone_64x import stage_totals  # noqa: E402
from tools.ivfpq_scale_probe import COARSE_DIMS, emb_table, run  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe import similarity
    from aeon_mecha_spark.session import get_spark

    from tools.scale_probe import BASE, build_scaled

    import __spark_entry__ as entry_mod

    spark = get_spark("ivfpq-capstone", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled(spark, n)

    base = emb_table(spark, BASE)
    scaled = emb_table(spark, scaled_dir)
    books = entry_mod._pq_fixed_codebooks()
    cells_fixed = len(entry_mod._IVF_CENTROIDS)
    cells_scaled = cells_fixed * n

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

    # warmup (JVM/codegen) on the 1× gate shape, untimed
    run(spark, base, entry_mod._IVF_CENTROIDS, books, reps=1)

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
    base_s = phase("search_1x_4cells", lambda: run(
        spark, base, entry_mod._IVF_CENTROIDS, books, reps=3))
    scaled_s = phase(f"search_{n}x_{cells_scaled}cells", lambda: run(
        spark, scaled, cent_big, books, reps=3))
    print(json.dumps({
        "n": n,
        "cells_fixed": cells_fixed,
        "cells_scaled": cells_scaled,
        "base_s": base_s,
        "scaled_cells_prop_s": scaled_s,
        "ratio_cells_prop": round(scaled_s / base_s, 2),
        "phases": phases,
    }))


if __name__ == "__main__":
    main()
