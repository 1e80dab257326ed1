"""IVF-PQ composed-search scaling probe: fixed cells vs cells ∝ N.

q271 pins 4 literal coarse cells + the fixed q109 codebooks for
oracle-checkability, which makes its naive scale ratio superlinear by
construction (candidate pairs ≈ N²·nprobe/cells). The production
operating rule is cells ∝ N (constant cell size → constant candidates
per query); this probe measures both on the same replicated corpus,
mirroring tools/ivf_scale_probe.py for the composed ivf_pq_search:

  1×  corpus, cells=4            (the gate shape)
  N×  corpus, cells=4            (degenerate fixed-codebook shape)
  N×  corpus, cells=4·N          (cells ∝ N: per-query work flat)

PQ codebooks stay the fixed literal ones in all configs — PQ cost is
per-vector (code assign) + per-candidate (LUT lookup), so the coarse
cell count is the only scale knob that matters.

Writes only under /tmp. Usage: python tools/ivfpq_scale_probe.py [N]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COARSE_DIMS = 8


def emb_table(spark, sf_dir: str):
    from pyspark.sql import functions as F

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def run(spark, emb, centroids, books, reps: int = 3) -> float:
    from aeon_mecha_spark.datapipe import similarity

    best = None
    for _ in range(reps):
        t0 = time.time()
        similarity.ivf_pq_search(
            emb, centroids, books, k=3, nprobe=2, shortlist=12
        ).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe import similarity
    from aeon_mecha_spark.session import get_spark

    from tools.scale_probe import BASE, build_scaled

    import __spark_entry__ as entry_mod

    spark = get_spark("ivfpq-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled(spark, n)

    base = emb_table(spark, BASE)
    scaled = emb_table(spark, scaled_dir)
    books = entry_mod._pq_fixed_codebooks()
    cells_fixed = len(entry_mod._IVF_CENTROIDS)
    cells_scaled = cells_fixed * n
    coarse = scaled.select(
        "vec_id", F.slice("embedding", 1, COARSE_DIMS).alias("embedding")
    )
    cent_big = similarity.kmeans_train(coarse, k=cells_scaled, iters=5)

    run(spark, base, entry_mod._IVF_CENTROIDS, books)  # warmup

    report = {
        "n": n,
        "cells_fixed": cells_fixed,
        "cells_scaled": cells_scaled,
        "base_s": run(spark, base, entry_mod._IVF_CENTROIDS, books),
        "scaled_fixed_cells_s": run(spark, scaled, entry_mod._IVF_CENTROIDS, books),
        "scaled_cells_prop_s": run(spark, scaled, cent_big, books),
    }
    report["ratio_fixed"] = round(report["scaled_fixed_cells_s"] / report["base_s"], 2)
    report["ratio_cells_prop"] = round(
        report["scaled_cells_prop_s"] / report["base_s"], 2
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
