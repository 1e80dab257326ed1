"""End-to-end demo: what a user of the reference pipeline does daily,
on this engine.

Builds a synthetic chunked experiment on disk, ingests it (epochs →
chunks → stream table → per-chunk summaries), queries it with the
DataJoint-style algebra, fits clock-sync models, and runs the
training-data operators against the driver testdata.

Run:  python examples/demo_pipeline.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aeon_mecha_spark.session import get_spark
from aeon_mecha_spark.pipeline import ingest
from aeon_mecha_spark.query import Relation, U
from aeon_mecha_spark.sources import load as L
from aeon_mecha_spark.sources.readers import REGISTRY

HARP0 = 2_082_844_800 + 1_704_067_200  # 2024-01-01 in HARP seconds


def build_experiment(root: str) -> str:
    exp = os.path.join(root, "exp01")
    for epoch, hours in [("2024-01-01T00-00-00", [0, 1]), ("2024-01-01T02-00-00", [2])]:
        d = os.path.join(exp, epoch, "Patch1")
        os.makedirs(d, exist_ok=True)
        for h in hours:
            lines = ["aeon_time,angle,intensity"]
            for s in range(0, 3600, 30):
                lines.append(f"{HARP0 + h*3600 + s},{float((h*3600+s) % 360)},{1.0 + h}")
            with open(os.path.join(d, f"Patch1_Encoder_2024-01-01T{h:02d}-00-00.csv"), "w") as f:
                f.write("\n".join(lines) + "\n")
    return exp


def main() -> None:
    spark = get_spark("demo", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="aeon_demo_")
    exp = build_experiment(tmp)

    # 1. raw load with time-window pruning (the reference's io load())
    rdr = REGISTRY["encoder"]
    window = L.load(
        spark, exp, rdr,
        start=dt.datetime(2024, 1, 1, 0, 30), end=dt.datetime(2024, 1, 1, 1, 30),
    )
    print(f"[load] encoder rows in 00:30–01:30 window: {window.count()}")

    # 2. materialize + summarize via the pipeline layer
    stream = window.select(
        F.lit("exp01").alias("experiment_name"), F.lit("Encoder").alias("stream_name"),
        "time", "angle", "intensity",
    )
    t = ingest.write_stream_table(stream, tmp, "encoder_stream")
    summary = ingest.stream_summary(
        spark.read.parquet(t.path), ["angle", "intensity"],
        keys=["experiment_name", "stream_name"],
    )
    print("[summary] per-chunk stats:")
    summary.orderBy("chunk_start").show(truncate=False)

    # 3. DataJoint-style algebra over the testdata catalog
    sf = "/root/testdata/sf0.001"
    orders = Relation(spark.read.parquet(f"{sf}/orders.parquet"), pk=["o_orderkey"])
    customer = Relation(spark.read.parquet(f"{sf}/customer.parquet"), pk=["c_custkey"]).proj(
        "c_name", o_custkey="c_custkey"
    )
    big = (orders & "o_totalprice > 300000") * customer
    print("[algebra] big orders joined to customers:")
    big.top(5, order_by="o_totalprice desc").proj("o_orderkey", "o_totalprice", "c_name").df.show()

    per_status = U("o_orderstatus").aggr(orders, n="count(1)", total="cast(sum(cast(o_totalprice as decimal(27,2))) as double)")
    print("[algebra] per-status rollup:")
    per_status.df.show()

    # 4. training-data ops on documents
    from aeon_mecha_spark.datapipe import dedup, textqc

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs)
    jac = dedup.ngram_jaccard(docs, pairs).filter(F.col("jaccard") > 0.2)
    print(f"[dedup] LSH candidate pairs: {pairs.count()}, jaccard>0.2: {jac.count()}")
    print("[textqc] quality sample:")
    textqc.quality_features(docs).orderBy(F.col("quality_score").desc()).show(3)

    spark.stop()
    print("demo complete")


if __name__ == "__main__":
    main()
