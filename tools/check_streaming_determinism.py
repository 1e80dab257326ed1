"""Streaming determinism sweep (VERDICT r10 item 5): the batch≡stream
claims must hold under ANY in-order micro-batch split, not just the
single-batch AvailableNow drain the gates normally run.

Each file-fed streaming gate runs twice — once as the normal one-file
single micro-batch, once with SPARK_GRAFT_STREAM_SPLIT=8 (the feed is
rewritten as 8 event-time-ordered parquet slices and the file source
gets maxFilesPerTrigger=1, so AvailableNow drains it as 8 micro-batches
with real cross-batch state carryover) — and the two results must agree
on the gate's split-invariant view:

- q42 / q135* / q136 / q138: the full result (complete-mode aggregates
  and the append-mode join emit the same rows whatever the split).
- q129: the per-device rollup (its raw output is per-micro-batch BY
  DESIGN — batch_rows rows appear once per batch — so the invariant is
  sum(batch_rows) / max(last_counter) / max(total_drops)).
- q122: its micro-batching is internal (id %% 3 growing batches with
  replay); re-batching as id %% 5 must still accept each doc EXACTLY
  once (batch_id legitimately differs — it records which batch a doc
  first appeared in).
- watermark[late-drop] (round 12): an OUT-OF-ORDER replay whose late
  rows deterministically cross the watermark — the drop semantics the
  in-order sweep deliberately excludes. Spark splits the watermark
  (SPARK-40925): eviction uses the value from all prior batches, late
  filtering uses the PREVIOUS batch's eviction value; with a pinned
  3-slice replay the dropped window set is exact and asserted.

*q135's gate is the batch declaration; its streaming twin
(sliding_window_stats over the stream feed) runs here explicitly.

Usage: python tools/check_streaming_determinism.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_determinism import canon, eq  # noqa: E402

SPLIT = "8"


def _run(qs, name, spark, sf_dir, split):
    if split:
        os.environ["SPARK_GRAFT_STREAM_SPLIT"] = SPLIT
    else:
        os.environ.pop("SPARK_GRAFT_STREAM_SPLIT", None)
    try:
        return qs[name](spark, sf_dir)
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_SPLIT", None)


def main() -> None:
    from pyspark.sql import functions as F

    from aeon_mecha_spark.session import get_spark

    import __spark_entry__ as entry_mod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("stream-determinism")
    qs = entry_mod.queries()
    failed = 0

    def check(label, a_rows, b_rows):
        nonlocal failed
        ok = eq(a_rows, b_rows)
        failed += not ok
        print(f"{'PASS' if ok else 'FAIL'} {label} "
              f"({len(a_rows)} vs {len(b_rows)} rows, 1 vs {SPLIT} micro-batches)")

    # identity-invariant gates
    for name in ("q42_streaming_hourly", "q136_stream_stream_join",
                 "q138_streaming_sessions"):
        a = canon(_run(qs, name, spark, sf_dir, split=False))
        b = canon(_run(qs, name, spark, sf_dir, split=True))
        check(name, a, b)

    # q129: per-device rollup invariant
    def dropcount_rollup(df):
        return df.groupBy("device").agg(
            F.sum("batch_rows").alias("rows"),
            F.max("last_counter").alias("last_counter"),
            F.max("total_drops").alias("total_drops"),
        )

    a = canon(dropcount_rollup(_run(qs, "q129_stateful_dropcount", spark, sf_dir, False)))
    b = canon(dropcount_rollup(_run(qs, "q129_stateful_dropcount", spark, sf_dir, True)))
    check("q129_stateful_dropcount[rollup]", a, b)

    # q135 streaming twin: batch declaration vs 8-micro-batch stream
    from aeon_mecha_spark.streaming.stream import sliding_window_stats

    batch = canon(qs["q135_sliding_window"](spark, sf_dir))
    os.environ["SPARK_GRAFT_STREAM_SPLIT"] = SPLIT
    try:
        feed = entry_mod._stream_feed(sf_dir, "events", "q135_sweep_")
        src = entry_mod._stream_events(spark, feed)
        streamed = sliding_window_stats(
            src, "ts", ["event_type"], window="1 hour", slide="15 minutes",
            value_col="value", watermark="0 seconds",
        )
        name = f"q135_sweep_{uuid.uuid4().hex[:8]}"
        q = (streamed.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
        stream_rows = canon(spark.table(name).select(*sorted(
            spark.table(name).columns)))
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_SPLIT", None)
    check("q135_sliding_window[stream-twin]", batch, stream_rows)

    # q122: internal re-batching (id % 5 instead of % 3) — exactly-once
    import shutil

    from aeon_mecha_spark.streaming.stream import bloom_dedup_batches

    root = os.path.join(REPO, "spark-warehouse", "bloom_sweep")
    shutil.rmtree(root, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    fn, _ = bloom_dedup_batches(
        spark,
        os.path.join(root, "state"),
        key_col="doc_id",
        sink=os.path.join(root, "accepted"),
    )
    for b in range(5):
        fn(docs.filter(F.col("doc_id") % 5 <= b).select("doc_id"), b)
    ledger = spark.read.parquet(os.path.join(root, "accepted"))
    n_docs = docs.select("doc_id").distinct().count()
    n_led = ledger.count()
    n_dist = ledger.select("doc_id").distinct().count()
    ok = n_led == n_dist == n_docs
    failed += not ok
    print(f"{'PASS' if ok else 'FAIL'} q122_bloom_ledger[rebatch %5] "
          f"(ledger {n_led}, distinct {n_dist}, docs {n_docs})")

    # watermark late-drop: out-of-order replay, exact dropped set
    import datetime as dt
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)

    def _t(h, m=0):
        return base + dt.timedelta(hours=h, minutes=m)

    slices = [[_t(18), _t(20)], [_t(21)], [_t(5), _t(5, 30), _t(22)]]
    feed = tempfile.mkdtemp(prefix="wm_sweep_")
    for i, rows in enumerate(slices):
        tbl = pa.table({
            "time": pa.array(rows, pa.timestamp("us")),
            "device": ["cam"] * len(rows),
            "v": [1.0] * len(rows),
        })
        p = os.path.join(feed, f"part{i:05d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1700000000 + i, 1700000000 + i))

    def wm_run(split):
        src = spark.readStream.schema("time timestamp, device string, v double")
        if split:
            src = src.option("maxFilesPerTrigger", 1)
        agg = (src.parquet(feed)
               .withWatermark("time", "1 hour")
               .groupBy(F.window("time", "1 hour").alias("w"))
               .agg(F.count("*").alias("n")))
        name = "wm" + uuid.uuid4().hex[:8]
        q = (agg.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
        dropped = sum(so.get("numRowsDroppedByWatermark", 0)
                      for p in q.recentProgress for so in p["stateOperators"])
        return {(r.w.start, r.n) for r in spark.table(name).collect()}, dropped

    split_rows, split_dropped = wm_run(True)
    single_rows, single_dropped = wm_run(False)
    ok = (
        split_rows == {(_t(18), 1), (_t(20), 1)}
        and split_dropped == 1
        and single_dropped == 0
        and single_rows - split_rows == {(_t(5), 2)}
    )
    failed += not ok
    print(f"{'PASS' if ok else 'FAIL'} watermark[late-drop] "
          f"(dropped set {sorted(single_rows - split_rows)}, "
          f"metric {split_dropped} vs {single_dropped})")

    total = 7
    print(f"\n{total - failed} passed, {failed} failed, sf_dir={sf_dir}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
