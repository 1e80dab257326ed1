"""Structured Streaming equivalents of the reference's micro-batch
incremental pipeline (SURVEY §2.9).

The reference polls an append-only file store every few hours and
re-derives chunk tables; its semantics map 1:1 onto Structured Streaming
concepts:

- 1-hour chunk binning (T1)            → ``window(ts, "1 hour")`` aggs
- late/out-of-order chunk arrivals (T3)→ watermarks
- populate-on-new-files triggers (T4)  → file source + Trigger.AvailableNow
- skip-ingested idempotency (T5)       → checkpointed exactly-once sinks
- session epochs (T2)                  → ``session_window`` gap windows

``run_available_now`` is the cron-worker replacement: one call drains
everything new since the last checkpoint and stops — identical cadence
semantics to docker/cron_script.bash:3-5 but with exactly-once state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over an append-only parquet directory — the
    raw-chunk arrival feed."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 64).parquet(path)


def hourly_chunk_stats(
    stream: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-chunk summary stats as a streaming windowed agg (the
    streams_maker per-chunk stats table, computed continuously).
    Watermark bounds state: chunks later than ``watermark`` are final."""
    aggs = [F.count(F.lit(1)).alias("sample_count")]
    if value_col:
        aggs += [
            F.min(value_col).alias(f"{value_col}_min"),
            F.max(value_col).alias(f"{value_col}_max"),
        ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("chunk"), *keys)
        .agg(*aggs)
        .select(
            F.col("chunk.start").alias("chunk_start"),
            F.col("chunk.end").alias("chunk_end"),
            *keys,
            *[F.col(c) for c in ["sample_count"] + ([f"{value_col}_min", f"{value_col}_max"] if value_col else [])],
        )
    )


def session_epochs(
    stream: DataFrame, ts_col: str, keys: list[str], gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Epoch discovery as session windows (T2): an epoch closes when no
    data arrives for ``gap``."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("epoch"), *keys)
        .agg(F.count(F.lit(1)).alias("sample_count"))
        .select(
            F.col("epoch.start").alias("epoch_start"),
            F.col("epoch.end").alias("epoch_end"),
            *keys,
            "sample_count",
        )
    )


def dedup_stream(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup on a key set (the skip-ingested guard T5 /
    ownership-claim T7, continuously): keeps the FIRST arrival of each
    key, drops re-deliveries within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark window — unbounded-history dedup is the batch
    ``Table.insert`` anti-join's job; the stream only needs to absorb
    at-least-once delivery from the file feed.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def hourly_distinct(
    stream: DataFrame,
    ts_col: str,
    keys: list[str],
    distinct_col: str,
    watermark: str = "2 hours",
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct-cardinality per hour window, continuously — HyperLogLog
    (``approx_count_distinct``) because exact distinct needs unbounded
    per-window sets while HLL state is a fixed few KB per (window, key).
    The deterministic batch twin is datapipe/sketch.py::kmv_distinct."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("chunk"), *keys)
        .agg(F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"))
        .select(
            F.col("chunk.start").alias("chunk_start"),
            *keys,
            "approx_distinct",
        )
    )


def run_available_now(
    result: DataFrame, sink_path: str, checkpoint_path: str, mode: str = "append"
) -> None:
    """Drain all currently-available input through the streaming plan
    into a parquet sink, exactly once, then stop (Trigger.AvailableNow) —
    the cron-populate replacement."""
    q = (
        result.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(result: DataFrame, name: str, mode: str = "complete") -> None:
    """Test/debug sink: run the whole available input into an in-memory
    table queryable as ``SELECT * FROM <name>``."""
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def bloom_dedup_batches(
    spark: SparkSession,
    state_path: str,
    key_col: str = "doc_id",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    sink=None,
):
    """Streaming dedup against UNBOUNDED history with BOUNDED state — a
    ``foreachBatch`` body that keeps a Bloom filter of every key ever
    accepted (Parquet word table under ``state_path``) instead of the
    key set itself.

    Each micro-batch: probe the stored filter (broadcast join — the
    batch never shuffles on the key), emit only rows the filter has
    definitely never seen, then OR the batch's own partial into the
    stored state. The Bloom no-false-negative guarantee means a
    duplicate is NEVER re-emitted; the price is dropping the rare fresh
    key that false-positives (P ≈ (n·k/m)^k — size ``num_bits`` for the
    expected history, 2^20 bits ≈ 128 KiB handles ~10^5 keys at k=4
    under 1e-4). Watermark dedup (``dedup_stream``) bounds state by
    TIME; this bounds it by SIZE with no horizon — the right trade for
    ingest-once ledgers over long-lived streams.

    ``sink`` selects where accepted rows go:

    * a **path string** — the production form: each batch's fresh rows
      are written to ``<sink>/batch_id=<n>`` with overwrite, so a
      retried batch rewrites its own directory (idempotent, no driver
      materialization; read the sink back with
      ``spark.read.parquet(sink)`` for the full ledger);
    * a **callable** ``(fresh_df, batch_id) -> None`` for custom sinks;
    * ``None`` — test/debug mode: accepted rows are collect()ed into
      the returned ``emitted`` list.

    Crash safety is commit-ordered: the sink write happens BEFORE the
    state commit, so a crash between the two re-emits the batch on
    retry (the idempotent per-batch sink directory absorbs it) instead
    of silently dropping it, and a retry that arrives AFTER the state
    commit is detected from the version pointer (which names the last
    committed batch id) and skipped wholesale — without that check the
    retried batch would probe its own keys as duplicates and overwrite
    its sink directory with nothing. State itself is versioned —
    ``state_path/v<batch_id>`` is written fully, then a one-line
    ``CURRENT`` pointer file is flipped with an atomic rename
    (``os.replace``; on HDFS/S3 commit via ``FileSystem.rename`` / a
    conditional put of the same pointer object) — so readers and
    crash-retries only ever see a complete, committed filter, and a
    crash mid-swap leaves the previous version current. Stale version
    directories are pruned after the flip.

    Returns ``(fn, emitted)``: pass ``fn`` to
    ``writeStream.foreachBatch``.
    """
    import os as _os
    import shutil as _shutil

    from aeon_mecha_spark.datapipe import sketch as _sk

    emitted: list[list] = []
    pointer = _os.path.join(state_path, "CURRENT")

    def _current_version() -> str | None:
        if not _os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            name = fh.read().strip()
        return _os.path.join(state_path, name) if name else None

    def fn(batch: DataFrame, batch_id: int) -> None:
        cur0 = _current_version()
        if cur0 is not None and int(_os.path.basename(cur0)[1:]) >= batch_id:
            # the pointer doubles as the committed-epoch marker: this
            # batch's state flip already happened, so its keys are in
            # the filter and its sink directory is final — reprocessing
            # would probe them as duplicates and overwrite the sink
            # with nothing. Retry after full commit is a no-op.
            return
        batch = batch.dropDuplicates([key_col]).persist()
        try:
            cur = _current_version()
            if cur is not None:
                state = spark.read.parquet(cur)
                probed = _sk.bloom_contains(
                    batch, key_col, state, [key_col], num_bits, num_hashes
                )
                fresh = batch.join(
                    probed.filter(F.col("maybe_member") == 0).select(key_col),
                    key_col,
                )
            else:
                state = None
                fresh = batch
            # 1. sink first (see docstring: re-emit-on-retry beats drop)
            if sink is None:
                emitted.append(fresh.collect())
            elif callable(sink):
                sink(fresh, batch_id)
            else:
                fresh.write.mode("overwrite").parquet(
                    _os.path.join(sink, f"batch_id={batch_id}")
                )
            # 2. write the new state version in full …
            add = _sk.bloom_partial(fresh, key_col, num_bits, num_hashes)
            merged = _sk.bloom_merge(state.unionByName(add)) if state is not None else add
            vname = f"v{batch_id}"
            merged.coalesce(1).write.mode("overwrite").parquet(
                _os.path.join(state_path, vname)
            )
            # 3. … then commit with an atomic pointer flip
            tmp_ptr = pointer + ".tmp"
            with open(tmp_ptr, "w") as fh:
                fh.write(vname)
            _os.replace(tmp_ptr, pointer)
            # 4. prune superseded versions (best-effort)
            for d in _os.listdir(state_path):
                if d.startswith("v") and d != vname:
                    _shutil.rmtree(_os.path.join(state_path, d), ignore_errors=True)
        finally:
            batch.unpersist()

    return fn, emitted


def sliding_window_stats(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    window: str = "1 hour",
    slide: str = "15 minutes",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Hopping-window aggregation: overlapping windows of ``window``
    duration starting every ``slide`` (each row lands in window/slide
    windows; ``F.window`` explodes it map-side, so the shuffle carries
    one pre-aggregated partial per (window, key) — no row blow-up past
    the map stage).

    Works identically on a batch DataFrame and on a stream (pass
    ``watermark`` there so window state can be evicted once closed) —
    the reference recomputes rolling views batch-wise per chunk cycle
    (aeon/io/api.py load windows + dj_pipeline block analyses); here
    one declaration serves both modes, and batch==streaming parity is
    test-pinned.

    Sums route through decimal so the result is shuffle-plan-independent
    and bit-identical to the SQL oracle.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(27,6)")).cast("double").alias("sum_value")
        )
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("win_start"),
            *keys,
            "n",
            *(["sum_value"] if value_col else []),
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str = "0 seconds",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked stream-stream event-time interval join: pair each
    left row with the right rows sharing ``keys`` whose event time falls
    in ``[left_ts, left_ts + upper]``.

    This is the streaming twin of operators/intervals.py's batch
    interval join (the reference joins device streams to enclosing
    epochs per poll cycle — dj_pipeline ingest; a stream-stream join
    keeps those pairings continuous). Both sides carry a watermark and
    the join condition bounds BOTH event times, so Spark can evict
    state: left rows older than watermark + ``upper`` can never match
    again and are dropped — bounded state at any input rate.

    ``upper`` / ``watermark`` are SQL interval strings ("24 hours").
    Equality ``keys`` hash-partition both sides, so matching is
    co-located and never quadratic in anything but per-key density.
    """
    lw = left.withWatermark(left_ts, watermark)
    # disambiguate columns: the join condition must reference each
    # side's own event-time attribute. Rename FIRST, then watermark the
    # renamed column — withWatermark tags a specific attribute and a
    # later select/alias would silently drop the tag.
    rsel = [F.col(k).alias(f"r_{k}") for k in keys] + [
        F.col(right_ts).alias(f"r_{right_ts}")
    ] + [F.col(c).alias(f"r_{c}") for c in (right_cols or [])]
    rw = right.select(*rsel).withWatermark(f"r_{right_ts}", watermark)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    cond = (
        cond
        & (F.col(f"r_{right_ts}") >= F.col(left_ts))
        & (F.col(f"r_{right_ts}") <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner")
