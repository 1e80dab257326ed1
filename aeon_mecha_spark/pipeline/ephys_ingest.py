"""Ephys ingestion twin — the Spark re-expression of the reference's
most intricate flow (/root/reference/aeon/dj_pipeline/ephys.py:117-189,
400-478,515-682; docs/specs/SPEC_EPHYS_PIPELINE.md:60-137; SURVEY §3.3).

Reference semantics, re-derived relationally:

1. **Ephys epochs**: epoch_start is the *observed* HARP time of the
   first HarpSync CSV row in the epoch — not the directory timestamp
   (SPEC_EPHYS_PIPELINE.md:60-91). Here: min(harp) per epoch dir over
   the sync stream.
2. **Sync models**: one linear model clock→harp per HarpSync file
   (schema/ephys.py:35-71) with observed bounds — the grouped
   closed-form OLS.
3. **Ephys chunks**: each binary chunk's ONIX bounds [first, last]
   resolve to HARP bounds through the *covering* sync model, with the
   exact-boundary fast path (a chunk whose first tick equals a model's
   clock_start uses that model — ephys_utils.py:645-683). Covering =
   inclusive-start point-in-interval join against the (tiny, broadcast)
   model table; chunks spanning model boundaries take the model covering
   their first tick (reference behavior).
4. **Spike sync** then reuses operators.spikes: index→chunk bucketing by
   cumulative lengths, ONIX→HARP prediction.

Everything is one batch plan per table — re-runnable, idempotent when
written through ``pipeline.orchestrator.Table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aeon_mecha_spark.functions.time import harp_to_timestamp
from aeon_mecha_spark.operators.regression import fit_closed_form


def ephys_epochs(harp_sync: DataFrame, keys: list[str] = ("experiment_name", "epoch_dir")) -> DataFrame:
    """Observed epoch start = first HARP sample per epoch
    (SPEC_EPHYS_PIPELINE.md:60-91): min over the sync stream, converted
    to a timestamp."""
    keys = list(keys)
    agg = harp_sync.groupBy(*keys).agg(
        F.min("harp_time").alias("epoch_start_harp"),
        F.max("harp_time").alias("epoch_last_harp"),
        F.count(F.lit(1)).alias("n_sync_rows"),
    )
    return agg.withColumn("epoch_start", harp_to_timestamp(F.col("epoch_start_harp")))


def sync_models(
    harp_sync: DataFrame,
    keys: list[str] = ("experiment_name", "epoch_dir", "file_chunk"),
) -> DataFrame:
    """Per-sync-file clock→harp linear model with observed bounds
    (EphysSyncModel, ephys.py:379-398). NULL harp rows drop before the
    fit (schema/ephys.py:42)."""
    fitted = fit_closed_form(harp_sync, "clock", "harp_time", list(keys))
    return fitted.select(
        *keys,
        F.col("clock_start").cast("long").alias("onix_ts_start"),
        F.col("clock_end").cast("long").alias("onix_ts_end"),
        F.col("harp_time_start").alias("sync_start_harp"),
        F.col("harp_time_end").alias("sync_end_harp"),
        "n_samples",
        "slope",
        "intercept",
        "r2",
    )


def resolve_chunk_bounds(
    chunks: DataFrame,
    models: DataFrame,
    keys: list[str] = ("experiment_name", "epoch_dir"),
) -> DataFrame:
    """Map each binary chunk's ONIX bounds to HARP timestamps via the
    model covering its FIRST tick (ephys.py:515-682).

    Window membership is inclusive-start/exclusive-end on
    [onix_ts_start, onix_ts_end); a final model's end is extended to
    +∞ within its epoch so trailing samples resolve (the reference's
    clamp-to-last-model behavior). The exact-boundary fast path
    (first == clock_start) is the inclusive start bound.
    """
    from pyspark.sql import Window as W

    keys = list(keys)
    w = W.partitionBy(*keys).orderBy("onix_ts_start")
    # first window extends backward, last extends forward: every chunk in
    # the epoch resolves to its nearest model (clamp-to-first/last —
    # leading chunks recorded before the first sync file must not drop)
    m = (
        models.withColumn(
            "win_end", F.coalesce(F.lead("onix_ts_start").over(w), F.lit(2**62))
        )
        .withColumn(
            "win_start",
            F.when(F.row_number().over(w) == 1, F.lit(-(2**62))).otherwise(
                F.col("onix_ts_start")
            ),
        )
    )
    l, r = chunks.alias("l"), m.alias("r")
    cond = (F.col("l.first_ts") >= F.col("r.win_start")) & (
        F.col("l.first_ts") < F.col("r.win_end")
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    joined = l.join(F.broadcast(r), cond, "inner").select(
        "l.*", F.col("r.slope"), F.col("r.intercept"), F.col("r.onix_ts_start").alias("model_start")
    )
    harp_of = lambda c: F.col("intercept") + F.col("slope") * c.cast("double")  # noqa: E731
    return (
        joined.withColumn("chunk_start_harp", harp_of(F.col("first_ts")))
        .withColumn("chunk_end_harp", harp_of(F.col("last_ts")))
        .withColumn("chunk_start", harp_to_timestamp(F.col("chunk_start_harp")))
        .withColumn("chunk_end", harp_to_timestamp(F.col("chunk_end_harp")))
    )


def ingest_ephys(
    harp_sync: DataFrame,
    binary_chunks: DataFrame,
    epoch_keys: list[str] = ("experiment_name", "epoch_dir"),
    file_keys: list[str] = ("experiment_name", "epoch_dir", "file_chunk"),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full flow: (epochs, sync_models, resolved_chunks)."""
    epochs = ephys_epochs(harp_sync, epoch_keys)
    models = sync_models(harp_sync, file_keys)
    chunks = resolve_chunk_bounds(binary_chunks, models, epoch_keys)
    return epochs, models, chunks
