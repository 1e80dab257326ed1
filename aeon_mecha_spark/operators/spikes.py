"""Spike-time synchronization + unit matching — the relational
re-expression of the reference's ephys post-processing
(/root/reference/aeon/dj_pipeline/spike_sorting.py:1098-1179 spike-time
sync; 1400-1460 + SPEC_UNIT_MATCHING.md unit matching; FIXTURES.md §10).

1. *Chunk bucketing*: a spike's sample index into the concatenated
   recording maps to its source chunk by cumulative chunk lengths —
   a window cumsum over the chunk catalog + a range join (no per-spike
   Python).
2. *ONIX→HARP*: each spike's onix_ts finds its covering sync window
   (point-in-interval against the tiny sync-model dim → broadcast) and
   applies the per-window linear model; exact-boundary spikes take the
   window whose start equals the boundary (ephys_utils.py:665-672 fast
   path ≙ inclusive-start/exclusive-end windows here).
3. *Unit matching*: two sorters' spike trains agree when spike times
   fall within ±delta (0.4 ms default, spike_sorting.py:1440-1452).
   Naively a cross join; here each spike gets time-bucket keys of width
   delta and the join is equi on bucket with a |Δt| ≤ delta residual —
   collision-bounded work, the standard big-big band-join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def chunk_offsets(chunks: DataFrame, keys: list[str], length_col: str = "n_samples", order_col: str = "chunk_index") -> DataFrame:
    """Cumulative start offset of each chunk in the concatenated
    recording (spike_sorting.py:1124-1166)."""
    w = W.partitionBy(*keys).orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    return chunks.withColumn(
        "start_offset", F.coalesce(F.sum(length_col).over(w), F.lit(0)).cast("long")
    ).withColumn("end_offset", (F.col("start_offset") + F.col(length_col)).cast("long"))


def assign_spike_chunks(
    spikes: DataFrame, chunks_with_offsets: DataFrame, keys: list[str], index_col: str = "spike_index"
) -> DataFrame:
    """spike_index ∈ [start_offset, end_offset) → chunk. The chunk
    catalog is tiny vs the spike table → broadcast range join."""
    l, r = spikes.alias("l"), chunks_with_offsets.alias("r")
    cond = (F.col(f"l.{index_col}") >= F.col("r.start_offset")) & (
        F.col(f"l.{index_col}") < F.col("r.end_offset")
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    rcols = [F.col(f"r.{c}") for c in chunks_with_offsets.columns if c not in keys]
    out = l.join(F.broadcast(r), cond, "inner").select("l.*", *rcols)
    return out.withColumn("sample_in_chunk", (F.col(index_col) - F.col("start_offset")).cast("long"))


def spikes_to_harp(
    spikes_with_onix: DataFrame,
    sync_models: DataFrame,
    keys: list[str],
    onix_col: str = "onix_ts",
) -> DataFrame:
    """ONIX ticks → HARP seconds via the covering sync model
    (ephys.py:968-971 predict; window selection ephys.py:726-752).
    Sync models: (keys..., onix_ts_start, onix_ts_end, slope, intercept).
    Inclusive-start windows; the model dim broadcasts."""
    l, r = spikes_with_onix.alias("l"), sync_models.alias("r")
    cond = (F.col(f"l.{onix_col}") >= F.col("r.onix_ts_start")) & (
        F.col(f"l.{onix_col}") < F.col("r.onix_ts_end")
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    rcols = [F.col(f"r.{c}") for c in sync_models.columns if c not in keys]
    joined = l.join(F.broadcast(r), cond, "inner").select("l.*", *rcols)
    return joined.withColumn(
        "harp_time", F.col("intercept") + F.col("slope") * F.col(onix_col).cast("double")
    )


def match_units(
    spikes_a: DataFrame,
    spikes_b: DataFrame,
    delta_s: float = 0.0004,
    time_col: str = "harp_time",
    unit_col: str = "unit",
) -> DataFrame:
    """±delta spike-time agreement between two sorters — the relational
    form of SpikeInterface's ``compare_two_sorters`` counting
    (spike_sorting.py:1440-1452: delta_time=0.4 ms).

    Bucketing: each A-spike joins B-spikes in its own and adjacent
    delta-buckets (a |Δt|≤delta pair can never be >1 bucket apart), so
    the join is equi on (bucket) + residual filter. Agreement score per
    (unit_a, unit_b) = matched / (n_a + n_b − matched) — the SI formula.
    """
    bucket = lambda c: F.floor(c / F.lit(delta_s)).cast("long")  # noqa: E731
    a = spikes_a.select(
        F.col(unit_col).alias("unit_a"), F.col(time_col).alias("t_a")
    ).withColumn("bkt", bucket(F.col("t_a")))
    b = spikes_b.select(
        F.col(unit_col).alias("unit_b"), F.col(time_col).alias("t_b")
    ).withColumn("bkt0", bucket(F.col("t_b")))
    b3 = b.withColumn("bkt", F.explode(F.array(F.col("bkt0") - 1, F.col("bkt0"), F.col("bkt0") + 1))).drop("bkt0")

    pairs = a.join(b3, "bkt").filter(F.abs(F.col("t_a") - F.col("t_b")) <= delta_s)
    # each spike may participate in at most ONE match (SpikeInterface
    # matches one-to-one): count distinct matched spikes on each side and
    # take the smaller — bounds n_matched <= min(n_a, n_b), keeping the
    # agreement in [0, 1] even for bursty trains where raw pair counts
    # would exceed the spike counts
    matched = (
        pairs.select("unit_a", "unit_b", "t_a", "t_b").dropDuplicates()
        .groupBy("unit_a", "unit_b")
        .agg(
            F.least(F.countDistinct("t_a"), F.countDistinct("t_b")).alias("n_matched")
        )
    )
    n_a = spikes_a.groupBy(F.col(unit_col).alias("unit_a")).agg(F.count(F.lit(1)).alias("n_a"))
    n_b = spikes_b.groupBy(F.col(unit_col).alias("unit_b")).agg(F.count(F.lit(1)).alias("n_b"))
    out = matched.join(F.broadcast(n_a), "unit_a").join(F.broadcast(n_b), "unit_b")
    return out.withColumn(
        "agreement",
        F.col("n_matched") / (F.col("n_a") + F.col("n_b") - F.col("n_matched")),
    )
