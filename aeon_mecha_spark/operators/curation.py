"""Curation operators — the reference's spike-sorting curation flow
(/root/reference/aeon/dj_pipeline/spike_sorting_curation.py:150-215)
re-expressed for append-only storage.

Reference behavior: a curation pass merges/relabels/removes units, then
deletes downstream rows and repopulates. Here:

- unit relabeling/merging is a broadcast-joined mapping applied to the
  spike table (new curated version written alongside, not mutated);
- unit differences between two sorts/curations are set ops (U3,
  spike_sorting_curation.py:150-152);
- delete-and-repopulate = ``Table.delete_restriction`` + ``populate``
  (pipeline/orchestrator.py) — targeted recompute, idempotent.

Curated outputs carry a ``curation_id`` column instead of overwriting —
every historical curation stays queryable (lineage for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_unit_mapping(
    spikes: DataFrame,
    mapping: DataFrame,
    curation_id: str,
    unit_col: str = "unit",
) -> DataFrame:
    """Relabel/merge units: mapping is (unit → new_unit); units absent
    from the mapping keep their label (including NULL-unit noise spikes);
    new_unit NULL = unit removed. Merge = many→one mapping rows.
    Broadcast join (mapping is tiny); duplicate old-unit rows are
    deduplicated so the join can never fan out spike rows."""
    m = mapping.select(F.col(unit_col).alias("_old"), F.col("new_unit")).dropDuplicates(["_old"])
    out = spikes.join(F.broadcast(m), spikes[unit_col] == F.col("_old"), "left")
    curated = (
        # drop ONLY spikes whose unit was explicitly mapped to NULL;
        # unmatched rows (incl. unit IS NULL) keep their label
        out.filter(~(F.col("_old").isNotNull() & F.col("new_unit").isNull()))
        .withColumn(
            unit_col,
            F.when(F.col("_old").isNotNull(), F.col("new_unit")).otherwise(F.col(unit_col)),
        )
        .drop("_old", "new_unit")
    )
    return curated.withColumn("curation_id", F.lit(curation_id))


def unit_diff(before: DataFrame, after: DataFrame, unit_col: str = "unit") -> DataFrame:
    """Units present before but not after (removed/merged-away) — the
    python set-difference check (spike_sorting_curation.py:150-152) as a
    relation."""
    b = before.select(unit_col).dropDuplicates()
    a = after.select(unit_col).dropDuplicates()
    return b.join(a, unit_col, "left_anti")


def curation_summary(curated: DataFrame, unit_col: str = "unit") -> DataFrame:
    """Per-curation unit inventory: unit count + spike counts — the
    golden-dataset assertions' shape (expected_unit_count,
    expected_total_spikes; conftest.py:114-117)."""
    return curated.groupBy("curation_id").agg(
        F.countDistinct(unit_col).alias("n_units"),
        F.count(F.lit(1)).alias("n_spikes"),
    )
