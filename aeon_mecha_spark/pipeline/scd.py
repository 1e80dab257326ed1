"""Slowly-changing-dimension maintenance (SCD type 2) as a pure plan.

The reference versions curation state by replace-in-place (DataJoint
delete-and-repopulate, /root/reference/aeon/dj_pipeline/__init__.py
delete patterns); a warehouse at 100 TB keeps HISTORY instead: each
dimension row carries a validity interval, an update closes the open row
and appends a new one. ``scd2_apply`` is that merge as a deterministic
DataFrame transformation — input dimension + update batch in, full new
dimension out — so it runs identically as a batch job, inside
``foreachBatch``, or under the idempotent-sink orchestrator
(``Table.upsert`` keyed on (key, valid_from)).

Scale: one equi-join of the OPEN slice against the update batch (the
closed history never joins — at 100 TB that is the difference between
touching this batch's keys and rewriting the dimension), one union of
four branch plans. Change detection is null-safe equality on the
tracked columns, all Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Merge one update batch into an SCD2 dimension.

    ``dim``: the current dimension — one OPEN row per key
    (``valid_to`` NULL, ``current_col`` true) plus closed history.
    ``updates``: ``(keys…, tracked…, effective_col)`` — at most one row
    per key (dedupe upstream; the merge asserts nothing about order
    within a batch).

    Semantics per update key:
    - tracked attributes unchanged (null-safe) → no-op;
    - changed → the open row closes (``valid_to = effective_ts``,
      current=false) and a new open row with the update's attributes
      and ``valid_from = effective_ts`` appends;
    - key not in the dimension → new open row appends.
    Closed history rows and open rows of un-updated keys pass through
    untouched. Output schema == ``dim`` schema.
    """
    other_cols = [
        c for c in dim.columns
        if c not in (*keys, *tracked, valid_from, valid_to, current_col)
    ]
    open_rows = dim.filter(F.col(current_col))
    closed_rows = dim.filter(~F.col(current_col))
    upd = updates.select(
        *keys,
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
        F.col(effective_col).alias("_eff"),
    )
    j = open_rows.join(upd, keys, "left")
    changed = j["_eff"].isNotNull() & ~F.struct(
        *[F.col(c) for c in tracked]
    ).eqNullSafe(F.struct(*[F.col(f"_u_{c}") for c in tracked]))

    # open rows: unchanged pass through; changed close at the effective ts
    kept_open = j.filter(~F.coalesce(changed, F.lit(False))).select(*dim.columns)
    newly_closed = j.filter(changed).select(
        *keys,
        *tracked,
        *other_cols,
        F.col(valid_from),
        F.col("_eff").alias(valid_to),
        F.lit(False).alias(current_col),
    )
    # new open versions for changed keys (non-key attrs carry over)
    reopened = j.filter(changed).select(
        *keys,
        *[F.col(f"_u_{c}").alias(c) for c in tracked],
        *other_cols,
        F.col("_eff").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_col),
    )
    # brand-new keys (anti-join against the OPEN slice)
    fresh = (
        updates.join(open_rows.select(*keys), keys, "left_anti")
        .select(
            *keys,
            *tracked,
            *[F.lit(None).cast(dim.schema[c].dataType).alias(c) for c in other_cols],
            F.col(effective_col).alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(current_col),
        )
    )
    out_cols = dim.columns
    return (
        closed_rows.select(*out_cols)
        .unionByName(kept_open.select(*out_cols))
        .unionByName(newly_closed.select(*out_cols))
        .unionByName(reopened.select(*out_cols))
        .unionByName(fresh.select(*out_cols))
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Effective-dated dimension lookup — the read side of SCD2: each
    fact row joins the dimension VERSION whose validity interval covers
    the fact's timestamp (``valid_from <= ts < valid_to``, open rows
    have NULL ``valid_to`` = +infinity). With an ``scd2_apply``-
    maintained dimension, intervals per key are disjoint, so every fact
    matches at most one version.

    Plan: equi-join on the keys (broadcast when the dimension fits —
    dimensions are small next to facts by definition) with the interval
    predicate evaluated inside the same join — a hash join with a
    residual range filter, never a nested-loop over versions.
    """
    f, d = facts.alias("f"), dim.alias("d")
    cond = (F.col(f"f.{ts_col}") >= F.col(f"d.{valid_from}")) & (
        F.col(f"d.{valid_to}").isNull()
        | (F.col(f"f.{ts_col}") < F.col(f"d.{valid_to}"))
    )
    for k in keys:
        cond = cond & (F.col(f"f.{k}") == F.col(f"d.{k}"))
    dside = F.broadcast(d) if broadcast_dim else d
    dup = set(keys) | (set(facts.columns) & set(dim.columns))
    dcols = [F.col(f"d.{c}") for c in dim.columns if c not in dup]
    return f.join(dside, cond, how).select("f.*", *dcols)
