"""Interval-overlap, range, and as-of joins (SURVEY.md §2.3 J3-J5).

These are the reference's load-bearing temporal joins:

- device-install-window theta join driving stream population
  (/root/reference/aeon/dj_pipeline/utils/streams_maker.py:203-216);
- chunk-covers-timestamp and ONIX range-overlap joins
  (acquisition.py:642-661; ephys.py:620-635,726-752; onix_imu.py:89-134);
- as-of (nearest-predecessor) epoch lookup
  (docs/specs/SPEC_EPHYS_PIPELINE.md:375-385; load_metadata.py:688-692).

Spark has no native interval/as-of join, so each gets a scale-aware plan:

- *small × big* (the reference's actual shape — device/sync-window dims
  are tiny): plain non-equi join; the small side broadcasts, each task
  filters its stream partition — no shuffle of the big side.
- *big × big*: bucketize the range key to hour buckets and equi-join on
  (key, bucket) before the residual range filter — turns the cross
  product into a co-partitioned join (`range_join_bucketed`).
- *as-of*: union-then-window ("merge" technique): tag both sides, sort
  within key partitions, forward-fill right values, keep left rows. One
  shuffle, no per-row lookups, no driver loops — scales to any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    closed: bool = True,
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval-overlap join, inclusive bounds by default (parity with
    onix_imu.py:89-134 chunk selection)."""
    l, r = left.alias("l"), right.alias("r")
    if closed:
        cond = (F.col(f"l.{left_start}") <= F.col(f"r.{right_end}")) & (
            F.col(f"l.{left_end}") >= F.col(f"r.{right_start}")
        )
    else:
        cond = (F.col(f"l.{left_start}") < F.col(f"r.{right_end}")) & (
            F.col(f"l.{left_end}") > F.col(f"r.{right_start}")
        )
    for k in on or []:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    rside = F.broadcast(r) if broadcast_right else r
    # drop every right column whose name collides with a left column —
    # an ambiguous duplicate name would poison all downstream references
    dup = set(on or []) | (set(left.columns) & set(right.columns))
    rcols = [F.col(f"r.{c}") for c in right.columns if c not in dup]
    return l.join(rside, cond, "inner").select("l.*", *rcols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """`t BETWEEN start AND end` join — chunk-covering-a-timestamp
    (acquisition.py:642-661)."""
    p, i = points.alias("p"), intervals.alias("i")
    cond = (F.col(f"p.{point_col}") >= F.col(f"i.{start_col}")) & (
        F.col(f"p.{point_col}") <= F.col(f"i.{end_col}")
    )
    for k in on or []:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    iside = F.broadcast(i) if broadcast_intervals else i
    dup = set(on or []) | (set(points.columns) & set(intervals.columns))
    icols = [F.col(f"i.{c}") for c in intervals.columns if c not in dup]
    return p.join(iside, cond, "inner").select("p.*", *icols)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str],
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Big×big point-in-interval join without a broadcast: explode each
    interval into the hour buckets it spans, equi-join on (keys, bucket),
    then apply the exact range filter. Interval spans are bounded (1-h
    chunks), so the explode factor is ~1-2."""
    b = F.lit(bucket_us)
    pts = points.withColumn("_bkt", (F.unix_micros(F.col(point_col)) / b).cast("long"))
    ivs = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / b).cast("long"),
                (F.unix_micros(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    joined = pts.join(ivs, [*on, "_bkt"], "inner").drop("_bkt")
    return joined.filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' mirrors).

    Union-merge formulation: one shuffle on ``on`` keys, sorted window,
    ``last(..., ignorenulls)`` forward-fill — the classic scalable as-of
    plan (no broadcast, no per-group pandas). Right rows sort before left
    rows at equal timestamps, so ties are inclusive (<=) — matching the
    reference's covering-epoch lookup MAX(epoch_start <= t)
    (SPEC_EPHYS_PIPELINE.md:375-385).
    """
    lcols = left.columns
    marker = "_is_left"
    ts = "_asof_ts"
    payload = "_asof_payload"

    # value columns travel as ONE struct: the fill then moves whole right
    # ROWS atomically, so (a) a legitimately-NULL value in the matched
    # right row stays NULL (not replaced by an older row's value) and
    # (b) multiple value columns can never mix across right rows.
    rstruct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    payload_type = right.select(rstruct.alias(payload)).schema[payload].dataType

    lnorm = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(marker),
        F.lit(None).cast(payload_type).alias(payload),
    )
    rnorm = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(marker),
        rstruct.alias(payload),
    ).select(*[c for c in lcols], F.col(ts), F.col(marker), F.col(payload))

    unioned = lnorm.unionByName(rnorm)
    order = [F.col(ts).asc(), F.col(marker).asc()] if direction == "backward" else [
        F.col(ts).desc(),
        F.col(marker).asc(),
    ]
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    filled = unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    out = filled.filter(F.col(marker) == 1).drop(marker, ts)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}" if suffix else c, F.col(f"{payload}.{c}"))
    return out.drop(payload)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(
    direction='nearest')``): each left row takes the right row with the
    smallest ``|right_ts − left_ts|``; distance ties prefer the earlier
    (backward) row, deterministically. ``tolerance_us`` drops matches
    farther than the bound (µs); unmatched rows keep NULL values. Adds
    ``value_cols`` plus ``asof_gap_us`` (signed right−left µs, NULL when
    unmatched).

    Plan: the same union-merge as :func:`asof_join`, but BOTH
    directions come out of ONE shuffle + ONE sort — the backward
    candidate is a ``last(…, ignorenulls)`` over the preceding frame
    and the forward candidate a ``first(…, ignorenulls)`` over the
    following frame of the same ascending (ts, right-first) order —
    then a row-local distance comparison picks the winner. No joins,
    no second exchange; scale is the per-key sort, exactly like the
    backward form.
    """
    lcols = left.columns
    marker, ts, pay = "_is_left", "_asof_ts", "_asof_payload"
    rstruct = F.struct(
        F.unix_micros(F.col(right_ts)).alias("_rts_us"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    payload_type = right.select(rstruct.alias(pay)).schema[pay].dataType
    lnorm = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(marker),
        F.lit(None).cast(payload_type).alias(pay),
    )
    rnorm = right.select(
        *[
            F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
            for c in lcols
            if c not in on
        ],
        *[F.col(c) for c in on],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(marker),
        rstruct.alias(pay),
    ).select(*[c for c in lcols], F.col(ts), F.col(marker), F.col(pay))
    unioned = lnorm.unionByName(rnorm)
    order = [F.col(ts).asc(), F.col(marker).asc()]
    wb = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy(*on).orderBy(*order).rowsBetween(0, W.unboundedFollowing)
    back = F.last(pay, ignorenulls=True).over(wb)
    fwd = F.first(pay, ignorenulls=True).over(wf)
    t_us = F.unix_micros(F.col(ts))
    bgap = t_us - back.getField("_rts_us")  # >= 0
    fgap = fwd.getField("_rts_us") - t_us  # >= 0
    if tolerance_us is not None:
        back = F.when(bgap <= tolerance_us, back)
        fwd = F.when(fgap <= tolerance_us, fwd)
    chosen = (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(bgap <= fgap, back)  # distance tie -> earlier row
        .otherwise(fwd)
    )
    out = (
        unioned.withColumn("_chosen", chosen)
        .filter(F.col(marker) == 1)
        .withColumn(
            "asof_gap_us", F.col("_chosen").getField("_rts_us") - t_us
        )
        .drop(marker, ts, pay)
    )
    for c in value_cols:
        out = out.withColumn(c, F.col("_chosen").getField(c))
    return out.drop("_chosen")
