"""Position geometry — parity with the reference's patch/nest analytics
(/root/reference/aeon/dj_pipeline/tracking.py:290-340; FIXTURES.md §7).

- distance to a target point (F12),
- in_patch: distance < radius AND the wheel moved in the trailing 1 s
  (rolling sum of wheel displacement > threshold, forward-filled onto
  position timestamps — tracking.py:317-320, W3/W4),
- patch exit events: falling edge of in_patch (W9),
- in_nest: point-in-polygon (F13) as a vectorized ray-casting pandas
  UDF (the reference uses matplotlib.path; same algorithm, numpy only).

All window math partitions by the subject/experiment key — bounded state
per executor at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from aeon_mecha_spark.operators.intervals import asof_join
from aeon_mecha_spark.operators.windows import lag_delta, rolling_time_sum, sign_change


def distance_to(x: Column, y: Column, tx: float, ty: float) -> Column:
    """Euclidean distance to a fixed target (tracking.py:290-302)."""
    return F.sqrt(F.pow(x - F.lit(tx), F.lit(2)) + F.pow(y - F.lit(ty), F.lit(2)))


def wheel_moving(
    wheel: DataFrame,
    keys: list[str],
    ts_col: str = "time",
    dist_col: str = "wheel_distance",
    window_us: int = 1_000_000,
    threshold: float = 1.0,
) -> DataFrame:
    """Wheel-moving detector: diff the cumulative distance, 1-s trailing
    rolling sum > threshold (tracking.py:319).

    pandas ``rolling("1s")`` windows are left-open ``(t-1s, t]``; the
    range frame drops one µs from the left bound to match."""
    d = lag_delta(wheel, ts_col, keys, [dist_col])
    d = d.withColumn("_step", F.coalesce(F.col(f"{dist_col}_delta"), F.lit(0.0)))
    r = rolling_time_sum(d, F.col("_step"), ts_col, keys, window_us - 1, "_moved_1s")
    return r.withColumn("wheel_moving", F.col("_moved_1s") > threshold).drop("_step", "_moved_1s")


def in_patch(
    position: DataFrame,
    wheel: DataFrame,
    keys: list[str],
    patch_x: float,
    patch_y: float,
    radius: float = 0.2,
    ts_col: str = "time",
) -> DataFrame:
    """distance < radius AND wheel moving, with the wheel signal
    forward-filled onto position timestamps via an as-of join
    (tracking.py:317-320 ``reindex(method="pad")``)."""
    moving = wheel_moving(wheel, keys, ts_col)
    aligned = asof_join(
        position,
        moving.select(*keys, F.col(ts_col).alias("_wts"), "wheel_moving"),
        on=keys,
        left_ts=ts_col,
        right_ts="_wts",
        value_cols=["wheel_moving"],
    )
    near = distance_to(F.col("x"), F.col("y"), patch_x, patch_y) < radius
    out = aligned.withColumn(
        "in_patch", near & F.coalesce(F.col("wheel_moving"), F.lit(False))
    )
    return sign_change(out, F.col("in_patch"), ts_col, keys, "exit_patch")


def point_in_polygon(vertices: list[tuple[float, float]]):
    """Vectorized ray-casting point-in-polygon pandas UDF (F13).

    Same semantics as matplotlib.path.Path.contains_points for simple
    polygons (tracking.py:326-340); numpy-only so executors need no
    plotting stack. Arrow-batched — one numpy pass per batch.
    """
    vx = np.array([v[0] for v in vertices], dtype="float64")
    vy = np.array([v[1] for v in vertices], dtype="float64")

    @F.pandas_udf(BooleanType())
    def _contains(x: pd.Series, y: pd.Series) -> pd.Series:
        px = x.to_numpy(dtype="float64")
        py = y.to_numpy(dtype="float64")
        inside = np.zeros(len(px), dtype=bool)
        n = len(vx)
        j = n - 1
        for i in range(n):
            cond = ((vy[i] > py) != (vy[j] > py)) & (
                px < (vx[j] - vx[i]) * (py - vy[i]) / (vy[j] - vy[i] + 1e-300) + vx[i]
            )
            inside ^= cond
            j = i
        return pd.Series(inside)

    return _contains


def in_nest(position: DataFrame, nest_vertices: list[tuple[float, float]]) -> DataFrame:
    contains = point_in_polygon(nest_vertices)
    return position.withColumn("in_nest", contains(F.col("x"), F.col("y")))
