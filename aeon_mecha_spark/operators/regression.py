"""Per-group linear regression — the clock-sync model fit.

The reference fits ``LinearRegression(onix_clock → harp_time)`` per
HarpSync CSV file and stores (bounds, slope, intercept, r², n)
(/root/reference/aeon/schema/ephys.py:35-71, stored in EphysSyncModel
ephys.py:379-398). Prediction maps ONIX ticks → HARP time per spike
(ephys_utils.py:645-683).

Two implementations, both distributed:

- ``fit_closed_form``: Catalyst-native ``regr_slope``/``regr_intercept``/
  ``regr_r2`` + observed bounds — one groupBy, map-side partials, no
  Python. OLS closed form is exactly what sklearn's LinearRegression
  computes, so coefficients match to float precision. Default.
- ``fit_applyinpandas``: per-group numpy ``polyfit``-style fit via
  applyInPandas — the escape hatch shape for models with no SQL closed
  form (kept for API parity with reader-style UDAFs, SURVEY.md X3).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_closed_form(df: DataFrame, x: str, y: str, keys: list[str]) -> DataFrame:
    """Grouped OLS with observed bounds and n (schema/ephys.py:46-71).

    Rows with NULL/NaN in x or y are dropped before the fit — parity with
    the reference's ``dropna()`` (schema/ephys.py:42; pinned by
    tests/schema/test_ephys_reader_unit.py:49-63). regr_* aggregates
    ignore null pairs natively; bounds use the same filtered set.
    """
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    clean = df.filter(
        xc.isNotNull() & yc.isNotNull() & ~F.isnan(xc) & ~F.isnan(yc)
    )
    return clean.groupBy(*keys).agg(
        F.min(xc).alias(f"{x}_start"),
        F.max(xc).alias(f"{x}_end"),
        F.min(yc).alias(f"{y}_start"),
        F.max(yc).alias(f"{y}_end"),
        F.count(F.lit(1)).alias("n_samples"),
        F.regr_slope(yc, xc).alias("slope"),
        F.regr_intercept(yc, xc).alias("intercept"),
        F.regr_r2(yc, xc).alias("r2"),
    )


def fit_closed_form_portable(
    df: DataFrame,
    x: str,
    y: str,
    keys: list[str],
    x_scale: float = 1.0,
    y_scale: float = 1e6,
) -> DataFrame:
    """OLS on quantized inputs via exact integer moments — reproducible
    across engines and cluster shapes.

    ``regr_slope`` accumulates double moments whose value depends on
    partition order; here x,y are quantized to integers (xi =
    round(x·x_scale), yi = round(y·y_scale)), the moments Σxi, Σyi,
    Σxiyi, Σxi², Σyi² are *exact* (products stay inside int64; sums go
    through decimal(38,0), whose addition is associative — the shuffle
    plan cannot change the answer), and the closed form

        slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)

    is evaluated in double at the end after de-scaling. Choose scales so
    |x·x_scale| < ~3e9 and |y·y_scale| < ~3e9 (then every pairwise
    product < 2^63). Bounds/n match ``fit_closed_form`` up to the
    quantization.
    """
    xd, yd = F.col(x).cast("double"), F.col(y).cast("double")
    finite = lambda c: c.isNotNull() & ~F.isnan(c) & (c != float("inf")) & (c != float("-inf"))  # noqa: E731
    # dropna/finite BEFORE the long cast: under ANSI mode (Spark 4
    # default) casting NaN/Inf to BIGINT throws instead of nulling
    df = df.filter(finite(xd) & finite(yd))
    xi = F.round(xd * F.lit(x_scale), 0).cast("long")
    yi = F.round(yd * F.lit(y_scale), 0).cast("long")
    clean = df
    dec = "decimal(38,0)"
    agg = clean.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_samples"),
        (F.min(xi).cast("double") / x_scale).alias(f"{x}_start"),
        (F.max(xi).cast("double") / x_scale).alias(f"{x}_end"),
        (F.min(yi).cast("double") / y_scale).alias(f"{y}_start"),
        (F.max(yi).cast("double") / y_scale).alias(f"{y}_end"),
        (F.sum(xi.cast(dec)).cast("double") / x_scale).alias("_sx"),
        (F.sum(yi.cast(dec)).cast("double") / y_scale).alias("_sy"),
        (F.sum((xi * yi).cast(dec)).cast("double") / (x_scale * y_scale)).alias("_sxy"),
        (F.sum((xi * xi).cast(dec)).cast("double") / (x_scale * x_scale)).alias("_sxx"),
        (F.sum((yi * yi).cast(dec)).cast("double") / (y_scale * y_scale)).alias("_syy"),
    )
    n = F.col("n_samples").cast("double")
    sx, sy, sxy, sxx, syy = (F.col(c) for c in ("_sx", "_sy", "_sxy", "_sxx", "_syy"))
    den = n * sxx - sx * sx
    slope = F.when(den != 0, (n * sxy - sx * sy) / den)
    intercept = (sy - slope * sx) / n
    r2_den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r2 = F.when(r2_den > 0, F.pow(n * sxy - sx * sy, F.lit(2)) / r2_den)
    return agg.withColumn("slope", slope).withColumn("intercept", intercept).withColumn(
        "r2", r2
    ).drop("_sx", "_sy", "_sxy", "_sxx", "_syy")


def fit_applyinpandas(df: DataFrame, x: str, y: str, keys: list[str]) -> DataFrame:
    """Same contract via grouped-map pandas UDF (Arrow-batched)."""
    key_schema = ", ".join(f"{k} {t}" for k, t in df.dtypes if k in keys)
    out_schema = (
        f"{key_schema}, {x}_start double, {x}_end double, {y}_start double, "
        f"{y}_end double, n_samples bigint, slope double, intercept double, r2 double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        sub = pdf[[*keys, x, y]].dropna()
        xs = sub[x].astype("float64").to_numpy()
        ys = sub[y].astype("float64").to_numpy()
        n = len(xs)
        if n == 0:
            return pd.DataFrame(columns=[*keys, f"{x}_start", f"{x}_end", f"{y}_start", f"{y}_end", "n_samples", "slope", "intercept", "r2"])
        xm, ym = xs.mean(), ys.mean()
        sxx = ((xs - xm) ** 2).sum()
        sxy = ((xs - xm) * (ys - ym)).sum()
        slope = sxy / sxx if sxx > 0 else float("nan")
        intercept = ym - slope * xm
        pred = intercept + slope * xs
        sst = ((ys - ym) ** 2).sum()
        r2 = 1.0 - ((ys - pred) ** 2).sum() / sst if sst > 0 else float("nan")
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(
            {
                f"{x}_start": xs.min(), f"{x}_end": xs.max(),
                f"{y}_start": ys.min(), f"{y}_end": ys.max(),
                "n_samples": n, "slope": slope, "intercept": intercept, "r2": r2,
            }
        )
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(fit, schema=out_schema)


def predict(df: DataFrame, x: str, slope: str = "slope", intercept: str = "intercept", alias: str = "prediction") -> DataFrame:
    """Apply a fitted model: ŷ = intercept + slope·x (ephys.py:968-971) —
    a pure column expression after a broadcast join of the model table."""
    return df.withColumn(alias, F.col(intercept) + F.col(slope) * F.col(x).cast("double"))
