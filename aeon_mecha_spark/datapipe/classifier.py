"""Trained quality classifier: distributed logistic regression (IRLS).

The CCNet/fastText stage the curation pipelines reference but the repo
had only heuristics for (VERDICT r11 item 4): learn a linear quality
model from labeled examples, score the corpus with it. Architecture
follows the repo's trained-model twin convention:

- TRAINING is distributed but driver-coordinated: each Newton/IRLS
  round is ONE single-row aggregate over the feature table (the
  d×d Hessian ``XᵀWX`` and d-vector gradient ``Xᵀ(y−p)`` are just
  sums of per-row products — map-side partial aggregation, no
  shuffle wider than d(d+3)/2 doubles), then a d×d solve on the
  driver (d is 4-8; this is a trained-model materialization, the
  allowed collect class). The feature table persists once; rounds
  re-scan memory, not parquet.
- SCORING with a trained (literal) coefficient vector is a pure
  Catalyst expression — fixed-shape dot product + the logistic link,
  quantized half-up to integer ppm so the oracle gate compares exact
  BIGINTs (the q109/q110 literal-model pattern).

At 100 TB: training cost per round = one scan + a d²-double reduce
(the classic sufficient-statistics shape — no per-row Python, no
gradient shuffle); scoring is embarrassingly map-side.

Exactness notes: the logistic link needs ``exp``; like ``ln`` in the
q112/q276 family, both engines bind libm doubles and the gate quantizes
AFTER the link, with the identical expression shape on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_irls_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 6,
    ridge: float = 1e-6,
) -> list[float]:
    """Fit logistic regression by fixed-round Newton/IRLS; returns
    ``[intercept, coef_1, …, coef_d]``.

    Update per round: ``β ← β + (XᵀWX + λI)⁻¹ (Xᵀ(y − p) − λβ)`` with
    ``p = σ(Xβ)``, ``W = diag(p(1−p))`` — the textbook iteration, λ a
    small ridge so separable labels stay finite. Fixed ``iters`` (the
    bradley_terry_int convention: fixed rounds ⇒ reproducible path).
    Each round computes all sufficient statistics in ONE aggregate.
    """
    import numpy as np

    d = len(feature_cols) + 1  # +intercept
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    x = feats.select(y.alias("_y"), *[c.alias(f"_x{i}") for i, c in enumerate(cols)])
    x = x.persist()
    try:
        x.count()  # materialize once; every round re-scans memory
        beta = np.zeros(d)
        for _ in range(int(iters)):
            z: Column = F.lit(0.0)
            for i, b in enumerate(beta):
                z = z + F.lit(float(b)) * F.col(f"_x{i}")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            w = p * (F.lit(1.0) - p)
            aggs = []
            for i in range(d):
                aggs.append(
                    F.sum((F.col("_y") - p) * F.col(f"_x{i}")).alias(f"g{i}")
                )
            for i in range(d):
                for j in range(i, d):
                    aggs.append(
                        F.sum(w * F.col(f"_x{i}") * F.col(f"_x{j}")).alias(
                            f"h{i}_{j}"
                        )
                    )
            row = x.agg(*aggs).collect()[0]
            g = np.array([row[f"g{i}"] or 0.0 for i in range(d)]) - ridge * beta
            H = np.zeros((d, d))
            for i in range(d):
                for j in range(i, d):
                    H[i, j] = H[j, i] = row[f"h{i}_{j}"] or 0.0
            H += ridge * np.eye(d)
            beta = beta + np.linalg.solve(H, g)
        return [float(b) for b in beta]
    finally:
        x.unpersist()


def logreg_score_ppm(
    df: DataFrame,
    feature_cols: list[str],
    coefs: list[float],
    out_col: str = "prob_ppm",
) -> DataFrame:
    """Score rows with a (trained, literal) logistic model:
    ``prob_ppm = floor(10⁶·σ(β₀ + Σ βk·xk) + ½)`` as BIGINT — the
    fixed-shape left-associated dot product, so the identical SQL
    expression reproduces it bit-for-bit in any engine."""
    if len(coefs) != len(feature_cols) + 1:
        raise ValueError(
            f"need {len(feature_cols) + 1} coefficients "
            f"(intercept + {len(feature_cols)}), got {len(coefs)}"
        )
    z: Column = F.lit(float(coefs[0]))
    for c, b in zip(feature_cols, coefs[1:]):
        z = z + F.lit(float(b)) * F.col(c).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(
        out_col, F.floor(prob * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    )


def score_sql_expr(feature_exprs: list[str], coefs: list[float]) -> str:
    """The DuckDB-side twin of :func:`logreg_score_ppm`: renders the
    identical left-associated expression so both engines evaluate the
    same double arithmetic before quantization."""
    z = repr(float(coefs[0]))
    for e, b in zip(feature_exprs, coefs[1:]):
        z = f"({z} + {float(b)!r} * ({e}))"
    # same op sequence as logreg_score_ppm: σ first, then · 10⁶, then +½
    return f"floor((1.0 / (1.0 + exp(-{z}))) * 1000000.0 + 0.5)::bigint"
