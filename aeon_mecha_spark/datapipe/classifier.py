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


def softmax_irls_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    classes: list,
    iters: int = 8,
    ridge: float = 1e-6,
) -> list[list[float]]:
    """Fit multinomial (softmax) logistic regression by fixed-round
    Newton — the multiclass head the CCNet pipeline's fastText langid
    actually is; the binary :func:`logreg_irls_train` generalized with
    the SAME sufficient-statistics shape. Returns ``K-1`` coefficient
    rows ``[intercept, coef_1, …, coef_d]`` (the LAST class in
    ``classes`` is the reference, pinned to zero).

    Update per round: with ``p_k = softmax(Xβ_k)`` (``β_K ≡ 0``), the
    full multinomial Newton step solves the ``(K−1)d × (K−1)d`` system
    with blocks ``H[(k,i),(l,j)] = Σ_rows p_k(δ_kl − p_l)·x_i·x_j`` and
    gradient ``g[k,i] = Σ_rows (y_k − p_k)·x_i`` — every statistic a
    plain sum of per-row products, so each round is ONE single-row
    aggregate (map-side partials, no gradient shuffle) + a small dense
    solve on the driver. The feature table persists once; rounds
    re-scan memory. At 100 TB: per-round cost = one scan + a
    ``((K−1)d)²``-double reduce, the classic shape."""
    import numpy as np

    k_all = len(classes)
    km = k_all - 1
    d = len(feature_cols) + 1
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    x = feats.select(
        F.col(label_col).alias("_lbl"),
        *[c.alias(f"_x{i}") for i, c in enumerate(cols)],
    )
    for k, cls in enumerate(classes[:km]):
        x = x.withColumn(
            f"_y{k}", F.when(F.col("_lbl") == cls, 1.0).otherwise(0.0)
        )
    x = x.persist()
    try:
        x.count()
        beta = np.zeros((km, d))
        for _ in range(int(iters)):
            zs = []
            for k in range(km):
                z: Column = F.lit(0.0)
                for i in range(d):
                    z = z + F.lit(float(beta[k, i])) * F.col(f"_x{i}")
                zs.append(z)
            den: Column = F.lit(1.0)
            for z in zs:
                den = den + F.exp(z)
            ps = [F.exp(z) / den for z in zs]
            aggs = []
            for k in range(km):
                for i in range(d):
                    aggs.append(
                        F.sum(
                            (F.col(f"_y{k}") - ps[k]) * F.col(f"_x{i}")
                        ).alias(f"g{k}_{i}")
                    )
            for k in range(km):
                for l in range(k, km):
                    w = ps[k] * ((F.lit(1.0) if k == l else F.lit(0.0)) - ps[l])
                    for i in range(d):
                        for j in range(i if k == l else 0, d):
                            aggs.append(
                                F.sum(w * F.col(f"_x{i}") * F.col(f"_x{j}"))
                                .alias(f"h{k}_{l}_{i}_{j}")
                            )
            row = x.agg(*aggs).collect()[0]
            m = km * d
            g = np.zeros(m)
            H = np.zeros((m, m))
            for k in range(km):
                for i in range(d):
                    g[k * d + i] = row[f"g{k}_{i}"] or 0.0
            for k in range(km):
                for l in range(k, km):
                    for i in range(d):
                        for j in range(i if k == l else 0, d):
                            v = row[f"h{k}_{l}_{i}_{j}"] or 0.0
                            H[k * d + i, l * d + j] = v
                            H[l * d + j, k * d + i] = v
            g -= ridge * beta.reshape(-1)
            H += ridge * np.eye(m)
            beta = beta + np.linalg.solve(H, g).reshape(km, d)
        return [[float(b) for b in rowk] for rowk in beta]
    finally:
        x.unpersist()


def softmax_score(
    df: DataFrame,
    feature_cols: list[str],
    coefs: list[list[float]],
    classes: list[str],
    pred_col: str = "pred",
    ppm_col: str = "prob_ppm",
) -> DataFrame:
    """Score rows with a (trained, literal) softmax model: adds the
    argmax class (first-wins strictly-greater over the logits, the
    language_id tie convention — the reference class logit is the
    literal 0.0) and the winning probability quantized half-up to
    integer ppm. Fixed-shape left-associated expressions throughout so
    :func:`softmax_sql_exprs` reproduces them bit-for-bit."""
    km = len(classes) - 1
    if len(coefs) != km:
        raise ValueError(f"need {km} coefficient rows, got {len(coefs)}")
    d = len(feature_cols) + 1
    zs: list[Column] = []
    for k in range(km):
        if len(coefs[k]) != d:
            raise ValueError(f"coefficient row {k}: need {d} values")
        z: Column = F.lit(float(coefs[k][0]))
        for c, b in zip(feature_cols, coefs[k][1:]):
            z = z + F.lit(float(b)) * F.col(c).cast("double")
        zs.append(z)
    zs.append(F.lit(0.0))  # the reference class
    den: Column = F.exp(zs[0])
    for z in zs[1:]:
        den = den + F.exp(z)
    best = F.lit(classes[0])
    bz = zs[0]
    for k in range(1, len(classes)):
        cond = zs[k] > bz
        best = F.when(cond, F.lit(classes[k])).otherwise(best)
        bz = F.when(cond, zs[k]).otherwise(bz)
    ppm = F.floor(F.exp(bz) / den * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    return df.withColumn(pred_col, best).withColumn(ppm_col, ppm)


def softmax_sql_exprs(
    feature_exprs: list[str], coefs: list[list[float]], classes: list[str]
) -> tuple[str, str]:
    """DuckDB twin of :func:`softmax_score`: renders (pred_expr,
    ppm_expr) with the identical left-associated logits, exp-sum
    denominator, and first-wins strictly-greater argmax chain."""
    zs = []
    for row in coefs:
        z = repr(float(row[0]))
        for e, b in zip(feature_exprs, row[1:]):
            z = f"({z} + {float(b)!r} * ({e}))"
        zs.append(z)
    zs.append("0.0")
    den = f"exp({zs[0]})"
    for z in zs[1:]:
        den = f"({den} + exp({z}))"
    best = f"'{classes[0]}'"
    bz = zs[0]
    for k in range(1, len(classes)):
        cond = f"({zs[k]}) > ({bz})"
        best = f"CASE WHEN {cond} THEN '{classes[k]}' ELSE {best} END"
        bz = f"CASE WHEN {cond} THEN {zs[k]} ELSE {bz} END"
    ppm = f"floor(exp({bz}) / {den} * 1000000.0 + 0.5)::bigint"
    return best, ppm
