"""Trainable quality classifier: logistic regression fit by IRLS where
every pass is ONE DataFrame aggregation.

Modern curation pipelines gate documents with a small learned
classifier (the fastText-style quality filters of the RefinedWeb /
FineWeb data recipes); the reference has no trainable surface at all
(its EM estimation in model.py:340 is the nearest analog). This module
gives the engine that primitive without MLlib:

- **Fit** is iteratively-reweighted least squares: each Newton step
  needs only ``X^T W X`` ((d+1)² sums) and ``X^T W z`` (d+1 sums) —
  all expressible as one ``agg`` of sum-of-products columns with the
  current weights folded in as literals. One Spark job per iteration,
  map-side partials, nothing driver-side but a (d+1)×(d+1) solve;
  quadratic convergence means ~5-8 passes, not the hundreds SGD needs.
  At 100 TB each pass is a single scan of the (tiny) feature columns —
  column pruning keeps text out of it.
- **Score** is a pure projection (``sigmoid(w·x)`` in codegen) — the
  filter costs the same as any arithmetic column.

Determinism: no sampling, no shuffling of floats into varying orders
beyond Spark's sum associativity (guarded by the convergence tolerance);
fit from the same data and init is reproducible to float noise.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_fit", "logreg_score", "sigmoid_expr"]

_EPS = 1e-6


def sigmoid_expr(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _z_expr(feature_cols: list[str], w: list[float]) -> Column:
    z = F.lit(float(w[0]))
    for c, wi in zip(feature_cols, w[1:]):
        z = z + F.lit(float(wi)) * F.col(c).cast("double")
    return z


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    max_iter: int = 8,
    ridge: float = 1e-6,
    tol: float = 1e-8,
) -> list[float]:
    """Fit logistic-regression weights ``[intercept, w_1..w_d]`` for
    ``P(label=1 | x)``. ``label_col`` must be 0/1 (numeric or boolean).
    ``ridge`` adds λ‖w‖² — keeps the Newton system solvable on
    separable data (where unregularized weights diverge)."""
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    xs = ["__one"] + feature_cols

    base = df.select(
        F.lit(1.0).alias("__one"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    # each IRLS pass is one agg over `base`; without caching, every pass
    # would silently recompute the caller's full upstream lineage; the
    # try/finally keeps a failed pass (job cancellation, executor loss)
    # from leaking the cached blocks for the session lifetime
    base = base.cache()
    try:
        w = _irls_loop(base, feature_cols, w, max_iter, ridge, tol)
    finally:
        base.unpersist()
    return w


def _irls_loop(
    base: DataFrame,
    feature_cols: list[str],
    w: list[float],
    max_iter: int,
    ridge: float,
    tol: float,
) -> list[float]:
    d = len(feature_cols)
    xs = ["__one"] + feature_cols
    for _ in range(max_iter):
        z = _z_expr(feature_cols, w)
        p = F.greatest(
            F.lit(_EPS), F.least(F.lit(1.0 - _EPS), sigmoid_expr(z))
        )
        wt = p * (1 - p)
        # working response: z + (y - p) / W
        resp = z + (F.col("__y") - p) / wt
        aggs = []
        for i in range(d + 1):
            for j in range(i, d + 1):
                aggs.append(
                    F.sum(wt * F.col(xs[i]) * F.col(xs[j])).alias(f"h_{i}_{j}")
                )
            aggs.append(F.sum(wt * F.col(xs[i]) * resp).alias(f"g_{i}"))
        row = base.agg(*aggs).collect()[0]

        H = np.zeros((d + 1, d + 1))
        g = np.zeros(d + 1)
        for i in range(d + 1):
            g[i] = row[f"g_{i}"]
            for j in range(i, d + 1):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"]
        H += ridge * np.eye(d + 1)
        new_w = np.linalg.solve(H, g)
        shift = float(np.max(np.abs(new_w - np.asarray(w))))
        w = [float(x) for x in new_w]
        if shift <= tol:
            break
    return w


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    *,
    out_col: str = "p_quality",
) -> DataFrame:
    """Append ``sigmoid(w·x)`` — a pure codegen projection."""
    return df.withColumn(
        out_col, F.round(sigmoid_expr(_z_expr(feature_cols, weights)), 6)
    )
