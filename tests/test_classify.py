"""Trainable quality classifier: IRLS logistic regression as DataFrame
aggregation, checked against an independent local implementation."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from auto_data_linkage_spark.operators.classify import logreg_fit, logreg_score


def local_irls(X, y, max_iter=8, ridge=1e-6):
    """Independent reference: the same algorithm in pure numpy on the
    collected matrix (matrix ops, not per-term sums)."""
    X1 = np.hstack([np.ones((len(X), 1)), X])
    w = np.zeros(X1.shape[1])
    for _ in range(max_iter):
        p = 1 / (1 + np.exp(-(X1 @ w)))
        p = np.clip(p, 1e-6, 1 - 1e-6)
        W = p * (1 - p)
        z = X1 @ w + (y - p) / W
        H = X1.T @ (W[:, None] * X1) + ridge * np.eye(X1.shape[1])
        g = X1.T @ (W * z)
        nw = np.linalg.solve(H, g)
        if np.max(np.abs(nw - w)) <= 1e-8:
            w = nw
            break
        w = nw
    return w


@pytest.fixture(scope="module")
def labeled(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(600, 3))
    true_w = np.array([0.5, 2.0, -1.5, 0.0])
    logits = true_w[0] + X @ true_w[1:]
    y = (rng.uniform(size=600) < 1 / (1 + np.exp(-logits))).astype(float)
    rows = [
        (float(a), float(b), float(c), float(lbl))
        for (a, b, c), lbl in zip(X, y)
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")
    return df, X, y


def test_fit_matches_local_reference(spark, labeled):
    df, X, y = labeled
    w_spark = logreg_fit(df, ["f1", "f2", "f3"], "y")
    w_local = local_irls(X, y)
    assert np.allclose(w_spark, w_local, rtol=1e-6, atol=1e-6)


def test_fit_recovers_signal_and_scores(spark, labeled):
    df, X, y = labeled
    w = logreg_fit(df, ["f1", "f2", "f3"], "y")
    # signs and rough magnitudes of the generating weights
    assert w[1] > 1.0 and w[2] < -0.7 and abs(w[3]) < 0.5
    scored = logreg_score(df, ["f1", "f2", "f3"], w)
    acc = scored.select(
        F.avg(
            ((F.col("p_quality") >= 0.5).cast("int") == F.col("y").cast("int"))
            .cast("double")
        ).alias("acc")
    ).collect()[0].acc
    # labels are SAMPLED from the sigmoid: irreducible noise caps
    # accuracy near ~0.81 for these weights (the Bayes rate), so the
    # floor sits just under it; exact-fit quality is pinned by
    # test_fit_matches_local_reference instead
    assert acc >= 0.78


def test_separable_data_is_stable(spark):
    rows = [(float(i), 1.0) for i in range(1, 20)] + [
        (float(-i), 0.0) for i in range(1, 20)
    ]
    df = spark.createDataFrame(rows, "f1 double, y double")
    w = logreg_fit(df, ["f1"], "y", ridge=1e-3)
    assert all(math.isfinite(x) for x in w)
    scored = logreg_score(df, ["f1"], w)
    acc = scored.select(
        F.avg(
            ((F.col("p_quality") >= 0.5).cast("int") == F.col("y").cast("int"))
            .cast("double")
        ).alias("acc")
    ).collect()[0].acc
    assert acc == 1.0


def test_score_is_pure_projection(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "f1 double")
    out = logreg_score(df, ["f1"], [0.0, 1.0])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r.f1: r.p_quality for r in out.collect()}
    assert abs(got[1.0] - 1 / (1 + math.exp(-1))) < 1e-6
