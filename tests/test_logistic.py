"""Distributed Newton/IRLS logistic regression (llm/classifier.py).

Ground truth is a pure-numpy IRLS implementation running the SAME
algorithm on the same rows — the distributed aggregation must
reproduce it to float tolerance regardless of partitioning, the same
validation strategy as RidgeForecaster's sklearn-replay tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from temp_data_pipeline_spark.llm.classifier import fit_logistic, logistic_score


def _numpy_irls(X, y, l2=1e-6, iters=25, tol=1e-10):
    n, p = X.shape
    Xb = np.hstack([np.ones((n, 1)), X])
    w = np.zeros(p + 1)
    reg = l2 * np.eye(p + 1)
    reg[0, 0] = 0.0
    for _ in range(iters):
        z = Xb @ w
        pr = 1.0 / (1.0 + np.exp(-z))
        g = Xb.T @ (pr - y) + reg @ w
        wt = pr * (1.0 - pr)
        h = Xb.T @ (Xb * wt[:, None]) + reg
        step = np.linalg.solve(h + 1e-12 * np.eye(p + 1), g)
        w = w - step
        if np.max(np.abs(step)) < tol:
            break
    return w


def _make_data(seed=7, n=400, p=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    true_w = np.array([0.5, 1.5, -2.0, 0.8])
    z = true_w[0] + X @ true_w[1:]
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-z))).astype(float)
    return X, y


def _frame(spark, X, y, n_parts=8):
    rows = [
        (float(yy),) + tuple(float(v) for v in xx) for xx, yy in zip(X, y)
    ]
    cols = "label double, " + ", ".join(f"f{i} double" for i in range(X.shape[1]))
    return spark.createDataFrame(rows, cols).repartition(n_parts)


FEATS = ["f0", "f1", "f2"]


def test_matches_numpy_irls(spark):
    X, y = _make_data()
    want = _numpy_irls(X, y)
    got = fit_logistic(_frame(spark, X, y), FEATS, "label")
    assert got["converged"]
    np.testing.assert_allclose(
        [got["intercept"]] + got["coef"], want, rtol=1e-8, atol=1e-8
    )
    # recovers the generating direction (sanity, loose)
    assert got["coef"][0] > 0 and got["coef"][1] < 0


def test_partition_invariant(spark):
    X, y = _make_data(seed=11)
    a = fit_logistic(_frame(spark, X, y, n_parts=1), FEATS, "label")
    b = fit_logistic(_frame(spark, X, y, n_parts=32), FEATS, "label")
    np.testing.assert_allclose(
        [a["intercept"]] + a["coef"],
        [b["intercept"]] + b["coef"],
        rtol=1e-9,
    )


def test_l2_shrinks_separable_data(spark):
    # perfectly separable on f0: unregularized weights diverge, l2
    # keeps them finite and the fit converged
    X = np.array([[x, 0.0, 0.0] for x in (-2.0, -1.0, 1.0, 2.0)] * 25)
    y = (X[:, 0] > 0).astype(float)
    strong = fit_logistic(_frame(spark, X, y), FEATS, "label", l2=1.0)
    weak = fit_logistic(_frame(spark, X, y), FEATS, "label", l2=1e-4)
    assert abs(strong["coef"][0]) < abs(weak["coef"][0])
    assert np.isfinite(strong["coef"][0]) and strong["converged"]


def test_score_is_map_only_and_matches_driver_sigmoid(spark):
    X, y = _make_data(seed=3, n=50)
    df = _frame(spark, X, y)
    model = fit_logistic(df, FEATS, "label")
    scored = logistic_score(df, model, FEATS)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # inference adds no exchange beyond the frame's own repartition
    assert plan.count("Exchange") == 1
    rows = scored.select("f0", "f1", "f2", "prob").collect()
    w = np.array([model["intercept"]] + model["coef"])
    for r in rows:
        z = w[0] + w[1] * r["f0"] + w[2] * r["f1"] + w[3] * r["f2"]
        assert abs(r["prob"] - 1.0 / (1.0 + np.exp(-z))) < 1e-12
    # probabilities separate the classes on average
    sc = logistic_score(df, model, FEATS).join(df, ["f0", "f1", "f2", "label"])
    pos = sc.filter("label = 1").agg({"prob": "avg"}).first()[0]
    neg = sc.filter("label = 0").agg({"prob": "avg"}).first()[0]
    assert pos > neg


def test_empty_training_set_raises(spark):
    df = spark.createDataFrame([], "label double, f0 double, f1 double, f2 double")
    with pytest.raises(ValueError, match="empty"):
        fit_logistic(df, FEATS, "label")
