"""Numpy GBT fallback + XGBoostForecaster (reference eval/models.py:177-259).

The reference trains xgb.XGBRegressor(n_estimators=100, lr=0.1,
max_depth=3, early_stopping_rounds=10); this suite pins the fallback's
boosting mechanics (exact single-split recovery, NaN default
direction, early stopping on the last eval set) and the Spark-side
forecaster path (collect-fit, broadcast + pandas-UDF scoring, factory).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql.types import DoubleType, StructField, StructType

from temp_data_pipeline_spark.eval.config import ModelConfig
from temp_data_pipeline_spark.eval.gbt import NumpyGBTRegressor
from temp_data_pipeline_spark.eval.models import XGBoostForecaster, create_forecaster

try:  # real-library path is env-gated; fallback path always runs
    import xgboost  # noqa: F401

    HAVE_XGB = True
except ImportError:
    HAVE_XGB = False


# ------------------------------------------------------------- regressor core


def test_single_tree_recovers_step_function():
    # depth-1, one round, lr=1, lambda=0 → leaf weights are exact means
    x = np.array([[0.0], [1.0], [2.0], [3.0]])
    y = np.array([0.0, 0.0, 10.0, 10.0])
    m = NumpyGBTRegressor(
        n_estimators=1, learning_rate=1.0, max_depth=1, reg_lambda=0.0
    )
    m.fit(x, y)
    np.testing.assert_allclose(m.predict(x), y, atol=1e-12)


def test_boosting_reduces_train_rmse_monotone_family():
    rng = np.random.RandomState(7)
    x = rng.uniform(-3, 3, size=(400, 2))
    y = np.sin(x[:, 0]) * 3 + (x[:, 1] > 0) * 2
    few = NumpyGBTRegressor(n_estimators=5, learning_rate=0.1, max_depth=3)
    many = NumpyGBTRegressor(n_estimators=60, learning_rate=0.1, max_depth=3)
    few.fit(x, y)
    many.fit(x, y)
    rmse = lambda m: float(np.sqrt(np.mean((m.predict(x) - y) ** 2)))  # noqa: E731
    assert rmse(many) < rmse(few) < float(np.std(y))
    assert rmse(many) < 0.3


def test_nan_routes_to_learned_default_direction():
    # NaN rows carry the high label → the split must learn to send
    # missing values to the high child (xgboost sparsity-aware split)
    x = np.array([[0.0], [0.1], [0.2], [np.nan], [np.nan], [1.0], [1.1], [1.2]])
    y = np.array([0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 10.0])
    m = NumpyGBTRegressor(
        n_estimators=1, learning_rate=1.0, max_depth=1, reg_lambda=0.0
    )
    m.fit(x, y)
    pred_nan = m.predict(np.array([[np.nan]]))[0]
    assert pred_nan == pytest.approx(10.0)


def test_early_stopping_truncates_to_best_iteration():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=(200, 1))
    y = rng.normal(size=200)  # pure noise: eval can't keep improving
    ex = rng.uniform(-1, 1, size=(100, 1))
    ey = np.zeros(100)
    m = NumpyGBTRegressor(
        n_estimators=100, learning_rate=0.3, max_depth=3, early_stopping_rounds=5
    )
    m.fit(x, y, eval_set=[(ex, ey)])
    assert m.best_iteration_ is not None
    assert len(m.trees_) == m.best_iteration_ + 1
    assert len(m.trees_) < 100  # stopped early on noise


def test_no_eval_set_keeps_all_rounds():
    x = np.array([[float(i)] for i in range(20)])
    y = x[:, 0] * 2.0
    m = NumpyGBTRegressor(n_estimators=8, learning_rate=0.5, max_depth=2)
    m.fit(x, y)
    assert len(m.trees_) == 8


# --------------------------------------------------------- Spark forecaster


def _df(spark, rows):
    schema = StructType(
        [
            StructField("tmax_pred_f", DoubleType()),
            StructField("sin_doy", DoubleType()),
            StructField("tmax_actual_f", DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_xgboost_forecaster_fit_predict(spark):
    # y is a noiseless nonlinear function of the forecast column
    rows = [(float(i), math.sin(i / 5.0), float(i) + 5.0 * (i > 25)) for i in range(50)]
    train = _df(spark, rows)
    m = XGBoostForecaster(
        features=["tmax_pred_f", "sin_doy"],
        hyperparams={"n_estimators": 80, "learning_rate": 0.3},
    )
    m.fit(train)
    out = m.predict_mu(train).orderBy("tmax_pred_f").collect()
    resid = [r.y_pred_f - r.tmax_actual_f for r in out]
    rmse = math.sqrt(sum(e * e for e in resid) / len(resid))
    assert rmse < 1.0  # far below the ~15F label std


def test_xgboost_forecaster_early_stopping_with_spark_eval_set(spark):
    rows = [(float(i), 0.0, float(i % 7)) for i in range(60)]  # noisy-ish labels
    train = _df(spark, rows)
    ev = _df(spark, [(float(i), 0.0, 0.0) for i in range(30)])
    m = XGBoostForecaster(
        features=["tmax_pred_f"],
        hyperparams={"n_estimators": 100, "early_stopping_rounds": 3},
    )
    m.fit(train, eval_set=[ev])
    if m._backend == "numpy":
        assert len(m.model.trees_) < 100


def test_factory_builds_working_xgboost_path(spark):
    cfg = ModelConfig(
        type="xgboost",
        features=["tmax_pred_f"],
        hyperparams={"n_estimators": 10},
    )
    m = create_forecaster(cfg)
    assert isinstance(m, XGBoostForecaster)
    train = _df(spark, [(float(i), 0.0, 2.0 * i) for i in range(20)])
    m.fit(train)
    out = m.predict_mu(train).collect()
    assert len(out) == 20 and all(r.y_pred_f is not None for r in out)


@pytest.mark.skipif(not HAVE_XGB, reason="xgboost not installed")
def test_real_xgboost_backend_selected():
    m = XGBoostForecaster()
    assert m._backend == "xgboost"


def test_fallback_backend_documented():
    m = XGBoostForecaster()
    assert m._backend == ("xgboost" if HAVE_XGB else "numpy")
    assert m.params["n_estimators"] == 100
    assert m.params["learning_rate"] == 0.1
    assert m.params["max_depth"] == 3
    assert m.params["early_stopping_rounds"] == 10
