"""Eval framework tests, mirroring reference tests/test_eval.py +
tests/eval/test_models_baselines.py + tests/eval/test_multi_model.py."""

from __future__ import annotations

import math
from datetime import date, datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from temp_data_pipeline_spark.eval.config import EvalConfig, ModelConfig, SplitConfig
from temp_data_pipeline_spark.eval.metrics import (
    compute_calibration_metrics,
    compute_forecast_metrics,
    compute_pinball_loss,
    norm_ppf,
)
from temp_data_pipeline_spark.eval.models import (
    KNNForecaster,
    PersistenceForecaster,
    RidgeForecaster,
)
from temp_data_pipeline_spark.eval.report import list_runs, load_multi_model_run, write_all_artifacts
from temp_data_pipeline_spark.eval.runner import run_multi_model_evaluation
from temp_data_pipeline_spark.eval.slicing import compute_metrics_by_slice
from temp_data_pipeline_spark.eval.splits import StaticSplit, WalkForwardSplit
from temp_data_pipeline_spark.eval.uncertainty import BucketedSigma, GlobalSigma, RollingSigma

UTC = timezone.utc


# ---------------------------------------------------------------- config


def test_config_validation_and_roundtrip(tmp_path):
    cfg = EvalConfig(models=[ModelConfig(type="ridge", alpha=2.0)])
    p = tmp_path / "cfg.json"
    cfg.to_json(p)
    back = EvalConfig.from_json(p)
    assert back.models[0].alpha == 2.0
    assert back.split.train_frac == 0.70
    with pytest.raises(ValueError):
        SplitConfig(train_frac=0.9, val_frac=0.2, test_frac=0.2)
    with pytest.raises(ValueError):
        EvalConfig(start_date_local="2025-01-01", end_date_local="2020-01-01")
    with pytest.raises(ValueError):
        EvalConfig(sigma_type="nope")


# ---------------------------------------------------------------- splits

SPLIT_SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("target_date_local", StringType()),
        StructField("v", LongType()),
    ]
)


def _seq_df(spark, n=20):
    rows = [("S", (date(2024, 1, 1) + timedelta(days=i)).isoformat(), i) for i in range(n)]
    return spark.createDataFrame(rows, SPLIT_SCHEMA).withColumn(
        "target_date_local", F.to_date("target_date_local")
    )


def test_static_split_fractions_and_order(spark):
    df = _seq_df(spark, 20)
    train, val, test = StaticSplit(0.7, 0.15, 0.15).split(df)
    tr = [r.v for r in train.orderBy("v").collect()]
    va = [r.v for r in val.orderBy("v").collect()]
    te = [r.v for r in test.orderBy("v").collect()]
    assert tr == list(range(14))  # int(20*0.7) = 14
    assert va == [14, 15, 16]  # int(20*0.85) = 17
    assert te == [17, 18, 19]
    assert max(tr) < min(va) < min(te)  # temporal order, no overlap


def test_walk_forward_final_fold(spark):
    df = _seq_df(spark, 20)
    train, val, test = WalkForwardSplit(window_size=5, step_size=3).split(df)
    assert [r.v for r in train.orderBy("v").collect()] == [12, 13, 14, 15, 16]
    assert val.count() == 0
    assert [r.v for r in test.orderBy("v").collect()] == [17, 18, 19]


def test_walk_forward_folds(spark):
    df = _seq_df(spark, 11)
    folds = WalkForwardSplit(window_size=4, step_size=3).generate_folds(df)
    got = [
        ([r.v for r in tr.orderBy("v").collect()], [r.v for r in te.orderBy("v").collect()])
        for tr, te in folds
    ]
    assert got == [
        ([0, 1, 2, 3], [4, 5, 6]),
        ([3, 4, 5, 6], [7, 8, 9]),
    ]


# ---------------------------------------------------------------- metrics

PRED_SCHEMA = StructType(
    [
        StructField("y_pred_f", DoubleType()),
        StructField("y_true_f", DoubleType()),
        StructField("y_pred_sigma_f", DoubleType()),
    ]
)


def test_forecast_metrics_golden(spark):
    # reference test_eval.py:225-241 arithmetic: 3 rows
    df = spark.createDataFrame(
        [(52.0, 50.0), (49.0, 50.0), (51.0, 50.0)],
        StructType([StructField("y_pred_f", DoubleType()), StructField("y_true_f", DoubleType())]),
    )
    m = compute_forecast_metrics(df)
    assert m.n_samples == 3
    assert math.isclose(m.mae, 4 / 3)
    assert math.isclose(m.bias, 2 / 3)
    assert math.isclose(m.rmse, math.sqrt(2.0))
    # y_true constant → ss_tot = 0 → r2 = 0.0 by convention
    assert m.r2 == 0.0


def test_perfect_prediction_coverage(spark):
    df = spark.createDataFrame([(50.0, 50.0, 1.0)] * 12, PRED_SCHEMA)
    c = compute_calibration_metrics(df)
    assert c.coverage_50 == 1.0 and c.coverage_90 == 1.0
    assert math.isclose(c.mean_sigma, 1.0)
    assert math.isclose(c.sharpness_90, 2 * 1.6448536269514722, rel_tol=1e-9)


def test_norm_ppf_matches_scipy_values():
    assert math.isclose(norm_ppf(0.75), 0.6744897501960817, abs_tol=2e-9)
    assert math.isclose(norm_ppf(0.95), 1.6448536269514722, abs_tol=2e-9)
    assert math.isclose(norm_ppf(0.005), -2.5758293035489004, abs_tol=2e-8)


def test_pinball_loss(spark):
    schema = StructType(
        [StructField("y_true_f", DoubleType()), StructField("q50", DoubleType())]
    )
    df = spark.createDataFrame([(10.0, 8.0), (10.0, 12.0)], schema)
    losses = compute_pinball_loss(df, [0.50])
    # q50: 0.5*2 and 0.5*2 → mean 1.0
    assert math.isclose(losses[0.50], 1.0)


# ---------------------------------------------------------------- models


def _train_df(spark, xs, ys):
    schema = StructType(
        [StructField("x", DoubleType()), StructField("tmax_actual_f", DoubleType())]
    )
    return spark.createDataFrame(list(zip(xs, ys)), schema)


def test_ridge_exact_recovery_alpha0(spark):
    df = _train_df(spark, [0.0, 1.0, 2.0, 3.0], [3.0, 5.0, 7.0, 9.0])  # y = 2x+3
    m = RidgeForecaster(alpha=0.0, features=["x"])
    m.fit(df)
    assert math.isclose(m.coef_[0], 2.0, abs_tol=1e-9)
    assert math.isclose(m.intercept_, 3.0, abs_tol=1e-9)
    pred = m.predict_mu(df).orderBy("x").collect()
    assert [round(r.y_pred_f, 9) for r in pred] == [3.0, 5.0, 7.0, 9.0]


def test_ridge_shrinks_with_alpha(spark):
    df = _train_df(spark, [0.0, 1.0, 2.0, 3.0], [3.0, 5.0, 7.0, 9.0])
    m = RidgeForecaster(alpha=10.0, features=["x"])
    m.fit(df)
    assert 0 < m.coef_[0] < 2.0  # shrunk toward 0, intercept absorbs mean


def test_ridge_closed_form_matches_numpy(spark):
    # independent numpy solve on the same (centered) problem
    import numpy as np

    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [1.0, 3.0, 2.0, 5.0, 4.0]
    alpha = 1.0
    x = np.array(xs)[:, None]
    y = np.array(ys)
    xc = x - x.mean(0)
    yc = y - y.mean()
    w = np.linalg.solve(xc.T @ xc + alpha * np.eye(1), xc.T @ yc)
    b = y.mean() - x.mean(0) @ w
    m = RidgeForecaster(alpha=alpha, features=["x"])
    m.fit(_train_df(spark, xs, ys))
    assert math.isclose(m.coef_[0], w[0], rel_tol=1e-12)
    assert math.isclose(m.intercept_, b, rel_tol=1e-12)


def test_persistence_uses_lag_and_fills_zero(spark):
    schema = StructType(
        [
            StructField("tmax_actual_f_lag1", DoubleType()),
            StructField("tmax_actual_f", DoubleType()),
        ]
    )
    df = spark.createDataFrame([(None, 50.0), (50.0, 51.0)], schema)
    out = PersistenceForecaster().predict_mu(df).orderBy("tmax_actual_f").collect()
    assert out[0].y_pred_f == 0.0  # NaN→0.0 (reference models.py:335)
    assert out[1].y_pred_f == 50.0


def test_knn_nearest_averaging(spark):
    schema = StructType(
        [StructField("tmax_pred_f", DoubleType()), StructField("tmax_actual_f", DoubleType())]
    )
    train = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (10.0, 10.0)], schema
    )
    m = KNNForecaster(n_neighbors=2, features=["tmax_pred_f"])
    m.fit(train)
    test = spark.createDataFrame([(0.1, 0.0)], schema)
    out = m.predict_mu(test).collect()
    assert math.isclose(out[0].y_pred_f, 0.5)  # mean of y(0), y(1)


# ---------------------------------------------------------------- sigma


def _pred_train(spark, residuals, leads=None):
    leads = leads or [24] * len(residuals)
    schema = StructType(
        [
            StructField("y_pred_f", DoubleType()),
            StructField("tmax_actual_f", DoubleType()),
            StructField("lead_hours", LongType()),
        ]
    )
    rows = [(50.0 + r, 50.0, le) for r, le in zip(residuals, leads)]
    return spark.createDataFrame(rows, schema)


def test_global_sigma_ddof0_and_floor(spark):
    m = GlobalSigma(sigma_floor=1.0)
    m.fit(_pred_train(spark, [-2.0, 0.0, 2.0]))
    import numpy as np

    assert math.isclose(m.sigma, float(np.std([-2.0, 0.0, 2.0])))  # ddof=0
    m2 = GlobalSigma(sigma_floor=5.0)
    m2.fit(_pred_train(spark, [-0.1, 0.0, 0.1]))
    assert m2.sigma == 5.0  # floor applied


def test_bucketed_sigma_fallback_and_buckets(spark):
    # bucket (0,36) has 12 samples → own sigma; bucket (36,60) only 2 → fallback
    residuals = [float(i % 5 - 2) for i in range(12)] + [8.0, -8.0]
    leads = [24] * 12 + [48, 48]
    m = BucketedSigma(sigma_floor=0.1)
    m.fit(_pred_train(spark, residuals, leads))
    bs = m.get_bucket_sigmas()
    assert (0, 36) in bs and (36, 60) not in bs
    out = m.predict_sigma(_pred_train(spark, [0.0, 0.0], [24, 48])).collect()
    by_lead = {r.lead_hours: r.y_pred_sigma_f for r in out}
    assert math.isclose(by_lead[24], bs[(0, 36)])
    assert by_lead[48] != by_lead[24]  # fallback (global over all residuals)


def test_rolling_sigma_floor_and_fallback(spark):
    schema = StructType([StructField("sigma_lead", DoubleType())])
    df = spark.createDataFrame([(0.2,), (None,), (4.0,)], schema)
    out = RollingSigma(sigma_floor=1.0, fallback_sigma=3.0).predict_sigma(df).collect()
    vals = sorted(r.y_pred_sigma_f for r in out)
    assert vals == [1.0, 3.0, 4.0]  # floored, fallback, passthrough


# ---------------------------------------------------------------- slicing


def test_slicing_keys_present(spark):
    schema = StructType(
        [
            StructField("y_pred_f", DoubleType()),
            StructField("y_true_f", DoubleType()),
            StructField("month", LongType()),
            StructField("lead_hours", LongType()),
        ]
    )
    rows = [(50.0 + (i % 3), 50.0 + (i % 7), (i % 12) + 1, 24) for i in range(240)]
    df = spark.createDataFrame(rows, schema)
    slices = compute_metrics_by_slice(df)
    assert set(slices) == {"by_month", "by_season", "by_lead_bucket", "by_temp_regime"}
    assert set(slices["by_season"]) == {"DJF", "MAM", "JJA", "SON"}
    assert "24-48h" in slices["by_lead_bucket"]
    assert all(v["n_samples"] >= 10 for v in slices["by_month"].values())


# ---------------------------------------------------------------- e2e

FC_SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("target_date_local", StringType()),
        StructField("tmax_pred_f", DoubleType()),
        StructField("lead_hours", LongType()),
    ]
)
TR_SCHEMA = StructType(
    [
        StructField("date_local", StringType()),
        StructField("station_id", StringType()),
        StructField("tmax_f", DoubleType()),
    ]
)


def test_multi_model_end_to_end(spark, tmp_path):
    # FIXTURES.md §4: 10 days, pred = 50+i, truth = 51+i
    n = 30
    fc = spark.createDataFrame(
        [("TEST", (date(2024, 1, 1) + timedelta(days=i)).isoformat(), 50.0 + i, 24)
         for i in range(n)],
        FC_SCHEMA,
    )
    tr = spark.createDataFrame(
        [((date(2024, 1, 1) + timedelta(days=i)).isoformat(), "TEST", 51.0 + i)
         for i in range(n)],
        TR_SCHEMA,
    )
    cfg = EvalConfig(
        station_ids=["TEST"],
        start_date_local="2024-01-01",
        end_date_local="2024-12-31",
        models=[ModelConfig(type="passthrough"), ModelConfig(type="persistence"),
                ModelConfig(type="ridge")],
        sigma_type="global",
    )
    result = run_multi_model_evaluation(cfg, fc, tr, run_id="testrun")
    assert set(result.models) == {"Passthrough", "Persistence", "Ridge"}
    # passthrough: pred always 1 under truth → bias −1, mae 1
    pm = result.models["Passthrough"].metrics.forecast
    assert math.isclose(pm.bias, -1.0) and math.isclose(pm.mae, 1.0)
    comp = result.comparison()
    assert comp["ranking"]["by_mae"][-1] == "Persistence"  # worst: lag + zero-fill

    run_dir = write_all_artifacts(result, base_path=tmp_path, write_parquet=True)
    assert (run_dir / "comparison.json").exists()
    assert (run_dir / "models" / "Ridge" / "metrics.json").exists()
    assert (run_dir / "models" / "Ridge" / "predictions.parquet").exists()
    back = load_multi_model_run("testrun", base_path=tmp_path)
    assert back["comparison"]["ranking"]["by_mae"] == comp["ranking"]["by_mae"]
    assert list_runs(base_path=tmp_path) == ["testrun"]
