"""Evaluation runner (reference eval/runner.py).

One lazy plan carries join→filter→features→split; the only driver
materialization points are model fitting (tiny aggregate collects —
see models.py) and the final metric aggregations, mirroring the
reference's lifecycle (SURVEY §3.3).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.eval.config import EvalConfig, ModelConfig
from temp_data_pipeline_spark.eval.data import EvalDataset, load_eval_data
from temp_data_pipeline_spark.eval.metrics import (
    CalibrationMetrics,
    EvalMetrics,
    compute_calibration_metrics,
    compute_forecast_metrics,
)
from temp_data_pipeline_spark.eval.models import create_forecaster
from temp_data_pipeline_spark.eval.slicing import compute_metrics_by_slice
from temp_data_pipeline_spark.eval.uncertainty import create_uncertainty_model


@dataclass
class ModelEvalResult:
    model_name: str
    metrics: EvalMetrics
    predictions: DataFrame  # test frame + y_pred_f / y_true_f / y_pred_sigma_f


@dataclass
class EvalRunResult:
    run_id: str
    config: EvalConfig
    dataset: EvalDataset
    models: dict[str, ModelEvalResult] = field(default_factory=dict)

    def comparison(self) -> dict[str, Any]:
        """Cross-model comparison + rankings (reference report.py:221-287)."""
        comp: dict[str, Any] = {"run_id": self.run_id, "models": {}, "ranking": {}}
        for name, res in self.models.items():
            f = res.metrics.forecast
            comp["models"][name] = {
                "mae": round(f.mae, 4),
                "rmse": round(f.rmse, 4),
                "bias": round(f.bias, 4),
                "r2": round(f.r2, 4) if f.r2 is not None else None,
                "n_samples": f.n_samples,
            }
        if comp["models"]:
            by = lambda k, f=abs: sorted(
                comp["models"], key=lambda m: f(comp["models"][m][k])
            )
            comp["ranking"]["by_mae"] = sorted(
                comp["models"], key=lambda m: comp["models"][m]["mae"]
            )
            comp["ranking"]["by_rmse"] = sorted(
                comp["models"], key=lambda m: comp["models"][m]["rmse"]
            )
            comp["ranking"]["by_abs_bias"] = by("bias")
        return comp


def _evaluate_model(
    cfg: EvalConfig, model_cfg: ModelConfig, dataset: EvalDataset
) -> ModelEvalResult:
    """Fit → predict → σ → metrics for one model (reference runner.py:212-281)."""
    model = create_forecaster(model_cfg)
    model.fit(dataset.train)

    # uncertainty fits on TRAIN residuals (reference runner.py:193-196)
    train_pred = model.predict_mu(dataset.train)
    sigma_model = create_uncertainty_model(
        cfg.sigma_type, cfg.sigma_buckets, cfg.sigma_floor
    )
    sigma_model.fit(train_pred)

    test_pred = model.predict_mu(dataset.test).withColumn(
        "y_true_f", F.col("tmax_actual_f").cast("double")
    )
    test_pred = sigma_model.predict_sigma(test_pred).cache()

    forecast = compute_forecast_metrics(test_pred)
    calibration: CalibrationMetrics | None = compute_calibration_metrics(test_pred)
    slices = compute_metrics_by_slice(test_pred)
    return ModelEvalResult(
        model_name=model_cfg.display_name(),
        metrics=EvalMetrics(forecast=forecast, calibration=calibration, slices=slices),
        predictions=test_pred,
    )


def _make_run_id(now: _dt.datetime | None = None) -> str:
    now = now or _dt.datetime.now(_dt.timezone.utc)
    return now.strftime("%Y%m%d_%H%M%S")


def run_evaluation(
    config: EvalConfig,
    forecast_df: DataFrame,
    truth_df: DataFrame,
    feature_df: DataFrame | None = None,
    run_id: str | None = None,
) -> EvalRunResult:
    """Single-model evaluation (reference runner.py:64-158)."""
    dataset = load_eval_data(config, forecast_df, truth_df, feature_df)
    result = EvalRunResult(
        run_id=run_id or _make_run_id(), config=config, dataset=dataset
    )
    mc = config.models[0]
    result.models[mc.display_name()] = _evaluate_model(config, mc, dataset)
    return result


def run_multi_model_evaluation(
    config: EvalConfig,
    forecast_df: DataFrame,
    truth_df: DataFrame,
    feature_df: DataFrame | None = None,
    run_id: str | None = None,
) -> EvalRunResult:
    """Multi-model loop over one shared dataset (reference runner.py:284-403)."""
    dataset = load_eval_data(config, forecast_df, truth_df, feature_df)
    # the split frames are reused per model — cache once
    dataset.train.cache()
    dataset.test.cache()
    result = EvalRunResult(
        run_id=run_id or _make_run_id(), config=config, dataset=dataset
    )
    for mc in config.models:
        result.models[mc.display_name()] = _evaluate_model(config, mc, dataset)
    return result
