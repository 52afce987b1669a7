"""Replay the reference's committed evaluation run 20260121_173246 on
the reference's own data and reproduce its published numbers
(BASELINE.md) — the strongest end-to-end parity check available.

Inputs: the reference repo's committed parquet (read-only). The run
globbed BOTH overlapping openmeteo historical files (2016–2024 and
2016–2025), so every 2016-2024 forecast row enters twice — replayed
verbatim, which is what makes test n = 549 rather than 275.

Ridge + Persistence + bucketed-σ calibration reproduce every published
digit (4 decimals). kNN is allowed a small tolerance: sklearn's
neighbor selection among distance ties differs from our pandas-UDF
implementation (published 1.2287 vs ours 1.2378).
"""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.eval.config import EvalConfig, ModelConfig, SplitConfig
from temp_data_pipeline_spark.eval.runner import run_multi_model_evaluation
from temp_data_pipeline_spark.sources.registry import read_parquet_any

REF = "/root/reference/data/clean"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/forecasts/openmeteo/KLGA"),
    reason="reference data not present",
)


@pytest.fixture(scope="module")
def replay(spark):
    fc = read_parquet_any(spark, f"{REF}/forecasts/openmeteo/KLGA/*.parquet")
    truth = read_parquet_any(spark, f"{REF}/daily_tmax/KLGA/*.parquet")
    cfg = EvalConfig(
        station_ids=["KLGA"],
        start_date_local="2020-01-01",
        end_date_local="2024-12-31",
        min_coverage_hours=18,
        split=SplitConfig(type="static", train_frac=0.7, val_frac=0.15, test_frac=0.15),
        models=[
            ModelConfig(
                type="ridge",
                alpha=1.0,
                features=["tmax_pred_f", "sin_doy", "cos_doy", "bias_7d", "bias_14d"],
            ),
            ModelConfig(
                type="knn",
                n_neighbors=50,
                features=["tmax_pred_f", "lead_hours", "sin_doy", "cos_doy"],
            ),
            ModelConfig(type="persistence"),
        ],
        sigma_type="bucketed",
        sigma_floor=1.0,
        seed=42,
    )
    return run_multi_model_evaluation(cfg, fc, truth, run_id="baseline_replay")


def test_ridge_reproduces_published_metrics(replay):
    m = replay.models["Ridge"].metrics.forecast
    assert m.n_samples == 549
    assert round(m.mae, 4) == 1.1534
    assert round(m.rmse, 4) == 1.4039
    assert round(m.bias, 4) == 0.7286
    assert round(m.r2, 4) == 0.9915


def test_ridge_reproduces_published_calibration(replay):
    c = replay.models["Ridge"].metrics.calibration
    assert round(c.coverage_50, 4) == 0.49
    assert round(c.coverage_80, 4) == 0.8106
    assert round(c.coverage_90, 4) == 0.9235
    assert round(c.mean_sigma, 4) == 1.4982
    assert round(c.sharpness_90, 4) == 4.9286


def test_persistence_reproduces_published_metrics(replay):
    m = replay.models["Persistence"].metrics.forecast
    assert round(m.mae, 4) == 2.5718
    assert round(m.rmse, 4) == 4.7381
    assert round(m.bias, 4) == 0.002


def test_knn_close_to_published_metrics(replay):
    m = replay.models["kNN (k=50)"].metrics.forecast
    assert m.mae == pytest.approx(1.2287, abs=0.02)
    assert m.rmse == pytest.approx(1.5196, abs=0.02)


def test_model_ranking_matches_published(replay):
    maes = {name: mr.metrics.forecast.mae for name, mr in replay.models.items()}
    ranked = sorted(maes, key=maes.get)
    assert ranked == ["Ridge", "kNN (k=50)", "Persistence"]
