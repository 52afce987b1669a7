"""Rolling-feature causality goldens (FIXTURES.md §5 / reference
tests/test_build_train_daily_tmax.py:95-190)."""

from __future__ import annotations

import math
from datetime import date, datetime, timedelta, timezone

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from temp_data_pipeline_spark.operators.features import (
    add_rolling_features,
    build_train_daily_tmax,
    join_forecast_to_truth,
)

UTC = timezone.utc

RESIDUAL_SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("lead_hours", LongType()),
        StructField("issue_time_utc", TimestampType()),
        StructField("residual", DoubleType()),
    ]
)


def residual_df(spark, residuals, station="TEST", lead=24):
    t0 = datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (station, lead, t0 + timedelta(days=i), float(r)) for i, r in enumerate(residuals)
    ]
    return spark.createDataFrame(rows, RESIDUAL_SCHEMA)


def col_values(df, col):
    return [r[col] for r in df.orderBy("station_id", "lead_hours", "issue_time_utc").collect()]


def test_bias_window2_golden(spark):
    df = residual_df(spark, [0, 1, 2, 3, 4])
    out = add_rolling_features(df, bias_windows=(2,), rmse_windows=())
    assert col_values(out, "bias_2d") == [None, 0.0, 0.5, 1.5, 2.5]


def test_bias_no_lookahead_sentinel(spark):
    # last residual is 100; bias_7d on the last row must ignore it
    df = residual_df(spark, [1, 1, 1, 1, 100])
    out = add_rolling_features(df, bias_windows=(7,), rmse_windows=())
    assert col_values(out, "bias_7d")[-1] == 1.0


def test_rmse_window2_golden(spark):
    df = residual_df(spark, [1, 1, 1])
    out = add_rolling_features(df, bias_windows=(), rmse_windows=(2,))
    assert col_values(out, "rmse_2d") == [None, 1.0, 1.0]


def test_sigma_lead_ddof1_golden(spark):
    df = residual_df(spark, [0, 2, 4, 6, 8])
    out = add_rolling_features(df)
    got = col_values(out, "sigma_lead")
    assert got[0] is None and got[1] is None
    assert math.isclose(got[2], 1.4142135623730951)  # std([0,2], ddof=1)
    assert math.isclose(got[3], 2.0)  # std([0,2,4], ddof=1)
    assert math.isclose(got[4], 2.581988897471611)  # std([0,2,4,6], ddof=1)


def test_groups_isolated(spark):
    a = residual_df(spark, [0, 1, 2], lead=24)
    b = residual_df(spark, [100, 101, 102], lead=48)
    out = add_rolling_features(a.unionByName(b), bias_windows=(2,), rmse_windows=())
    vals = col_values(out, "bias_2d")
    assert vals[:3] == [None, 0.0, 0.5]  # lead=24 unaffected by lead=48 rows
    assert vals[3:] == [None, 100.0, 100.5]


FORECAST_SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("issue_time_utc", TimestampType()),
        StructField("target_date_local", StringType()),
        StructField("tmax_pred_c", DoubleType()),
        StructField("tmax_pred_f", DoubleType()),
        StructField("lead_hours", LongType()),
        StructField("model", StringType()),
        StructField("source", StringType()),
        StructField("ingested_at_utc", TimestampType()),
    ]
)

TRUTH_SCHEMA = StructType(
    [
        StructField("date_local", StringType()),
        StructField("station_id", StringType()),
        StructField("tmax_c", DoubleType()),
        StructField("tmax_f", DoubleType()),
        StructField("coverage_hours", LongType()),
        StructField("source", StringType()),
        StructField("qc_flags", LongType()),
        StructField("updated_at_utc", TimestampType()),
    ]
)


def eval_frames(spark, n=10):
    """FIXTURES.md §4: forecast pred=50+i, truth actual=51+i, 10 days."""
    issue = datetime(2024, 7, 1, 12, tzinfo=UTC)
    fc = [
        ("TEST", 40.0, -73.0, issue + timedelta(days=i), f"2024-01-{i + 1:02d}",
         10.0, 50.0 + i, 24, "m", "openmeteo", issue)
        for i in range(n)
    ]
    tr = [
        (f"2024-01-{i + 1:02d}", "TEST", 11.0, 51.0 + i, 24 if i != 3 else 10,
         "noaa_isd", 0, issue)
        for i in range(n)
    ]
    return (
        spark.createDataFrame(fc, FORECAST_SCHEMA),
        spark.createDataFrame(tr, TRUTH_SCHEMA),
    )


def test_join_coverage_gate_and_residual(spark):
    fc, tr = eval_frames(spark)
    out = join_forecast_to_truth(fc, tr, min_coverage_hours=18)
    rows = {r.target_date_local: r for r in out.collect()}
    assert len(rows) == 9  # day 4 (coverage 10) gated out
    assert date(2024, 1, 4) not in rows
    r = rows[date(2024, 1, 1)]
    assert r.tmax_actual_f == 51.0 and r.residual == -1.0  # pred − actual


def test_build_train_full_pipeline(spark):
    fc, tr = eval_frames(spark)
    out = build_train_daily_tmax(fc, tr, validate=True)
    rows = out.orderBy("issue_time_utc").collect()
    assert len(rows) == 9
    assert out.columns[:6] == [
        "station_id", "issue_time_utc", "target_date_local",
        "tmax_pred_f", "lead_hours", "forecast_source",
    ]
    # residual is constant −1 → bias converges to −1, sigma to 0
    assert rows[0].bias_7d is None  # warm-up
    assert rows[1].bias_7d == -1.0
    assert rows[2].sigma_lead == 0.0 or rows[2].sigma_lead is None
    assert abs(rows[0].sin_doy - math.sin(2 * math.pi * 1 / 365.25)) < 1e-12
    assert rows[0].month == 1
    # drop_warmup_nulls drops rows with any null rolling col
    dropped = build_train_daily_tmax(fc, tr, drop_warmup_nulls=True, validate=True)
    assert dropped.count() == 7  # first two rows lack sigma_lead
