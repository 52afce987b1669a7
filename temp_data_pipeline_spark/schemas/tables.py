"""Canonical table schemas as StructType constants.

The reference declares each table as a TypedDict + ordered field list
(`src/tempdata/schemas/{hourly_obs,daily_tmax,daily_tmax_forecast,
train_daily_tmax}.py`); here each is a `StructType` plus the same
ordered field list, so `df.select(*FIELDS)` pins column order at
stage boundaries.

Type mapping (SURVEY §1.4): tz-aware UTC ts → TimestampType with
session tz pinned UTC; local midnight dates → DateType; qc bitmask →
LongType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# hourly_obs — reference schemas/hourly_obs.py:32-56
# ---------------------------------------------------------------------------

HOURLY_OBS_FIELDS = [
    "ts_utc",
    "station_id",
    "lat",
    "lon",
    "temp_c",
    "source",
    "qc_flags",
]

HOURLY_OBS_SCHEMA = StructType(
    [
        StructField("ts_utc", TimestampType(), nullable=False),
        StructField("station_id", StringType(), nullable=False),
        StructField("lat", DoubleType(), nullable=True),
        StructField("lon", DoubleType(), nullable=True),
        StructField("temp_c", DoubleType(), nullable=True),
        StructField("source", StringType(), nullable=False),
        StructField("qc_flags", LongType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# daily_tmax — reference schemas/daily_tmax.py:36-63
# ---------------------------------------------------------------------------

DAILY_TMAX_FIELDS = [
    "date_local",
    "station_id",
    "tmax_c",
    "tmax_f",
    "coverage_hours",
    "source",
    "qc_flags",
    "updated_at_utc",
]

DAILY_TMAX_SCHEMA = StructType(
    [
        StructField("date_local", DateType(), nullable=False),
        StructField("station_id", StringType(), nullable=False),
        StructField("tmax_c", DoubleType(), nullable=False),
        StructField("tmax_f", DoubleType(), nullable=False),
        StructField("coverage_hours", LongType(), nullable=False),
        StructField("source", StringType(), nullable=False),
        StructField("qc_flags", LongType(), nullable=False),
        StructField("updated_at_utc", TimestampType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# daily_tmax_forecast — reference schemas/daily_tmax_forecast.py:31-63
# ---------------------------------------------------------------------------

DAILY_TMAX_FORECAST_FIELDS = [
    "station_id",
    "lat",
    "lon",
    "issue_time_utc",
    "target_date_local",
    "tmax_pred_c",
    "tmax_pred_f",
    "lead_hours",
    "model",
    "source",
    "ingested_at_utc",
]

DAILY_TMAX_FORECAST_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), nullable=False),
        StructField("lat", DoubleType(), nullable=True),
        StructField("lon", DoubleType(), nullable=True),
        StructField("issue_time_utc", TimestampType(), nullable=False),
        StructField("target_date_local", DateType(), nullable=False),
        StructField("tmax_pred_c", DoubleType(), nullable=False),
        StructField("tmax_pred_f", DoubleType(), nullable=False),
        StructField("lead_hours", LongType(), nullable=False),
        StructField("model", StringType(), nullable=False),
        StructField("source", StringType(), nullable=False),
        StructField("ingested_at_utc", TimestampType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# train_daily_tmax — reference schemas/train_daily_tmax.py:69-93 (16 cols)
# ---------------------------------------------------------------------------

TRAIN_DAILY_TMAX_FIELDS = [
    "station_id",
    "issue_time_utc",
    "target_date_local",
    "tmax_pred_f",
    "lead_hours",
    "forecast_source",
    "sin_doy",
    "cos_doy",
    "month",
    "bias_7d",
    "bias_14d",
    "bias_30d",
    "rmse_14d",
    "rmse_30d",
    "sigma_lead",
    "tmax_actual_f",
]

TRAIN_DAILY_TMAX_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), nullable=False),
        StructField("issue_time_utc", TimestampType(), nullable=False),
        StructField("target_date_local", DateType(), nullable=False),
        StructField("tmax_pred_f", DoubleType(), nullable=False),
        StructField("lead_hours", LongType(), nullable=False),
        StructField("forecast_source", StringType(), nullable=False),
        StructField("sin_doy", DoubleType(), nullable=False),
        StructField("cos_doy", DoubleType(), nullable=False),
        StructField("month", IntegerType(), nullable=False),
        # rolling features are nullable during causal warm-up
        StructField("bias_7d", DoubleType(), nullable=True),
        StructField("bias_14d", DoubleType(), nullable=True),
        StructField("bias_30d", DoubleType(), nullable=True),
        StructField("rmse_14d", DoubleType(), nullable=True),
        StructField("rmse_30d", DoubleType(), nullable=True),
        StructField("sigma_lead", DoubleType(), nullable=True),
        StructField("tmax_actual_f", DoubleType(), nullable=False),
    ]
)
