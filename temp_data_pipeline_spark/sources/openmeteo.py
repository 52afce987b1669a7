"""Open-Meteo daily-forecast JSON source (SURVEY §2.1 S6).

Reference: fetch/openmeteo_daily_forecast.py:57-189. The HTTP call is
a driver-side concern (import-gated on ``requests``); the payload →
table transformation is Spark-native: the raw (date, temp) pairs
become a DataFrame and temp_f / lead_hours are column expressions
(functions.c_to_f / functions.lead_hours), so a backfill of thousands
of issue-time payloads unions into one distributed frame.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from temp_data_pipeline_spark.functions import c_to_f, lead_hours
from temp_data_pipeline_spark.schemas.tables import DAILY_TMAX_FORECAST_FIELDS

OPENMETEO_FORECAST_URL = "https://api.open-meteo.com/v1/forecast"
OPENMETEO_HISTORICAL_FORECAST_URL = (
    "https://historical-forecast-api.open-meteo.com/v1/forecast"
)

_RAW_SCHEMA = StructType(
    [
        StructField("date_str", StringType(), nullable=False),
        StructField("tmax_pred_c", DoubleType(), nullable=False),
    ]
)


def parse_forecast_response(
    spark: SparkSession,
    data: dict,
    station_id: str,
    lat: float,
    lon: float,
    station_tz: str,
    issue_time_utc: datetime,
    ingested_at_utc: datetime,
) -> DataFrame:
    """Open-Meteo JSON payload → daily_tmax_forecast frame.

    Null temperatures are skipped (reference :160-162); temp_f and
    lead-hours (target midnight in station tz, floored, clamped ≥0)
    are computed as column expressions.
    """
    daily = data.get("daily", {}) or {}
    times = daily.get("time", []) or []
    temps = daily.get("temperature_2m_max", []) or []
    rows = [
        (str(d), float(t)) for d, t in zip(times, temps) if t is not None
    ]
    raw = spark.createDataFrame(rows, _RAW_SCHEMA)

    issue = F.lit(issue_time_utc.replace(tzinfo=None)).cast("timestamp")
    ingested = F.lit(ingested_at_utc.replace(tzinfo=None)).cast("timestamp")
    return raw.select(
        F.lit(station_id).alias("station_id"),
        F.lit(float(lat)).alias("lat"),
        F.lit(float(lon)).alias("lon"),
        issue.alias("issue_time_utc"),
        F.to_date("date_str").alias("target_date_local"),
        F.col("tmax_pred_c"),
        c_to_f("tmax_pred_c").alias("tmax_pred_f"),
        lead_hours(issue, F.to_date("date_str"), station_tz).alias("lead_hours"),
        F.lit("openmeteo").alias("model"),
        F.lit("openmeteo").alias("source"),
        ingested.alias("ingested_at_utc"),
    ).select(*DAILY_TMAX_FORECAST_FIELDS)


def fetch_forecast_json(
    lat: float, lon: float, station_tz: str, forecast_days: int
) -> dict:
    """Live API fetch (reference :57-85). Driver-side; requires the
    ``requests`` package at call time."""
    import requests  # gated: not needed for any batch/test path

    response = requests.get(
        OPENMETEO_FORECAST_URL,
        params={
            "latitude": lat,
            "longitude": lon,
            "daily": "temperature_2m_max",
            "timezone": station_tz,
            "forecast_days": forecast_days,
        },
        timeout=30,
    )
    response.raise_for_status()
    return response.json()


def fetch_historical_forecast_json(
    lat: float, lon: float, station_tz: str, start_date: str, end_date: str
) -> dict:
    """Historical-forecast API fetch (reference :88-121)."""
    import requests

    response = requests.get(
        OPENMETEO_HISTORICAL_FORECAST_URL,
        params={
            "latitude": lat,
            "longitude": lon,
            "daily": "temperature_2m_max",
            "timezone": station_tz,
            "start_date": start_date,
            "end_date": end_date,
        },
        timeout=60,
    )
    response.raise_for_status()
    return response.json()
