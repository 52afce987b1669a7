"""NOAA GHCNh pipe-separated source (SURVEY §2.1 S4).

Reference: fetch/noaa_hourly.py:235-307 (_parse_ghcnh_psv). Header
names vary across GHCNh vintages, so the reference discovers the
datetime and temperature columns heuristically after lowercasing
headers. The discovery runs on the header only (driver-side, free);
the data path is a single schema-normalized Spark CSV scan with
column-expression parses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import ghcnh_parse_temp, ts_parse_utc
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_FIELDS
from temp_data_pipeline_spark.sources.stations import StationMeta

_DATETIME_CANDIDATES = ("datetime", "date_time", "observation_time")
_TEMP_CANDIDATES = ("temperature", "temp", "air_temperature", "t")


def read_ghcnh_psv(spark: SparkSession, path: str, station: StationMeta) -> DataFrame:
    """GHCNh PSV file(s) → canonical hourly_obs frame."""
    raw = spark.read.option("header", True).option("sep", "|").csv(path)
    # normalize: lowercase + strip (reference df.columns.str.strip().str.lower())
    raw = raw.toDF(*[c.strip().lower() for c in raw.columns])
    cols = set(raw.columns)

    ts_expr = None
    for cand in _DATETIME_CANDIDATES:
        if cand in cols:
            ts_expr = ts_parse_utc(F.col(cand))
            break
    if ts_expr is None:
        if "date" in cols and "hour" in cols:
            ts_expr = ts_parse_utc(
                F.concat(
                    F.col("date").cast("string"),
                    F.lit(" "),
                    F.lpad(F.col("hour").cast("string"), 2, "0"),
                    F.lit(":00"),
                )
            )
        elif "date" in cols:
            ts_expr = ts_parse_utc(F.col("date"))
        else:
            raise ValueError(
                f"Cannot find datetime column in GHCNh PSV: {sorted(cols)}"
            )

    temp_col = next((c for c in _TEMP_CANDIDATES if c in cols), None)
    if temp_col is None:
        raise ValueError(f"Cannot find temperature column in GHCNh PSV: {sorted(cols)}")

    lat = (
        F.coalesce(F.col("latitude").try_cast("double"), F.lit(station.lat))
        if "latitude" in cols
        else F.lit(station.lat)
    )
    lon = (
        F.coalesce(F.col("longitude").try_cast("double"), F.lit(station.lon))
        if "longitude" in cols
        else F.lit(station.lon)
    )
    return (
        raw.select(
            ts_expr.alias("ts_utc"),
            F.lit(station.station_id).alias("station_id"),
            lat.alias("lat"),
            lon.alias("lon"),
            ghcnh_parse_temp(F.col(temp_col)).alias("temp_c"),
            F.lit("ghcnh").alias("source"),
            F.lit(0).cast("long").alias("qc_flags"),
        )
        .filter(F.col("ts_utc").isNotNull())
        .select(*HOURLY_OBS_FIELDS)
    )
