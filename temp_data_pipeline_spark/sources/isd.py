"""NOAA ISD hourly CSV source (SURVEY §2.1 S3).

Reference: fetch/noaa_hourly.py:193-232 (_parse_isd_csv). The pandas
version reads 4 columns as strings and maps Python parse functions per
row; here the scan is a schema'd Spark CSV read (Catalyst prunes to
the referenced columns at the reader) and every parse is a built-in
column expression — one map-only stage, no Python in the loop, so a
year of ISD files for thousands of stations scans in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import isd_parse_temp, ts_parse_utc
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_FIELDS
from temp_data_pipeline_spark.sources.stations import StationMeta


def read_isd_csv(
    spark: SparkSession, path: str | list[str], station: StationMeta
) -> DataFrame:
    """ISD CSV file(s) → canonical hourly_obs frame.

    - DATE → ts_utc via coercing timestamp parse; unparseable rows
      dropped (reference dropna on ts_utc)
    - TMP "+0150,1" → tenths-°C parse with sentinel handling
    - LATITUDE/LONGITUDE fall back to station metadata when absent or
      unparseable
    - rows keep qc_flags=0; cleaning stages flag downstream
    """
    raw = spark.read.option("header", True).csv(path)
    cols = set(raw.columns)
    missing = {"DATE", "TMP"} - cols
    if missing:
        raise ValueError(f"Missing required columns in {path}: {sorted(missing)}")

    lat = (
        F.coalesce(F.col("LATITUDE").try_cast("double"), F.lit(station.lat))
        if "LATITUDE" in cols
        else F.lit(station.lat)
    )
    lon = (
        F.coalesce(F.col("LONGITUDE").try_cast("double"), F.lit(station.lon))
        if "LONGITUDE" in cols
        else F.lit(station.lon)
    )
    return (
        raw.select(
            ts_parse_utc(F.col("DATE")).alias("ts_utc"),
            F.lit(station.station_id).alias("station_id"),
            lat.alias("lat"),
            lon.alias("lon"),
            isd_parse_temp(F.col("TMP")).alias("temp_c"),
            F.lit("isd").alias("source"),
            F.lit(0).cast("long").alias("qc_flags"),
        )
        .filter(F.col("ts_utc").isNotNull())
        .select(*HOURLY_OBS_FIELDS)
    )
