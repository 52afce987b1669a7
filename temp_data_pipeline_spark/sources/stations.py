"""Station metadata dimension (SURVEY §2.1 S11).

The reference loads ``stations/stations.csv`` into a dict keyed by
station_id and passes one StationMeta around per call
(fetch/noaa_hourly.py:60-87). The engine keeps both forms:
- :func:`load_stations` — a small dimension DataFrame, used as a
  broadcast join so multi-station frames resolve lat/lon/tz in one
  query (the 100 TB posture: never a driver-side loop over stations);
- :func:`resolve_station` — the driver-side single-station lookup for
  per-station fetch orchestration, mirroring the reference API.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

STATIONS_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), nullable=False),
        StructField("usaf", StringType(), nullable=True),
        StructField("wban", StringType(), nullable=True),
        StructField("ghcn_id", StringType(), nullable=True),
        StructField("name", StringType(), nullable=True),
        StructField("lat", DoubleType(), nullable=False),
        StructField("lon", DoubleType(), nullable=False),
        StructField("tz", StringType(), nullable=True),
    ]
)


@dataclass(frozen=True)
class StationMeta:
    """Reference parity: fetch/noaa_hourly.py StationMeta."""

    station_id: str
    usaf: str = ""
    wban: str = ""
    ghcn_id: str = ""
    name: str = ""
    lat: float = float("nan")
    lon: float = float("nan")
    tz: str = "UTC"

    @property
    def isd_key(self) -> str:
        return f"{self.usaf.zfill(6)}-{self.wban.zfill(5)}"


def load_stations(spark: SparkSession, path: str) -> DataFrame:
    """Stations CSV → normalized dimension DataFrame (ids uppercased,
    strings trimmed). Small enough to broadcast everywhere."""
    raw = spark.read.option("header", True).schema(STATIONS_SCHEMA).csv(path)
    return raw.select(
        F.upper(F.trim("station_id")).alias("station_id"),
        F.trim("usaf").alias("usaf"),
        F.trim("wban").alias("wban"),
        F.trim("ghcn_id").alias("ghcn_id"),
        F.trim("name").alias("name"),
        F.col("lat"),
        F.col("lon"),
        F.trim("tz").alias("tz"),
    )


def with_station_meta(
    df: DataFrame, stations: DataFrame, on: str = "station_id"
) -> DataFrame:
    """Broadcast-join station attributes onto a fact frame."""
    return df.join(F.broadcast(stations), on, "left")


def resolve_station(station_id: str, path: str | Path) -> StationMeta:
    """Driver-side single-station lookup (reference
    fetch/noaa_hourly.py:82-87). Raises KeyError when unknown."""
    key = station_id.strip().upper()
    with Path(path).open(newline="", encoding="utf-8") as handle:
        for row in csv.DictReader(handle):
            if row["station_id"].strip().upper() == key:
                return StationMeta(
                    station_id=key,
                    usaf=row.get("usaf", "").strip(),
                    wban=row.get("wban", "").strip(),
                    ghcn_id=row.get("ghcn_id", "").strip(),
                    name=row.get("name", "").strip(),
                    lat=float(row["lat"]),
                    lon=float(row["lon"]),
                    tz=row.get("tz", "UTC").strip() or "UTC",
                )
    raise KeyError(f"Station {station_id} not found in {path}")
