"""Fetch orchestration: NOAA ISD/GHCNh + Open-Meteo → cached raw
files → Spark parse → parquet (SURVEY §3; reference
fetch/noaa_hourly.py:334-470, scripts/run_pipeline.py:16-26).

Spark-first split of responsibilities: the HTTP download is
driver-side (tiny per-station files, cached + atomic via
sources/http_cache.py — the data plane never routes through the
driver's memory), and EVERYTHING after the bytes land is a
distributed read: one `read_isd_csv`/`read_ghcnh_psv` scan over ALL
cached files at once (the reference loops years through pandas;
Spark takes the whole glob in one job), a ts-range filter that
prunes at the scan, and a partitioned atomic parquet write.

The transport is injectable (`fetcher=(url, path) -> None`) so tests
and offline environments run the full orchestration without the
`requests` package or network access.
"""

from __future__ import annotations

from datetime import date, datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.sources.http_cache import Fetcher, download_file
from temp_data_pipeline_spark.sources.stations import StationMeta, resolve_station

# public NOAA endpoints (reference fetch/noaa_hourly.py:22-26)
ISD_BASE_URL = "https://www.ncei.noaa.gov/data/global-hourly/access"
GHCNH_BASE_URL = (
    "https://www.ncei.noaa.gov/data/global-historical-climatology-network-hourly/access"
)
ISD_CUTOFF_DATE = date(2025, 8, 29)  # ISD discontinued after this date


def isd_url(usaf: str, wban: str, year: int) -> str:
    return f"{ISD_BASE_URL}/{year}/{usaf}{wban}.csv"


def ghcnh_url(ghcn_id: str) -> str:
    return f"{GHCNH_BASE_URL}/{ghcn_id}.psv"


def _to_utc(value: str | date | datetime) -> datetime:
    if isinstance(value, datetime):
        return value if value.tzinfo else value.replace(tzinfo=timezone.utc)
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day, tzinfo=timezone.utc)
    return datetime.strptime(value, "%Y-%m-%d").replace(tzinfo=timezone.utc)


def _year_range(start: datetime, end: datetime) -> list[int]:
    last = end.year if (end.month, end.day, end.hour) != (1, 1, 0) else end.year - 1
    return list(range(start.year, last + 1))


def effective_source(start: datetime, end: datetime) -> str:
    """"isd" / "ghcnh" / "hybrid" by the ISD cutoff (reference
    fetch_noaa_hourly's auto mode)."""
    cutoff = datetime(
        ISD_CUTOFF_DATE.year, ISD_CUTOFF_DATE.month, ISD_CUTOFF_DATE.day,
        tzinfo=timezone.utc,
    )
    if end <= cutoff:
        return "isd"
    if start >= cutoff:
        return "ghcnh"
    return "hybrid"


def fetch_noaa_hourly(
    spark: SparkSession,
    station: StationMeta,
    start_date: str | date | datetime,
    end_date: str | date | datetime,
    out_dir: str | Path,
    cache_dir: str | Path,
    source: str = "auto",
    fetcher: Fetcher | None = None,
) -> Path:
    """Download the raw feed(s) into `cache_dir`, parse them with ONE
    distributed Spark scan, filter to [start, end), and write a
    year-partitioned parquet tree under `out_dir`. Returns `out_dir`.

    Unlike the reference's per-year pandas loop, all cached files of a
    source parse in a single Spark job; the hybrid window unions the
    ISD and GHCNh frames (sources/hybrid.py semantics)."""
    from temp_data_pipeline_spark.sources.ghcnh import read_ghcnh_psv
    from temp_data_pipeline_spark.sources.isd import read_isd_csv

    start_dt, end_dt = _to_utc(start_date), _to_utc(end_date)
    if end_dt <= start_dt:
        raise ValueError("end_date must be after start_date")
    mode = effective_source(start_dt, end_dt) if source == "auto" else source
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)

    frames: list[DataFrame] = []
    if mode in ("isd", "hybrid"):
        isd_paths = []
        for year in _year_range(start_dt, end_dt):
            p = cache / f"isd_{year}.csv"
            download_file(isd_url(station.usaf, station.wban, year), p, fetcher=fetcher)
            isd_paths.append(str(p))
        frames.append(read_isd_csv(spark, isd_paths, station))
    if mode in ("ghcnh", "hybrid"):
        p = cache / f"{station.ghcn_id or station.station_id}.psv"
        download_file(ghcnh_url(station.ghcn_id), p, fetcher=fetcher)
        frames.append(read_ghcnh_psv(spark, str(p), station))

    df = frames[0]
    for extra in frames[1:]:
        df = df.unionByName(extra)
    lo = start_dt.replace(tzinfo=None)
    hi = end_dt.replace(tzinfo=None)
    out = (
        df.filter((F.col("ts_utc") >= F.lit(lo)) & (F.col("ts_utc") < F.lit(hi)))
        .withColumn("year", F.year("ts_utc"))
    )
    out.write.mode("overwrite").partitionBy("year").parquet(str(out_dir))
    return Path(out_dir)


def fetch_openmeteo_forecast(
    spark: SparkSession,
    station: StationMeta,
    start_date: str,
    end_date: str,
    out_path: str | Path,
    payload: dict | None = None,
) -> Path:
    """Historical-forecast fetch → parse → parquet (reference
    scripts/fetch_openmeteo_daily_forecast.py). `payload` injects a
    pre-fetched API response for offline runs/tests; otherwise the
    live endpoint is called driver-side."""
    from temp_data_pipeline_spark.sources.openmeteo import (
        fetch_historical_forecast_json,
        parse_forecast_response,
    )

    if payload is None:
        payload = fetch_historical_forecast_json(
            station.lat, station.lon, station.tz, start_date, end_date
        )
    df = parse_forecast_response(
        spark, payload, station.station_id, station.lat, station.lon, station.tz,
        _to_utc(start_date).replace(tzinfo=None),
        _to_utc(end_date).replace(tzinfo=None),
    )
    df.write.mode("overwrite").parquet(str(out_path))
    return Path(out_path)


def resolve_fetch_station(
    station_id: str, stations_csv: str | None
) -> StationMeta:
    if stations_csv:
        return resolve_station(station_id, stations_csv)
    return StationMeta(station_id=station_id)
