"""ERA5 reanalysis grid source (SURVEY §2.1 S7).

Reference: fetch/era5_hourly.py:89-347 — CDS API retrieve, xarray (or
netCDF4 fallback) parse, nearest-grid-point selection to the station
coordinate, Kelvin→Celsius.

Neither xarray nor netCDF4 ships in this container, so the decode step
is import-gated; everything around it — nearest-point selection, the
row→DataFrame path, unit conversion — is real and tested. At scale the
decode runs distributed: ``spark.read.format("binaryFile")`` over the
.nc files + :func:`grid_rows_to_hourly_obs` per file inside
``mapInPandas`` (same pattern as llm/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import k_to_c
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_FIELDS
from temp_data_pipeline_spark.sources.stations import StationMeta


def nearest_grid_index(values: list[float], target: float) -> int:
    """Index of the grid coordinate nearest to target (reference
    era5_hourly.py:281-287 argmin |grid − station|)."""
    if not values:
        raise ValueError("empty grid coordinate array")
    return min(range(len(values)), key=lambda i: abs(values[i] - target))


def grid_rows_to_hourly_obs(
    spark: SparkSession,
    rows: list[tuple],
    station: StationMeta,
) -> DataFrame:
    """(ts_utc, t2m_kelvin) rows at the selected grid point → canonical
    hourly_obs frame. Kelvin→C is a column expression; null Kelvin
    stays null temp_c."""
    raw = spark.createDataFrame(rows, "ts_utc timestamp, t2m_k double")
    return (
        raw.select(
            F.col("ts_utc"),
            F.lit(station.station_id).alias("station_id"),
            F.lit(station.lat).alias("lat"),
            F.lit(station.lon).alias("lon"),
            k_to_c("t2m_k").alias("temp_c"),
            F.lit("era5").alias("source"),
            F.lit(0).cast("long").alias("qc_flags"),
        )
        .filter(F.col("ts_utc").isNotNull())
        .select(*HOURLY_OBS_FIELDS)
    )


def read_era5_netcdf(
    spark: SparkSession, nc_path: str, station: StationMeta
) -> DataFrame:
    """Decode one ERA5 netCDF file and emit hourly_obs rows for the
    grid point nearest the station (reference era5_hourly.py:264-347).

    Requires xarray or netCDF4; raises NotImplementedError with a
    clear message when neither is installed (this container).
    """
    try:
        import xarray  # noqa: F401
    except ImportError:
        try:
            import netCDF4  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "ERA5 decode needs xarray or netCDF4, neither is installed; "
                "grid_rows_to_hourly_obs covers the post-decode path"
            ) from exc

    import numpy as np
    import xarray as xr

    ds = xr.open_dataset(nc_path)
    lat_i = nearest_grid_index([float(v) for v in ds["latitude"].values], station.lat)
    lon_i = nearest_grid_index([float(v) for v in ds["longitude"].values], station.lon)
    point = ds["t2m"].isel(latitude=lat_i, longitude=lon_i)
    times = [
        t.astype("datetime64[us]").item() for t in np.asarray(point["time"].values)
    ]
    kelvins = [float(v) if np.isfinite(v) else None for v in np.asarray(point.values)]
    return grid_rows_to_hourly_obs(spark, list(zip(times, kelvins)), station)
