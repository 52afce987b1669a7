"""Source-adapter tests (SURVEY §2.1 S3–S7, S11) on synthetic fixture
files, mirroring the reference's parse semantics:
- ISD CSV: fetch/noaa_hourly.py:193-232
- GHCNh PSV (header-variant discovery): :235-307
- Open-Meteo JSON: fetch/openmeteo_daily_forecast.py:124-189
- ERA5 post-decode path + nearest-grid select: fetch/era5_hourly.py:264-347
- stations dim + broadcast join: fetch/noaa_hourly.py:60-87
"""

from __future__ import annotations

from datetime import datetime

import pytest

from temp_data_pipeline_spark.sources.era5 import (
    grid_rows_to_hourly_obs,
    nearest_grid_index,
    read_era5_netcdf,
)
from temp_data_pipeline_spark.sources.ghcnh import read_ghcnh_psv
from temp_data_pipeline_spark.sources.http_cache import download_file, download_with_retry
from temp_data_pipeline_spark.sources.isd import read_isd_csv
from temp_data_pipeline_spark.sources.openmeteo import parse_forecast_response
from temp_data_pipeline_spark.sources.stations import (
    StationMeta,
    load_stations,
    resolve_station,
    with_station_meta,
)

STATION = StationMeta(
    station_id="KLGA", usaf="725030", wban="14732", lat=40.7769, lon=-73.874,
    tz="America/New_York",
)

HOURLY_COLS = ["ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags"]


def test_isd_csv(spark, tmp_path):
    p = tmp_path / "isd_2024.csv"
    p.write_text(
        "DATE,TMP,LATITUDE,LONGITUDE,JUNK\n"
        '2024-01-01T00:54:00,"+0150,1",40.77,-73.87,x\n'
        '2024-01-01T01:54:00,"+9999,9",40.77,-73.87,x\n'
        'bad-date,"+0100,1",40.77,-73.87,x\n'
        '2024-01-01T02:54:00,"-0032,5",,,x\n'
    )
    out = read_isd_csv(spark, str(p), STATION)
    assert out.columns == HOURLY_COLS
    rows = {r["ts_utc"]: r for r in out.collect()}
    assert len(rows) == 3  # bad-date dropped
    assert rows[datetime(2024, 1, 1, 0, 54)]["temp_c"] == pytest.approx(15.0)
    assert rows[datetime(2024, 1, 1, 1, 54)]["temp_c"] is None  # sentinel
    r = rows[datetime(2024, 1, 1, 2, 54)]
    assert r["temp_c"] == pytest.approx(-3.2)
    assert r["lat"] == pytest.approx(STATION.lat)  # empty falls back to station
    assert r["source"] == "isd" and r["qc_flags"] == 0


def test_isd_csv_missing_required(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("DATE,OTHER\n2024-01-01T00:00:00,x\n")
    with pytest.raises(ValueError, match="TMP"):
        read_isd_csv(spark, str(p), STATION)


def test_ghcnh_psv_datetime_column(spark, tmp_path):
    p = tmp_path / "ghcnh.psv"
    p.write_text(
        "Station_ID|DateTime|Temperature|Latitude|Longitude\n"
        "USW00014732|2024-01-01 00:00|150|40.77|-73.87\n"
        "USW00014732|2024-01-01 01:00|-9999|40.77|-73.87\n"
        "USW00014732|2024-01-01 02:00|-87||\n"
    )
    out = read_ghcnh_psv(spark, str(p), STATION)
    assert out.columns == HOURLY_COLS
    rows = {r["ts_utc"]: r for r in out.collect()}
    assert rows[datetime(2024, 1, 1, 0, 0)]["temp_c"] == pytest.approx(15.0)
    assert rows[datetime(2024, 1, 1, 1, 0)]["temp_c"] is None
    r = rows[datetime(2024, 1, 1, 2, 0)]
    assert r["temp_c"] == pytest.approx(-8.7)
    assert r["lat"] == pytest.approx(STATION.lat)
    assert r["source"] == "ghcnh"


def test_ghcnh_psv_date_hour_fallback(spark, tmp_path):
    p = tmp_path / "ghcnh2.psv"
    p.write_text("date|hour|temp\n2024-02-01|7|210\n2024-02-01|23|15\n")
    out = read_ghcnh_psv(spark, str(p), STATION)
    rows = {r["ts_utc"]: r["temp_c"] for r in out.collect()}
    assert rows[datetime(2024, 2, 1, 7, 0)] == pytest.approx(21.0)
    assert rows[datetime(2024, 2, 1, 23, 0)] == pytest.approx(1.5)


def test_ghcnh_psv_no_temp_column(spark, tmp_path):
    p = tmp_path / "ghcnh3.psv"
    p.write_text("datetime|pressure\n2024-01-01 00:00|1013\n")
    with pytest.raises(ValueError, match="temperature"):
        read_ghcnh_psv(spark, str(p), STATION)


def test_openmeteo_parse(spark):
    payload = {
        "daily": {
            "time": ["2024-06-02", "2024-06-03", "2024-06-04"],
            "temperature_2m_max": [25.0, None, 30.5],
        }
    }
    issue = datetime(2024, 6, 1, 0, 0)
    out = parse_forecast_response(
        spark, payload, "KLGA", STATION.lat, STATION.lon,
        "America/New_York", issue, issue,
    )
    rows = {str(r["target_date_local"]): r for r in out.collect()}
    assert set(rows) == {"2024-06-02", "2024-06-04"}  # null temp skipped
    r = rows["2024-06-02"]
    assert r["tmax_pred_c"] == pytest.approx(25.0)
    assert r["tmax_pred_f"] == pytest.approx(77.0)
    # midnight EDT 2024-06-02 = 04:00 UTC → 28h after 00:00 UTC issue
    assert r["lead_hours"] == 28
    assert r["model"] == "openmeteo" and r["source"] == "openmeteo"


def test_openmeteo_empty_payload(spark):
    out = parse_forecast_response(
        spark, {}, "KLGA", 0.0, 0.0, "UTC",
        datetime(2024, 1, 1), datetime(2024, 1, 1),
    )
    assert out.count() == 0
    assert out.columns[:5] == [
        "station_id", "lat", "lon", "issue_time_utc", "target_date_local",
    ]


def test_era5_grid_rows(spark):
    rows = [
        (datetime(2024, 1, 1, 0, 0), 288.15),
        (datetime(2024, 1, 1, 1, 0), None),
    ]
    out = grid_rows_to_hourly_obs(spark, rows, STATION)
    got = {r["ts_utc"]: r for r in out.collect()}
    assert got[datetime(2024, 1, 1, 0, 0)]["temp_c"] == pytest.approx(15.0)
    assert got[datetime(2024, 1, 1, 1, 0)]["temp_c"] is None
    assert got[datetime(2024, 1, 1, 0, 0)]["source"] == "era5"


def test_era5_nearest_grid_index():
    assert nearest_grid_index([41.0, 40.75, 40.5], 40.7769) == 1
    assert nearest_grid_index([-74.0, -73.75], -73.874) == 1  # 0.124 < 0.126
    with pytest.raises(ValueError):
        nearest_grid_index([], 0.0)


def test_era5_netcdf_classic_fallback(spark, tmp_path):
    """With xarray/netCDF4 absent, the classic-format tier decodes a
    real fixture end-to-end (full coverage in tests/test_netcdf_era5.py)."""
    from tests.test_netcdf_era5 import era5_fixture_bytes

    p = tmp_path / "fix.nc"
    p.write_bytes(era5_fixture_bytes())
    out = read_era5_netcdf(spark, str(p), STATION)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["source"] == "era5" for r in rows)


def test_stations_dim_and_broadcast_join(spark, tmp_path):
    p = tmp_path / "stations.csv"
    p.write_text(
        "station_id,usaf,wban,ghcn_id,name,lat,lon,tz\n"
        "klga ,725030,14732,USW00014732,LaGuardia,40.7769,-73.8740,America/New_York\n"
        "KBOS,725090,14739,USW00014739,Logan,42.3606,-71.0106,America/New_York\n"
    )
    dim = load_stations(spark, str(p))
    rows = {r["station_id"]: r for r in dim.collect()}
    assert set(rows) == {"KLGA", "KBOS"}  # id normalized to upper
    assert rows["KLGA"]["lat"] == pytest.approx(40.7769)

    meta = resolve_station("klga", p)
    assert meta.tz == "America/New_York" and meta.isd_key == "725030-14732"
    with pytest.raises(KeyError):
        resolve_station("XXXX", p)

    facts = spark.createDataFrame(
        [("KLGA", 1.0), ("KBOS", 2.0)], "station_id string, x double"
    )
    joined = with_station_meta(facts, dim)
    assert {r["station_id"]: r["tz"] for r in joined.collect()} == {
        "KLGA": "America/New_York",
        "KBOS": "America/New_York",
    }
    # dim side must broadcast — no shuffle on the fact side
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_download_file_cache_and_retry(tmp_path):
    calls = []

    def fake_fetcher(url, out_path):
        calls.append(url)
        out_path.write_text("payload")

    out = tmp_path / "f.csv"
    p1 = download_file("http://x/f.csv", out, fetcher=fake_fetcher)
    p2 = download_file("http://x/f.csv", out, fetcher=fake_fetcher)
    assert p1 == p2 == out and len(calls) == 1  # second hit cached

    # corrupted-cache retry: first validation fails, re-fetch once
    out2 = tmp_path / "g.csv"
    out2.write_text("corrupt")
    seen = []

    def validate(path):
        seen.append(path.read_text())
        return path.read_text() == "payload"

    got = download_with_retry("http://x/g.csv", out2, validate, fetcher=fake_fetcher)
    assert got.read_text() == "payload" and seen[0] == "corrupt"
