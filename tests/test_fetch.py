"""Fetch orchestration (reference fetch/noaa_hourly.py:334-470,
scripts/run_pipeline.py): injectable-transport downloads → one
distributed parse → partitioned parquet. Offline throughout — the
fake fetcher writes synthetic ISD/GHCNh payloads."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from temp_data_pipeline_spark.sources.fetch import (
    effective_source,
    fetch_noaa_hourly,
    fetch_openmeteo_forecast,
    ghcnh_url,
    isd_url,
)
from temp_data_pipeline_spark.sources.stations import StationMeta

STATION = StationMeta(
    station_id="KLGA", usaf="725030", wban="14732", ghcn_id="USW00014732",
    lat=40.7769, lon=-73.874, tz="UTC",
)


def _utc(y, m, d):
    return datetime(y, m, d, tzinfo=timezone.utc)


def _isd_csv(year: int) -> str:
    lines = ["DATE,TMP,LATITUDE,LONGITUDE"]
    for day in (1, 2):
        lines.append(f'{year}-06-{day:02d}T12:00:00,"+0{150 + day},1",40.77,-73.87')
    return "\n".join(lines) + "\n"


def _ghcnh_psv() -> str:
    return (
        "Station_ID|DATE|temperature|temperature_Quality_Code\n"
        "USW00014732|2025-09-01T12:00:00|21.5|1\n"
        "USW00014732|2025-09-02T12:00:00|22.5|1\n"
    )


def fake_fetcher(urls_seen):
    def fetch(url, out_path):
        urls_seen.append(url)
        if url.endswith(".csv"):
            year = int(url.rsplit("/", 2)[-2])
            out_path.write_text(_isd_csv(year))
        else:
            out_path.write_text(_ghcnh_psv())
    return fetch


def test_url_builders_match_reference_layout():
    assert isd_url("725030", "14732", 2024) == (
        "https://www.ncei.noaa.gov/data/global-hourly/access/2024/72503014732.csv"
    )
    assert ghcnh_url("USW00014732").endswith("/access/USW00014732.psv")


def test_effective_source_cutoff():
    assert effective_source(_utc(2024, 1, 1), _utc(2025, 1, 1)) == "isd"
    assert effective_source(_utc(2025, 9, 1), _utc(2025, 10, 1)) == "ghcnh"
    assert effective_source(_utc(2025, 8, 1), _utc(2025, 9, 15)) == "hybrid"


def test_fetch_isd_years_to_partitioned_parquet(spark, tmp_path):
    urls = []
    out = fetch_noaa_hourly(
        spark, STATION, "2023-01-01", "2025-01-01",
        out_dir=tmp_path / "out", cache_dir=tmp_path / "cache",
        fetcher=fake_fetcher(urls),
    )
    assert len(urls) == 2 and all("global-hourly" in u for u in urls)
    df = spark.read.parquet(str(out))
    rows = df.collect()
    assert len(rows) == 4  # 2 rows per fetched year
    assert {r["year"] for r in rows} == {2023, 2024}
    assert all(r["source"] == "isd" for r in rows)
    # second run hits the cache: no new downloads
    urls2 = []
    fetch_noaa_hourly(
        spark, STATION, "2023-01-01", "2025-01-01",
        out_dir=tmp_path / "out", cache_dir=tmp_path / "cache",
        fetcher=fake_fetcher(urls2),
    )
    assert urls2 == []


def test_fetch_hybrid_unions_both_sources(spark, tmp_path):
    urls = []
    out = fetch_noaa_hourly(
        spark, STATION, "2025-06-01", "2025-10-01",
        out_dir=tmp_path / "out", cache_dir=tmp_path / "cache",
        fetcher=fake_fetcher(urls),
    )
    df = spark.read.parquet(str(out))
    by_src = {r["source"] for r in df.collect()}
    assert by_src == {"isd", "ghcnh"}
    assert any("global-hourly" in u for u in urls)
    assert any(u.endswith(".psv") for u in urls)


def test_fetch_rejects_inverted_range(spark, tmp_path):
    with pytest.raises(ValueError, match="after start_date"):
        fetch_noaa_hourly(
            spark, STATION, "2024-02-01", "2024-01-01",
            out_dir=tmp_path / "o", cache_dir=tmp_path / "c",
            fetcher=fake_fetcher([]),
        )


def test_fetch_openmeteo_with_injected_payload(spark, tmp_path):
    payload = {
        "daily": {
            "time": ["2024-06-01", "2024-06-02"],
            "temperature_2m_max": [25.0, 26.5],
        },
        "utc_offset_seconds": 0,
    }
    out = fetch_openmeteo_forecast(
        spark, STATION, "2024-06-01", "2024-06-03",
        tmp_path / "om", payload=payload,
    )
    df = spark.read.parquet(str(out))
    assert df.count() == 2
    assert set(df.columns) >= {"station_id", "target_date_local", "tmax_pred_f"}


def test_cli_fetch_subcommand(spark, tmp_path, monkeypatch):
    """CLI wiring: the fetch subcommand drives fetch_noaa_hourly with
    the station resolved from --stations-csv."""
    import temp_data_pipeline_spark.sources.http_cache as hc

    monkeypatch.setattr(hc, "_requests_fetcher", fake_fetcher([]))
    stations = tmp_path / "stations.csv"
    stations.write_text(
        "station_id,usaf,wban,ghcn_id,name,lat,lon,tz\n"
        "KLGA,725030,14732,USW00014732,LaGuardia,40.7769,-73.8740,UTC\n"
    )
    from temp_data_pipeline_spark.cli import main

    assert main([
        "fetch", "--station", "KLGA", "--start", "2024-01-01",
        "--end", "2024-07-01", "--stations-csv", str(stations),
        "--data-dir", str(tmp_path / "data"),
    ]) == 0
    df = spark.read.parquet(str(tmp_path / "data" / "raw" / "noaa_hourly" / "KLGA"))
    assert df.count() == 2  # one fetched year, two synthetic rows
