"""Daily-Tmax goldens, mirroring reference tests/test_build_daily_tmax.py."""

from __future__ import annotations

from datetime import date, datetime, timedelta, timezone

from temp_data_pipeline_spark.operators.daily_tmax import build_daily_tmax
from temp_data_pipeline_spark.schemas import qc_flags as qc
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_SCHEMA

UTC = timezone.utc
STAMP = datetime(2026, 1, 1, tzinfo=UTC)


def make_hourly(spark, rows, station="KLGA"):
    """rows: list of (ts_utc, temp_c, qc_flags)."""
    data = [(ts, station, 40.78, -73.87, t, "noaa", q) for ts, t, q in rows]
    return spark.createDataFrame(data, HOURLY_OBS_SCHEMA)


def run(spark, rows, tz="America/New_York", **kw):
    df = make_hourly(spark, rows)
    out = build_daily_tmax(df, station_tz=tz, updated_at_utc=STAMP, **kw)
    return {(r.date_local, r.station_id): r for r in out.collect()}


def full_day(day_start_utc, base=20.0):
    """24 hourly obs spanning one UTC day."""
    return [(day_start_utc + timedelta(hours=h), base + (h % 5), 0) for h in range(24)]


def test_simple_tmax_and_coverage(spark):
    # 24 obs on 2024-07-01 UTC; EDT = UTC-4 so 00:00–03:59Z belong to 06-30 local
    t0 = datetime(2024, 7, 1, 0, 0, tzinfo=UTC)
    out = run(spark, full_day(t0))
    # local 06-30 gets hours 00-03Z (20,21,22,23 local) → 4 hours, low coverage
    prev = out[(date(2024, 6, 30), "KLGA")]
    assert prev.coverage_hours == 4
    assert prev.qc_flags & qc.QC_LOW_COVERAGE
    cur = out[(date(2024, 7, 1), "KLGA")]
    assert cur.coverage_hours == 20
    assert cur.tmax_c == 24.0
    assert cur.tmax_f == 75.2  # round(24*9/5+32, 1)
    assert not cur.qc_flags & qc.QC_LOW_COVERAGE


def test_out_of_range_excluded_from_tmax(spark):
    t0 = datetime(2024, 7, 1, 12, 0, tzinfo=UTC)
    rows = [(t0, 20.0, 0), (t0 + timedelta(hours=1), 99.0, qc.QC_OUT_OF_RANGE)]
    out = run(spark, rows)
    r = out[(date(2024, 7, 1), "KLGA")]
    assert r.tmax_c == 20.0  # 99 excluded
    assert r.coverage_hours == 1
    assert r.qc_flags & qc.QC_OUT_OF_RANGE  # flag still bubbles up


def test_spike_included_in_tmax(spark):
    t0 = datetime(2024, 7, 1, 12, 0, tzinfo=UTC)
    rows = [(t0, 20.0, 0), (t0 + timedelta(hours=1), 45.0, qc.QC_SPIKE_DETECTED)]
    out = run(spark, rows)
    r = out[(date(2024, 7, 1), "KLGA")]
    assert r.tmax_c == 45.0  # spikes count (real heat spikes kept)
    assert r.qc_flags & qc.QC_SPIKE_DETECTED


def test_null_temps_excluded_and_all_null_day_dropped(spark):
    t0 = datetime(2024, 7, 1, 12, 0, tzinfo=UTC)
    rows = [
        (t0, None, qc.QC_MISSING_VALUE),
        (t0 + timedelta(hours=1), None, qc.QC_MISSING_VALUE),
    ]
    out = run(spark, rows)
    assert out == {}  # zero-valid day dropped entirely


def test_subhourly_obs_count_one_hour(spark):
    t0 = datetime(2024, 7, 1, 12, 0, tzinfo=UTC)
    rows = [
        (t0, 20.0, 0),
        (t0 + timedelta(minutes=20), 21.0, 0),
        (t0 + timedelta(minutes=40), 22.0, 0),
    ]
    out = run(spark, rows)
    r = out[(date(2024, 7, 1), "KLGA")]
    assert r.coverage_hours == 1  # distinct local hours, not obs count
    assert r.tmax_c == 22.0


def test_multi_station_grouping(spark):
    t0 = datetime(2024, 7, 1, 12, 0, tzinfo=UTC)
    rows = [
        (t0, "AAA", 40.0, -73.0, 20.0, "noaa", 0),
        (t0, "BBB", 41.0, -74.0, 30.0, "noaa", 0),
    ]
    df = spark.createDataFrame(rows, HOURLY_OBS_SCHEMA)
    out = build_daily_tmax(df, updated_at_utc=STAMP)
    got = {(r.date_local, r.station_id): r.tmax_c for r in out.collect()}
    assert got == {
        (date(2024, 7, 1), "AAA"): 20.0,
        (date(2024, 7, 1), "BBB"): 30.0,
    }


def test_utc_vs_local_grouping(spark):
    # 23:30Z on Jun 30 = 19:30 EDT Jun 30 → same local day as earlier obs
    rows = [
        (datetime(2024, 6, 30, 23, 30, tzinfo=UTC), 25.0, 0),
        (datetime(2024, 7, 1, 1, 0, tzinfo=UTC), 30.0, 0),  # 21:00 EDT Jun 30
    ]
    out = run(spark, rows)
    assert list(out) == [(date(2024, 6, 30), "KLGA")]
    assert out[(date(2024, 6, 30), "KLGA")].tmax_c == 30.0
