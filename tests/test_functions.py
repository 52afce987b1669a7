"""Unit tests for the scalar function library (SURVEY §2.9).

The oracle queries (plans/function_queries.py) pin cross-engine parity
with fixed-offset zones; these tests pin the real-IANA-zone semantics
(DST transitions included) and the reference's documented edge cases:
- ISD parse: fetch/noaa_hourly.py:135-163 (sentinel ±9990, empty,
  unparseable, signed tenths)
- GHCNh parse: fetch/noaa_hourly.py:166-190
- lead_hours: fetch/openmeteo_daily_forecast.py:30-54 (floor + clamp,
  target midnight in station zone)
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import (
    c_to_f,
    ghcnh_parse_temp,
    isd_parse_temp,
    k_to_c,
    lead_hours,
    local_date,
    local_hour,
    season_of,
    ts_parse_utc,
)


def _one(spark, col, **lits):
    row = spark.createDataFrame([lits]).select(col.alias("v")).first()
    return row["v"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("+0150,1", 15.0),
        ("-0132,5", -13.2),
        ("+9999,9", None),
        ("9999", None),
        ("-9999,1", None),
        ("", None),
        ("abc,1", None),
        ("  +0021 ,1", 2.1),  # reference strips the comma part before float()
        ("0000,1", 0.0),
    ],
)
def test_isd_parse(spark, raw, expected):
    got = _one(spark, isd_parse_temp(F.col("raw")), raw=raw)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("150", 15.0),
        ("  -87  ", -8.7),
        ("-9999", None),
        ("", None),
        ("9995", None),
        ("-9991", None),
        ("junk", None),
        ("0", 0.0),
    ],
)
def test_ghcnh_parse(spark, raw, expected):
    got = _one(spark, ghcnh_parse_temp(F.col("raw")), raw=raw)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


def test_unit_conversions(spark):
    assert _one(spark, c_to_f(F.col("c")), c=100.0) == pytest.approx(212.0)
    assert _one(spark, c_to_f(F.col("c")), c=-40.0) == pytest.approx(-40.0)
    assert _one(spark, k_to_c(F.col("k")), k=273.15) == pytest.approx(0.0)


def test_season_map(spark):
    got = [
        _one(spark, season_of(F.col("m")), m=m)
        for m in [12, 1, 2, 3, 5, 6, 8, 9, 11]
    ]
    assert got == ["DJF", "DJF", "DJF", "MAM", "MAM", "JJA", "JJA", "SON", "SON"]


def test_ts_parse_coerce(spark):
    ok = _one(spark, ts_parse_utc(F.col("s")), s="2024-03-15 12:34:56")
    assert ok == datetime(2024, 3, 15, 12, 34, 56)
    assert _one(spark, ts_parse_utc(F.col("s")), s="not-a-ts") is None


def test_local_date_hour_dst(spark):
    """America/New_York spring-forward (2024-03-10): 06:30 UTC is
    01:30 EST; 07:30 UTC is 03:30 EDT (02:30 does not exist)."""
    before = datetime(2024, 3, 10, 6, 30)
    after = datetime(2024, 3, 10, 7, 30)
    tz = "America/New_York"
    assert _one(spark, local_hour(F.col("ts"), tz), ts=before) == 1
    assert _one(spark, local_hour(F.col("ts"), tz), ts=after) == 3
    assert str(_one(spark, local_date(F.col("ts"), tz), ts=before)) == "2024-03-10"
    # UTC midnight-crossing: 2024-06-01 02:00 UTC is 2024-05-31 22:00 EDT
    late = datetime(2024, 6, 1, 2, 0)
    assert str(_one(spark, local_date(F.col("ts"), tz), ts=late)) == "2024-05-31"


def test_local_date_per_row_tz(spark):
    """tz as a Column: one query, several stations in different zones."""
    rows = [
        {"ts": datetime(2024, 6, 1, 2, 0), "tz": "America/New_York"},
        {"ts": datetime(2024, 6, 1, 2, 0), "tz": "UTC"},
        {"ts": datetime(2024, 6, 1, 2, 0), "tz": "Asia/Tokyo"},
    ]
    df = spark.createDataFrame(rows)
    got = [
        str(r["d"])
        for r in df.select(local_date(F.col("ts"), F.col("tz")).alias("d"))
        .orderBy("tz")
        .collect()
    ]
    # America/New_York < Asia/Tokyo < UTC lexically
    assert got == ["2024-05-31", "2024-06-01", "2024-06-01"]


def test_lead_hours_reference_semantics(spark):
    """Matches _compute_lead_hours: target midnight in station zone,
    floor of the hour difference, clamped at 0."""
    tz = "America/New_York"
    # issue 2024-06-01 00:00 UTC; target 2024-06-02 → midnight EDT is
    # 2024-06-02 04:00 UTC → 28 hours
    got = _one(
        spark,
        lead_hours(F.col("issue"), F.col("target"), tz),
        issue=datetime(2024, 6, 1, 0, 0),
        target=datetime(2024, 6, 2, 0, 0),
    )
    assert got == 28
    # floor: 30 minutes past the hour rounds down → 27
    got = _one(
        spark,
        lead_hours(F.col("issue"), F.col("target"), tz),
        issue=datetime(2024, 6, 1, 0, 30),
        target=datetime(2024, 6, 2, 0, 0),
    )
    assert got == 27
    # clamp: issue after target midnight → 0, never negative
    got = _one(
        spark,
        lead_hours(F.col("issue"), F.col("target"), tz),
        issue=datetime(2024, 6, 3, 12, 0),
        target=datetime(2024, 6, 2, 0, 0),
    )
    assert got == 0
