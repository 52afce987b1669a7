"""Clean-stage goldens, mirroring reference tests/test_clean_hourly semantics."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from temp_data_pipeline_spark.operators.clean_hourly import clean_hourly_obs
from temp_data_pipeline_spark.schemas import qc_flags as qc
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_SCHEMA
from temp_data_pipeline_spark.schemas.validate import SchemaValidationError

T0 = datetime(2024, 7, 1, 0, 0, tzinfo=timezone.utc)


def make_hourly(spark, rows):
    """rows: list of (hour_offset, temp_c, qc, source)."""
    data = [
        (T0 + timedelta(hours=h), "KLGA", 40.78, -73.87, t, src, q)
        for h, t, q, src in rows
    ]
    return spark.createDataFrame(data, HOURLY_OBS_SCHEMA)


def by_ts(df):
    # collect() returns tz-naive datetimes in the (UTC) session tz
    return {
        (r.ts_utc.replace(tzinfo=timezone.utc), r.station_id): r for r in df.collect()
    }


def test_dedup_keeps_first_by_tie_breaker(spark):
    df = make_hourly(
        spark,
        [(0, 20.0, 0, "a_first"), (0, 99.0, 0, "b_second"), (1, 21.0, 0, "a_first")],
    )
    out = clean_hourly_obs(df, tie_breaker="source")
    rows = by_ts(out)
    assert len(rows) == 2
    assert rows[(T0, "KLGA")].temp_c == 20.0  # first by tie-breaker kept


def test_missing_value_flagged_not_dropped(spark):
    df = make_hourly(spark, [(0, 20.0, 0, "x"), (1, None, 0, "x")])
    out = by_ts(clean_hourly_obs(df))
    assert len(out) == 2
    assert out[(T0 + timedelta(hours=1), "KLGA")].qc_flags & qc.QC_MISSING_VALUE
    assert not out[(T0, "KLGA")].qc_flags


def test_out_of_range_flagged_and_nullified(spark):
    df = make_hourly(spark, [(0, 20.0, 0, "x"), (1, 99.0, 0, "x"), (2, -95.0, 0, "x")])
    out = by_ts(clean_hourly_obs(df))
    hot = out[(T0 + timedelta(hours=1), "KLGA")]
    cold = out[(T0 + timedelta(hours=2), "KLGA")]
    assert hot.qc_flags & qc.QC_OUT_OF_RANGE and hot.temp_c is None
    assert cold.qc_flags & qc.QC_OUT_OF_RANGE and cold.temp_c is None
    assert out[(T0, "KLGA")].temp_c == 20.0


def test_spike_flagged_on_jump(spark):
    df = make_hourly(spark, [(0, 20.0, 0, "x"), (1, 40.0, 0, "x"), (2, 41.0, 0, "x")])
    out = by_ts(clean_hourly_obs(df))
    assert out[(T0 + timedelta(hours=1), "KLGA")].qc_flags & qc.QC_SPIKE_DETECTED
    assert not out[(T0, "KLGA")].qc_flags  # first row: no previous → no flag
    assert not out[(T0 + timedelta(hours=2), "KLGA")].qc_flags


def test_spike_not_flagged_across_null_gap(spark):
    # null between 20 and 40: delta vs null is null → no flag (pandas NaN diff)
    df = make_hourly(spark, [(0, 20.0, 0, "x"), (1, None, 0, "x"), (2, 40.0, 0, "x")])
    out = by_ts(clean_hourly_obs(df))
    assert not out[(T0 + timedelta(hours=2), "KLGA")].qc_flags & qc.QC_SPIKE_DETECTED


def test_spike_after_oor_nullify(spark):
    # 99 °C is nullified by OOR first, so it can't create a spike pair
    df = make_hourly(spark, [(0, 20.0, 0, "x"), (1, 99.0, 0, "x"), (2, 21.0, 0, "x")])
    out = by_ts(clean_hourly_obs(df))
    assert not out[(T0 + timedelta(hours=2), "KLGA")].qc_flags & qc.QC_SPIKE_DETECTED


def test_stations_isolated_for_spikes(spark):
    rows = [
        (T0, "AAA", 40.0, -73.0, 20.0, "x", 0),
        (T0 + timedelta(hours=1), "BBB", 41.0, -74.0, 40.0, "x", 0),
    ]
    df = spark.createDataFrame(rows, HOURLY_OBS_SCHEMA)
    out = clean_hourly_obs(df)
    assert all(r.qc_flags == 0 for r in out.collect())


def test_idempotent_after_first_reclean(spark):
    # Exactly like the reference: an OOR row is nullified on pass 1, so
    # pass 2 additionally flags it QC_MISSING_VALUE; from pass 2 on the
    # output is a fixed point.
    df = make_hourly(spark, [(0, 20.0, 0, "x"), (1, 99.0, 0, "x"), (1, 21.0, 0, "y")])
    twice = clean_hourly_obs(clean_hourly_obs(df))
    thrice = clean_hourly_obs(twice)
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, thrice.collect()))


def test_input_validation_rejects_negative_flags(spark):
    df = make_hourly(spark, [(0, 20.0, -1, "x")])
    with pytest.raises(SchemaValidationError, match="nonnegative"):
        clean_hourly_obs(df)
