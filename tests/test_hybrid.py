"""Hybrid multi-source union: windowing, cutover exclusivity, schema
drift tolerance, and filter pushdown above each scan."""

from __future__ import annotations

from datetime import date

import pytest

from temp_data_pipeline_spark.sources.hybrid import (
    SourceWindow,
    hybrid_truth,
    union_sources,
)


def _daily(spark, dates, source, extra_col=False):
    rows = [
        (date.fromisoformat(d), "KLGA", 20.0, source) + ((1,) if extra_col else ())
        for d in dates
    ]
    schema = "date_local date, station_id string, tmax_c double, source string"
    if extra_col:
        schema += ", provenance int"
    return spark.createDataFrame(rows, schema)


def test_cutover_is_half_open(spark):
    isd = _daily(spark, ["2025-08-27", "2025-08-28", "2025-08-29"], "isd")
    ghcnh = _daily(spark, ["2025-08-28", "2025-08-29", "2025-08-30"], "ghcnh")
    out = hybrid_truth(isd, ghcnh, cutover="2025-08-29")
    got = {(str(r["date_local"]), r["source"]) for r in out.collect()}
    # isd strictly before the cutover, ghcnh from the cutover on
    assert got == {
        ("2025-08-27", "isd"),
        ("2025-08-28", "isd"),
        ("2025-08-29", "ghcnh"),
        ("2025-08-30", "ghcnh"),
    }


def test_schema_drift_tolerated(spark):
    a = _daily(spark, ["2024-01-01"], "isd", extra_col=True)
    b = _daily(spark, ["2024-01-02"], "ghcnh")
    out = union_sources(
        [SourceWindow(a), SourceWindow(b)], "date_local"
    )
    rows = {r["source"]: r for r in out.collect()}
    assert rows["isd"]["provenance"] == 1
    assert rows["ghcnh"]["provenance"] is None


def test_empty_sources_rejected(spark):
    with pytest.raises(ValueError):
        union_sources([], "date_local")


def test_window_filters_push_to_each_scan(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    _daily(spark, ["2024-01-01", "2024-06-01"], "isd").write.parquet(p1)
    _daily(spark, ["2024-06-01", "2024-12-01"], "ghcnh").write.parquet(p2)
    out = union_sources(
        [
            SourceWindow(spark.read.parquet(p1), end="2024-06-01"),
            SourceWindow(spark.read.parquet(p2), start="2024-06-01"),
        ],
        "date_local",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one pushed range predicate per source scan
    assert plan.count("PushedFilters: [IsNotNull(date_local)") == 2
    assert out.count() == 3
