"""Hybrid multi-source loads (SURVEY §2.8 U2).

The reference stitches eras of different feeds with per-source date
windows: forecasts = ERA5(<2016) ∪ Open-Meteo(≥2016), truth =
ISD(< 2025-08-29) ∪ GHCNh(≥) — scripts/eval_daily_tmax.py:208-324 and
the hybrid fetch in fetch/noaa_hourly.py:506-529. Here that is one
generic combinator over (frame, window) pairs: filter each source to
its half-open [start, end) window on a date column, then
unionByName(allowMissingColumns) so schema drift between feeds (extra
provenance columns etc.) doesn't break the union.

Scale: the per-source filters sit directly above each scan (predicate
pushdown → partition pruning per feed); the union is a no-shuffle
narrow op.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SourceWindow:
    df: DataFrame
    start: str | None = None  # inclusive ISO date, None = open
    end: str | None = None  # exclusive ISO date, None = open


def union_sources(
    sources: list[SourceWindow], date_col: str
) -> DataFrame:
    """Window each source on `date_col` then union by name."""
    if not sources:
        raise ValueError("union_sources needs at least one source")
    parts = []
    for s in sources:
        df = s.df
        if s.start is not None:
            df = df.filter(F.col(date_col) >= F.lit(s.start).cast("date"))
        if s.end is not None:
            df = df.filter(F.col(date_col) < F.lit(s.end).cast("date"))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def hybrid_truth(
    isd_daily: DataFrame,
    ghcnh_daily: DataFrame,
    cutover: str = "2025-08-29",
    date_col: str = "date_local",
) -> DataFrame:
    """ISD before the cutover date, GHCNh after (reference
    scripts/eval_daily_tmax.py:262-324)."""
    return union_sources(
        [
            SourceWindow(isd_daily, end=cutover),
            SourceWindow(ghcnh_daily, start=cutover),
        ],
        date_col,
    )


def hybrid_forecasts(
    era5_fc: DataFrame,
    openmeteo_fc: DataFrame,
    cutover: str = "2016-01-01",
    date_col: str = "target_date_local",
) -> DataFrame:
    """ERA5-derived pseudo-forecasts before 2016, Open-Meteo after
    (reference scripts/eval_daily_tmax.py:208-260)."""
    return union_sources(
        [
            SourceWindow(era5_fc, end=cutover),
            SourceWindow(openmeteo_fc, start=cutover),
        ],
        date_col,
    )
