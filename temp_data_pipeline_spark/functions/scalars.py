"""Scalar column functions — the engine's counterpart of the
reference's inline conversion/parse helpers (SURVEY §2.9).

All pure Column expressions over built-in pyspark.sql.functions:
JVM-side, codegen-friendly, usable in both batch and streaming plans.
Reference parity targets are cited per function (file:line in
kyler505/temp-data-pipeline).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- unit conversions (F1, F2) ----------------------------------------------


def c_to_f(c: Column | str) -> Column:
    """Celsius → Fahrenheit. Ref: aggregate/build_daily_tmax.py:29-31."""
    return _c(c) * 9.0 / 5.0 + 32.0


def k_to_c(k: Column | str) -> Column:
    """Kelvin → Celsius. Ref: fetch/era5_hourly.py:292,332."""
    return _c(k) - 273.15


def rnd(col: Column | str, dp: int = 2) -> Column:
    """Half-up decimal rounding via the floor formula — identical
    bits in Spark and DuckDB (ROUND differs between them on x.xx5
    boundaries; see plans/declared.py)."""
    scale = float(10**dp)
    return F.floor(_c(col) * scale + F.lit(0.5)) / scale


# -- timezone / calendar (F3–F5) --------------------------------------------


def utc_to_local(ts: Column | str, tz: Column | str) -> Column:
    """UTC instant → local wall-clock time. tz may be a per-row Column,
    so multi-station frames with different zones work in one query.
    Ref: aggregate/build_daily_tmax.py:68."""
    tzc = F.lit(tz) if isinstance(tz, str) else tz
    return F.from_utc_timestamp(_c(ts), tzc)


def local_date(ts: Column | str, tz: Column | str) -> Column:
    """Local calendar date of a UTC instant (F4).
    Ref: aggregate/build_daily_tmax.py:69."""
    return F.to_date(utc_to_local(ts, tz))


def local_hour(ts: Column | str, tz: Column | str) -> Column:
    """Local hour-of-day of a UTC instant (F5) — coverage counting.
    Ref: aggregate/build_daily_tmax.py:82."""
    return F.hour(utc_to_local(ts, tz))


# -- seasonal encodings (F7, F13) -------------------------------------------


def doy_sin(date_col: Column | str, period: float = 365.25) -> Column:
    """sin(2π·doy/period). The reference uses 365.25 in the feature
    builder (features/build_train_daily_tmax.py:118) but 365 in the
    eval fallback (eval/data.py:212) — pass period explicitly."""
    return F.sin(F.lit(2.0 * math.pi) * F.dayofyear(_c(date_col)) / F.lit(period))


def doy_cos(date_col: Column | str, period: float = 365.25) -> Column:
    return F.cos(F.lit(2.0 * math.pi) * F.dayofyear(_c(date_col)) / F.lit(period))


def season_of(month_col: Column | str) -> Column:
    """Month → meteorological season DJF/MAM/JJA/SON.
    Ref: eval/slicing.py:87-95."""
    m = _c(month_col)
    return (
        F.when(m.isin(12, 1, 2), F.lit("DJF"))
        .when(m.isin(3, 4, 5), F.lit("MAM"))
        .when(m.isin(6, 7, 8), F.lit("JJA"))
        .otherwise(F.lit("SON"))
    )


# -- raw-feed parsers (F9–F11) ----------------------------------------------


def isd_parse_temp(raw: Column | str) -> Column:
    """NOAA ISD TMP field → °C. Format "+0150,1": first comma part is
    tenths-°C; empty/unparseable/|x|≥9990 → null; else value/10.
    Ref: fetch/noaa_hourly.py:135-163."""
    part = F.trim(F.split(_c(raw), ",").getItem(0))
    v = part.try_cast("double")
    return F.when(part == "", F.lit(None).cast("double")).otherwise(
        F.when(F.abs(v) >= 9990.0, F.lit(None).cast("double")).otherwise(v / 10.0)
    )


def ghcnh_parse_temp(raw: Column | str) -> Column:
    """GHCNh temperature field → °C. Tenths-°C; empty/"-9999"/
    unparseable/outside (−9990, 9990) → null.
    Ref: fetch/noaa_hourly.py:166-190."""
    s = F.trim(_c(raw))
    v = s.try_cast("double")
    return F.when(
        (s == "") | (s == "-9999"), F.lit(None).cast("double")
    ).otherwise(
        F.when((v <= -9990.0) | (v >= 9990.0), F.lit(None).cast("double")).otherwise(
            v / 10.0
        )
    )


def ts_parse_utc(raw: Column | str, fmt: str | None = None) -> Column:
    """Timestamp parse with null on failure (pandas errors="coerce"
    equivalent). Ref: fetch/noaa_hourly.py:206,230,271,305.

    The no-format path uses the native string→timestamp cast (ISO-8601
    variants, space or T separator) rather than try_to_timestamp's
    DateTimeFormatter: same accepted inputs for the feeds involved,
    ~5× faster, and identical to DuckDB's TRY_CAST in the oracle."""
    c = _c(raw)
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else c.try_cast("timestamp")


# -- forecast lead time (F12) -----------------------------------------------


def lead_hours(
    issue_time_utc: Column | str, target_date: Column | str, tz: Column | str
) -> Column:
    """floor((UTC instant of target-date midnight in tz − issue)/3600),
    clamped ≥ 0. Ref: fetch/openmeteo_daily_forecast.py:30-54."""
    tzc = F.lit(tz) if isinstance(tz, str) else tz
    target_midnight_utc = F.to_utc_timestamp(
        _c(target_date).cast("timestamp"), tzc
    )
    delta = F.unix_timestamp(target_midnight_utc) - F.unix_timestamp(
        _c(issue_time_utc)
    )
    return F.greatest(F.floor(delta / 3600.0).cast("long"), F.lit(0).cast("long"))


# -- QC bitmask helpers (F8) ------------------------------------------------


def has_flag(qc: Column | str, flag: int) -> Column:
    """(qc & flag) != 0. Ref: clean/clean_hourly.py:59,208."""
    return _c(qc).bitwiseAND(F.lit(flag)) != 0


def or_flag(qc: Column | str, flag: int, when_mask: Column | None = None) -> Column:
    """qc | flag, optionally only where `when_mask` holds (the
    reference's df.loc[mask, "qc_flags"] |= FLAG idiom,
    clean/clean_hourly.py:59)."""
    qc_col = _c(qc)
    flagged = qc_col.bitwiseOR(F.lit(flag))
    if when_mask is None:
        return flagged
    return F.when(when_mask, flagged).otherwise(qc_col)
