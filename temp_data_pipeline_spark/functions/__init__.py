"""Scalar function library (SURVEY §2.9 F1–F16)."""

from temp_data_pipeline_spark.functions.scalars import (
    c_to_f,
    doy_cos,
    doy_sin,
    ghcnh_parse_temp,
    has_flag,
    isd_parse_temp,
    k_to_c,
    lead_hours,
    local_date,
    local_hour,
    or_flag,
    rnd,
    season_of,
    ts_parse_utc,
    utc_to_local,
)

__all__ = [
    "c_to_f",
    "doy_cos",
    "doy_sin",
    "ghcnh_parse_temp",
    "has_flag",
    "isd_parse_temp",
    "k_to_c",
    "lead_hours",
    "local_date",
    "local_hour",
    "or_flag",
    "rnd",
    "season_of",
    "ts_parse_utc",
    "utc_to_local",
]
