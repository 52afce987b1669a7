"""Column-expression validators executed as ONE aggregated pass.

The reference validates eagerly per rule with pandas boolean masks
(`src/tempdata/schemas/validate.py:39-482`, 10 generic validators) and
reports the failing count + first-5 failing rows. Here every rule for
a table is compiled into a single `agg(sum(when(violation,1)))` pass —
one job over the data regardless of rule count — and only on failure
do we run a second `limit(5)` job to sample offending rows.

At 100 TB this matters: validation cost is one scan (predicate
columns only, pruned at the parquet reader), not one scan per rule.

Uniqueness (`require_unique`) is inherently an aggregation, so it is
its own `groupBy(keys).count() > 1` check, also one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.schemas import qc_flags as qc


class SchemaValidationError(ValueError):
    """Raised with dataset name, rule, failing count and sample rows."""


# ---------------------------------------------------------------------------
# Structural checks (no data pass)
# ---------------------------------------------------------------------------


def require_columns(df: DataFrame, required: list[str], dataset: str) -> None:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise SchemaValidationError(
            f"[{dataset}] missing required columns: {missing}; has {df.columns}"
        )


# ---------------------------------------------------------------------------
# Row-predicate checks, batched into one aggregation
# ---------------------------------------------------------------------------


def violation_checks(df: DataFrame, checks: list[tuple[str, Column]], dataset: str) -> None:
    """Run all (rule_name, is_violation_column) checks in one pass.

    Raises SchemaValidationError naming every failing rule, with ≤5
    sample rows for the first one (mirrors the reference's error
    ergonomics, `validate.py:18-36`, without an O(n) collect).
    """
    if not checks:
        return
    counts = df.agg(
        *[F.sum(F.when(c, 1).otherwise(0)).alias(name) for name, c in checks]
    ).first()
    failed = [(name, counts[name]) for name, _ in checks if (counts[name] or 0) > 0]
    if not failed:
        return
    first_rule = failed[0][0]
    first_col = dict(checks)[first_rule]
    sample = df.filter(first_col).limit(5).collect()
    raise SchemaValidationError(
        f"[{dataset}] {len(failed)} rule(s) failed: "
        + "; ".join(f"{n} ({c} rows)" for n, c in failed)
        + f"; first offending rows for '{first_rule}': {[r.asDict() for r in sample]}"
    )


def require_unique(df: DataFrame, keys: list[str], dataset: str) -> None:
    """Key-uniqueness as an aggregation (reference validate.py:158-192)."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .limit(5)
        .collect()
    )
    if dups:
        raise SchemaValidationError(
            f"[{dataset}] duplicate keys on {keys}: {[r.asDict() for r in dups]}"
        )


# -- check-column builders (each returns an is-violation Column) --


def null_check(col: str) -> tuple[str, Column]:
    return (f"no_nulls[{col}]", F.col(col).isNull())


def range_check(col: str, lo: float, hi: float, nullable: bool = True) -> tuple[str, Column]:
    v = (F.col(col) < lo) | (F.col(col) > hi)
    if nullable:
        v = F.col(col).isNotNull() & v
    return (f"range[{col}∈[{lo},{hi}]]", v)


def nonneg_check(col: str) -> tuple[str, Column]:
    return (f"nonnegative[{col}]", F.col(col).isNotNull() & (F.col(col) < 0))


def close_check(col_f: str, col_c: str, tol: float = 0.2) -> tuple[str, Column]:
    """C/F consistency: |f − (c·9/5+32)| ≤ tol (reference validate.py:373-425)."""
    return (
        f"close[{col_f}≈{col_c}*9/5+32±{tol}]",
        F.abs(F.col(col_f) - (F.col(col_c) * 9 / 5 + 32)) > tol,
    )


# ---------------------------------------------------------------------------
# Per-table composite validators
# ---------------------------------------------------------------------------


def validate_hourly_obs(
    df: DataFrame, check_unique: bool = True, check_temp_range: bool = True
) -> None:
    """Reference hourly_obs.py:77-123.

    ``check_temp_range=False`` mirrors the clean stage's lighter input
    validation (`clean_hourly.py:145-177`): structure and types but not
    temp range — fixing out-of-range temps is the clean stage's job.
    """
    from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_FIELDS

    ds = "hourly_obs"
    require_columns(df, HOURLY_OBS_FIELDS, ds)
    checks = [
        null_check("ts_utc"),
        null_check("station_id"),
        null_check("source"),
        null_check("qc_flags"),
        range_check("lat", -90, 90),
        range_check("lon", -180, 180),
        nonneg_check("qc_flags"),
    ]
    if check_temp_range:
        checks.insert(4, range_check("temp_c", -90, 60))
    violation_checks(df, checks, ds)
    if check_unique:
        require_unique(df, ["ts_utc", "station_id"], ds)


def validate_daily_tmax(df: DataFrame) -> None:
    """Reference daily_tmax.py:77-134 (incl. C/F closeness ≤ 0.2)."""
    from temp_data_pipeline_spark.schemas.tables import DAILY_TMAX_FIELDS

    ds = "daily_tmax"
    require_columns(df, DAILY_TMAX_FIELDS, ds)
    violation_checks(
        df,
        [
            null_check("date_local"),
            null_check("station_id"),
            null_check("tmax_c"),
            null_check("tmax_f"),
            null_check("updated_at_utc"),
            range_check("tmax_c", -90, 60),
            range_check("tmax_f", -130, 140),
            range_check("coverage_hours", 0, 24, nullable=False),
            nonneg_check("qc_flags"),
            close_check("tmax_f", "tmax_c", 0.2),
        ],
        ds,
    )
    require_unique(df, ["date_local", "station_id"], ds)


def validate_daily_tmax_forecast(df: DataFrame) -> None:
    """Reference daily_tmax_forecast.py:77-134."""
    from temp_data_pipeline_spark.schemas.tables import DAILY_TMAX_FORECAST_FIELDS

    ds = "daily_tmax_forecast"
    require_columns(df, DAILY_TMAX_FORECAST_FIELDS, ds)
    violation_checks(
        df,
        [
            null_check("station_id"),
            null_check("issue_time_utc"),
            null_check("target_date_local"),
            range_check("tmax_pred_c", -90, 60),
            range_check("tmax_pred_f", -130, 140),
            range_check("lead_hours", -24, 720, nullable=False),
            range_check("lat", -90, 90),
            range_check("lon", -180, 180),
            close_check("tmax_pred_f", "tmax_pred_c", 0.2),
        ],
        ds,
    )
    require_unique(df, ["station_id", "issue_time_utc", "target_date_local"], ds)


def validate_train_daily_tmax(df: DataFrame, allow_warmup_nulls: bool = True) -> None:
    """Reference train_daily_tmax.py:126-210."""
    from temp_data_pipeline_spark.schemas.tables import TRAIN_DAILY_TMAX_FIELDS

    ds = "train_daily_tmax"
    require_columns(df, TRAIN_DAILY_TMAX_FIELDS, ds)
    checks = [
        null_check("station_id"),
        null_check("issue_time_utc"),
        null_check("target_date_local"),
        null_check("tmax_pred_f"),
        null_check("tmax_actual_f"),
        range_check("sin_doy", -1, 1),
        range_check("cos_doy", -1, 1),
        range_check("month", 1, 12, nullable=False),
        range_check("bias_7d", -50, 50),
        range_check("bias_14d", -50, 50),
        range_check("bias_30d", -50, 50),
        range_check("rmse_14d", 0, 50),
        range_check("rmse_30d", 0, 50),
        range_check("sigma_lead", 0, 50),
        range_check("tmax_actual_f", -130, 140),
    ]
    if not allow_warmup_nulls:
        checks += [
            null_check(c)
            for c in ["bias_7d", "bias_14d", "bias_30d", "rmse_14d", "rmse_30d", "sigma_lead"]
        ]
    violation_checks(df, checks, ds)
    require_unique(df, ["station_id", "issue_time_utc", "target_date_local"], ds)


__all__ = [
    "SchemaValidationError",
    "require_columns",
    "require_unique",
    "violation_checks",
    "null_check",
    "range_check",
    "nonneg_check",
    "close_check",
    "validate_hourly_obs",
    "validate_daily_tmax",
    "validate_daily_tmax_forecast",
    "validate_train_daily_tmax",
    "qc",
]


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity violations: child rows whose key has NO
    matching parent — the FK audit a warehouse runs after every load.
    One left-anti join on the key (parent side carries only its key
    column, so nothing but keys shuffles; broadcast under AQE when
    the parent key set is small). SQL FK semantics: a NULL child key
    is NOT a violation (MATCH SIMPLE), so NULL-key rows are excluded
    — a plain anti-join would report them, since NULL never equals a
    parent key. Returns the orphan child rows unchanged; aggregate
    downstream for a report."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )
