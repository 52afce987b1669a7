"""Incremental rollup maintenance (continuous aggregates).

The hypertable/continuous-aggregate pattern: a 100 TB fact stream
must not be rescanned to refresh a daily rollup — instead the rollup
is stored as MERGEABLE partial aggregates, and each new batch folds
in with one keyed shuffle over (existing rollup ∪ new partials):

    rollup(all data) == merge(rollup(batch₁), ..., rollup(batchₙ))

Mergeable forms used here:
- sum/count → sum (count re-merges as a sum of counts)
- max/min   → max/min
- bit_or    → bit_or
- distinct-hour coverage → an HOUR BITMASK: bit h set when hour h was
  seen. bit_or-mergeable where a distinct count is not, and
  `bit_count(mask)` recovers the coverage number exactly. (This is
  why `daily_tmax_partial` carries `hours_mask`, not
  `coverage_hours`: the reference's countDistinct(hour) — SURVEY
  §2.5 A3 — is not incrementally mergeable, the mask is.)
- avg → carry (sum, count), divide at read time.

`merge_rollups` is the general fold; `daily_tmax_partial` /
`merge_daily_tmax` instantiate it for the pipeline's daily-Tmax
grain so late-arriving hourly files refresh only the days they touch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import c_to_f

_MERGERS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "bit_or": lambda c: F.expr(f"bit_or({c})"),
    "bit_and": lambda c: F.expr(f"bit_and({c})"),
}


def merge_rollups(
    parts: list[DataFrame], keys: list[str], mergers: dict[str, str]
) -> DataFrame:
    """Fold partial rollups into one: union → one keyed aggregation.
    `mergers` maps column → merge function name (sum/max/min/bit_or/
    bit_and). Every column must be in `keys` or `mergers`."""
    if not parts:
        raise ValueError("no rollups to merge")
    u = reduce(lambda a, b: a.unionByName(b), parts)
    bad = [c for c in u.columns if c not in keys and c not in mergers]
    if bad:
        raise ValueError(f"columns without a merger: {bad}")
    aggs = [_MERGERS[how](c).alias(c) for c, how in mergers.items()]
    return u.groupBy(*keys).agg(*aggs)


def daily_tmax_partial(hourly: DataFrame, tz: str = "UTC") -> DataFrame:
    """Per-(station, local day) partial aggregate of an hourly batch,
    in the mergeable form: max temp, hour bitmask, qc bit_or, row
    count. Valid rows follow operators/daily_tmax semantics (non-null
    temp; QC filtering stays with the caller's clean stage)."""
    local_ts = F.from_utc_timestamp(F.col("ts_utc"), tz)
    return (
        hourly.withColumn("_ld", F.to_date(local_ts))
        .withColumn("_lh", F.hour(local_ts))
        .groupBy(F.col("station_id"), F.col("_ld").alias("date_local"))
        .agg(
            F.max("temp_c").alias("tmax_c"),
            F.expr(
                "bit_or(CASE WHEN temp_c IS NOT NULL "
                "THEN shiftleft(CAST(1 AS LONG), _lh) ELSE 0 END)"
            ).alias("hours_mask"),
            F.expr("bit_or(qc_flags)").alias("qc_flags"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def merge_daily_tmax(parts: list[DataFrame]) -> DataFrame:
    """Merge daily partials (late files refresh only the days they
    touch) and derive the read-time columns: tmax_f and exact
    distinct-hour coverage from the mask."""
    merged = merge_rollups(
        parts,
        keys=["station_id", "date_local"],
        mergers={
            "tmax_c": "max",
            "hours_mask": "bit_or",
            "qc_flags": "bit_or",
            "n_rows": "sum",
        },
    )
    return merged.withColumn(
        "coverage_hours", F.bit_count(F.col("hours_mask"))
    ).withColumn(
        "tmax_f", F.floor(c_to_f("tmax_c") * 10.0 + F.lit(0.5)) / 10.0
    )


__all__ = ["daily_tmax_partial", "merge_daily_tmax", "merge_rollups"]
