"""Cardinality sketches: exact vs HyperLogLog++ distinct counts.

Same two-tier posture as operators/quantiles.py:

- **exact** — `count_distinct`: a full distinct shuffle per group;
  the oracle tier (DuckDB COUNT(DISTINCT ...) matches exactly).
- **approx** — `approx_count_distinct` (HyperLogLog++, Heule et al.
  2013): fixed O(2^p) registers per group, mergeable map-side, one
  normal aggregation shuffle. `rsd` is the target relative standard
  deviation (default 5 %; Spark sizes p ≈ log2((1.106/rsd)²)). At
  100 TB an exact distinct over a high-cardinality key is a full
  repartition of the fact table; the sketch is a constant-size
  accumulator.

tests/test_quantiles.py pins the approx tier inside its documented
error envelope at the bench scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_count(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct values of `value_col`, optionally per `by` group,
    as column `n_distinct`. `exact` picks the tier."""
    agg = (
        F.count_distinct(F.col(value_col))
        if exact
        else F.approx_count_distinct(value_col, rsd)
    ).alias("n_distinct")
    if by:
        return df.groupBy(*by).agg(agg)
    return df.agg(agg)
