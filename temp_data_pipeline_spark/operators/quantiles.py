"""Exact and approximate percentiles (SURVEY §2.12 A10 scale posture).

Two tiers, deliberately:

- **exact** — Spark's `percentile` (interpolating, identical to
  DuckDB `quantile_cont` and np.percentile). This is the oracle tier:
  q_quantile / q_quantile_group and the regime cut points in
  eval/slicing.py use it so results hash-match the reference math.
  Cost: the aggregate buffers EVERY value per group in executor
  memory — fine at eval scale, a memory hazard on a 100 TB fact
  column.

- **approx** — `percentile_approx` (the Greenwald-Khanna sketch;
  reference: Greenwald & Khanna, SIGMOD'01). Bounded memory
  (O(accuracy) per group) and a guaranteed RANK error: the returned
  value's true rank is within n/accuracy of the requested one. At the
  default accuracy=10000 that is ±0.01 % of rows — e.g. on a 1 B-row
  group the value returned for p50 sits between p49.99 and p50.01.
  VALUE error follows from rank error through the local density, so
  wide flat distributions stay tight while heavy tails widen — which
  is why the bound is stated (and tested) in rank space.

Production guidance: exact for small/eval frames and oracle parity;
approx for interactive/production percentiles over big fact tables.
`tests/test_quantiles.py` pins both tiers against each other at the
bench scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ACCURACY = 10_000


def quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    by: list[str] | None = None,
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Percentiles of `value_col` at `probs`, optionally per `by`
    group. One aggregation pass either way; `exact` selects the tier
    (see module docstring for the memory/error trade)."""
    pa = F.array(*[F.lit(float(p)) for p in probs])
    if exact:
        agg = F.percentile(F.col(value_col), pa)
    else:
        agg = F.percentile_approx(F.col(value_col), pa, F.lit(accuracy))
    out_cols = [
        F.element_at(F.col("_q"), i + 1).alias(f"q{str(p).replace('.', '_')}")
        for i, p in enumerate(probs)
    ]
    if by:
        return (
            df.groupBy(*by).agg(agg.alias("_q")).select(*by, *out_cols)
        )
    return df.agg(agg.alias("_q")).select(*out_cols)
