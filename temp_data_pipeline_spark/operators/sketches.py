"""Cardinality and frequency sketches: exact tiers with mergeable
approximate counterparts.

Same two-tier posture as operators/quantiles.py:

- **exact** — `count_distinct` / full groupBy-count: the oracle tier
  (DuckDB COUNT(DISTINCT ...) / GROUP BY matches exactly).
- **approx** — `approx_count_distinct` (HyperLogLog++, Heule et al.
  2013): fixed O(2^p) registers per group, mergeable map-side, one
  normal aggregation shuffle. `rsd` is the target relative standard
  deviation (default 5 %; Spark sizes p ≈ log2((1.106/rsd)²)). At
  100 TB an exact distinct over a high-cardinality key is a full
  repartition of the fact table; the sketch is a constant-size
  accumulator.
- **frequency** — a Count-Min sketch (Cormode & Muthukrishnan 2005)
  materialized as a (depth × width) counter TABLE built with one
  explode + keyed sum: mergeable by construction (counters add), at
  most depth·width rows regardless of input size, never
  underestimates, overestimates by ≤ e·N/width with probability
  1 − e^−depth. The heavy-hitter pattern at 100 TB: full groupBy on a
  power-law key skews the exchange; the sketch bounds state and the
  exact tier confirms the (tiny) candidate set.

tests/test_quantiles.py pins the approx tiers inside their documented
error envelopes at the bench scale factor.
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


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Count-Min sketch of `value_col` as a (depth, pos, c) counter
    table: row d hashes every value with xxhash64(seed+d, v) mod
    width, and c sums occurrences landing in that cell.

    One explode(depth structs) + one keyed sum — the shuffle carries
    at most depth·width rows per upstream partition (map-side partial
    aggregation collapses cells first), so sketch cost is independent
    of input cardinality. Two sketches with the same (depth, width,
    seed) merge by adding c on (depth, pos) — the incremental-
    maintenance property groupBy-count lacks."""
    layers = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("depth"),
                F.pmod(
                    F.xxhash64(F.lit(seed + d), F.col(value_col).cast("string")),
                    F.lit(width),
                )
                .cast("int")
                .alias("pos"),
            )
            for d in range(depth)
        ]
    )
    ex = df.select(F.explode(layers).alias("_s")).select("_s.depth", "_s.pos")
    return ex.groupBy("depth", "pos").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate counts for `candidates` rows from a cms_build
    sketch: min over depth rows of the addressed counters (absent
    cell ⇒ 0). Emits the candidate columns + `est` (never below the
    true count). The sketch side is ≤ depth·width rows, so Catalyst
    broadcasts it — the probe is shuffle-free on the candidate side."""
    probes = candidates.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("depth"),
                        F.pmod(
                            F.xxhash64(F.lit(seed + d), F.col(value_col).cast("string")),
                            F.lit(width),
                        )
                        .cast("int")
                        .alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_p"),
    ).select("*", "_p.depth", "_p.pos").drop("_p")
    joined = probes.join(F.broadcast(sketch), ["depth", "pos"], "left").withColumn(
        "_c", F.coalesce(F.col("c"), F.lit(0))
    )
    keys = [c for c in candidates.columns]
    return joined.groupBy(*keys).agg(F.min("_c").cast("long").alias("est"))


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 25,
    by_count: str = "cnt",
) -> DataFrame:
    """Exact global top-k values by occurrence count: one keyed
    aggregation (map-side partials collapse repeats before the
    exchange) + TakeOrdered on (count DESC, value ASC) — k rows to
    the driver, never a global sort. The oracle tier the CMS estimate
    is checked against."""
    return (
        df.groupBy(value_col)
        .agg(F.count(F.lit(1)).alias(by_count))
        .orderBy(F.desc(by_count), F.col(value_col))
        .limit(k)
    )
