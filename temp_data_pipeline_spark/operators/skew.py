"""Skew mitigation: salted two-stage aggregation.

A groupBy on a zipf-distributed key sends every row of the hot key to
one reducer; at 100 TB that single task is the job's wall clock. The
standard fix is salting: scatter each key over N buckets, aggregate
partially per (key, salt), then merge the N partials per key. Both
stages shuffle, but no task ever sees more than ~1/N of the hot key.

Spark's own map-side partial aggregation already handles *moderate*
skew (each input partition pre-combines before the exchange); explicit
salting is for aggregation states too large to pre-combine (e.g.
collect_set/countDistinct states, or joins — for joins prefer AQE's
skewJoin, which the session enables by default).

Only algebraic aggregates decompose this way; the supported kinds and
their merge functions:

    count → sum of partial counts        sum → sum of partial sums
    max   → max of partial maxes         min → min of partial mins
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "max": lambda c: F.max(c),
    "min": lambda c: F.min(c),
}
_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: list[tuple[str, str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    measures: (output_name, input_col, kind) with kind in
    count|sum|max|min. ``("n", "*", "count")`` counts rows.
    Result is identical to ``df.groupBy(keys).agg(...)`` — pinned by
    the q_skew_agg oracle query.
    """
    for _, _, kind in measures:
        if kind not in _PARTIAL:
            raise ValueError(f"unsupported salted aggregate kind: {kind}")

    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _PARTIAL[kind](F.lit(1) if col == "*" else F.col(col)).alias(f"_p_{name}")
                for name, col, kind in measures
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[kind](F.col(f"_p_{name}")).alias(name)
            for name, _, kind in measures
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by salting: the (large, skewed) left side
    scatters each key over `salt_buckets` sub-keys; the (smaller)
    right side replicates each row into every bucket. The join then
    shuffles on (key..., salt), so a hot key's rows spread over N
    tasks instead of one.

    Cost model: right side inflates ×N — use when right is modest but
    too large to broadcast, and left has pathological key skew. For
    moderate skew prefer AQE's skew-join (on by default in
    session.py), which splits oversized partitions without the
    replication cost; salting is the explicit fallback when a single
    KEY (not partition) exceeds what one task can hold.

    Result equals left.join(right, on, how) for inner/left joins —
    pinned by tests/test_skew.py.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    out = l_salted.join(r_salted, on + ["_salt"], how)
    return out.drop("_salt")
