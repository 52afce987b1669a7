"""Table statistics (ANALYZE): per-column null count, exact NDV,
min/max — the inputs a cost-based optimizer, data-skipping layer, or
data-quality monitor reads.

One distributed pass: every column's aggregates run in a single
``agg`` (Catalyst rewrites the multiple DISTINCT aggregates into one
Expand + two-stage hash aggregation — one logical scan, not one scan
per column), and the 1-row result is unpivoted into per-column rows
with ``stack``. min/max are computed on the NATIVE type and cast to
string only for the report (string-casting first would order numbers
lexicographically: min("10") < min("9")).

Exact NDV is the default because the driver contract is hash-exact;
``approx=True`` swaps in HyperLogLog++ (`approx_count_distinct`) —
the 100 TB tier, one ordinary aggregation, ~1.6%/rsd error — same
exact/approx pairing as operators/quantiles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["analyze_table"]


def analyze_table(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.016,
) -> DataFrame:
    """Per-column statistics of ``df`` (all columns by default).

    Returns one row per analyzed column:
    (col_name, n_rows, n_null, n_distinct, min_s, max_s) — min/max as
    strings so mixed-type tables report through one schema; NULL
    min/max for all-null columns. n_distinct counts non-null values.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nu{i}")
        )
        nd = (
            F.approx_count_distinct(col, rsd)
            if approx
            else F.count_distinct(col)
        )
        aggs.append(nd.cast("long").alias(f"_nd{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_mn{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_mx{i}"))
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"_nu{i}"),
                F.col(f"_nd{i}"),
                F.col(f"_mn{i}"),
                F.col(f"_mx{i}"),
            ]
        )
    return one.select(
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("col_name", "n_null", "n_distinct", "min_s", "max_s"),
        F.col("_n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
