"""Token-budget corpus selection: cut a weighted corpus down to a
training budget.

The last step of every data-curation funnel: given per-document
priorities (a DSIR importance weight, a classifier score, a quality
heuristic) and token counts, keep the best documents whose cumulative
token count fits the budget — "fill 15T tokens from the top of the
ranking". Semantics are the deterministic greedy PREFIX: documents
are taken in (weight desc, id asc) order while the running token
total stays within budget, and the first document that would
overflow ends the selection (no hole-filling knapsack — exactness
and replayability over the last fractional document).

A naive implementation is ``Window.orderBy(weight)`` with no
partition key — one task sorts the corpus. This uses the same
two-level prefix-sum shape as `chunk.pack_documents`, keyed on the
SORT ORDER instead of ids:

  1. bucket documents by weight range (descending buckets — order-
     preserving for the (weight desc) sort),
  2. within-bucket running token sums (parallel windows, one
     shuffle),
  3. per-bucket totals → cumulative bucket offsets (a window over
     n_buckets rows — tiny by construction),
  4. broadcast the offsets back, add, filter ``cum <= budget``.

Driver-side data: one (min, max) weight pair and the n_buckets-row
offset table — bounded regardless of corpus size. Weight-range
bucketing can be skewed when weights cluster; skew only imbalances
the within-bucket windows (step 2), never correctness. The worst
case — every document sharing ONE weight value — degrades to a
single window, the same documented degenerate as pack_documents
with a single id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_within_budget(
    df: DataFrame,
    budget: int,
    *,
    weight_col: str,
    token_col: str,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """The greedy budget prefix of ``df``: rows in (weight desc, id
    asc) order whose INCLUSIVE cumulative ``token_col`` is ≤
    ``budget``. Adds ``cum_tokens`` (the running total through this
    document); all input columns pass through."""
    if budget < 0:
        raise ValueError(f"negative budget {budget}")
    spark = df.sparkSession
    w, t = F.col(weight_col), F.col(token_col)

    bounds = df.agg(F.min(w).alias("lo"), F.max(w).alias("hi")).first()
    if bounds["lo"] is None:
        return df.withColumn("cum_tokens", t.cast("long")).limit(0)
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    B = n_buckets or spark.sparkContext.defaultParallelism * 4
    width = max((hi - lo) / B, 1e-12)
    # descending buckets: bucket 0 holds the HIGHEST weights, so
    # ascending bucket order == the selection order
    bucket = F.least(
        F.floor((F.lit(hi) - w) / F.lit(width)).cast("bigint"), F.lit(B)
    )

    w_in = (
        Window.partitionBy("_b")
        .orderBy(w.desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part = df.withColumn("_b", bucket).withColumn(
        "_cum_in", F.sum(t).over(w_in).cast("long")
    )

    # n_buckets rows — the single-partition window runs over the
    # bucket summary, never the data
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_b")
        .agg(F.sum(t).cast("long").alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)))
        .select("_b", "_off")
    )

    cum = (F.col("_off") + F.col("_cum_in")).cast("long")
    return (
        part.join(F.broadcast(offsets), "_b")
        .withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") <= budget)
        .drop("_b", "_cum_in", "_off")
    )
