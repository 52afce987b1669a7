"""Hashed linear quality-classifier scoring (fastText-style inference).

The production quality gate in LLM data pipelines (CCNet, LLaMA, GPT-3
"WebText-like" filtering) is a linear classifier over hashed bag-of-
words features: tokens hash into a fixed number of buckets (the
"hashing trick"), each bucket carries a learned weight, and a
document's score is the mean bucket weight of its tokens. Inference
at corpus scale is exactly the shape Spark is good at:

  tokenize map-side → bucket = md5-hash % dim (map) → broadcast join
  against the dim-sized weight table (map) → one shuffle keyed by
  document for the sum.

The weight table is tiny (dim ≤ a few million rows) and broadcast —
at 100 TB the only exchange is the per-document aggregation, and the
partial sums combine map-side. No Python touches the hot path.

Weights come from anywhere:
- ``train_log_odds`` — a one-pass distributed Naive-Bayes log-odds
  trainer over labeled documents (the classic seed-classifier recipe:
  label a quality corpus vs a crawl sample, train, score everything);
- ``hashed_weights`` — deterministic md5-derived pseudo-weights whose
  integer values both engines can recompute; the conformance query
  pins these so DuckDB replays scoring end to end.

Summation exactness: integer-VALUED weights (both generators above
quantize to integers; train_log_odds scales log-odds to integer
micro-nats like llm/lm.py) make the per-document double sum exact and
order-independent, so scores hash-compare across engines. Float
weights work too — scores then carry the usual reduction-order ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import tokenized
from temp_data_pipeline_spark.llm.text import md5_int60

__all__ = [
    "classifier_score",
    "hashed_bucket",
    "hashed_weights",
    "train_log_odds",
]


def hashed_bucket(col: Column, dim: int) -> Column:
    """Hashing-trick feature index: md5-derived 60-bit int mod dim.
    Engine-stable (DuckDB: int60(tok) % dim) — the bucket assignment
    IS the model's feature map, so it must never drift between the
    engine that trains and the engine that scores."""
    return md5_int60(col) % dim


def hashed_weights(
    spark: SparkSession, dim: int, *, salt: str = "w:"
) -> DataFrame:
    """Deterministic integer-valued weight table in [-1000, 1000]:
    w(b) = (int60(salt||b) % 2001) - 1000, as DOUBLE. Both engines
    recompute it from the bucket index alone — no weight shipping —
    which makes classifier scoring fully oracle-replayable."""
    return spark.range(dim).select(
        F.col("id").cast("long").alias("bucket"),
        (
            (
                md5_int60(F.concat(F.lit(salt), F.col("id").cast("string")))
                % 2001
            )
            - 1000
        )
        .cast("double")
        .alias("w"),
    )


def train_log_odds(
    labeled: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    dim: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """One-pass Naive-Bayes log-odds trainer over labeled documents.

    w(b) = ln((pos_b + α)/(N_pos + 2α)) − ln((neg_b + α)/(N_neg + 2α))

    — the per-bucket evidence that a token signals the positive
    (quality) class, Laplace-smoothed. One shuffle keyed by bucket;
    the two class totals are a driver-side scalar aggregate. Weights
    are quantized to integer micro-nats (×1e6, like llm/lm.py) so
    downstream score sums stay exact and order-independent.
    """
    toks = tokenized(labeled, text_col, keep=[label_col]).select(
        F.col(label_col).alias("_y"), F.explode(F.col("_tok")).alias("_t")
    )
    b = toks.select("_y", hashed_bucket(F.col("_t"), dim).alias("bucket"))
    per = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("_y") != 1, 1).otherwise(0)).alias("neg"),
    )
    tot = per.agg(F.sum("pos"), F.sum("neg")).first()
    n_pos, n_neg = int(tot[0] or 0), int(tot[1] or 0)
    import math

    log_pos_denom = math.log(n_pos + 2 * alpha)
    log_neg_denom = math.log(n_neg + 2 * alpha)
    w = (
        F.log(F.col("pos") + F.lit(alpha))
        - F.lit(log_pos_denom)
        - F.log(F.col("neg") + F.lit(alpha))
        + F.lit(log_neg_denom)
    )
    return per.select(
        "bucket",
        F.round(w * 1_000_000).cast("double").alias("w"),
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int,
    with_prob: bool = False,
) -> DataFrame:
    """Score every document with a hashed linear model: mean bucket
    weight of its tokens. Map-only until ONE per-document aggregation;
    the weight table is broadcast (bounded by dim, not data).

    Tokens whose bucket has no trained weight contribute 0 (left join
    + coalesce) — inference never drops tokens, matching fastText.

    Returns (id, n_tokens, w_sum, score[, prob]); score = w_sum /
    n_tokens, prob = sigmoid(score) when requested (kept off the
    conformance path: exp() is not correctly-rounded, scores are).
    """
    toks = tokenized(df, text_col, keep=[id_col]).select(
        F.col(id_col), F.explode(F.col("_tok")).alias("_t")
    )
    b = toks.select(id_col, hashed_bucket(F.col("_t"), dim).alias("bucket"))
    joined = b.join(F.broadcast(weights), "bucket", "left")
    out = (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.coalesce(F.sum("w"), F.lit(0.0)).alias("w_sum"),
        )
        .withColumn("score", F.col("w_sum") / F.col("n_tokens"))
    )
    if with_prob:
        out = out.withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))))
    return out
