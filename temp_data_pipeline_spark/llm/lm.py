"""Corpus-trained bigram language model scoring (LLM-pipeline tier).

Perplexity-style filtering (CCNet trains a KenLM and drops
high-perplexity documents) needs an engine-native analogue: train a
bigram model over the corpus in one aggregation pass, then score every
document's mean negative log-likelihood with add-one smoothing.
Low-NLL documents read like the corpus; high-NLL ones are noise.

Distributed shape (the 100 TB posture):

- Training is ``explode bigrams → groupBy(w1, w2) count`` — map-side
  partial aggregation collapses each partition's repeats before the
  one hash shuffle. Context counts c(w1) reduce from the *aggregated*
  bigram table (tiny), not from the raw corpus.
- The per-distinct-bigram NLL term is computed once on the model
  table, not per occurrence — ln() runs |distinct bigrams| times, not
  |corpus tokens| times.
- Scoring joins exploded document bigrams to the model on (w1, w2):
  a plain hash join both sides of which are already partitioned by
  the join key after training. No driver collect anywhere; the only
  scalar pulled is the vocabulary size (one aggregated number).

Exactness: each NLL term is quantized to integer micro-nats
(``FLOOR(1e6 * ln(...))`` as BIGINT) on the model table, so per-doc
sums are integer arithmetic — order-independent and bit-identical
across engines. Summing raw doubles would make the result depend on
partitioning. A DuckDB oracle replays the identical pipeline
(plans/llm_queries.py::llm_lm_score).

Smoothing: P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = |vocab|.
Unseen contexts score ln(V) per token (uniform prior) via the
left-join coalesce in ``score_bigram_nll``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.text import tokens

MICRO = 1_000_000.0


@dataclass(frozen=True)
class BigramLM:
    """Trained model: aggregated bigram table + vocabulary size.

    ``counts`` columns: w1, w2, c12 (bigram count), c1 (context
    count = occurrences of w1 as a predecessor), nll_micro (the
    quantized smoothed -ln P(w2|w1) for this bigram).
    """

    counts: DataFrame
    vocab_size: int


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode (id, w1, w2) adjacent-token pairs; map-only."""
    t = tokens(text_col)
    n = F.size(t)
    pairs = F.arrays_zip(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return df.select(F.col(id_col).alias("_id"), F.explode(pairs).alias("p")).select(
        "_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def nll_term_micro(c12: Column, c1: Column, vocab_size: int) -> Column:
    """Quantized smoothed NLL of one bigram, in integer micro-nats."""
    ratio = (c1 + F.lit(vocab_size)).cast("double") / (c12 + F.lit(1)).cast("double")
    return F.floor(F.log(ratio) * F.lit(MICRO)).cast("bigint")


def train_bigram_lm(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> BigramLM:
    """One-pass bigram model over the corpus.

    The vocabulary counts *all* tokens (every position), matching the
    conventional add-one denominator; it reduces from the aggregated
    per-token table, and only the final scalar reaches the driver.
    """
    pairs = _bigrams(df, id_col, text_col)
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
        .collect()[0]["v"]
    )
    counts = bg.join(ctx, "w1").withColumn(
        "nll_micro", nll_term_micro(F.col("c12"), F.col("c1"), int(vocab))
    )
    return BigramLM(counts=counts, vocab_size=int(vocab))


def score_bigram_nll(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document NLL under the model: (id, n_bigrams, nll_micro).

    Documents with fewer than two tokens have no bigrams and are
    absent from the result (no probability is defined for them).
    Out-of-model bigrams fall back to the uniform prior ln(V).
    """
    pairs = _bigrams(df, id_col, text_col)
    oov = F.floor(F.log(F.lit(float(lm.vocab_size))) * F.lit(MICRO)).cast("bigint")
    scored = pairs.join(
        lm.counts.select("w1", "w2", "nll_micro"), ["w1", "w2"], "left"
    ).select("_id", F.coalesce("nll_micro", oov).alias("t"))
    return (
        scored.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("t").alias("nll_micro"))
        .select(F.col("_id").alias(id_col), "n_bigrams", "nll_micro")
    )
