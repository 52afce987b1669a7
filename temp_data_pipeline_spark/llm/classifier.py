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
    "fit_logistic",
    "hashed_bucket",
    "hashed_weights",
    "logistic_score",
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


def fit_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    *,
    l2: float = 1e-6,
    iters: int = 25,
    tol: float = 1e-10,
) -> dict:
    """Distributed Newton/IRLS logistic regression over a SMALL
    engineered feature set — the discriminative upgrade of
    ``train_log_odds`` for the quality gate's decision layer (features
    = the Gopher/repetition/lang-id signals already computed at scale;
    label = a human- or LLM-annotated sample).

    Per iteration ONE distributed aggregation computes the gradient
    and Hessian moments (p² + p sums, p = len(feature_cols) + 1 with
    the intercept — tens of numbers collected, like RidgeForecaster's
    Gram pass); the p×p Newton solve runs on the driver. Cost is
    iters × one scan; no training row ever reaches the driver, so the
    fit is 100 TB-safe for any p where p² moments fit a collect
    (hundreds). For hashed million-dim BoW models stay with
    ``train_log_odds`` — a dense Hessian is the wrong tool there.

    ``l2`` penalizes coefficients but not the intercept (sklearn
    convention). Returns {"intercept", "coef", "n_iter", "converged",
    "loss"} with loss = mean negative log-likelihood (unpenalized).
    """
    import numpy as np

    p = len(feature_cols)
    x = [F.coalesce(F.col(f).cast("double"), F.lit(0.0)) for f in feature_cols]
    y = F.col(label_col).cast("double")

    n = df.count()
    if n == 0:
        raise ValueError("empty training set")
    w = np.zeros(p + 1)  # [intercept, coef...]

    def moments(wv: "np.ndarray"):
        z = F.lit(float(wv[0]))
        for i in range(p):
            z = z + F.lit(float(wv[i + 1])) * x[i]
        pr = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = pr - y                      # gradient residual
        wt = pr * (F.lit(1.0) - pr)    # IRLS weight
        # clamped log-loss: log(p) with p==0/1 would be -inf under
        # extreme separation; the 1e-15 floor matches sklearn's
        eps = F.lit(1e-15)
        ll = -(
            y * F.log(F.greatest(pr, eps))
            + (F.lit(1.0) - y) * F.log(F.greatest(F.lit(1.0) - pr, eps))
        )
        aggs = [F.sum(ll).alias("loss"), F.sum(r).alias("g0")]
        for i in range(p):
            aggs.append(F.sum(r * x[i]).alias(f"g{i + 1}"))
            aggs.append(F.sum(wt * x[i]).alias(f"h0_{i + 1}"))
            for j in range(i, p):
                aggs.append(F.sum(wt * x[i] * x[j]).alias(f"h{i + 1}_{j + 1}"))
        aggs.append(F.sum(wt).alias("h0_0"))
        row = df.agg(*aggs).first()
        g = np.zeros(p + 1)
        h = np.zeros((p + 1, p + 1))
        g[0] = row["g0"]
        h[0, 0] = row["h0_0"]
        for i in range(p):
            g[i + 1] = row[f"g{i + 1}"]
            h[0, i + 1] = h[i + 1, 0] = row[f"h0_{i + 1}"]
            for j in range(i, p):
                h[i + 1, j + 1] = h[j + 1, i + 1] = row[f"h{i + 1}_{j + 1}"]
        return g, h, float(row["loss"]) / n

    reg = l2 * np.eye(p + 1)
    reg[0, 0] = 0.0  # unpenalized intercept
    loss = float("inf")
    converged = False
    it = 0
    for it in range(1, iters + 1):
        g, h, loss = moments(w)
        g = g + reg @ w
        step = np.linalg.solve(h + reg + 1e-12 * np.eye(p + 1), g)
        w = w - step
        if float(np.max(np.abs(step))) < tol:
            converged = True
            break
    return {
        "intercept": float(w[0]),
        "coef": [float(c) for c in w[1:]],
        "n_iter": it,
        "converged": converged,
        "loss": loss,
    }


def logistic_score(
    df: DataFrame,
    model: dict,
    feature_cols: list[str],
    *,
    out: str = "prob",
) -> DataFrame:
    """Apply a ``fit_logistic`` model as a pure column expression —
    map-only, zero shuffles, whole-stage codegen (the same zero-cost
    inference shape as RidgeForecaster.predict_mu)."""
    z = F.lit(float(model["intercept"]))
    for f, c in zip(feature_cols, model["coef"]):
        z = z + F.lit(float(c)) * F.coalesce(F.col(f).cast("double"), F.lit(0.0))
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
