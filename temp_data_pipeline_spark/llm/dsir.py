"""DSIR-style importance weighting: select raw documents that look
like a target corpus (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" — the hashed-ngram variant).

The published recipe: featurize every document as hashed n-gram
counts (unigrams + bigrams → D buckets), fit two bucket unigram
models — target p and raw q, Laplace-smoothed — and weight each raw
document by its log importance ratio Σ_b count_b · (log p_b − log
q_b). Selecting the top-weighted documents shifts the raw pool
toward the target distribution — the standard "make CommonCrawl look
like Wikipedia" move of large-scale pretraining pipelines.

Physical shape — everything reduces to bucket space:
  - featurization is explode → hash → groupBy on 8-byte keys
    (map-side combinable, no UDFs);
  - each corpus model is ONE aggregate down to ≤ D rows;
  - the per-bucket log-ratio table (D rows — tiny by construction)
    broadcasts back onto the raw documents' sparse bucket counts,
    so scoring is an equi-join on bucket + one groupBy per doc.
  At 100 TB: two corpus scans (raw + target), two D-row broadcasts,
  zero driver-side data paths.

Exactness contract (drives the DuckDB oracle): the only non-IEEE
scalar is ln, so each bucket's log-ratio is quantized to integer
nano-units BEFORE the per-document sum — identical inputs reach ln
in both engines ((c+1)·(T+D) products computed in double, IEEE
multiply/divide), and the quantization absorbs its last-ulp latitude
(the llm_bm25 precedent). Per-document weights are exact BIGINT sums,
order-independent and safe to rank across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.text import md5_int60, tokens

NANO = 1_000_000_000


def gram_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    salt: str = "d:",
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram+bigram feature counts.

    bucket = md5_int60(salt || gram) % dim — the replayable hash
    family every conformance oracle shares. Spark's ``sequence``
    DESCENDS when start > stop, so the bigram index range is guarded
    for single-token documents (DuckDB's ``range`` is simply empty).
    """
    t = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(t) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = df.select(
        F.col(id_col), F.explode(F.concat(t, bigrams)).alias("_g")
    )
    bucket = (md5_int60(F.concat(F.lit(salt), F.col("_g"))) % dim).cast("long")
    return (
        ex.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_log_ratio_table(
    raw_buckets: DataFrame,
    target_buckets: DataFrame,
    dim: int,
) -> DataFrame:
    """(bucket, w_nano) for every bucket in [0, dim): the Laplace-
    smoothed log importance ratio ln(p_target/p_raw) in integer
    nano-units. D rows — built fully distributed (two 1-row total
    broadcasts), small enough to broadcast onward."""
    spark = raw_buckets.sparkSession
    tb = target_buckets.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("ct")
    )
    rb = raw_buckets.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("cr")
    )
    t_tot = tb.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("Tt"))
    r_tot = rb.agg(F.coalesce(F.sum("cr"), F.lit(0)).cast("long").alias("Tr"))
    dom = spark.range(dim).select(F.col("id").cast("long").alias("bucket"))
    joined = (
        dom.join(tb, "bucket", "left")
        .join(rb, "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
    )
    num = (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") * (
        F.col("Tr") + F.lit(dim)
    ).cast("double")
    den = (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double") * (
        F.col("Tt") + F.lit(dim)
    ).cast("double")
    w = F.floor(F.log(num / den) * F.lit(float(NANO)) + F.lit(0.5)).cast("long")
    return joined.select("bucket", w.alias("w_nano"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    salt: str = "d:",
    single_scan: bool = False,
) -> DataFrame:
    """(id, dsir_nano): per-raw-document importance weight in integer
    nano-units. Positive ⇒ the document looks more like the target
    corpus than like the raw pool average.

    The raw corpus feeds BOTH the bucket model and the scoring join.
    ``single_scan=True`` persists the per-doc bucket counts at that
    fork (the bm25_score pattern and cache-lifecycle contract);
    measured at sf0.1 the recompute is CHEAPER than caching the wide
    (id, bucket, cnt) frame (4.2 s vs 4.7 s), so the default stays
    off — flip it when the corpus scan itself dominates (cold object
    storage), not the explode."""
    rb = gram_buckets(raw, text_col=text_col, id_col=id_col, dim=dim, salt=salt)
    if single_scan:
        rb = rb.persist()
    tgt = gram_buckets(
        target, text_col=text_col, id_col=id_col, dim=dim, salt=salt
    )
    ratio = dsir_log_ratio_table(rb, tgt, dim)
    return (
        rb.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("w_nano"))
            .cast("long")
            .alias("dsir_nano")
        )
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    k: int = 100,
    salt: str = "d:",
) -> DataFrame:
    """The k raw documents most target-like by importance weight:
    (rank, id, dsir_nano), ties broken by ascending id. Deterministic
    top-k selection — the paper's Gumbel resampling reduces to this
    when sampling temperature → 0, and a seeded Gumbel draw can be
    layered on the weights without changing this operator."""
    from temp_data_pipeline_spark.llm.similarity import ranked_topk

    w = dsir_weights(
        raw, target, text_col=text_col, id_col=id_col, dim=dim, salt=salt
    )
    return ranked_topk(
        w, [F.col("dsir_nano").desc(), F.col(id_col).asc()], k
    )
