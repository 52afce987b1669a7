"""Context-window chunking and sequence packing (LLM-pipeline tier).

Two operations every pretraining data pipeline runs just before
tokenizer/trainer handoff:

- ``chunk_documents``: sliding fixed-size token windows with overlap
  (long-document splitting). Map-only — sequence + posexplode +
  slice, all JVM expressions; zero shuffles, so it scales linearly
  with input bytes.
- ``pack_documents``: GPT-style concat-and-chunk packing — documents
  are laid end-to-end in a deterministic order and cut into
  ``seq_len``-token training sequences; each document learns its
  global token offset, pack id, and offset within the pack.

Packing needs a *global* prefix sum over token counts. A naive
``Window.orderBy(id)`` with no partition key runs on ONE task — the
classic scale-killer. This implementation uses the two-level
prefix-sum shape instead:

  1. bucket documents by id range (order-preserving),
  2. within-bucket running sums (parallel windows, one shuffle),
  3. per-bucket totals → cumulative bucket offsets (a window over
     ``n_buckets`` rows — tiny by construction),
  4. broadcast the offsets back and add.

The only driver-side data is the (min, max) id pair and the
``n_buckets``-row offset table — both bounded regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.text import token_count, tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Sliding token windows: (id, chunk_id, n_tokens, chunk_text).

    ``stride`` defaults to ``size`` (disjoint chunks); a smaller
    stride overlaps adjacent chunks by ``size - stride`` tokens.
    Start positions are 0, stride, 2·stride … while < n_tokens, so
    trailing partial chunks are kept (standard splitter behavior).
    """
    stride = size if stride is None else stride
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    t = tokens(text_col)
    n = F.greatest(F.size(t), F.lit(1))
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    ex = df.select(F.col(id_col), t.alias("_t"), F.posexplode(starts).alias("_cid", "_start"))
    chunk = F.slice("_t", F.col("_start") + 1, size)
    return ex.select(
        id_col,
        F.col("_cid").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 1024,
    n_buckets: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: (id, n_tokens, begin, pack_id, pack_off).

    ``begin`` is the document's first-token offset in the virtual
    concatenation ordered by ``id_col``; ``pack_id = begin // seq_len``
    and ``pack_off = begin % seq_len`` locate it in the training
    sequence stream (documents may straddle pack boundaries, exactly
    as trainers consume them).
    """
    spark = df.sparkSession
    base = df.select(F.col(id_col), token_count(text_col).cast("bigint").alias("n_tokens"))

    bounds = base.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        return base.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("bigint").alias("begin"),
            F.lit(0).cast("bigint").alias("pack_id"),
            F.lit(0).cast("bigint").alias("pack_off"),
        )
    B = n_buckets or spark.sparkContext.defaultParallelism * 4
    width = max(1, (int(hi) - int(lo)) // B + 1)
    bucket = F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(width)).cast("bigint")

    w_in = (
        Window.partitionBy("_b").orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    part = base.withColumn("_b", bucket).withColumn("_cum", F.sum("n_tokens").over(w_in))

    # n_buckets rows — the single-partition window here is over a
    # bounded, already-aggregated frame, not the data.
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_b")
        .agg(F.sum("n_tokens").alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)))
        .select("_b", "_off")
    )

    begin = F.col("_off") + F.col("_cum") - F.col("n_tokens")
    return (
        part.join(F.broadcast(offsets), "_b")
        .select(
            id_col,
            "n_tokens",
            begin.alias("begin"),
            F.floor(begin / F.lit(float(seq_len))).cast("bigint").alias("pack_id"),
            (begin % F.lit(seq_len)).cast("bigint").alias("pack_off"),
        )
    )


def reassemble_packs(
    df: DataFrame,
    seq_len: int,
    pack_lo: int = 0,
    pack_hi: int | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The INVERSE of `pack_documents`: training sequences back from a
    packed frame — (pack_id, n_tokens, tokens array<string>), one row
    per pack in [pack_lo, pack_hi), each exactly ``seq_len`` tokens
    (the final pack may be partial).

    ``df`` carries (id, text, n_tokens, begin) — pack_documents output
    joined back to the text, or a training-shard table row as-is
    (`pipeline.read_pack_range` feeds this).

    Shape: one map stage (explode each document onto the packs it
    overlaps — at most ceil(n_tokens/seq_len)+1 rows per document),
    then ONE shuffle keyed by pack_id whose reduce side sorts
    segments by ``begin`` and
    flattens. Every pack's payload is ≤ seq_len tokens, so reducers
    are perfectly bounded regardless of document length — a 10M-token
    document never lands on one reducer, its packs spread across the
    cluster.
    """
    lo_tok = pack_lo * seq_len
    pred = (F.col("begin") + F.col("n_tokens") > lo_tok) & (F.col("n_tokens") > 0)
    if pack_hi is not None:
        pred = pred & (F.col("begin") < pack_hi * seq_len)
    covered = df.filter(pred)
    p_first = F.greatest(
        F.floor(F.col("begin") / F.lit(seq_len)), F.lit(pack_lo)
    ).cast("bigint")
    p_last = F.floor((F.col("begin") + F.col("n_tokens") - 1) / F.lit(seq_len))
    if pack_hi is not None:
        p_last = F.least(p_last, F.lit(pack_hi - 1))
    p_last = p_last.cast("bigint")
    ex = covered.select(
        F.col("begin"),
        F.col("n_tokens"),
        F.split(F.col(text_col), " ").alias("_t"),
        F.explode(F.sequence(p_first, p_last)).alias("pack_id"),
    )
    tok_lo = F.greatest(F.col("pack_id") * seq_len - F.col("begin"), F.lit(0))
    tok_hi = F.least(
        F.col("n_tokens"), (F.col("pack_id") + 1) * seq_len - F.col("begin")
    )
    seg = ex.select(
        "pack_id",
        "begin",
        F.slice("_t", (tok_lo + 1).cast("int"), (tok_hi - tok_lo).cast("int")).alias(
            "_seg"
        ),
    )
    # array_sort on (begin, seg) structs orders segments by stream
    # position (begins are globally unique); flatten concatenates
    return (
        seg.groupBy("pack_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("begin"), F.col("_seg")))
                    ),
                    lambda s: s["_seg"],
                )
            ).alias("tokens")
        )
        .select(
            "pack_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            "tokens",
        )
    )


def length_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_bucket: int = 16,
    max_bucket: int = 8192,
) -> DataFrame:
    """Sequence-length bucket report — the batch-scheduler input for
    length-bucketed training/inference (docs padded to the next
    power-of-two length; one bucket per batch means padding waste is
    bounded by 2× instead of max_len/len). Per bucket: document
    count, real token count, and padding tokens the bucket would
    spend (bucket_len − n_toks summed).

    The bucket boundary is EXACT integer math in both engines:
    ceil(log2(n)) computed as length(bin(n−1)) — no float log2 whose
    rounding at exact powers of two could differ across engines.
    Buckets clamp to [min_bucket, max_bucket]; longer docs land in
    max_bucket with zero padding (they get chunked, not padded).
    Map-only until ONE aggregation at bucket cardinality (≤ ~10
    groups), with map-side partial aggregation — scan-speed at any
    corpus size.

    Returns (bucket_len, n_docs, n_tokens, n_pad) ordered by bucket.
    """
    n = token_count(text_col).cast("long")
    # pyspark's F.shiftleft takes a literal bit count — route the
    # column-valued shift through the SQL form instead
    staged = df.select(n.alias("_n")).withColumn(
        "_l2",
        F.when(F.col("_n") <= 1, F.lit(0))
        .otherwise(F.length(F.bin(F.col("_n") - 1)))
        .cast("int"),
    )
    raw = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), _l2) AS BIGINT)")
    bucket = F.least(
        F.greatest(raw, F.lit(int(min_bucket)).cast("long")),
        F.lit(int(max_bucket)).cast("long"),
    )
    pad = F.greatest(bucket - F.col("_n"), F.lit(0).cast("long"))
    return (
        staged.select(
            bucket.alias("bucket_len"),
            F.col("_n"),
            pad.alias("_pad"),
        )
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_tokens"),
            F.sum("_pad").alias("n_pad"),
        )
    )
