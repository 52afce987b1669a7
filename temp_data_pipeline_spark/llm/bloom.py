"""Broadcast Bloom-filter prefilters (the 100 TB decontamination path).

``curate.ngram_overlap`` shuffles every train-side gram to the join.
At pretraining scale that shuffle is the whole cost: trillions of
grams move so that a tiny eval set (thousands of distinct grams) can
reject almost all of them. The classic fix is a Bloom filter of the
eval grams applied map-side BEFORE the exchange — only the grams that
*might* collide ever shuffle, and an exact confirm join afterwards
removes the false positives, so the result is bit-identical to the
exact join (Bloom filters have no false negatives).

Spark's own runtime row-filter uses the same trick internally
(``InjectRuntimeFilter``), but its ``bloom_filter_agg`` expression is
not registered for end users, so the filter here is built from public
primitives only:

- bit positions are computed DISTRIBUTED: ``pmod(xxhash64(gram, i),
  m)`` for k seeds, exploded and made distinct — the driver only ever
  collects ≤ k·n_eval bounded integers, never the grams;
- the bitset is embedded as an ``array<bigint>`` literal column and
  probed with pure JVM expressions (``element_at`` + ``shiftleft`` +
  bitwise AND) — codegen-friendly, no UDF, no broadcast-variable
  Python round-trip;
- the probe is a conjunction over k seeds, so a candidate row costs k
  xxhash64 calls and k word tests.

Sizing: with m bits, n eval grams, k probes the false-positive rate
is ≈ (1 - e^{-kn/m})^k; the default m = 2^16, k = 4 holds FPR under
1e-5 up to n ≈ 2 000 and the bitset is 8 KiB. Scale m with the eval
set (1M grams → m = 2^24 ≈ 2 MiB broadcast — still trivial).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import shingles_of, tokenized


def auto_m_bits(n_eval: int) -> int:
    """Bitset size for n distinct eval grams: next power of two ≥
    64·n, floor 2^16 — holds FPR ≈ 1.5e-5 at k=4 at ANY eval-set
    size (a fixed m degrades to a pass-everything gate as the suite
    grows). 64 bits/gram = 8 MiB broadcast per million grams."""
    return max(1 << 16, 1 << (64 * max(n_eval, 1) - 1).bit_length())


def bloom_bits(df: DataFrame, col: str, m_bits: int = 1 << 16, k: int = 4) -> list[int]:
    """Build the bitset words (signed int64, Spark-literal-ready).

    The aggregation to distinct bit positions happens in the cluster;
    the driver materializes at most ``min(k·n, m_bits)`` integers.
    """
    pos = [F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits)) for i in range(k)]
    rows = df.select(F.explode(F.array(*pos)).alias("p")).distinct().collect()
    words = [0] * ((m_bits + 63) // 64)
    for r in rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def might_contain(col: str, words: list[int], m_bits: int, k: int = 4) -> Column:
    """Membership-test Column over a bitset literal; pure JVM exprs.

    ``shiftleft``/``&`` take column operands only at the SQL layer
    (the PySpark wrappers pin the shift amount to a python int), so
    the per-seed word/bit tests are assembled with ``F.expr``.
    """
    probes = []
    for i in range(k):
        p = f"pmod(xxhash64({col}, {i}), {m_bits})"
        word = f"element_at(_bf, CAST(shiftright({p}, 6) AS INT) + 1)"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({p} & 63 AS INT))"
        probes.append(f"(({word} & {mask}) != 0)")
    return F.expr(" AND ".join(probes))


def _doc_grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    t = tokenized(df, text_col, keep=[id_col])
    return t.select(F.col(id_col), F.explode(shingles_of(F.col("_tok"), n)).alias("gram"))


def bloom_decontam(
    train: DataFrame,
    test: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
    m_bits: int | None = None,
    k: int = 4,
) -> DataFrame:
    """Exactly ``curate.ngram_overlap``, with the map-side Bloom gate.

    train grams → Bloom probe (map-only, rejects ~everything) → exact
    inner join with the distinct eval grams (confirms, killing false
    positives) → per-doc count. Same result as the exact join, with
    the shuffle carrying only the Bloom survivors.

    ``m_bits=None`` (default) sizes the bitset from the OBSERVED
    distinct eval-gram count: the next power of two ≥ 64·n_eval,
    floor 2^16 — FPR ≈ 1.5e-5 at k=4 regardless of eval-set size.
    A fixed m silently degrades as the eval suite grows (at 2^16
    bits a 100k-gram suite would pass ~everything and the gate
    becomes a no-op shuffle); the count is free here because the
    checkpoint below materializes the grams anyway. 64 bits/gram =
    8 MiB broadcast per million eval grams — trivial.
    """
    # materialize the distinct eval grams ONCE: they feed three
    # consumers (the m sizing, the bitset build, the confirm join)
    # and are bounded by the eval-set size, so the checkpoint is
    # small — without it the eval-side tokenize/shingle/distinct
    # pipeline executes per consumer
    test_grams = (
        _doc_grams(test, text_col, id_col, n).select("gram").distinct()
        .localCheckpoint()
    )
    if m_bits is None:
        m_bits = auto_m_bits(test_grams.count())
    words = bloom_bits(test_grams, "gram", m_bits, k)
    # bitset as a broadcast ONE-ROW frame, not an array literal: the
    # probe references _bf k times, and Catalyst inlines a literal
    # CreateArray(1024 words) into every reference — as data the
    # bitset is materialized once per executor by the broadcast
    spark = train.sparkSession
    from temp_data_pipeline_spark.session import local_df

    bf_df = local_df(spark, [(words,)], "_bf array<bigint>")
    candidates = (
        _doc_grams(train, text_col, id_col, n)
        .join(F.broadcast(bf_df))
        .filter(might_contain("gram", words, m_bits, k))
        .drop("_bf")
    )
    return (
        candidates.join(test_grams, "gram", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
