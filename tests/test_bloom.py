"""Bloom prefilter: no false negatives, transparency vs exact join,
map-side selectivity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.bloom import (
    bloom_bits,
    bloom_decontam,
    might_contain,
)
from temp_data_pipeline_spark.llm.curate import ngram_overlap

M = 1 << 16


def _words(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "gram string")
    return bloom_bits(df, "gram", M, 4)


def test_no_false_negatives(spark):
    vals = [f"gram-{i}" for i in range(300)]
    words = _words(spark, vals)
    arr = F.array(*[F.lit(w) for w in words])
    hits = (
        spark.createDataFrame([(v,) for v in vals], "gram string")
        .withColumn("_bf", arr)
        .filter(might_contain("gram", words, M, 4))
        .count()
    )
    assert hits == 300  # every inserted member must pass


def test_low_false_positive_rate(spark):
    words = _words(spark, [f"gram-{i}" for i in range(300)])
    arr = F.array(*[F.lit(w) for w in words])
    probes = spark.createDataFrame([(f"other-{i}",) for i in range(5000)], "gram string")
    fp = probes.withColumn("_bf", arr).filter(might_contain("gram", words, M, 4)).count()
    assert fp <= 5  # expected ≈ 0 at n=300, m=2^16, k=4


def test_bloom_decontam_equals_exact(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(30))
    shared = mk()
    rows = [(i, mk() if i % 3 else mk() + " " + shared) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    test = df.filter(F.col("doc_id") % 10 == 0)
    train = df.filter(F.col("doc_id") % 10 != 0)
    got = sorted(map(tuple, bloom_decontam(train, test, n=4).collect()))
    want = sorted(map(tuple, ngram_overlap(train, test, n=4).collect()))
    assert got == want and len(want) > 0


def test_probe_plan_is_jvm_only(spark):
    words = _words(spark, ["a b c"])
    arr = F.array(*[F.lit(w) for w in words])
    df = (
        spark.createDataFrame([("a b c",), ("x y z",)], "gram string")
        .withColumn("_bf", arr)
        .filter(might_contain("gram", words, M, 4))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_auto_m_bits_tracks_eval_size():
    from temp_data_pipeline_spark.llm.bloom import auto_m_bits

    assert auto_m_bits(0) == 1 << 16
    assert auto_m_bits(100) == 1 << 16          # floor
    assert auto_m_bits(24_000) == 1 << 21       # 64*24k = 1.5M -> 2M
    assert auto_m_bits(1_000_000) == 1 << 26    # 8 MiB of bits
    for n in (1, 10, 1000, 123_456):
        m = auto_m_bits(n)
        assert m >= 64 * n              # FPR bound holds
        assert m & (m - 1) == 0         # power of two (cheap pmod)


def test_bloom_gate_stays_selective_at_large_eval_sets(spark):
    """The sizing exists so FP survivors stay ~0 even when the eval
    set outgrows the old fixed 2^16 bitset."""
    from temp_data_pipeline_spark.llm.bloom import (
        auto_m_bits,
        bloom_bits,
        might_contain,
    )
    from pyspark.sql import functions as F

    n_eval = 30_000
    ev = spark.range(n_eval).select(
        F.concat(F.lit("eval-gram-"), F.col("id").cast("string")).alias("gram")
    )
    m = auto_m_bits(n_eval)
    assert m == 1 << 21
    words = bloom_bits(ev, "gram", m, 4)
    probe = spark.range(100_000).select(
        F.concat(F.lit("train-gram-"), F.col("id").cast("string")).alias("gram")
    )
    bf = spark.createDataFrame([(words,)], "_bf: array<bigint>")
    fps = (
        probe.join(F.broadcast(bf))
        .filter(might_contain("gram", words, m, 4))
        .count()
    )
    # disjoint corpora: every survivor is a false positive;
    # E[fps] ≈ 100k * 1.5e-5 ≈ 1.5
    assert fps < 50
