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
