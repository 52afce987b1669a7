"""Chunking + packing semantics and plan shape.

Cross-engine parity: llm_chunk / llm_pack oracle queries. Here:
goldens, the reassembly invariant, the two-level prefix-sum
decomposition vs a naive global window, and the no-shuffle plan gate
for the map-only chunker.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.chunk import chunk_documents, pack_documents


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_golden_overlap(spark):
    d = _df(spark, [(1, "a b c d e f g")])  # 7 tokens
    got = {
        r["chunk_id"]: (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(d, size=4, stride=3).collect()
    }
    assert got == {
        0: (4, "a b c d"),
        1: (4, "d e f g"),
        2: (1, "g"),
    }


def test_chunk_disjoint_reassembles(spark):
    text = " ".join(f"t{i}" for i in range(11))
    d = _df(spark, [(1, text)])
    chunks = (
        chunk_documents(d, size=4)  # stride defaults to size: disjoint
        .orderBy("chunk_id")
        .collect()
    )
    assert " ".join(c["chunk_text"] for c in chunks) == text
    assert [c["n_tokens"] for c in chunks] == [4, 4, 3]


def test_chunk_empty_text(spark):
    got = chunk_documents(_df(spark, [(1, "")]), size=8).collect()
    assert len(got) == 1 and got[0]["n_tokens"] == 1  # [''] — split semantics


def test_chunk_plan_is_shuffle_free(spark):
    d = _df(spark, [(1, "a b c")])
    plan = chunk_documents(d, size=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_matches_naive_global_window(spark):
    rows = [(i, " ".join(["w"] * ((i * 7) % 13 + 1))) for i in range(50)]
    d = _df(spark, rows)
    got = pack_documents(d, seq_len=16, n_buckets=7)  # force multiple buckets
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        d.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))
        .withColumn("begin", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("pack_id", F.floor(F.col("begin") / 16.0).cast("bigint"))
        .withColumn("pack_off", (F.col("begin") % 16).cast("bigint"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_pack_begin_is_exclusive_prefix(spark):
    d = _df(spark, [(1, "a b"), (2, "c d e"), (3, "f")])
    got = {r["doc_id"]: (r["begin"], r["pack_id"], r["pack_off"]) for r in pack_documents(d, seq_len=4).collect()}
    assert got == {1: (0, 0, 0), 2: (2, 0, 2), 3: (5, 1, 1)}


def test_pack_empty_frame(spark):
    d = _df(spark, []).filter("doc_id < 0")
    assert pack_documents(d, seq_len=8).count() == 0


def test_length_buckets_exact_boundaries(spark):
    from temp_data_pipeline_spark.llm.chunk import length_buckets

    def doc(n):
        return " ".join(["t"] * n)

    # 1 -> clamps to 16; 16 -> exact power stays 16; 17 -> 32;
    # 9000 -> clamps to 8192 with zero pad
    df = spark.createDataFrame(
        [(1, doc(1)), (2, doc(16)), (3, doc(17)), (4, doc(9000))],
        "doc_id long, text string",
    )
    out = {r["bucket_len"]: r for r in length_buckets(df).collect()}
    assert set(out) == {16, 32, 8192}
    assert (out[16]["n_docs"], out[16]["n_tokens"], out[16]["n_pad"]) == (2, 17, 15)
    assert (out[32]["n_docs"], out[32]["n_pad"]) == (1, 15)
    assert (out[8192]["n_docs"], out[8192]["n_pad"]) == (1, 0)


def test_length_buckets_single_shuffle(spark):
    from temp_data_pipeline_spark.llm.chunk import length_buckets

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = length_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the bucket-cardinality agg only
