"""JSON function tier: extraction semantics and null behavior.

Cross-engine value parity is pinned by the q_json_extract oracle query
(plans/function_queries.py); these tests pin the edge cases the oracle
fixture can't hit — malformed documents, absent paths, type coercion
failures — and that the hot path stays UDF-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import json as jx


def _one(spark, doc: str, col):
    return spark.createDataFrame([(doc,)], "j string").select(col.alias("v")).first()["v"]


def test_json_long_extracts_nested(spark):
    doc = '{"a": {"b": [10, 20, 30]}, "s": "x"}'
    assert _one(spark, doc, jx.json_long("j", "$.a.b[2]")) == 30
    assert _one(spark, doc, jx.json_str("j", "$.s")) == "x"


def test_missing_path_is_null(spark):
    doc = '{"a": 1}'
    assert _one(spark, doc, jx.json_long("j", "$.nope")) is None
    assert _one(spark, doc, jx.json_str("j", "$.a.b.c")) is None


def test_malformed_document_is_null(spark):
    assert _one(spark, "{not json", jx.json_long("j", "$.a")) is None
    # PERMISSIVE from_json yields a struct with NULL fields (not a
    # NULL struct) on malformed input — pin that so consumers know to
    # null-check fields, not the struct.
    row = _one(spark, "{not json", jx.json_typed("j", "a bigint"))
    assert row["a"] is None


def test_non_numeric_coercion_is_null(spark):
    assert _one(spark, '{"a": "word"}', jx.json_long("j", "$.a")) is None


def test_typed_parse_one_pass(spark):
    doc = '{"k": 7, "tag": "t", "vals": [1, 2]}'
    row = (
        spark.createDataFrame([(doc,)], "j string")
        .select(jx.json_typed("j", "k bigint, tag string, vals array<bigint>").alias("s"))
        .select("s.k", "s.tag", F.element_at("s.vals", 2).alias("v2"))
        .first()
    )
    assert (row["k"], row["tag"], row["v2"]) == (7, "t", 2)


def test_array_parse_and_roundtrip(spark):
    assert _one(spark, "[5,6,7]", F.element_at(jx.json_array_longs("j"), 1)) == 5
    doc = '{"k": 3}'
    assert _one(spark, doc, jx.json_of(jx.json_long("j", "$.k").alias("k"))) == '{"k":3}'


def test_json_plan_is_udf_free(spark):
    df = spark.createDataFrame([('{"k": 1}',)], "j string").select(
        jx.json_long("j", "$.k"), jx.json_typed("j", "k bigint")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
