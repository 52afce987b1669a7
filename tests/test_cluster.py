"""Connected-components duplicate clustering (llm/cluster.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from temp_data_pipeline_spark.llm.cluster import (
    cluster_dedup,
    cluster_labels,
    connected_components,
)

PAIR_SCHEMA = StructType(
    [StructField("id_a", LongType()), StructField("id_b", LongType())]
)
DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, PAIR_SCHEMA)


def test_two_components_and_min_labels(spark):
    # {1,2,3} clique-ish, {7,9} pair
    comp = {
        r["node"]: r["cluster_id"]
        for r in connected_components(_pairs(spark, [(1, 2), (2, 3), (7, 9)])).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_chain_propagates_past_diameter(spark):
    # path 10-20-30-40-50: diameter 4 needs several rounds
    edges = [(10, 20), (20, 30), (30, 40), (40, 50)]
    comp = {r["node"]: r["cluster_id"]
            for r in connected_components(_pairs(spark, edges)).collect()}
    assert set(comp.values()) == {10}
    assert len(comp) == 5


def test_cluster_dedup_keeps_one_representative(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], DOC_SCHEMA
    )
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5)])
    kept = sorted(r["doc_id"] for r in cluster_dedup(docs, pairs).collect())
    assert kept == [0, 3, 4]  # reps of {0,1,2}, singleton 3, rep of {4,5}


def test_cluster_labels_marks_singletons(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(4)], DOC_SCHEMA)
    out = {r["doc_id"]: r for r in
           cluster_labels(docs, _pairs(spark, [(1, 3)])).collect()}
    assert out[0]["cluster_id"] == 0 and out[0]["is_representative"]
    assert out[1]["cluster_id"] == 1 and out[1]["is_representative"]
    assert out[3]["cluster_id"] == 1 and not out[3]["is_representative"]


def test_empty_pairs_all_singletons(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(3)], DOC_SCHEMA)
    out = cluster_labels(docs, _pairs(spark, [])).collect()
    assert all(r["is_representative"] for r in out)
    assert cluster_dedup(docs, _pairs(spark, [])).count() == 3


def test_string_ids_take_driver_fast_path(spark):
    # ADVICE r4: the driver union-find finish hard-coded `node long`;
    # string doc ids on a small contracted graph (the common case)
    # raised FIELD_DATA_TYPE_UNACCEPTABLE. Schema now follows id type.
    schema = StructType(
        [StructField("id_a", StringType()), StructField("id_b", StringType())]
    )
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")], schema
    )
    comp = {r["node"]: r["cluster_id"]
            for r in connected_components(pairs).collect()}
    assert comp == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }


def test_string_ids_distributed_path_matches(spark):
    # same graph forced through the O(log d) loop (driver_max_edges=0):
    # both paths must label identically for non-long ids
    schema = StructType(
        [StructField("id_a", StringType()), StructField("id_b", StringType())]
    )
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")], schema
    )
    comp = {r["node"]: r["cluster_id"]
            for r in connected_components(pairs, driver_max_edges=0).collect()}
    assert comp == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }
