"""Scale smoke: dedup operators at 10× bench scale (50k docs built by
unioning shifted copies of sf0.1 documents). Gated behind
SPARK_GRAFT_SCALE_SMOKE=1 so the default suite stays fast.

Measured on local[32] (2026-08-13): exact_dedup ~2s, minhash_dedup
~13s, simhash_neardup ~7s — the shapes that matter: exact dedup is
one keyed shuffle (linear), minhash grows with candidate-pair count,
simhash emits all verified pairs (quadratic within near-dup clusters,
inherent to the pairs-output contract).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import exact_dedup, minhash_dedup

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="set SPARK_GRAFT_SCALE_SMOKE=1 to run the 10x scale smoke",
)

SF_BENCH = "/root/testdata/sf0.1"


def _big_docs(spark, copies=10):
    d = spark.read.parquet(f"{SF_BENCH}/documents.parquet")
    big = d
    for i in range(1, copies):
        big = big.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + 5000 * i)
            .withColumn("text", F.concat(F.col("text"), F.lit(f" v{i}")))
        )
    return big.repartition(64)


def test_adversarial_boilerplate_corpus_is_capped(spark):
    """10k copies of one boilerplate doc: uncapped LSH banding puts all
    10k rows in one bucket → ~50M candidate pairs in a single task.
    With the default bucket cap the candidate space is bounded at
    cap²/2 per band and the job stays interactive."""
    import time

    from temp_data_pipeline_spark.llm.dedup import (
        exact_dedup,
        minhash_dedup,
        simhash_neardup_pairs,
    )

    boiler = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate banner text on every single page").alias("text"),
    )
    t0 = time.time()
    n_pairs = simhash_neardup_pairs(boiler, max_bucket=100).count()
    assert 0 < n_pairs <= 100 * 99 // 2
    assert time.time() - t0 < 120
    # recommended composition: exact dedup first collapses the mass
    # duplicates in one linear shuffle, then LSH sees singletons
    t0 = time.time()
    survivors = minhash_dedup(exact_dedup(boiler), max_bucket=1000).count()
    assert survivors == 1
    assert time.time() - t0 < 120


def test_exact_dedup_at_10x(spark):
    big = _big_docs(spark)
    n_in = big.count()
    n_out = exact_dedup(big).count()
    assert 0 < n_out <= n_in


def test_minhash_dedup_at_10x(spark):
    big = _big_docs(spark)
    kept = minhash_dedup(big, threshold=0.8).count()
    # the 10 suffixed variants of each doc are mutual near-dups at the
    # 3-gram level → survivors far below input count, above zero
    assert 0 < kept < big.count() // 2


def _big_events(spark, copies=10):
    from temp_data_pipeline_spark.sources.registry import load_table

    e = load_table(spark, SF_BENCH, "events")
    big = e
    for i in range(1, copies):
        big = big.unionByName(
            e.withColumn("event_id", F.col("event_id") + 1_000_000 * i)
            .withColumn("user_id", F.col("user_id") + 1_000 * i)
        )
    return big.repartition(64)


def test_asof_join_at_10x(spark):
    """1M-event as-of join: the union+window plan must stay one hash
    exchange regardless of row count (no pair blow-up)."""
    from temp_data_pipeline_spark.operators.temporal import asof_join

    big = _big_events(spark)
    purchases = big.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = big.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("cv")
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols={"cv": "click_value"},
    )
    n = out.count()
    assert n == purchases.count()  # left join preserves every purchase
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_at_10x(spark):
    """1M-event bounded-window self-join: bucketed equi-join keeps the
    candidate set linear in matches; must finish without BNL."""
    from temp_data_pipeline_spark.operators.temporal import range_join

    big = _big_events(spark)
    purchases = big.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = big.select("user_id", "ts", F.col("event_id").alias("eid"))
    pairs = range_join(
        purchases, others, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_seconds=0.0, upper_seconds=3600.0, right_cols={"eid": "match_eid"},
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert pairs.count() > 0


def test_bm25_at_10x(spark):
    """BM25 over 50k docs: the plan is scan + one stats row broadcast +
    top-k, so 10x data is ~10x scan work and nothing superlinear."""
    from temp_data_pipeline_spark.llm.retrieval import bm25_topk

    big = _big_docs(spark)
    rows = bm25_topk(big, "hash join stream", k=10).collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))


def test_hash_embed_knn_at_10x(spark):
    """Hashed-embedding kNN over 50k docs: sparse layout keeps the
    similarity join at (docs sharing a dimension with the query),
    never a cartesian. The 9 shifted copies of doc 0 differ only by a
    ' vN' suffix, so they dominate the neighbor list."""
    from temp_data_pipeline_spark.llm.embed import text_knn

    big = _big_docs(spark)
    rows = text_knn(big, 0, dim=64, k=10).collect()
    assert len(rows) == 10
    near_copies = {5000 * i for i in range(1, 10)}
    assert near_copies <= {r["doc_id"] for r in rows}
