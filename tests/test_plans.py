"""Physical-plan assertions — the 100 TB posture, checked.

Correctness tests prove the numbers; these prove the *plans*: filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast, aggregations combine map-side, the clean stage's two
windows share one exchange, and the hot paths contain no Python UDFs.
A plan regression here is a scale bug even when results stay right.
"""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES
from temp_data_pipeline_spark.plans.llm_queries import LLM_QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_scan(spark):
    plan = _plan(DECLARED_QUERIES["q_filter"].builder(spark, SF))
    assert "PushedFilters: [" in plan
    # the quantity predicate must reach the parquet reader
    assert "GreaterThanOrEqual(l_quantity,30.0)" in plan


def test_projection_prunes_read_schema(spark):
    plan = _plan(DECLARED_QUERIES["q_project"].builder(spark, SF))
    # only the four referenced columns are read, not all 16
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"):
        assert col in read
    for col in ("l_comment", "l_shipdate", "l_partkey"):
        assert col not in read


def test_dim_join_broadcasts(spark):
    plan = _plan(DECLARED_QUERIES["q_join"].builder(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multijoin_broadcasts_both_dims(spark):
    plan = _plan(DECLARED_QUERIES["q_multijoin"].builder(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_agg_has_mapside_partial(spark):
    plan = _plan(DECLARED_QUERIES["q_agg"].builder(spark, SF))
    # partial_ aggregate functions before the exchange = map-side combine
    assert "partial_" in plan


def test_clean_stage_shares_one_exchange(spark):
    """Dedup window and spike-lag window both partition by station_id:
    the plan must contain exactly one hash exchange for them (plus the
    final sort's range exchange)."""
    from temp_data_pipeline_spark.plans.pipeline_queries import PIPELINE_QUERIES

    plan = _plan(PIPELINE_QUERIES["q_pipeline_clean"].builder(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


# Operators whose hot loop is dense matrix math (plane-dot signatures,
# per-pair cosine verify, the tokens×nbits SimHash bit-vote): these run
# Arrow-batched numpy kernels by design — Catalyst higher-order
# functions are interpreted, and measurement showed them 3-10x slower
# on nbits×dim matmuls and ~5x on the SimHash vote.  Token/content
# HASHING stays JVM-side everywhere (one definition, oracle parity).
# Row-at-a-time Python remains banned EVERYWHERE.
_ARROW_ALLOWED = {
    "llm_multimodal",
    "llm_embed_neardup",
    "llm_ann_lsh_topk",
    "llm_ann_recall",  # composes ann_lsh_topk's declared kernel
    "llm_semdedup",
    "llm_ivf_topk",
    "llm_pq_topk",
    "llm_simhash",
    "llm_simhash_neardup",
    "llm_dup_clusters",
    "llm_knn_join",  # cell-assign + probe-cells kernels (declared vector math)
    "llm_normalize",  # NFC tier — gated to rows containing non-ASCII
}


def test_no_python_udfs_on_hot_paths(spark):
    """Everything stays JVM-side except the declared Arrow-batched
    vector-math operators: no row-at-a-time Python evals anywhere, and
    no Arrow evals outside the allowlist."""
    for name, spec in {**DECLARED_QUERIES, **LLM_QUERIES}.items():
        plan = _plan(spec.builder(spark, SF))
        assert "BatchEvalPython" not in plan, name
        if name not in _ARROW_ALLOWED:
            assert "ArrowEvalPython" not in plan, name


def test_minhash_generates_not_reevaluates(spark):
    """The minhash signature must be produced by Generate barriers
    (attribute materialization), never inlined md5 chains duplicated
    per output column: exactly one md5-bearing operator."""
    df = LLM_QUERIES["llm_minhash"].builder(spark, SF)
    plan = _plan(df)
    md5_ops = [ln for ln in plan.splitlines() if "md5(" in ln]
    assert len(md5_ops) == 1, f"md5 appears in {len(md5_ops)} operators"


def test_topk_is_takeordered_not_global_sort(spark):
    """Brute-force ANN ends in TakeOrderedAndProject (per-partition
    top-k + driver merge of k rows), not a full sort of all scores."""
    from temp_data_pipeline_spark.llm import similarity
    from temp_data_pipeline_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    topk = similarity.cosine_topk(e.filter(F.col("vec_id") != 0), qvec, k=10)
    assert "TakeOrderedAndProject" in _plan(topk)


def test_events_scan_prunes_partitions_by_filter(spark):
    """A ts-range filter on events reaches the parquet reader as a
    pushed predicate (partition/row-group pruning at scale)."""
    from pyspark.sql import functions as F

    from temp_data_pipeline_spark.sources.registry import load_table

    e = load_table(spark, SF, "events")
    if dict(e.dtypes).get("ts") != "timestamp":
        pytest.skip("nanos fallback path: filter applies post-cast")
    plan = _plan(e.filter(F.col("event_id") >= 100).select("event_id"))
    assert "PushedFilters: [IsNotNull(event_id), GreaterThanOrEqual(event_id,100)" in plan


def test_gopher_and_stratified_are_maponly(spark):
    """Quality filtering and stratified sampling must be pure map
    stages: zero exchanges, zero Python evals."""
    for name in ("llm_gopher", "llm_stratified"):
        df = LLM_QUERIES[name].builder(spark, SF)
        # strip the conformance queries' presorted() ordering exchange:
        # gate the operator expressions themselves
        plan = _plan(df.limit(10**9))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_keep_latest_single_exchange(spark):
    """CDC keep-latest = one hash exchange on the merge key + one
    in-partition sort (no join, no second shuffle)."""
    from temp_data_pipeline_spark.operators.upsert import keep_latest
    from temp_data_pipeline_spark.sources.registry import load_table

    e = load_table(spark, SF, "events")
    plan = _plan(keep_latest(e, ["user_id"], "ts", "event_id"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_cap_bucket_prunes_mapside(spark):
    """The hot-bucket cap must run as WindowGroupLimit BEFORE the
    exchange (Spark 4 pushes the row_number()<=k filter map-side), so
    a million-row bucket is cut to the cap per map partition before
    any bytes shuffle — the property that makes the cap scale-safe."""
    from temp_data_pipeline_spark.llm.dedup import simhash_neardup_pairs
    from temp_data_pipeline_spark.sources.registry import load_table

    d = load_table(spark, SF, "documents")
    # materialize=False keeps the lineage visible through the cap
    plan = _plan(simhash_neardup_pairs(d, max_bucket=1000, materialize=False))
    assert "WindowGroupLimit" in plan
    # partial (pre-shuffle) + final (post-shuffle) per window instance
    assert plan.count("WindowGroupLimit") >= 2


def test_bloom_probe_broadcasts_bitset_and_stays_mapside(spark):
    """The decontamination gate must attach the bitset via a broadcast
    (no shuffle of the train grams before the probe filter) and keep
    the probe as pure JVM expressions — no Python UDF."""
    plan = _plan(LLM_QUERIES["llm_bloom_decontam"].builder(spark, SF))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the probe's word tests must appear as xxhash64 exprs in the plan
    assert "xxhash64" in plan


def test_lsh_matrix_stays_out_of_the_plan(spark):
    """Plane/centroid matrices must NOT enter the plan as thousands of
    inlined float literals (analysis/codegen cost scales with literal
    count, duplicated across self-join branches). With the Arrow
    signature kernel the matrix ships inside the serialized UDF; the
    plan stays compact and the signature appears as one ArrowEval."""
    plan = _plan(LLM_QUERIES["llm_ann_lsh_topk"].builder(spark, SF))
    assert "ArrowEvalPython" in plan
    # a literal-matrix plan inlines hundreds of double literals; the
    # data-shaped plan stays compact
    assert len(plan) < 200_000


def test_temporal_joins_never_cartesian(spark):
    """asof_join and range_join were built to avoid the naive
    inequality-join physical shapes; a plan regression to a cartesian
    or nested-loop join is a scale bug even while results stay right."""
    from temp_data_pipeline_spark.plans.relational_queries import RELATIONAL_QUERIES
    from temp_data_pipeline_spark.plans.temporal_queries import TEMPORAL_QUERIES

    specs = {**TEMPORAL_QUERIES, **RELATIONAL_QUERIES}
    for name in ("q_asof_join", "q_range_join", "q_sessionize", "q_keep_latest"):
        plan = _plan(specs[name].builder(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_funnel_all_gates_in_one_scan(spark):
    """Every curation-funnel gate (gopher, repetition, classifier) is
    a map-only expression: exactly two exchanges total — the dedup
    fingerprint window and the final count aggregate — and no Python
    in the plan."""
    plan = _plan(LLM_QUERIES["llm_curation_funnel"].builder(spark, SF))
    assert plan.count("Exchange") <= 3  # fp window + partial/final agg
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("FileScan") == 1  # one pass over documents


def test_classifier_weights_broadcast(spark):
    """The weight table joins as a broadcast dim, never a shuffle
    join, and scoring stays Python-free."""
    plan = _plan(LLM_QUERIES["llm_classifier"].builder(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_no_cartesian_no_python(spark):
    plan = _plan(LLM_QUERIES["llm_span_dedup"].builder(spark, SF))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filtered_ann_pushes_label_filter(spark):
    plan = _plan(LLM_QUERIES["llm_filtered_ann"].builder(spark, SF))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "label" in pushed


def test_mix_temperature_filter_is_maponly(spark):
    """After the strata-count collect, membership is one filter over
    the scan — no join, no window, no extra exchange on the kept path."""
    from temp_data_pipeline_spark.llm.curate import mix_temperature
    from temp_data_pipeline_spark.sources.registry import load_table

    d = load_table(spark, SF, "documents")
    plan = _plan(mix_temperature(d, strata_col="lang", alpha=0.5))
    assert "Join" not in plan and "Window" not in plan
    assert "Exchange" not in plan
