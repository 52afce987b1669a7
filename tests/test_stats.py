"""ANALYZE-style table statistics (operators/stats.py)."""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.operators.stats import analyze_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (2, None, 2.5), (10, "c", None)],
        "k long, s string, v double",
    )


def test_per_column_stats_exact(spark):
    out = {r["col_name"]: r for r in analyze_table(_df(spark)).collect()}
    assert set(out) == {"k", "s", "v"}
    k = out["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    # min/max computed on the NATIVE type: numeric 10 > 2, while a
    # string-first cast would have made "10" < "2"
    assert (k["min_s"], k["max_s"]) == ("1", "10")
    s = out["s"]
    assert (s["n_null"], s["n_distinct"], s["min_s"], s["max_s"]) == (1, 3, "a", "c")
    v = out["v"]
    assert (v["n_null"], v["n_distinct"]) == (2, 2)


def test_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    out = {r["col_name"]: r for r in analyze_table(df).collect()}
    assert out["s"]["n_distinct"] == 0
    assert out["s"]["min_s"] is None and out["s"]["max_s"] is None


def test_approx_tier_close_to_exact(spark):
    df = spark.range(10_000).selectExpr("id", "CAST(id % 977 AS STRING) AS s")
    exact = {r["col_name"]: r["n_distinct"]
             for r in analyze_table(df).collect()}
    approx = {r["col_name"]: r["n_distinct"]
              for r in analyze_table(df, approx=True).collect()}
    assert exact["s"] == 977
    assert abs(approx["s"] - 977) / 977 < 0.1
    assert abs(approx["id"] - 10_000) / 10_000 < 0.1


def test_unknown_column_rejected(spark):
    with pytest.raises(ValueError, match="unknown columns"):
        analyze_table(_df(spark), ["nope"])


def test_single_logical_scan(spark):
    plan = (
        analyze_table(_df(spark), ["k", "s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one Expand-based multi-distinct aggregation, not one scan/agg
    # per analyzed column
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Expand" in plan


def test_fk_orphans_finds_only_orphans(spark):
    from temp_data_pipeline_spark.schemas.validate import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99)], "id long, pk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "k long")
    got = sorted(r["id"] for r in fk_orphans(child, parent, "pk", "k").collect())
    assert got == [4]
    # orphan rows come back with their full payload
    cols = fk_orphans(child, parent, "pk", "k").columns
    assert cols == ["pk", "id"] or cols == ["id", "pk"]


def test_fk_orphans_null_child_key_is_not_a_violation(spark):
    # SQL FK semantics (MATCH SIMPLE): a NULL FK never violates --
    # a bare anti-join would report it, since NULL matches no parent
    from temp_data_pipeline_spark.schemas.validate import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id long, pk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "k long")
    got = sorted(r["id"] for r in fk_orphans(child, parent, "pk", "k").collect())
    assert got == [3]
