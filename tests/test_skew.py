"""Salted two-stage aggregation: semantics identical to plain groupBy,
plan contains the two-stage shape (two keyed exchanges, salt column in
the first)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain_groupby(spark):
    # zipf-ish skew: key "hot" holds 90% of rows
    rows = [("hot" if i % 10 else "cold", float(i % 97)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    got = {
        r["k"]: r
        for r in salted_agg(
            df, ["k"], [("n", "*", "count"), ("s", "v", "sum"), ("m", "v", "max")],
            salt_buckets=16,
        ).collect()
    }
    want = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("m"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["s"] == pytest.approx(want[k]["s"])
        assert got[k]["m"] == want[k]["m"]


def test_salted_agg_two_stage_plan(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    out = salted_agg(df, ["k"], [("n", "*", "count")], salt_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert plan.count("Exchange hashpartitioning") == 2  # (k,salt) then (k)


def test_salted_agg_rejects_nonalgebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(df, ["k"], [("x", "v", "avg")])
