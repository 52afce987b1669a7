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


def test_salted_join_equals_plain_join(spark):
    from temp_data_pipeline_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, 0) for k in range(1, 20)],
        "k long, payload long",
    )  # key 0 is hot
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(15)], "k long, name string"
    )
    got = salted_join(left, right, ["k"], salt_buckets=8)
    want = left.join(right, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # left join keeps unmatched keys with nulls
    got_l = salted_join(left, right, ["k"], salt_buckets=8, how="left")
    want_l = left.join(right, ["k"], "left")
    assert sorted(map(tuple, got_l.collect()), key=repr) == sorted(
        map(tuple, want_l.collect()), key=repr)


def test_salted_join_spreads_hot_key(spark):
    from temp_data_pipeline_spark.operators.skew import salted_join

    left = spark.createDataFrame([(0, i) for i in range(1000)], "k long, p long")
    right = spark.createDataFrame([(0, "hot")], "k long, name string")
    out = salted_join(left, right, ["k"], salt_buckets=8)
    # join key includes the salt: shuffle spreads the hot key over
    # multiple sub-keys rather than one reducer
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert out.count() == 1000
