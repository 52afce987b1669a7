"""Bucketed-join layout: equal results to a plain join, and the plan
proof — no Exchange on either bucketed side."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from temp_data_pipeline_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    fc = spark.createDataFrame(
        [(f"S{i % 5}", i, float(i)) for i in range(1000)],
        "station_id string, k int, pred double",
    )
    truth = spark.createDataFrame(
        [(f"S{i % 5}", i, float(i) + 1) for i in range(1000)],
        "station_id string, k int, actual double",
    )
    ta, tb = f"fc_{uuid.uuid4().hex[:8]}", f"truth_{uuid.uuid4().hex[:8]}"
    # bucket spec must cover the join key for the exchange to vanish
    write_bucketed(fc, ta, str(tmp_path / "fc"), ["k"], buckets=8, sort_cols=["k"])
    write_bucketed(truth, tb, str(tmp_path / "truth"), ["k"], buckets=8,
                   sort_cols=["k"])

    a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
    joined = a.join(b.hint("merge").drop("station_id"), ["k"])

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: zero shuffle

    # same rows as the plain (shuffling) join
    plain = fc.join(truth.drop("station_id"), ["k"])
    got = sorted(tuple(r) for r in joined.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want

    spark.sql(f"DROP TABLE {ta}")
    spark.sql(f"DROP TABLE {tb}")
