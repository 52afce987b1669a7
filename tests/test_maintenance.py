"""Lake-maintenance operators: parquet compaction (small files) and
CDC keep-latest/merge upsert."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.compaction import (
    compact_parquet,
    list_parquet_files,
    plan_compaction,
)
from temp_data_pipeline_spark.operators.upsert import keep_latest, merge_upsert


def _fragmented(spark, tmp_path, n_files=40):
    src = str(tmp_path / "frag")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.rand(7).alias("v")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(src)
    return src, df


def test_plan_counts_small_files(spark, tmp_path):
    src, _ = _fragmented(spark, tmp_path)
    plan = plan_compaction(spark, src, target_file_mb=8)
    assert plan.n_files == 40
    assert plan.n_small == 40  # every fragment is far below 4 MB
    assert plan.target_files == 1
    assert plan.needed


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    src, df = _fragmented(spark, tmp_path)
    out = str(tmp_path / "compacted")
    plan = compact_parquet(spark, src, out, target_file_mb=8)
    assert plan.target_files == 1
    files = list_parquet_files(spark, out)
    assert len(files) == 1
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]


def test_compact_sorted_files_are_range_disjoint(spark, tmp_path):
    src = str(tmp_path / "frag2")
    # ~2 MB of incompressible doubles so target_file_mb=1 forces
    # multiple range-partitioned output files
    spark.range(150_000).select(
        F.col("id"), F.rand(3).alias("v"), F.rand(5).alias("w")
    ).repartition(30).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "sorted")
    compact_parquet(spark, src, out, target_file_mb=1, sort_by=["id"])
    files = [p for p, _ in list_parquet_files(spark, out)]
    assert len(files) > 1
    ranges = []
    for p in files:
        r = spark.read.parquet(p).agg(F.min("id"), F.max("id")).first()
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # file-level min/max never overlap


def test_keep_latest_resolves_ties_deterministically(spark):
    rows = [
        (1, 10, datetime(2024, 1, 1, 12), "a"),
        (1, 11, datetime(2024, 1, 1, 12), "b"),  # same ts, higher id wins
        (1, 9, datetime(2024, 1, 2, 12), "c"),  # later ts wins overall
        (2, 5, datetime(2024, 1, 1), "d"),
    ]
    df = spark.createDataFrame(rows, "k long, id long, ts timestamp, v string")
    out = {r["k"]: r for r in keep_latest(df, ["k"], "ts", "id").collect()}
    assert out[1]["id"] == 9 and out[1]["v"] == "c"
    assert out[2]["id"] == 5


def test_merge_upsert_applies_changes_and_appends(spark):
    base = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "old", 1.0), (2, datetime(2024, 1, 1), "keep", 2.0)],
        "k long, ts timestamp, v string, w double",
    )
    updates = spark.createDataFrame(
        [(1, datetime(2024, 2, 1), "new"), (3, datetime(2024, 2, 1), "add")],
        "k long, ts timestamp, v string",  # column subset: w null-fills
    )
    out = {r["k"]: r for r in merge_upsert(base, updates, ["k"], "ts").collect()}
    assert out[1]["v"] == "new" and out[1]["w"] is None
    assert out[2]["v"] == "keep" and out[2]["w"] == 2.0
    assert out[3]["v"] == "add"


def test_zorder_value_golden(spark):
    from temp_data_pipeline_spark.operators.compaction import zorder_value

    df = spark.createDataFrame([(5, 3)], "a long, b long")
    # a=0b101, b=0b011 interleave → 0b011011 = 27
    assert df.select(zorder_value("a", "b").alias("z")).first()["z"] == 27
    # order matters: bit i of a lands at 2i, of b at 2i+1
    df2 = spark.createDataFrame([(1, 0), (0, 1)], "a long, b long")
    zs = [r["z"] for r in df2.select(zorder_value("a", "b").alias("z")).collect()]
    assert zs == [1, 2]


def test_zorder_compaction_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files must have bounding boxes far smaller than the
    full grid in BOTH dimensions — the property lexicographic sort
    only gives you for the leading column."""
    from temp_data_pipeline_spark.operators.compaction import (
        compact_parquet,
        list_parquet_files,
    )

    side = 512
    src = str(tmp_path / "grid")
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
        F.rand(1).alias("pad"),  # incompressible payload → multiple files
        F.rand(2).alias("pad2"),
    )
    grid.repartition(16).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "zordered")
    compact_parquet(spark, src, out, target_file_mb=1, zorder_by=("x", "y"))
    files = [p for p, _ in list_parquet_files(spark, out)]
    assert len(files) >= 4
    x_spans, y_spans = [], []
    for p in files:
        r = spark.read.parquet(p).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).first()
        x_spans.append(r[1] - r[0] + 1)
        y_spans.append(r[3] - r[2] + 1)
    # lexicographic (x, y) sort would leave y_span == side for EVERY
    # file; z-order bounds the span in BOTH dimensions for most files
    # (a file straddling a quadrant boundary can still span one dim)
    assert sum(y_spans) / len(y_spans) <= side * 0.625
    assert sum(x_spans) / len(x_spans) <= side * 0.75
    assert max(y_spans) < side or max(x_spans) < side


def test_merge_rollups_equals_full_recompute(spark):
    from temp_data_pipeline_spark.operators.incremental import merge_rollups

    df = spark.createDataFrame(
        [(i % 5, float(i), i % 8) for i in range(200)], "k long, v double, f long"
    )
    def partial(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"),
            F.expr("bit_or(f)").alias("fl"),
        )
    parts = [partial(df.filter(F.col("v") < 80)),
             partial(df.filter((F.col("v") >= 80) & (F.col("v") < 150))),
             partial(df.filter(F.col("v") >= 150))]
    merged = merge_rollups(parts, ["k"], {"n": "sum", "mx": "max", "fl": "bit_or"})
    full = partial(df)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_merge_rollups_rejects_unmapped_columns(spark):
    from temp_data_pipeline_spark.operators.incremental import merge_rollups

    df = spark.createDataFrame([(1, 2)], "k long, x long")
    with pytest.raises(ValueError, match="without a merger"):
        merge_rollups([df], ["k"], {})


def test_incremental_daily_tmax_hour_mask(spark):
    """Late-arriving hourly files merge into the daily rollup; the
    hour bitmask recovers EXACT distinct-hour coverage, which a
    stored countDistinct could not."""
    from temp_data_pipeline_spark.operators.incremental import (
        daily_tmax_partial,
        merge_daily_tmax,
    )

    schema = ("ts_utc timestamp, station_id string, lat double, lon double, "
              "temp_c double, source string, qc_flags long")
    first = spark.createDataFrame(
        [(datetime(2024, 1, 1, h), "K", 0.0, 0.0, 10.0 + h, "isd", 0)
         for h in range(6)], schema)
    # late file: overlapping hour 5 (no double-count) + new hours 6-8
    late = spark.createDataFrame(
        [(datetime(2024, 1, 1, h), "K", 0.0, 0.0, 20.0 + h, "isd", 1 << h)
         for h in range(5, 9)], schema)
    merged = merge_daily_tmax(
        [daily_tmax_partial(first), daily_tmax_partial(late)]
    ).collect()
    assert len(merged) == 1
    row = merged[0]
    assert row["coverage_hours"] == 9  # hours 0-8, hour 5 counted once
    assert row["tmax_c"] == 28.0  # 20+8 from the late file
    assert row["n_rows"] == 10
    assert row["qc_flags"] == (1 << 5) | (1 << 6) | (1 << 7) | (1 << 8)
