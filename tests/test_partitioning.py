"""Hidden partitioning (Iceberg-style transforms) over versioned
tables: derived layout columns, manifest-recorded specs, and pruned
reads that filter on SOURCE columns only."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from temp_data_pipeline_spark.operators.partitioning import (
    apply_transforms,
    commit_version_transformed,
    parse_transform,
    partition_col_name,
    pruned_between,
    read_version_pruned,
)


def _events(spark):
    rows = [
        (1, datetime(2026, 1, 1, 5), "u1", 10.0),
        (2, datetime(2026, 1, 1, 23), "u2", 20.0),
        (3, datetime(2026, 1, 2, 1), "u1", 30.0),
        (4, datetime(2026, 2, 10, 9), "u3", 40.0),
        (5, datetime(2026, 3, 5, 0), "u2", 50.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, value double"
    )


class TestTransforms:
    def test_parse_and_names(self):
        assert parse_transform("days(ts)") == ("days", None, "ts")
        assert parse_transform("bucket(16, id)") == ("bucket", 16, "id")
        assert partition_col_name("months(ts)") == "_p_months_ts"
        with pytest.raises(ValueError, match="bad transform"):
            parse_transform("weeks(ts)")
        with pytest.raises(ValueError, match="requires a width"):
            parse_transform("bucket(ts)")
        with pytest.raises(ValueError, match="no width"):
            parse_transform("days(3, ts)")

    def test_derived_values(self, spark):
        df, names = apply_transforms(
            _events(spark), ["days(ts)", "bucket(4, user)", "truncate(2, user)"]
        )
        assert names == ["_p_days_ts", "_p_bucket_user", "_p_truncate_user"]
        r = {x["event_id"]: x for x in df.collect()}
        assert r[1]["_p_days_ts"] == "2026-01-01"
        assert r[3]["_p_days_ts"] == "2026-01-02"
        assert 0 <= r[1]["_p_bucket_user"] < 4
        assert r[1]["_p_truncate_user"] == "u1"[:2]
        # same user -> same bucket (layout is a function of the value)
        assert r[1]["_p_bucket_user"] == r[3]["_p_bucket_user"]

    def test_int_truncate(self, spark):
        df = _events(spark).selectExpr("event_id", "event_id * 7 AS k")
        out, _ = apply_transforms(df, ["truncate(10, k)"])
        for r in out.collect():
            assert r["_p_truncate_k"] == (r["k"] // 10) * 10


class TestVersionedIntegration:
    def test_commit_layout_and_manifest(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import read_manifest

        p = str(tmp_path / "tbl")
        v = commit_version_transformed(_events(spark), p, ["days(ts)"])
        man = read_manifest(spark, p, v)
        assert man["transforms"] == ["days(ts)"]
        dirs = sorted(
            d for d in os.listdir(os.path.join(p, "v=1"))
            if d.startswith("_p_days_ts=")
        )
        assert dirs == [
            "_p_days_ts=2026-01-01",
            "_p_days_ts=2026-01-02",
            "_p_days_ts=2026-02-10",
            "_p_days_ts=2026-03-05",
        ]

    def test_pruned_read_filters_on_source_column(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_version_transformed(_events(spark), p, ["days(ts)"])
        out = read_version_pruned(
            spark,
            p,
            between={"ts": (datetime(2026, 1, 1), datetime(2026, 1, 31, 23))},
        )
        assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3]
        # derived layout column never leaks to the reader
        assert not any(c.startswith("_p_") for c in out.columns)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_p_days_ts" in plan

    def test_bucket_eq_pruning_correct_and_pruned(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_version_transformed(_events(spark), p, ["bucket(4, user)"])
        out = read_version_pruned(spark, p, eq={"user": "u2"})
        assert sorted(r["event_id"] for r in out.collect()) == [2, 5]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_p_bucket_user" in plan.split("PartitionFilters")[1][:200]

    def test_multi_transform_and_untransformed_filter(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_version_transformed(
            _events(spark), p, ["months(ts)", "bucket(4, user)"]
        )
        out = read_version_pruned(
            spark,
            p,
            eq={"user": "u1", "value": 30.0},  # value has no transform
            between={"ts": (datetime(2026, 1, 1), datetime(2026, 1, 31))},
        )
        assert [r["event_id"] for r in out.collect()] == [3]

    def test_time_travel_keeps_old_spec(self, spark, tmp_path):
        # v1 daily, v2 monthly: each version prunes with ITS OWN spec
        p = str(tmp_path / "tbl")
        commit_version_transformed(_events(spark), p, ["days(ts)"])
        commit_version_transformed(_events(spark), p, ["months(ts)"])
        v1 = read_version_pruned(
            spark, p, 1,
            between={"ts": (datetime(2026, 1, 1), datetime(2026, 1, 2))},
        )
        v2 = read_version_pruned(
            spark, p, 2,
            between={"ts": (datetime(2026, 1, 1), datetime(2026, 1, 2))},
        )
        assert "_p_days_ts" in v1._jdf.queryExecution().executedPlan().toString()
        assert "_p_months_ts" in v2._jdf.queryExecution().executedPlan().toString()

    def test_bucket_range_rejected(self, spark):
        with pytest.raises(ValueError, match="equality pruning only"):
            pruned_between("bucket(4, user)", "a", "b")


def test_multi_level_layout_end_to_end(spark, tmp_path):
    """Two-level hive layouts: write, read (pruning intact), carry
    appends, SHOW PARTITIONS descent — and the COW ops carve the
    FIRST level (re-committing under the FULL layout, subtrees
    carried whole) while a non-leading carve refuses loudly."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from temp_data_pipeline_spark.operators.versioned import (
        commit_delete_cow,
        commit_version,
        compact_partitions,
        read_version,
        snapshot_partitions,
    )

    path = os.path.join(str(tmp_path), "two")
    df = spark.createDataFrame(
        [
            (i, d, r, 10 * i)
            for i, (d, r) in enumerate(
                (d, r)
                for d in ("2026-01-01", "2026-01-02")
                for r in ("eu", "us")
            )
        ],
        "k long, date string, region string, v long",
    )
    commit_version(df, path, partition_by=["date", "region"])
    commit_version(
        spark.createDataFrame(
            [(9, "2026-01-03", "ap", 90)],
            "k long, date string, region string, v long",
        ),
        path,
        carry_from=1,
    )
    cur = read_version(spark, path)
    assert cur.count() == 5
    # both partition levels prune
    assert cur.filter(
        (F.col("date") == "2026-01-01") & (F.col("region") == "us")
    ).count() == 1
    parts = [
        (r["date"], r["region"])
        for r in snapshot_partitions(spark, path).collect()
    ]
    assert ("2026-01-03", "ap") in parts and len(parts) == 5
    # COW carves the FIRST level of a multi-level layout: the rewrite
    # re-commits under the FULL layout, carried date-dirs bring their
    # region subtrees whole
    from temp_data_pipeline_spark.operators.versioned import read_manifest

    v = compact_partitions(spark, path, "date", values=["2026-01-01"])
    man = read_manifest(spark, path, v)
    assert man["_partition_by"] == ["date", "region"]
    after = read_version(spark, path)
    assert after.count() == 5
    assert sorted(
        (r["k"], r["date"], r["region"], r["v"]) for r in after.collect()
    ) == sorted(
        (r["k"], r["date"], r["region"], r["v"]) for r in cur.collect()
    )
    assert after.filter(
        (F.col("date") == "2026-01-02") & (F.col("region") == "eu")
    ).count() == 1
    # first-level COW delete on the compacted two-level table
    commit_delete_cow(spark, path, F.col("k") == 0, "date")
    assert read_version(spark, path).count() == 4
    assert read_manifest(
        spark, path, v + 1
    )["_partition_by"] == ["date", "region"]
    # carving a NON-leading column still refuses: its values spread
    # across every first-level dir — nothing to carry
    with pytest.raises(ValueError, match="FIRST-level"):
        compact_partitions(spark, path, "region", values=["us"])
