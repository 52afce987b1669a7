"""Versioned bucketed layout (operators/bucketing.py): bucket files
inside the commit protocol, co-located joins with time travel, bucket
pruning, carry-commit spec inheritance, and the rebucket maintenance
pass.  Plan assertions are the point — the rows are pinned by the
q_bucket_join oracle; these pin the *physical* story."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.bucketing import (
    bucket_spec,
    bucketed_join,
    commit_bucketed,
    read_bucketed,
    rebucket,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    read_version,
    versions,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _frame(spark, n=1000, mod=50, tag="x"):
    return spark.range(n).select(
        (F.col("id") % mod).cast("int").alias("k"),
        F.col("id").cast("int").alias("seq"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("payload"),
    )


def test_bucketed_commit_roundtrip_and_file_shape(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _frame(spark)
    v = commit_bucketed(df, path, bucket_by=["k"], n_buckets=8)
    assert v == 1
    assert bucket_spec(spark, path) == {
        "bucket_by": ["k"],
        "n": 8,
        "sort_by": ["k"],
    }
    # plain readers see the same rows — bucket files are just parquet
    got = sorted(tuple(r) for r in read_version(spark, path).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    # one file per bucket, Spark's bucket-id suffix in each name
    import os

    files = [
        f
        for f in os.listdir(tmp_path / "t" / "v=1")
        if f.endswith(".parquet")
    ]
    assert len(files) == 8
    assert all(re.search(r"_(\d{5})\.", f) for f in files)
    assert {re.search(r"_(\d{5})\.", f).group(1) for f in files} == {
        f"{i:05d}" for i in range(8)
    }


def test_colocated_join_has_zero_exchange(spark, tmp_path):
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    a, b = _frame(spark, 2000, 64, "a"), _frame(spark, 500, 64, "b")
    commit_bucketed(a, a_path, bucket_by=["k"], n_buckets=8)
    commit_bucketed(
        b.withColumnRenamed("payload", "b_payload").drop("seq"),
        b_path,
        bucket_by=["k"],
        n_buckets=8,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, a_path, b_path, ["k"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        # values equal the plain (shuffling) join
        plain = a.join(
            b.withColumnRenamed("payload", "b_payload").drop("seq"), ["k"]
        )
        got = sorted(tuple(r) for r in joined.collect())
        want = sorted(tuple(r) for r in plain.collect())
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )


def test_bucket_pruning_on_key_equality(spark, tmp_path):
    path = str(tmp_path / "t")
    commit_bucketed(_frame(spark), path, bucket_by=["k"], n_buckets=8)
    # Spark's DisableUnnecessaryBucketedScan rule un-buckets a scan
    # that feeds no distribution-requiring operator — which also drops
    # bucket PRUNING.  Pruning-only workloads (point lookups) pin the
    # scan bucketed via the documented switch.
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = read_bucketed(spark, path).filter(F.col("k") == 7)
        plan = _plan(df)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"no bucket pruning in plan:\n{plan}"
        assert m.group(1) == "1" and m.group(2) == "8"
        assert df.count() == 1000 // 50 * 1  # k==7 rows
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )


def test_append_breaks_colocation_and_rebucket_restores(spark, tmp_path):
    path = str(tmp_path / "t")
    commit_bucketed(_frame(spark, 600, 10, "a"), path, bucket_by=["k"], n_buckets=4)
    # plain carry append: spec inherited, locality broken
    commit_version(_frame(spark, 100, 10, "b"), path, carry_from=1)
    assert bucket_spec(spark, path) == bucket_spec(spark, path, 1)
    with pytest.warns(UserWarning, match="lost physical co-location"):
        df = read_bucketed(spark, path)
    assert df.count() == 700
    # rebucket: one rewrite, locality (and the fast path) back
    v = rebucket(spark, path)
    assert v == 3 and versions(spark, path) == [1, 2, 3]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        df2 = read_bucketed(spark, path)
    assert df2.count() == 700
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        assert "SelectedBucketsCount" in _plan(df2.filter(F.col("k") == 3))
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
    # idempotent: already co-located → no new version
    assert rebucket(spark, path) == 3


def test_layout_mismatch_and_guards(spark, tmp_path):
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    commit_bucketed(_frame(spark), a_path, bucket_by=["k"], n_buckets=8)
    commit_bucketed(_frame(spark), b_path, bucket_by=["k"], n_buckets=4)
    with pytest.raises(ValueError, match="counts differ"):
        bucketed_join(spark, a_path, b_path, ["k"])
    with pytest.raises(ValueError, match="must cover the bucket columns"):
        bucketed_join(spark, a_path, a_path, ["seq"])
    with pytest.raises(ValueError, match="not in frame columns"):
        commit_bucketed(
            _frame(spark), str(tmp_path / "c"), bucket_by=["nope"], n_buckets=2
        )
    with pytest.raises(ValueError, match="no _bucket_spec"):
        p = str(tmp_path / "plain")
        commit_version(_frame(spark), p)
        read_bucketed(spark, p)


def test_constraints_enforced_on_bucketed_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(ValueError, match="CHECK constraint violations"):
        commit_bucketed(
            _frame(spark),
            path,
            bucket_by=["k"],
            n_buckets=4,
            checks={"k_small": "k < 10"},
        )
    assert versions(spark, path) == []  # rejected commit left nothing
    commit_bucketed(
        _frame(spark),
        path,
        bucket_by=["k"],
        n_buckets=4,
        checks={"k_ok": "k < 50"},
    )
    assert read_bucketed(spark, path).count() == 1000


def test_coalesced_bucket_counts_join_without_exchange(spark, tmp_path):
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    commit_bucketed(_frame(spark, 1000, 32, "a"), a_path, bucket_by=["k"], n_buckets=8)
    commit_bucketed(
        _frame(spark, 300, 32, "b").withColumnRenamed("payload", "bp").drop("seq"),
        b_path,
        bucket_by=["k"],
        n_buckets=4,
    )
    # strict by default: mismatched counts refuse with guidance
    with pytest.raises(ValueError, match="coalesceBucketsInJoin"):
        bucketed_join(spark, a_path, b_path, ["k"])
    saved = {
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled": spark.conf.get(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        ),
    }
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, a_path, b_path, ["k"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        plain = _frame(spark, 1000, 32, "a").join(
            _frame(spark, 300, 32, "b")
            .withColumnRenamed("payload", "bp")
            .drop("seq"),
            ["k"],
        )
        assert joined.count() == plain.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_compact_snapshot_drops_spec_overwrite_keeps_it(spark, tmp_path):
    """compact_snapshot rewrites PLAIN files — carrying _bucket_spec
    over them would make the catalog-registered join read wrong
    buckets silently, so the spec must drop; SQL INSERT OVERWRITE on
    a bucketed table instead rewrites THROUGH the bucketed writer and
    keeps the layout."""
    from temp_data_pipeline_spark.operators.versioned import (
        compact_snapshot,
    )
    from temp_data_pipeline_spark.sql import SqlEngine

    path = str(tmp_path / "t")
    commit_bucketed(_frame(spark, 400, 8, "a"), path, bucket_by=["k"], n_buckets=4)
    commit_version(_frame(spark, 100, 8, "b"), path, carry_from=1)
    compact_snapshot(spark, path)
    assert bucket_spec(spark, path) is None  # plain files, no lie
    with pytest.raises(ValueError, match="no _bucket_spec"):
        read_bucketed(spark, path)
    # fresh bucketed table driven through the console
    p2 = str(tmp_path / "wh" / "t2")
    e = SqlEngine(spark, {}, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE t2 CLUSTERED BY (k) INTO 4 BUCKETS AS "
        "SELECT CAST(id % 8 AS INT) AS k, id AS v FROM range(200)"
    )
    e.sql("INSERT OVERWRITE t2 SELECT CAST(id % 8 AS INT) AS k, id AS v FROM range(50)")
    assert bucket_spec(spark, p2) == {
        "bucket_by": ["k"], "n": 4, "sort_by": ["k"],
    }
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # still co-located: no fallback
        assert read_bucketed(spark, p2).count() == 50


def test_compact_incremental_spec_rules(spark, tmp_path):
    from temp_data_pipeline_spark.operators.versioned import (
        compact_incremental,
    )

    path = str(tmp_path / "t")
    commit_bucketed(_frame(spark, 400, 8, "a"), path, bucket_by=["k"], n_buckets=4)
    commit_version(_frame(spark, 100, 8, "b"), path, carry_from=1)
    # everything is tiny: the whole chain collapses to ONE plain dir —
    # the spec must drop (plain files can't honor it)
    v = compact_incremental(spark, path, small_bytes=1 << 30)
    assert v == 3
    assert bucket_spec(spark, path) is None
    assert read_version(spark, path).count() == 500


def test_mor_delete_keeps_colocated_join(spark, tmp_path):
    """A deletion vector does not cost the co-located join: the DV
    subtracts via broadcast anti-join (partitioning-preserving), so a
    co-bucketed join over a MOR-deleted table still plans with zero
    Exchange; rebucket() materializes the deletes back into clean
    bucket files."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
    )

    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    commit_bucketed(_frame(spark, 800, 16, "a"), a_path, bucket_by=["k"], n_buckets=4)
    commit_bucketed(
        _frame(spark, 200, 16, "b").withColumnRenamed("payload", "bp").drop("seq"),
        b_path,
        bucket_by=["k"],
        n_buckets=4,
    )
    commit_delete_mor(spark, a_path, F.col("seq") % 2 == 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, a_path, b_path, ["k"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # ONE broadcast exchange for the DV is fine; no shuffle
        # exchange on either bucketed side
        assert "Exchange hashpartitioning" not in plan
        assert "BroadcastHashJoin" in plan  # the DV anti-join
        plain = (
            _frame(spark, 800, 16, "a")
            .filter(F.col("seq") % 2 != 0)
            .join(
                _frame(spark, 200, 16, "b")
                .withColumnRenamed("payload", "bp")
                .drop("seq"),
                ["k"],
            )
        )
        got = sorted(tuple(r) for r in joined.collect())
        want = sorted(tuple(r) for r in plain.collect())
        assert got == want
        # rebucket materializes the DV into clean bucket files
        v = rebucket(spark, a_path)
        assert v == 3
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            df = read_bucketed(spark, a_path)
        assert df.count() == 400
        assert "BroadcastHashJoin" not in _plan(df)  # DV gone
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)


def test_registration_refreshes_on_schema_change(spark, tmp_path):
    """ADD COLUMN (metadata-only commit over the SAME live dir) must
    not serve a stale catalog registration — the cache key
    fingerprints the schema, so the widened snapshot reads the new
    column as NULL and time travel still sees the old shape."""
    from temp_data_pipeline_spark.operators.versioned import add_column

    path = str(tmp_path / "t")
    commit_bucketed(_frame(spark, 200, 8, "a"), path, bucket_by=["k"], n_buckets=4)
    assert "note" not in read_bucketed(spark, path).columns
    add_column(spark, path, "note", "string")
    df = read_bucketed(spark, path)
    assert "note" in df.columns
    assert df.filter(F.col("note").isNull()).count() == 200
    # time travel to v1 keeps the old shape
    assert "note" not in read_bucketed(spark, path, 1).columns
