"""Incremental change feed (operators/changes.py): O(delta) appended
reads and the insert/delete feed, with the multiset invariant
visible(until) = visible(since) − deletes + inserts."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.changes import (
    changes_between,
    read_appended,
)
from temp_data_pipeline_spark.operators.deletion_vectors import (
    commit_delete_mor,
    commit_upsert_mor,
    read_table,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_merge_cow,
    commit_version,
    read_version,
    rollback,
    versions,
)

SCHEMA = "k long, part string, v long"


def _rows(df, cols):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def _invariant(spark, path, since, until):
    """visible(until) == visible(since) − deletes + inserts."""
    cols = [c for c in read_table(spark, path, until).columns]
    before = _rows(read_table(spark, path, since), cols)
    after = _rows(read_table(spark, path, until), cols)
    feed = changes_between(spark, path, since, until)
    ins = _rows(feed.filter(F.col("_change_type") == "insert").drop("_change_type"), cols)
    dels = _rows(feed.filter(F.col("_change_type") == "delete").drop("_change_type"), cols)
    reconstructed = before.copy()
    reconstructed.subtract(dels)
    reconstructed.update(ins)
    assert +reconstructed == after, (since, until)


def test_appended_reads_only_new_dirs(spark, tmp_path):
    path = os.path.join(str(tmp_path), "app")
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(10)], SCHEMA), path
    )
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(10, 15)], SCHEMA),
        path,
        carry_from=1,
    )
    got = sorted(r["k"] for r in read_appended(spark, path, 1).collect())
    assert got == list(range(10, 15))
    # since == until → empty frame with the table schema
    empty = read_appended(spark, path, 2, 2)
    assert empty.count() == 0 and empty.columns == ["k", "part", "v"]
    # the appended read scans ONLY the new dir's files, never the
    # carried ones
    opened = read_appended(spark, path, 1).inputFiles()
    assert opened and all("/v=2/" in f for f in opened)


def test_append_then_mor_delete_feed(spark, tmp_path):
    path = os.path.join(str(tmp_path), "feed")
    commit_version(
        spark.createDataFrame(
            [(i, "a", i % 3) for i in range(12)], SCHEMA
        ),
        path,
    )
    commit_version(
        spark.createDataFrame([(i, "a", i % 3) for i in range(12, 18)], SCHEMA),
        path,
        carry_from=1,
    )
    v3 = commit_delete_mor(spark, path, "v = 1")  # deletes across both dirs
    feed = changes_between(spark, path, 1, v3)
    ins = sorted(
        r["k"]
        for r in feed.filter(F.col("_change_type") == "insert").collect()
    )
    dels = sorted(
        r["k"]
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    )
    # inserts: appended keys NOT deleted by v3's DV
    assert ins == [k for k in range(12, 18) if k % 3 != 1]
    # deletes: since-visible keys the DV newly covers
    assert dels == [k for k in range(12) if k % 3 == 1]
    _invariant(spark, path, 1, v3)
    _invariant(spark, path, 2, v3)
    # consecutive MOR deletes: only the delta appears
    v4 = commit_delete_mor(spark, path, "k = 0")
    d2 = changes_between(spark, path, v3, v4)
    assert _rows(d2, ["k", "_change_type"]) == Counter([(0, "delete")])
    _invariant(spark, path, v3, v4)


def test_upsert_mor_feed_is_delete_plus_insert(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ups")
    commit_version(
        spark.createDataFrame([(1, "a", 10), (2, "a", 20)], SCHEMA), path
    )
    v2 = commit_upsert_mor(
        spark.createDataFrame([(2, "a", 99), (3, "a", 30)], SCHEMA),
        path,
        ["k"],
    )
    feed = changes_between(spark, path, 1, v2)
    got = _rows(feed, ["k", "v", "_change_type"])
    assert got == Counter(
        [(2, 20, "delete"), (2, 99, "insert"), (3, 30, "insert")]
    )
    _invariant(spark, path, 1, v2)


def test_cow_rewrite_feed_is_coarse_but_invariant(spark, tmp_path):
    """A COW partition rewrite swaps the dir: surviving rows show as
    delete+insert pairs (documented file-level granularity) — the
    multiset invariant still holds exactly."""
    path = os.path.join(str(tmp_path), "cow")
    base = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", i) for i in range(10)], SCHEMA
    )
    commit_merge_cow(base, path, ["k"], "v", "part")
    v2 = commit_merge_cow(
        spark.createDataFrame([(0, "a", 100)], SCHEMA), path, ["k"], "v", "part"
    )
    _invariant(spark, path, 1, v2)
    feed = changes_between(spark, path, 1, v2)
    # partition b untouched: none of its rows appear in the feed
    assert feed.filter(F.col("part") == "b").count() == 0


def test_rollback_resurrects_as_inserts(spark, tmp_path):
    path = os.path.join(str(tmp_path), "rb")
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(6)], SCHEMA), path
    )
    v2 = commit_delete_mor(spark, path, "k >= 4")
    v3 = rollback(spark, path, 1)
    feed = changes_between(spark, path, v2, v3)
    got = _rows(feed, ["k", "_change_type"])
    assert got == Counter([(4, "insert"), (5, "insert")])
    _invariant(spark, path, v2, v3)
    _invariant(spark, path, 1, v3)  # no net change vs v1


def test_feed_after_relocation(spark, tmp_path):
    """The feed rides on relative dir names and relative DV paths, so
    it keeps working on a copied table."""
    import shutil

    src = os.path.join(str(tmp_path), "src")
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(8)], SCHEMA), src
    )
    commit_version(
        spark.createDataFrame([(8, "a", 8)], SCHEMA), src, carry_from=1
    )
    commit_delete_mor(spark, src, "k = 2")
    dst = os.path.join(str(tmp_path), "dst")
    shutil.copytree(src, dst)
    shutil.rmtree(src)
    feed = changes_between(spark, dst, 1)
    got = _rows(feed, ["k", "_change_type"])
    assert got == Counter([(8, "insert"), (2, "delete")])
    _invariant(spark, dst, 1, versions(spark, dst)[-1])
