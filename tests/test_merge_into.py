"""Conditional MERGE INTO (operators/merge.py): clause precedence,
untouched-pair immutability, SET expressions, and guards.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import read_table
from temp_data_pipeline_spark.operators.merge import commit_merge_into
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    versions,
)

SCHEMA = "k long, v long, status string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(spark, path):
    return {
        r["k"]: (r["v"], r["status"])
        for r in read_table(spark, path).collect()
    }


def test_clause_precedence_and_untouched(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(
        _df(
            spark,
            [
                (1, 10, "live"),     # updated (s.v > t.v)
                (2, 20, "expired"),  # s.v <= t.v -> delete clause fires
                (3, 30, "live"),     # matched, neither clause: untouched
                (4, 40, "expired"),  # updated — update wins over delete
            ],
        ),
        path,
    )
    src = _df(
        spark,
        [
            (1, 99, "live"),
            (2, 5, "x"),
            (3, 1, "x"),
            (4, 999, "fresh"),
            (50, 500, "new"),     # unmatched, inserted
            (51, -1, "new"),      # unmatched, insert_when filters out
        ],
    )
    commit_merge_into(
        src,
        path,
        ["k"],
        update_when="s.v > t.v",
        delete_when="t.status = 'expired'",
        insert_when="v >= 0",
    )
    got = _rows(spark, path)
    assert got == {
        1: (99, "live"),
        3: (30, "live"),      # untouched pair keeps ORIGINAL content
        4: (999, "fresh"),    # update clause beat the delete clause
        50: (500, "new"),
    }


def test_update_set_expressions(spark, tmp_path):
    """SET may mix s./t. expressions; unlisted columns default to the
    source's value (SET *)."""
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), path)
    commit_merge_into(
        _df(spark, [(1, 5, "z"), (2, 7, "z")]),
        path,
        ["k"],
        update_when=True,
        update_set={"v": "t.v + s.v", "status": "t.status"},
    )
    assert _rows(spark, path) == {1: (15, "a"), 2: (27, "b")}


def test_insert_only_and_empty_target(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    # empty target: only the insert clause can fire
    commit_merge_into(
        _df(spark, [(1, 1, "a"), (2, -1, "b")]),
        path,
        ["k"],
        insert_when="v > 0",
    )
    assert _rows(spark, path) == {1: (1, "a")}
    # insert-only merge on a live table never touches matched rows
    commit_merge_into(
        _df(spark, [(1, 999, "x"), (3, 3, "c")]),
        path,
        ["k"],
        insert_when=True,
    )
    assert _rows(spark, path) == {1: (1, "a"), 3: (3, "c")}


def test_guards(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    with pytest.raises(ValueError, match="at least one clause"):
        commit_merge_into(_df(spark, [(1, 1, "a")]), path, ["k"])
    with pytest.raises(ValueError, match="update_set without"):
        commit_merge_into(
            _df(spark, [(1, 1, "a")]),
            path,
            ["k"],
            insert_when=True,
            update_set={"v": "s.v"},
        )
    with pytest.raises(ValueError, match="absent from the source"):
        commit_merge_into(
            _df(spark, [(1, 1, "a")]), path, ["missing"], update_when=True
        )


def test_merge_is_one_version_and_time_travelable(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), path)
    commit_merge_into(
        _df(spark, [(1, 11, "a")]),
        path,
        ["k"],
        update_when=True,
        delete_when=True,
    )
    assert versions(spark, path) == [1, 2]
    # v1 unchanged under time travel
    old = {r["k"]: r["v"] for r in read_table(spark, path, 1).collect()}
    assert old == {1: 10, 2: 20}
