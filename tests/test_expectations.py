"""Row-level expectations with quarantine (operators/expectations.py
+ the streaming sink's gated ingest).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.expectations import (
    ExpectationError,
    commit_with_expectations,
    split_expectations,
)
from temp_data_pipeline_spark.operators.versioned import (
    read_version,
    versions,
)

SCHEMA = "k long, v long"
EXPECT = {"v_positive": "v > 0", "k_small": "k < 100"}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_split_and_null_violates(spark):
    good, bad = split_expectations(
        _df(spark, [(1, 5), (2, -1), (200, 5), (300, None)]), EXPECT
    )
    assert sorted(r["k"] for r in good.collect()) == [1]
    got = {r["k"]: r["_violations"] for r in bad.collect()}
    # NULL predicate = violation (DLT semantics); tags in declaration
    # order, comma-joined
    assert got == {
        2: "v_positive",
        200: "k_small",
        300: "v_positive,k_small",
    }


def test_commit_quarantine_and_append(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    v, n = commit_with_expectations(
        _df(spark, [(1, 5), (2, -1)]), path, EXPECT
    )
    assert (v, n) == (1, 1)
    v2, n2 = commit_with_expectations(
        _df(spark, [(3, 7), (200, 1)]), path, EXPECT
    )
    assert (v2, n2) == (2, 1)
    # table accumulated the passing rows across both commits
    assert sorted(
        r["k"] for r in read_version(spark, path).collect()
    ) == [1, 3]
    q = read_version(spark, f"{path}_quarantine")
    assert sorted(
        (r["k"], r["_violations"]) for r in q.collect()
    ) == [(2, "v_positive"), (200, "k_small")]
    # manifests carry the audit trail
    from temp_data_pipeline_spark.operators.versioned import read_manifest

    man = read_manifest(spark, path, 2)
    assert man["_quarantined"] == 1 and "v_positive" in man["_expectations"]


def test_on_violation_drop_and_fail(spark, tmp_path):
    path = os.path.join(str(tmp_path), "d")
    _, n = commit_with_expectations(
        _df(spark, [(1, 5), (2, -1)]), path, EXPECT, on_violation="drop"
    )
    assert n == 1
    assert not versions(spark, f"{path}_quarantine")
    with pytest.raises(ExpectationError, match="v_positive"):
        commit_with_expectations(
            _df(spark, [(2, -1)]),
            os.path.join(str(tmp_path), "f"),
            EXPECT,
            on_violation="fail",
        )
    # fail aborts BEFORE any commit
    assert not versions(spark, os.path.join(str(tmp_path), "f"))


def test_streaming_gated_ingest_exactly_once(spark, tmp_path):
    """Two micro-batches through the gated sink, then a restart over
    the same checkpoint: table and quarantine both exactly-once."""
    from temp_data_pipeline_spark.streaming.sink import (
        stream_append_versioned,
    )

    src = os.path.join(str(tmp_path), "src")
    dest = os.path.join(str(tmp_path), "tbl")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _df(spark, [(1, 5), (2, -1)]).coalesce(1).write.parquet(src)
    _df(spark, [(3, 7), (200, 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run(reader):
        q = stream_append_versioned(
            reader, dest, ckpt, expectations=EXPECT
        )
        q.awaitTermination(180)

    run(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run(spark.readStream.schema(SCHEMA).parquet(src))  # restart: no-op
    assert sorted(
        r["k"] for r in read_version(spark, dest).collect()
    ) == [1, 3]
    assert sorted(
        (r["k"], r["_violations"])
        for r in read_version(spark, f"{dest}_quarantine").collect()
    ) == [(2, "v_positive"), (200, "k_small")]


def test_streaming_upsert_gated(spark, tmp_path):
    """The upsert sink gates batches too: violators quarantine, clean
    rows merge, restart exactly-once on both tables."""
    from temp_data_pipeline_spark.streaming.sink import (
        stream_upsert_versioned,
    )

    src = os.path.join(str(tmp_path), "src")
    dest = os.path.join(str(tmp_path), "tbl")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _df(spark, [(1, 5), (2, -1)]).coalesce(1).write.parquet(src)
    _df(spark, [(1, 7), (200, 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run(reader):
        q = stream_upsert_versioned(
            reader, dest, ckpt, ["k"], expectations=EXPECT
        )
        q.awaitTermination(180)

    run(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run(spark.readStream.schema(SCHEMA).parquet(src))  # restart no-op
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )

    got = {r["k"]: r["v"] for r in read_table(spark, dest).collect()}
    assert got == {1: 7}  # k=1 upserted 5 -> 7; violators never merged
    q = read_version(spark, f"{dest}_quarantine")
    assert sorted((r["k"], r["_violations"]) for r in q.collect()) == [
        (2, "v_positive"),
        (200, "k_small"),
    ]
