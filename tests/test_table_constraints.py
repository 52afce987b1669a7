"""Persisted table constraints (versioned.add_table_constraint —
Delta's ALTER TABLE ADD CONSTRAINT): every writer enforces them on
its new rows, they survive carries / MOR merges / maintenance
rewrites, and drop stops enforcement going forward.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import (
    commit_upsert_mor,
    read_table,
)
from temp_data_pipeline_spark.operators.versioned import (
    add_table_constraint,
    commit_version,
    compact_snapshot,
    drop_table_constraint,
    read_manifest,
    table_constraints,
    versions,
)

SCHEMA = "k long, v long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_add_validates_existing_and_gates_writers(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10), (2, 20)]), p)
    add_table_constraint(spark, p, "v_pos", "v > 0")
    assert table_constraints(spark, p) == {"v_pos": "v > 0"}

    # violating append aborts BEFORE the manifest lands
    before = versions(spark, p)[-1]
    with pytest.raises(ValueError, match="v_pos"):
        commit_version(_df(spark, [(3, -5)]), p, carry_from=before)
    assert versions(spark, p)[-1] == before
    # violating MOR upsert aborts too (every writer inherits)
    with pytest.raises(ValueError, match="v_pos"):
        commit_upsert_mor(_df(spark, [(1, -1)]), p, ["k"])
    # clean writes land and carry the constraint forward
    v = commit_version(_df(spark, [(3, 30)]), p, carry_from=before)
    assert read_manifest(spark, p, v)["_table_constraints"] == {
        "v_pos": "v > 0"
    }


def test_add_rejects_when_existing_rows_violate(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, -10)]), p)
    with pytest.raises(ValueError, match="existing row"):
        add_table_constraint(spark, p, "v_pos", "v > 0")
    assert table_constraints(spark, p) == {}
    # NULL passes (SQL semantics): adding over a null row is fine
    p2 = os.path.join(str(tmp_path), "t2")
    commit_version(_df(spark, [(1, None)]), p2)
    add_table_constraint(spark, p2, "v_pos", "v > 0")


def test_constraints_survive_compaction_and_drop(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10)]), p)
    add_table_constraint(spark, p, "v_pos", "v > 0")
    commit_version(_df(spark, [(2, 20)]), p, carry_from=2)
    compact_snapshot(spark, p)
    assert table_constraints(spark, p) == {"v_pos": "v > 0"}
    with pytest.raises(ValueError, match="v_pos"):
        commit_version(
            _df(spark, [(9, -9)]), p, carry_from=versions(spark, p)[-1]
        )
    drop_table_constraint(spark, p, "v_pos")
    assert table_constraints(spark, p) == {}
    commit_version(
        _df(spark, [(9, -9)]), p, carry_from=versions(spark, p)[-1]
    )  # lands post-drop
    assert {r["k"] for r in read_table(spark, p).collect()} == {1, 2, 9}
    # duplicate add / missing drop guard
    add_table_constraint(spark, p, "c", "k < 100")
    with pytest.raises(ValueError, match="already exists"):
        add_table_constraint(spark, p, "c", "k < 10")
    with pytest.raises(ValueError, match="no constraint"):
        drop_table_constraint(spark, p, "nope")
