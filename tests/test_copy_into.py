"""COPY INTO (operators/copy_into.py + the SQL statement): idempotent
incremental file loading with the manifest-as-ledger design."""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.operators.copy_into import (
    copied_files,
    copy_into,
)
from temp_data_pipeline_spark.operators.versioned import (
    read_manifest,
    read_version,
    versions,
)

SCHEMA = "k long, v long, tag string"


def _land(spark, d, name, rows):
    """Write one parquet file (single task) into the landing dir."""
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, name))
    # spark writes a DIR per file; COPY globs part files inside
    return os.path.join(d, name)


def _ks(spark, path):
    return sorted(r["k"] for r in read_version(spark, path).collect())


def test_incremental_and_idempotent(spark, tmp_path):
    land = os.path.join(str(tmp_path), "landing")
    _land(spark, land, "a", [(1, 10, "x"), (2, 20, "x")])
    t = os.path.join(str(tmp_path), "t")
    v, n = copy_into(spark, t, land, pattern="*/part-*.parquet")
    assert (v, n) == (1, 1)
    assert _ks(spark, t) == [1, 2]
    # re-run: nothing new
    v, n = copy_into(spark, t, land, pattern="*/part-*.parquet")
    assert (v, n) == (1, 0)
    # second wave loads ONLY the new file
    _land(spark, land, "b", [(3, 30, "y")])
    v, n = copy_into(spark, t, land, pattern="*/part-*.parquet")
    assert (v, n) == (2, 1)
    assert _ks(spark, t) == [1, 2, 3]
    # ledger = union of manifest records
    assert len(copied_files(spark, t)) == 2
    man = read_manifest(spark, t, 2)
    assert len(man["_copied_files"]) == 1
    # and again: stable
    v, n = copy_into(spark, t, land, pattern="*/part-*.parquet")
    assert (v, n) == (2, 0)


def test_relaxed_schema_alignment(spark, tmp_path):
    land = os.path.join(str(tmp_path), "landing")
    _land(spark, land, "a", [(1, 10, "x")])
    t = os.path.join(str(tmp_path), "t")
    copy_into(spark, t, land, pattern="*/part-*.parquet")
    # wave 2: missing nullable column v, extra column z
    spark.createDataFrame(
        [(5, "y", 99)], "k long, tag string, z long"
    ).coalesce(1).write.parquet(os.path.join(land, "b"))
    v, n = copy_into(spark, t, land, pattern="*/part-*.parquet")
    assert n == 1
    got = {r["k"]: (r["v"], r["tag"]) for r in read_version(spark, t).collect()}
    assert got == {1: (10, "x"), 5: (None, "y")}
    assert "z" not in read_version(spark, t).columns


def test_csv_format(spark, tmp_path):
    land = os.path.join(str(tmp_path), "csvland")
    os.makedirs(land)
    with open(os.path.join(land, "f1.csv"), "w") as f:
        f.write("k,v,tag\n1,10,x\n2,20,y\n")
    t = os.path.join(str(tmp_path), "t")
    v, n = copy_into(spark, t, land, file_format="csv", pattern="*.csv")
    assert (v, n) == (1, 1)
    assert _ks(spark, t) == [1, 2]


def test_sql_copy_into(spark, tmp_path):
    from temp_data_pipeline_spark.sql import SqlEngine

    land = os.path.join(str(tmp_path), "landing")
    _land(spark, land, "a", [(1, 10, "x")])
    t = os.path.join(str(tmp_path), "t")
    # seed the table so COPY INTO has a typed target
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
    )

    commit_version(spark.createDataFrame([(0, 0, "seed")], SCHEMA), t)
    e = SqlEngine(spark, {"t": t})
    v = e.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        "PATTERN = '*/part-*.parquet'"
    )
    assert v == 2
    assert sorted(
        r["k"] for r in e.sql("SELECT k FROM t").collect()
    ) == [0, 1]
    # idempotent via SQL too: version unchanged
    assert e.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        "PATTERN = '*/part-*.parquet'"
    ) == 2
    with pytest.raises(ValueError, match="FILEFORMAT"):
        e.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = AVRO")


def test_batch_cap(spark, tmp_path):
    land = os.path.join(str(tmp_path), "landing")
    for i, name in enumerate(("a", "b", "c")):
        _land(spark, land, name, [(i, i * 10, name)])
    t = os.path.join(str(tmp_path), "t")
    v, n = copy_into(
        spark, t, land, pattern="*/part-*.parquet", max_files=2
    )
    assert (v, n) == (1, 2)
    v, n = copy_into(
        spark, t, land, pattern="*/part-*.parquet", max_files=2
    )
    assert (v, n) == (2, 1)
    assert _ks(spark, t) == [0, 1, 2]
