"""SHALLOW CLONE (operators/versioned.py::shallow_clone + the
root-aware dir resolution `_dir_root`): zero-copy table references,
independent lifecycles, localization via compact, and the SQL
surface. Semantics follow Delta Lake's published SHALLOW CLONE."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import (
    commit_delete_mor,
    commit_upsert_mor,
    read_table,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    compact_snapshot,
    read_manifest,
    read_version,
    shallow_clone,
    vacuum,
    verify_table,
    versions,
)

SCHEMA = "k long, part string, v long"


def _mk(spark, tmp_path, name="src", partitioned=True, n=6):
    path = os.path.join(str(tmp_path), name)
    commit_version(
        spark.createDataFrame(
            [(i, "a" if i < 3 else "b", 10 * i) for i in range(n)], SCHEMA
        ),
        path,
        partition_by=["part"] if partitioned else None,
    )
    return path


def _ks(spark, path):
    return sorted(r["k"] for r in read_table(spark, path).collect())


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    v = shallow_clone(spark, src, dst)
    assert v == 1
    assert _ks(spark, dst) == list(range(6))
    # zero-copy: the clone's own v-dir holds no parquet bytes
    own = [
        f
        for root, _, files in os.walk(dst)
        for f in files
        if f.endswith(".parquet") and "_dv" not in root
    ]
    assert own == []
    man = read_manifest(spark, dst, 1)
    assert man["cloned_from"]["version"] == 1
    assert set(man["_dir_roots"]) == {"v=1"}
    assert verify_table(spark, dst) == []


def test_clone_lifecycles_are_independent(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    # MOR delete on the CLONE: source unchanged
    commit_delete_mor(spark, dst, "k = 2")
    assert _ks(spark, dst) == [0, 1, 3, 4, 5]
    assert _ks(spark, src) == list(range(6))
    # MOR upsert on the clone
    commit_upsert_mor(
        spark.createDataFrame([(0, "a", 999), (9, "b", 90)], SCHEMA),
        dst,
        ["k"],
    )
    got = {r["k"]: r["v"] for r in read_table(spark, dst).collect()}
    assert got == {0: 999, 1: 10, 3: 30, 4: 40, 5: 50, 9: 90}
    # append on the SOURCE: the clone pinned version 1 and must not
    # see it
    commit_version(
        spark.createDataFrame([(7, "b", 70)], SCHEMA), src, carry_from=1
    )
    assert 7 not in {r["k"] for r in read_table(spark, dst).collect()}
    assert verify_table(spark, dst) == []


def test_clone_of_dv_version_keeps_deletes(spark, tmp_path):
    src = _mk(spark, tmp_path)
    commit_delete_mor(spark, src, "k = 4")
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    assert _ks(spark, dst) == [0, 1, 2, 3, 5]
    # the DV sidecar was copied: the clone resolves it locally
    assert os.path.isdir(os.path.join(dst, "_dv"))
    assert verify_table(spark, dst) == []


def test_clone_version_as_of_and_chain_flattening(spark, tmp_path):
    src = _mk(spark, tmp_path)
    commit_version(
        spark.createDataFrame([(8, "b", 80)], SCHEMA), src, carry_from=1
    )
    dst1 = os.path.join(str(tmp_path), "c1")
    shallow_clone(spark, src, dst1, version=1)  # pre-append state
    assert _ks(spark, dst1) == list(range(6))
    dst2 = os.path.join(str(tmp_path), "c2")
    shallow_clone(spark, dst1, dst2)
    # clone-of-clone references the ORIGINAL byte owner, not c1
    # (c1's own empty dir legitimately stays a c1 reference)
    roots = read_manifest(spark, dst2, 1)["_dir_roots"]
    assert roots["v=1"].endswith("/src")
    assert _ks(spark, dst2) == list(range(6))


def test_compact_localizes_clone(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    v = compact_snapshot(spark, dst)
    man = read_manifest(spark, dst, v)
    assert "_dir_roots" not in man or not man["_dir_roots"]
    # localized bytes: vacuum the clone history, then delete the
    # SOURCE entirely — the clone still reads
    vacuum(spark, dst, keep_last=1, orphan_grace=0.0)
    import shutil

    shutil.rmtree(src)
    assert _ks(spark, dst) == list(range(6))
    assert verify_table(spark, dst) == []


def test_clone_vacuum_never_touches_source_bytes(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    commit_version(
        spark.createDataFrame([(9, "b", 90)], SCHEMA), dst, carry_from=1
    )
    # expire the clone's v1 manifest; source bytes must survive
    vacuum(spark, dst, keep_last=1, orphan_grace=0.0)
    assert _ks(spark, src) == list(range(6))
    assert _ks(spark, dst) == list(range(6)) + [9]


def test_cow_partition_rewrite_on_clone(spark, tmp_path):
    """compact_partitions carves external dirs: rewritten partitions
    land locally, untouched partitions stay source-referenced."""
    from temp_data_pipeline_spark.operators.versioned import (
        compact_partitions,
    )

    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    v = compact_partitions(spark, dst, "part", values=["a"])
    man = read_manifest(spark, dst, v)
    # partition b is carried as a nested reference that resolves to
    # the source via the v=1 head root; partition a was rewritten
    # into a fresh LOCAL dir (no roots entry)
    dirs = man["data_dirs"]
    carried_b = [d for d in dirs if d.endswith("part=b")]
    assert carried_b and carried_b[0].startswith("v=1/")
    ext = man.get("_dir_roots") or {}
    assert ext.get("v=1", "").endswith("/src")
    own = [d for d in dirs if "/" not in d and d not in ext]
    assert own and all(d not in ext for d in own)
    got = {r["k"]: r["v"] for r in read_version(spark, dst, v).collect()}
    assert got == {i: 10 * i for i in range(6)}


def test_streaming_clone_refuses_loudly(spark, tmp_path):
    from temp_data_pipeline_spark.streaming.source import (
        register_versioned_source,
    )

    src = _mk(spark, tmp_path, partitioned=False)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    register_versioned_source(spark)
    out = os.path.join(str(tmp_path), "out")
    ck = os.path.join(str(tmp_path), "ck")
    q = (
        spark.readStream.format("versioned_table")
        .option("path", dst)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="shallow-clone"):
        q.awaitTermination(120)
        raise RuntimeError("stream should have failed")


def test_clone_guards(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    with pytest.raises(ValueError, match="already has versions"):
        shallow_clone(spark, src, dst)
    with pytest.raises(ValueError, match="same path"):
        shallow_clone(spark, src, src)


def test_sql_shallow_clone(spark, tmp_path):
    from temp_data_pipeline_spark.sql import SqlEngine

    src = _mk(spark, tmp_path)
    e = SqlEngine(
        spark, {"t": src}, warehouse=os.path.join(str(tmp_path), "wh")
    )
    v = e.sql("CREATE TABLE c SHALLOW CLONE t")
    assert v == 1
    assert sorted(
        r["k"] for r in e.sql("SELECT k FROM c").collect()
    ) == list(range(6))
    e.sql("DELETE FROM c WHERE k = 0")
    assert sorted(
        r["k"] for r in e.sql("SELECT k FROM c").collect()
    ) == [1, 2, 3, 4, 5]
    assert sorted(
        r["k"] for r in e.sql("SELECT k FROM t").collect()
    ) == list(range(6))
    # clone a pinned version under an explicit location
    loc = os.path.join(str(tmp_path), "c2loc")
    e.sql(f"CREATE TABLE c2 SHALLOW CLONE c VERSION AS OF 1 LOCATION '{loc}'")
    assert sorted(
        r["k"] for r in e.sql("SELECT k FROM c2").collect()
    ) == list(range(6))
    with pytest.raises(ValueError, match="already in the catalog"):
        e.sql("CREATE TABLE c SHALLOW CLONE t")


def test_clone_scan_keeps_pushdown(spark, tmp_path):
    """Root-aware resolution must not cost the scan its pushdown: a
    filter over the clone reaches the parquet scan of the SOURCE
    dirs (PushedFilters), and column pruning holds (ReadSchema)."""
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "clone")
    shallow_clone(spark, src, dst)
    plan = (
        read_version(spark, dst)
        .filter(F.col("k") > 3)
        .select("k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,3)]" in plan
    assert "ReadSchema: struct<k:bigint>" in plan
