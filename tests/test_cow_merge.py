"""Partition-level copy-on-write MERGE on versioned tables.

The contract under test: `commit_merge_cow` must produce exactly the
rows `commit_merge` (full-rewrite MERGE) would, while physically
writing ONLY the partitions the update batch touches — every other
partition of the previous snapshot is carried by manifest reference
(nested ``v=<N>/part=x`` entries), never copied. Time travel, diffs,
and reference-aware vacuum must keep working across COW chains.
"""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.operators.upsert import merge_upsert
from temp_data_pipeline_spark.operators.versioned import (
    commit_merge_cow,
    read_manifest,
    read_version,
    snapshot_diff,
    vacuum,
    versions,
)

SCHEMA = "k long, part string, val string, ts long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return {tuple(r) for r in df.select("k", "part", "val", "ts").collect()}


def _part_subdirs(table, version):
    root = os.path.join(table, f"v={version}")
    return sorted(
        n for n in os.listdir(root)
        if os.path.isdir(os.path.join(root, n)) and n.startswith("part=")
    )


BASE = [
    (1, "a", "a1", 10),
    (2, "a", "a2", 10),
    (3, "b", "b1", 10),
    (4, "c", "c1", 10),
]


class TestCowMerge:
    def test_first_commit_then_cow_rewrites_only_touched(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        v1 = commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        assert v1 == 1
        updates = _df(spark, [(3, "b", "b1'", 20), (5, "b", "b2", 20)])
        v2 = commit_merge_cow(updates, p, ["k"], "ts", "part")
        assert v2 == 2
        # logical result == the full-rewrite merge
        expect = _rows(merge_upsert(_df(spark, BASE), updates, ["k"], "ts"))
        assert _rows(read_version(spark, p)) == expect
        # physical: v=2 holds ONLY the touched partition
        assert _part_subdirs(p, 2) == ["part=b"]
        # manifest references v1's untouched partitions, never copies
        man = read_manifest(spark, p, 2)
        assert man["data_dirs"] == ["v=1/part=a", "v=1/part=c", "v=2"]
        # time travel to v1 is intact
        assert _rows(read_version(spark, p, 1)) == set(BASE)

    def test_carried_files_are_untouched_bytes(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        before = {
            (f, os.path.getmtime(os.path.join(p, "v=1", "part=a", f)))
            for f in os.listdir(os.path.join(p, "v=1", "part=a"))
        }
        commit_merge_cow(
            _df(spark, [(3, "b", "x", 20)]), p, ["k"], "ts", "part"
        )
        after = {
            (f, os.path.getmtime(os.path.join(p, "v=1", "part=a", f)))
            for f in os.listdir(os.path.join(p, "v=1", "part=a"))
        }
        assert before == after

    def test_chained_cow_merges_and_new_partition(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        u2 = _df(spark, [(3, "b", "b1'", 20)])
        commit_merge_cow(u2, p, ["k"], "ts", "part")
        # third batch touches a carried-nested partition (a) AND an
        # entirely new partition value (d)
        u3 = _df(spark, [(1, "a", "a1'", 30), (9, "d", "d1", 30)])
        v3 = commit_merge_cow(u3, p, ["k"], "ts", "part")
        state = merge_upsert(_df(spark, BASE), u2, ["k"], "ts")
        state = merge_upsert(state, u3, ["k"], "ts")
        assert _rows(read_version(spark, p)) == _rows(state)
        assert _part_subdirs(p, v3) == ["part=a", "part=d"]
        man = read_manifest(spark, p, v3)
        # superseded v=1/part=a dropped; c still from v1, b from v2
        assert man["data_dirs"] == ["v=1/part=c", "v=2/part=b", "v=3"]
        # every version still readable with pruning-friendly layout
        assert read_version(spark, p, 2).count() == 4  # u2 updated, added none
        assert read_version(spark, p, 3).count() == 5  # u3 added k=9

    def test_matches_full_merge_rows_exactly(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import commit_merge

        cow, full = str(tmp_path / "cow"), str(tmp_path / "full")
        batches = [
            _df(spark, BASE),
            _df(spark, [(2, "a", "a2'", 20), (6, "c", "c2", 20)]),
            _df(spark, [(6, "c", "c2'", 30)]),
        ]
        for b in batches:
            commit_merge_cow(b, cow, ["k"], "ts", "part")
            commit_merge(b, full, ["k"], "ts")
        assert _rows(read_version(spark, cow)) == _rows(read_version(spark, full))

    def test_null_partition_value(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        base = BASE + [(7, None, "n1", 10)]
        commit_merge_cow(_df(spark, base), p, ["k"], "ts", "part")
        u = _df(spark, [(7, None, "n1'", 20)])
        v2 = commit_merge_cow(u, p, ["k"], "ts", "part")
        got = _rows(read_version(spark, p))
        assert (7, None, "n1'", 20) in got
        assert (1, "a", "a1", 10) in got
        # only the null partition was rewritten
        man = read_manifest(spark, p, v2)
        assert "v=1/part=a" in man["data_dirs"]
        assert not any(d.endswith("__HIVE_DEFAULT_PARTITION__")
                       for d in man["data_dirs"][:-1] if d.startswith("v=1"))

    def test_vacuum_keeps_referenced_partition_dirs(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        commit_merge_cow(_df(spark, [(3, "b", "x", 20)]), p, ["k"], "ts", "part")
        commit_merge_cow(_df(spark, [(4, "c", "y", 30)]), p, ["k"], "ts", "part")
        dropped = vacuum(spark, p, keep_last=1, orphan_grace=0.0)
        assert dropped == [1, 2]
        assert versions(spark, p) == [3]
        # v=1 and v=2 dirs survive: the kept manifest references them
        assert os.path.isdir(os.path.join(p, "v=1"))
        assert os.path.isdir(os.path.join(p, "v=2"))
        expect = {(1, "a", "a1", 10), (2, "a", "a2", 10),
                  (3, "b", "x", 20), (4, "c", "y", 30)}
        assert _rows(read_version(spark, p)) == expect

    def test_snapshot_diff_across_cow_versions(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        commit_merge_cow(
            _df(spark, [(3, "b", "b1'", 20), (5, "b", "b2", 20)]),
            p, ["k"], "ts", "part",
        )
        d = {r["k"]: r["change_type"]
             for r in snapshot_diff(spark, p, 1, 2, ["k"]).collect()}
        assert d == {3: "changed", 5: "added"}

    def test_unpartitioned_base_raises(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import commit_version

        p = str(tmp_path / "tbl")
        commit_version(_df(spark, BASE), p)  # no partition_by
        with pytest.raises(ValueError, match="not committed partition_by"):
            commit_merge_cow(
                _df(spark, [(3, "b", "x", 20)]), p, ["k"], "ts", "part"
            )

    def test_partition_filter_prunes_carried_branches(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        commit_merge_cow(_df(spark, [(3, "b", "x", 20)]), p, ["k"], "ts", "part")
        plan = (
            read_version(spark, p)
            .filter("part = 'a'")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan


class TestCowDelete:
    def _seed(self, spark, p):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_merge_cow,
        )

        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")

    def test_delete_rewrites_only_touched_partitions(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
        )

        p = str(tmp_path / "tbl")
        self._seed(spark, p)
        v2 = commit_delete_cow(spark, p, "k = 1", "part")
        assert v2 == 2
        got = _rows(read_version(spark, p))
        assert got == {r for r in BASE if r[0] != 1}
        # only partition a (where k=1 lives) was rewritten
        assert _part_subdirs(p, 2) == ["part=a"]
        man = read_manifest(spark, p, 2)
        assert man["data_dirs"] == ["v=1/part=b", "v=1/part=c", "v=2"]
        # v1 still has the deleted row (time travel contract)
        assert _rows(read_version(spark, p, 1)) == set(BASE)

    def test_delete_whole_partition_leaves_empty_rewrite(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
        )

        p = str(tmp_path / "tbl")
        self._seed(spark, p)
        commit_delete_cow(spark, p, "part = 'b'", "part")
        got = _rows(read_version(spark, p))
        assert got == {r for r in BASE if r[1] != "b"}

    def test_noop_delete_returns_current_version(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
            versions,
        )

        p = str(tmp_path / "tbl")
        self._seed(spark, p)
        assert commit_delete_cow(spark, p, "k = 999", "part") == 1
        assert versions(spark, p) == [1]

    def test_null_predicate_rows_are_kept(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
            commit_merge_cow,
        )

        p = str(tmp_path / "tbl")
        rows = BASE + [(8, "a", None, 10)]  # val NULL
        commit_merge_cow(_df(spark, rows), p, ["k"], "ts", "part")
        # predicate val = 'a1' is NULL for k=8 -> k=8 must survive
        commit_delete_cow(spark, p, F.col("val") == "a1", "part")
        got = _rows(read_version(spark, p))
        assert (8, "a", None, 10) in got
        assert all(r[0] != 1 for r in got)

    def test_delete_then_merge_chain(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
            commit_merge_cow,
        )

        p = str(tmp_path / "tbl")
        self._seed(spark, p)
        commit_delete_cow(spark, p, "k = 3", "part")          # drops b's only row
        commit_merge_cow(
            _df(spark, [(9, "c", "c9", 30)]), p, ["k"], "ts", "part"
        )
        got = _rows(read_version(spark, p))
        assert got == {(1, "a", "a1", 10), (2, "a", "a2", 10),
                       (4, "c", "c1", 10), (9, "c", "c9", 30)}


class TestCdcCow:
    def test_mixed_batch_applies_as_set(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_cdc_cow,
            commit_merge_cow,
            read_manifest,
        )

        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        changes = spark.createDataFrame(
            [
                (2, "a", "a2'", 20, "U"),   # update
                (5, "b", "b5", 20, "I"),    # insert
                (3, "b", None, 20, "D"),    # delete (payload ignored)
            ],
            "k long, part string, val string, ts long, op string",
        )
        v2 = commit_cdc_cow(changes, p, ["k"], "ts", "part")
        got = _rows(read_version(spark, p))
        assert got == {(1, "a", "a1", 10), (2, "a", "a2'", 20),
                       (4, "c", "c1", 10), (5, "b", "b5", 20)}
        # only a and b rewritten; c carried
        man = read_manifest(spark, p, v2)
        assert "v=1/part=c" in man["data_dirs"]
        assert _part_subdirs(p, v2) == ["part=a", "part=b"]

    def test_delete_beats_same_batch_upsert(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_cdc_cow,
            commit_merge_cow,
        )

        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        changes = spark.createDataFrame(
            [(3, "b", "resurrect", 99, "U"), (3, "b", None, 20, "D")],
            "k long, part string, val string, ts long, op string",
        )
        commit_cdc_cow(changes, p, ["k"], "ts", "part")
        assert all(r[0] != 3 for r in _rows(read_version(spark, p)))

    def test_first_commit_with_deletes(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_cdc_cow,
        )

        p = str(tmp_path / "tbl")
        changes = spark.createDataFrame(
            [(1, "a", "a1", 10, "I"), (2, "a", "x", 10, "I"),
             (2, "a", None, 10, "D")],
            "k long, part string, val string, ts long, op string",
        )
        commit_cdc_cow(changes, p, ["k"], "ts", "part")
        assert _rows(read_version(spark, p)) == {(1, "a", "a1", 10)}

    def test_first_commit_resolves_within_batch(self, spark, tmp_path):
        # first commit honors the same batch-as-a-set contract as the
        # merge path: duplicate-key upserts collapse last-writer-wins,
        # never seed the table with two rows per key
        from temp_data_pipeline_spark.operators.versioned import (
            commit_cdc_cow,
        )

        p = str(tmp_path / "tbl")
        changes = spark.createDataFrame(
            [(1, "a", "old", 10, "U"), (1, "a", "new", 20, "U")],
            "k long, part string, val string, ts long, op string",
        )
        commit_cdc_cow(changes, p, ["k"], "ts", "part")
        assert _rows(read_version(spark, p)) == {(1, "a", "new", 20)}

    def test_boolean_partition_column(self, spark, tmp_path):
        # partition values compare via Spark's string cast everywhere:
        # Python str(True)='True' vs Spark/Hive 'true' must not make
        # the base filter miss (stale rows surviving the merge)
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
            commit_merge_cow,
        )

        schema = "k long, flag boolean, val string, ts long"
        base = spark.createDataFrame(
            [(1, True, "t1", 10), (2, False, "f1", 10)], schema
        )
        p = str(tmp_path / "tbl")
        commit_merge_cow(base, p, ["k"], "ts", "flag")
        upd = spark.createDataFrame([(1, True, "t1'", 20)], schema)
        commit_merge_cow(upd, p, ["k"], "ts", "flag")
        got = {
            tuple(r)
            for r in read_version(spark, p)
            .select("k", "flag", "val", "ts")
            .collect()
        }
        assert got == {(1, True, "t1'", 20), (2, False, "f1", 10)}
        # and the untouched partition was carried, not copied
        man = read_manifest(spark, p, versions(spark, p)[-1])
        assert any("flag=false" in d for d in man["data_dirs"])
        # COW delete addresses the boolean partition too
        commit_delete_cow(spark, p, "k = 1", "flag")
        got = {tuple(r) for r in read_version(spark, p).select("k").collect()}
        assert got == {(2,)}

    def test_delete_on_uncommitted_table_raises(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_delete_cow,
        )

        with pytest.raises(FileNotFoundError, match="no committed versions"):
            commit_delete_cow(
                spark, str(tmp_path / "nope"), "k = 1", "part"
            )

    def test_compact_preserves_partition_layout(self, spark, tmp_path):
        # compact_snapshot defaults to the layout the manifest records;
        # the documented erasure recipe (delete + compact + vacuum)
        # must leave a table that still takes COW commits
        from temp_data_pipeline_spark.operators.versioned import (
            commit_merge_cow,
            compact_snapshot,
        )

        p = str(tmp_path / "tbl")
        commit_merge_cow(_df(spark, BASE), p, ["k"], "ts", "part")
        commit_merge_cow(
            _df(spark, [(5, "b", "b2", 20)]), p, ["k"], "ts", "part"
        )
        v = compact_snapshot(spark, p)
        assert _part_subdirs(p, v) == ["part=a", "part=b", "part=c"]
        v2 = commit_merge_cow(
            _df(spark, [(6, "c", "c2", 30)]), p, ["k"], "ts", "part"
        )
        assert len(_rows(read_version(spark, p, v2))) == 6


def test_compact_partitions_rewrites_only_selected(spark, tmp_path):
    """Partition-scoped OPTIMIZE: the selected partition's files are
    rewritten (coalesced), every other partition is carried by
    nested reference with untouched mtimes; rows identical; explicit
    values and a where-predicate select the same way; time travel
    intact."""
    from pathlib import Path

    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        compact_partitions,
    )

    path = os.path.join(str(tmp_path), "t")
    rows = [(i, "a" if i % 2 else "b", f"v{i}", 1) for i in range(20)]
    commit_version(
        _df(spark, rows).repartition(6), path, partition_by=["part"]
    )
    # fragment partition 'a' further with appends
    for j in range(2):
        commit_version(
            _df(spark, [(100 + j, "a", f"x{j}", 1)]),
            path,
            carry_from=j + 1,
            partition_by=["part"],
        )
    before = _rows(read_version(spark, path))
    b_files = {
        p: p.stat().st_mtime
        for p in Path(path).rglob("part=b/*.parquet")
    }
    v = compact_partitions(spark, path, "part", values=["a"])
    assert _rows(read_version(spark, path, v)) == before
    # 'a' collapsed to one file in the new version's own dir
    man = read_manifest(spark, path, v)
    dirs = man.get("data_dirs") or [man["data_dir"]]
    new_dirs = [d for d in dirs if "/" not in d]
    assert len(new_dirs) == 1
    written = list(
        (Path(path) / new_dirs[0]).rglob("part=a/*.parquet")
    )
    assert len(written) == 1
    assert not list((Path(path) / new_dirs[0]).rglob("part=b/*.parquet"))
    # 'b' carried by nested reference, bytes untouched
    assert any(d.endswith("part=b") for d in dirs if "/" in d)
    for p, mt in b_files.items():
        assert p.stat().st_mtime == mt
    # time travel to the fragmented version still works
    assert _rows(read_version(spark, path, v - 1)) == before
    # where-form: no-op predicate returns current version
    assert compact_partitions(
        spark, path, "part", where="part = 'zzz'"
    ) == v
    v2 = compact_partitions(spark, path, "part", where="part >= 'b'")
    assert _rows(read_version(spark, path, v2)) == before
    # guards
    with pytest.raises(ValueError, match="exactly one"):
        compact_partitions(spark, path, "part")
    with pytest.raises(ValueError, match="not in"):
        compact_partitions(spark, path, "part", values=["nope"])


def test_optimize_where_sql_statement(spark, tmp_path):
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
    )
    from temp_data_pipeline_spark.sql import SqlEngine

    path = os.path.join(str(tmp_path), "t")
    commit_version(
        _df(
            spark,
            [(i, "a" if i % 2 else "b", f"v{i}", 1) for i in range(10)],
        ).repartition(4),
        path,
        partition_by=["part"],
    )
    e = SqlEngine(spark, {"t": path})
    before = {
        tuple(r)
        for r in e.sql("SELECT k, part, val, ts FROM t").collect()
    }
    v = e.sql("OPTIMIZE t WHERE part = 'a'")
    assert v == 2
    assert {
        tuple(r)
        for r in e.sql("SELECT k, part, val, ts FROM t").collect()
    } == before
    # clustered variant
    v = e.sql("OPTIMIZE t WHERE part = 'b' ZORDER BY (k)")
    assert v == 3
    assert {
        tuple(r)
        for r in e.sql("SELECT k, part, val, ts FROM t").collect()
    } == before


from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=6, deadline=None)
@given(
    data=hst.lists(
        hst.tuples(
            hst.integers(0, 50),
            hst.sampled_from(["a", "b", "c", "d"]),
            hst.integers(0, 5),
        ),
        min_size=4,
        max_size=30,
    ),
    n_appends=hst.integers(0, 2),
    pick=hst.sets(hst.sampled_from(["a", "b", "c", "d"]), min_size=1),
)
def test_compact_partitions_rows_invariant(spark, tmp_path_factory, data, n_appends, pick):
    """Property: for ANY table content, append chain, and partition
    selection, compact_partitions preserves the exact visible multiset
    and only rewrites the selected partitions (values= and the
    equivalent where= agree)."""
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        compact_partitions,
    )

    tmp = tmp_path_factory.mktemp("cpprop")
    path = os.path.join(str(tmp), "t")
    rows = [(k, part, f"v{k}", ts) for k, part, ts in data]
    commit_version(
        _df(spark, rows).repartition(3), path, partition_by=["part"]
    )
    for j in range(n_appends):
        extra = [(1000 + j, p, f"x{j}", 0) for p in sorted({r[1] for r in rows})]
        commit_version(
            _df(spark, extra), path, carry_from=j + 1, partition_by=["part"]
        )
    before = _rows(read_version(spark, path))
    have = {r[1] for r in rows}
    sel = sorted(pick & have) or sorted(have)[:1]
    v = compact_partitions(spark, path, "part", values=sel)
    assert _rows(read_version(spark, path, v)) == before
    # where-form equivalence on a fresh compaction
    v2 = compact_partitions(
        spark, path, "part",
        where="part IN (" + ",".join(f"'{s}'" for s in sel) + ")",
    )
    assert _rows(read_version(spark, path, v2)) == before
    # the new version's own dir holds ONLY the selected partitions
    man = read_manifest(spark, path, v2)
    dirs = man.get("data_dirs") or [man["data_dir"]]
    new_dirs = [d for d in dirs if "/" not in d]
    assert len(new_dirs) == 1
    from pathlib import Path as _Path

    written = {
        p.parent.name.split("=", 1)[1]
        for p in (_Path(path) / new_dirs[0]).rglob("part=*/*.parquet")
    }
    assert written <= set(sel)


def test_compact_partitions_values_normalized_like_dirs(spark, tmp_path):
    """ADVICE r10 #5: values= must normalize through the SAME Spark
    cast-to-string round trip the dir decoder uses — str(True)='True'
    but the hive dir is part=true, so a boolean selection used to fail
    the unknown-partition check despite being valid."""
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        compact_partitions,
    )

    path = os.path.join(str(tmp_path), "boolpart")
    commit_version(
        spark.createDataFrame(
            [(1, True, 10), (2, False, 20), (3, True, 30)],
            "k long, part boolean, v long",
        ).repartition(3),
        path,
        partition_by=["part"],
    )
    def rows3(df):
        return {tuple(r) for r in df.select("k", "part", "v").collect()}

    before = rows3(read_version(spark, path))
    v = compact_partitions(spark, path, "part", values=[True])
    assert rows3(read_version(spark, path, v)) == before
    # a value that can't cast to the partition type fails loudly,
    # never silently selecting the NULL partition
    with pytest.raises(ValueError, match="does not cast"):
        compact_partitions(spark, path, "part", values=["maybe"])
