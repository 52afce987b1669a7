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
    """visible(until) == visible(since) − deletes + inserts.
    allow_reset: the identity must hold on EVERY window, including
    ones the guard would bounce for being full-pair-priced."""
    cols = [c for c in read_table(spark, path, until).columns]
    before = _rows(read_table(spark, path, since), cols)
    after = _rows(read_table(spark, path, until), cols)
    feed = changes_between(spark, path, since, until, allow_reset=True)
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
    from temp_data_pipeline_spark.operators.changes import FeedResetRequired

    path = os.path.join(str(tmp_path), "rb")
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(6)], SCHEMA), path
    )
    v2 = commit_delete_mor(spark, path, "k >= 4")
    v3 = rollback(spark, path, 1)
    # a restore in the window asks for a resync by default ...
    with pytest.raises(FeedResetRequired):
        changes_between(spark, path, v2, v3)
    # ... and the explicit passthrough still yields the exact feed:
    # the restored (metadata-only) version re-references a smaller
    # DV, so the un-deleted rows resurrect as inserts
    feed = changes_between(spark, path, v2, v3, allow_reset=True)
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


def test_compaction_in_window_requires_reset(spark, tmp_path):
    """Verdict r7 #3: a compaction rewrites every byte, so a window
    crossing it would pair-emit the whole table — raise the retryable
    FeedResetRequired instead; allow_reset=True opts into the full
    pair feed, which still satisfies the multiset invariant."""
    from temp_data_pipeline_spark.operators.changes import (
        FeedResetRequired,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        compact_snapshot,
    )

    path = os.path.join(str(tmp_path), "cmp")
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(6)], SCHEMA), path
    )
    commit_version(
        spark.createDataFrame([(6, "a", 6)], SCHEMA), path, carry_from=1
    )
    v3 = compact_snapshot(spark, path)
    for fn in (changes_between, read_appended):
        with pytest.raises(FeedResetRequired) as exc:
            fn(spark, path, 1, v3)
        assert exc.value.version == v3 and exc.value.kind == "compacted_from"
    # windows NOT crossing the compaction stay guard-free
    assert changes_between(spark, path, 1, 2).count() == 1
    # explicit passthrough: full pair feed, invariant exact
    feed = changes_between(spark, path, 1, v3, allow_reset=True)
    assert feed.filter(F.col("_change_type") == "insert").count() == 7
    assert feed.filter(F.col("_change_type") == "delete").count() == 6
    _invariant(spark, path, 1, v3)


def test_diff_lists_only_delta_dirs(spark, tmp_path, monkeypatch):
    """Verdict r7 #2: shared dir names are immutable and cancel
    WITHOUT a listing — an incremental window on a long carry chain
    walks only the symmetric-difference dirs, O(delta) driver
    metadata, not O(table files)."""
    import temp_data_pipeline_spark.operators.changes as CH

    path = os.path.join(str(tmp_path), "dirs")
    commit_version(
        spark.createDataFrame([(i, "a", i) for i in range(8)], SCHEMA), path
    )
    for v in range(2, 6):  # carry chain: v2..v5, one new dir each
        commit_version(
            spark.createDataFrame([(10 * v, "a", v)], SCHEMA),
            path,
            carry_from=v - 1,
        )
    listed: list[str] = []
    real = CH._list_dir_files

    def counting(spark_, path_, d):
        listed.append(d)
        return real(spark_, path_, d)

    monkeypatch.setattr(CH, "_list_dir_files", counting)
    got = sorted(r["k"] for r in read_appended(spark, path, 4, 5).collect())
    assert got == [50]
    # the window 4→5 shares dirs v=1..v=4: ONLY v=5 may be listed
    assert listed == ["v=5"]
    listed.clear()
    feed = changes_between(spark, path, 3, 5)
    assert sorted(r["k"] for r in feed.collect()) == [40, 50]
    assert sorted(listed) == ["v=4", "v=5"]


def test_dv_delta_scans_only_dv_named_files(spark, tmp_path, monkeypatch):
    """ADVICE r7 (medium): the DV delta over shared files must open
    ONLY the files either endpoint's DV names — a 1-row MOR delete on
    a many-file table scans one file, not the table."""
    import temp_data_pipeline_spark.operators.changes as CH
    from temp_data_pipeline_spark.operators.deletion_vectors import read_dv

    path = os.path.join(str(tmp_path), "dvp")
    commit_version(
        spark.createDataFrame(
            [(i, "a", i) for i in range(16)], SCHEMA
        ).repartition(8),
        path,
    )
    v2 = commit_delete_mor(spark, path, "k = 3")
    scans: list[list[str]] = []
    real = CH._scan_files

    def recording(spark_, path_, version_, files_):
        scans.append(list(files_))
        return real(spark_, path_, version_, files_)

    monkeypatch.setattr(CH, "_scan_files", recording)
    feed = changes_between(spark, path, 1, v2)
    assert _rows(feed, ["k", "_change_type"]) == Counter([(3, "delete")])
    # the shared-file (v=1) scan is pruned to exactly the DV's
    # distinct files — 1 of the 8 base files; the only other scan is
    # the MOR commit's own (empty) v=2 dir as the added set
    dv_files = {r["file"] for r in read_dv(spark, path, v2).collect()}
    assert len(dv_files) == 1
    v1_scanned = sorted(f for s in scans for f in s if f.startswith("v=1/"))
    assert v1_scanned == sorted(dv_files)
    _invariant(spark, path, 1, v2)


def test_feed_across_add_column_evolution(spark, tmp_path):
    """ADVICE r7 (low): since-side scans run under the narrower
    pre-evolution schema; the feed aligns every frame to until's
    schema (absent columns as typed NULLs) instead of letting
    unionByName throw."""
    path = os.path.join(str(tmp_path), "evo")
    commit_version(
        spark.createDataFrame([(i, "a" if i < 3 else "b", i) for i in range(6)], SCHEMA),
        path,
        partition_by=["part"],
    )
    evolved = spark.createDataFrame(
        [(10, "a", 10, "x"), (11, "b", 11, "y")],
        SCHEMA + ", w string",
    )
    commit_version(
        evolved, path, carry_from=1, allow_evolution=True,
        partition_by=["part"],
    )
    # COW-rewrite partition a at the evolved schema: v=1/part=a files
    # become REMOVED entries scanned under v1's 3-column schema
    v3 = commit_merge_cow(
        spark.createDataFrame([(0, "a", 100, "z")], SCHEMA + ", w string"),
        path,
        ["k"],
        "v",
        "part",
    )
    feed = changes_between(spark, path, 1, v3)
    assert set(feed.columns) == {"k", "part", "v", "w", "_change_type"}
    dels = feed.filter(F.col("_change_type") == "delete")
    # removed pre-evolution rows surface w as NULL
    assert dels.filter(F.col("w").isNotNull()).count() == 0
    assert sorted(r["k"] for r in dels.collect()) == [0, 1, 2]
    ins = feed.filter(F.col("_change_type") == "insert")
    got = {(r["k"], r["w"]) for r in ins.collect()}
    assert (0, "z") in got and (10, "x") in got and (11, "y") in got


def test_keyed_cdf_classifies_and_suppresses(spark, tmp_path):
    """table_changes_keyed: updates become pre/post image pairs,
    identical rewrite pairs are suppressed, pure inserts/deletes pass
    through — Delta table_changes semantics over the file-level feed."""
    from temp_data_pipeline_spark.operators.changes import (
        table_changes_keyed,
    )

    path = os.path.join(str(tmp_path), "cdf")
    commit_version(
        spark.createDataFrame(
            [(i, "a", 10 * i) for i in range(6)], SCHEMA
        ),
        path,
    )
    # upsert: k=1 changed, k=2 identical (noise), k=9 new
    v2 = commit_upsert_mor(
        spark.createDataFrame(
            [(1, "a", 999), (2, "a", 20), (9, "a", 90)], SCHEMA
        ),
        path,
        ["k"],
    )
    feed = table_changes_keyed(spark, path, ["k"], 1, v2)
    got = _rows(feed, ["k", "v", "_change_type"])
    assert got == Counter(
        [
            (1, 10, "update_preimage"),
            (1, 999, "update_postimage"),
            (9, 90, "insert"),
        ]
    )  # k=2's identical delete+insert pair is suppressed
    # a plain delete classifies as delete with the old row
    v3 = commit_delete_mor(spark, path, "k = 0")
    d = table_changes_keyed(spark, path, ["k"], v2, v3)
    assert _rows(d, ["k", "v", "_change_type"]) == Counter(
        [(0, 0, "delete")]
    )


def test_keyed_cdf_cow_rewrite_is_noise_free(spark, tmp_path):
    """The COW partition rewrite that pair-emits every surviving row
    at file level nets out to just the touched key at key level."""
    from temp_data_pipeline_spark.operators.changes import (
        table_changes_keyed,
    )

    path = os.path.join(str(tmp_path), "cdfc")
    base = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", i) for i in range(10)], SCHEMA
    )
    commit_merge_cow(base, path, ["k"], "v", "part")
    v2 = commit_merge_cow(
        spark.createDataFrame([(0, "a", 100)], SCHEMA), path, ["k"], "v", "part"
    )
    # file-level feed pairs all 5 rows of partition a; keyed nets to 1
    raw = changes_between(spark, path, 1, v2)
    assert raw.count() == 10  # 5 deletes + 5 inserts
    keyed = table_changes_keyed(spark, path, ["k"], 1, v2)
    assert _rows(keyed, ["k", "v", "_change_type"]) == Counter(
        [(0, 0, "update_preimage"), (0, 100, "update_postimage")]
    )


def test_keyed_cdf_guards(spark, tmp_path):
    from temp_data_pipeline_spark.operators.changes import (
        FeedResetRequired,
        table_changes_keyed,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        compact_snapshot,
    )

    path = os.path.join(str(tmp_path), "cdfg")
    commit_version(
        spark.createDataFrame([(1, "a", 1)], SCHEMA), path
    )
    commit_version(
        spark.createDataFrame([(2, "a", 2)], SCHEMA), path, carry_from=1
    )
    with pytest.raises(ValueError, match="key columns absent"):
        table_changes_keyed(spark, path, ["nope"], 1, 2)
    v3 = compact_snapshot(spark, path)
    with pytest.raises(FeedResetRequired):
        table_changes_keyed(spark, path, ["k"], 1, v3)
    # allow_reset: the compaction's full-pair noise nets out at key
    # level — only the window's REAL change (k=2 appended at v2)
    # survives; the rewritten-but-unchanged k=1 pair is suppressed
    keyed = table_changes_keyed(spark, path, ["k"], 1, v3, allow_reset=True)
    assert _rows(keyed, ["k", "_change_type"]) == Counter([(2, "insert")])
    # and the window that is ONLY the compaction nets to nothing
    assert (
        table_changes_keyed(
            spark, path, ["k"], 2, v3, allow_reset=True
        ).count()
        == 0
    )


def test_rename_in_window_keys_delete_side_by_field_id(spark, tmp_path):
    """ADVICE r8 #4: a window spanning a metadata-only rename_column
    plus a file-removing commit (a COW rewrite) must emit the removed
    files' delete rows with the renamed column POPULATED — the
    since-side scan resolves old disk names to the new output names by
    stable field id, so keyed consumers (table_changes_keyed,
    replication, SCD2) stay correctly keyed when the renamed column
    is a key."""
    from temp_data_pipeline_spark.operators.changes import (
        table_changes_keyed,
    )
    from temp_data_pipeline_spark.operators.versioned import rename_column

    path = os.path.join(str(tmp_path), "renwin")
    commit_version(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], SCHEMA
        ),
        path,
        partition_by=["part"],
    )
    rename_column(spark, path, "k", "kid")  # metadata-only
    # COW rewrite of part=a: removes its since-era file
    commit_merge_cow(
        spark.createDataFrame([(1, "a", 11)], "kid long, part string, v long"),
        path,
        ["kid"],
        "v",
        "part",
    )
    until = versions(spark, path)[-1]
    feed = changes_between(spark, path, 1, until)
    dels = feed.filter(F.col("_change_type") == "delete").collect()
    # the removed file's rows carry their key under the NEW name
    assert [(r["kid"], r["v"]) for r in dels] == [(1, 10)]
    # multiset identity across the window (the _invariant helper reads
    # the since snapshot under its PRE-rename names, so spell it out):
    # visible(until) = visible(since as renamed) − deletes + inserts
    ins = feed.filter(F.col("_change_type") == "insert").collect()
    assert [(r["kid"], r["v"]) for r in ins] == [(1, 11)]
    after = {
        (r["kid"], r["v"]) for r in read_table(spark, path, until).collect()
    }
    assert after == {(1, 11), (2, 20)}
    # keyed feed: k=1 classifies as an update pair, never as a
    # NULL-keyed spurious insert+delete
    keyed = table_changes_keyed(spark, path, ["kid"], 1, until)
    got = {
        (r["_change_type"], r["kid"], r["v"]) for r in keyed.collect()
    }
    assert got == {
        ("update_preimage", 1, 10),
        ("update_postimage", 1, 11),
    }


def test_stream_cdc_rename_in_window_keys_removed_files(spark, tmp_path):
    """The streaming source's twin of the same ADVICE r8 #4 hole:
    removed files resolve their colmap from SINCE's manifest, which
    may predate field-id tracking — the disk mapping then derives
    from the manifests that still record the dir's layout."""
    from temp_data_pipeline_spark.operators.versioned import rename_column
    from temp_data_pipeline_spark.streaming.source import (
        register_versioned_source,
    )

    path = os.path.join(str(tmp_path), "renstream")
    out = os.path.join(str(tmp_path), "renstream_out")
    ckpt = os.path.join(str(tmp_path), "renstream_ckpt")
    commit_version(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], SCHEMA),
        path,
        partition_by=["part"],
    )
    rename_column(spark, path, "k", "kid")
    commit_merge_cow(
        spark.createDataFrame([(1, "a", 11)], "kid long, part string, v long"),
        path,
        ["kid"],
        "v",
        "part",
    )
    register_versioned_source(spark)
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .option("mode", "cdc")
        .option("startingVersion", 1)
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["_change_type"], r["kid"], r["v"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("delete", 1, 10), ("insert", 1, 11)}
