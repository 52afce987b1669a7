"""CDC replication (operators/replicate.py + streaming/sink.py::
stream_replicate_versioned): apply a change-feed window to a replica
as one MOR commit, batch catch-up bookkeeping, and the exactly-once
streaming composition.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.changes import (
    FeedResetRequired,
    table_changes_keyed,
)
from temp_data_pipeline_spark.operators.deletion_vectors import (
    commit_delete_mor,
    commit_upsert_mor,
    read_table,
)
from temp_data_pipeline_spark.operators.replicate import (
    apply_changes_into,
    replica_of_version,
    replicate_incremental,
    replicate_seed,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    compact_snapshot,
    versions,
)

SCHEMA = "k long, part string, v long"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _base(spark):
    return spark.createDataFrame(
        [(i, "a" if i < 4 else "b", i * 10) for i in range(8)], SCHEMA
    )


def test_batch_replicate_tracks_source(spark, tmp_path):
    """Seed + two incremental catch-ups across an upsert window and a
    delete window: the replica equals the source snapshot after each
    step, and the manifest records which source version it reflects."""
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), src)
    replicate_seed(spark, src, dst, ["k"])
    assert replica_of_version(spark, dst) == 1
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))

    # window 1: an upsert (changed rows + a fresh key)
    commit_upsert_mor(
        spark.createDataFrame([(2, "a", 999), (100, "c", 1)], SCHEMA),
        src,
        ["k"],
    )
    replicate_incremental(spark, src, dst, ["k"])
    assert replica_of_version(spark, dst) == 2
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))

    # window 2: deletes only
    commit_delete_mor(spark, src, "part = 'b'")
    replicate_incremental(spark, src, dst, ["k"])
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))
    # already current: a further catch-up is a no-op (no new version)
    before = versions(spark, dst)[-1]
    replicate_incremental(spark, src, dst, ["k"])
    assert versions(spark, dst)[-1] == before


def test_apply_keyed_feed_semantics(spark, tmp_path):
    """update_preimage rows are dropped, postimages upsert, deletes
    without replacement leave the table, inserts append."""
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), dst)
    feed = spark.createDataFrame(
        [
            (1, "a", 10, "update_preimage"),
            (1, "a", 111, "update_postimage"),
            (7, "b", 70, "delete"),
            (50, "c", 500, "insert"),
        ],
        SCHEMA + ", _change_type string",
    )
    apply_changes_into(spark, feed, dst, ["k"])
    got = {r["k"]: r["v"] for r in read_table(spark, dst).collect()}
    assert got[1] == 111 and got[50] == 500 and 7 not in got
    assert len(got) == 8  # 8 base − 1 delete + 1 insert


def test_apply_rewrite_pair_is_idempotent_upsert(spark, tmp_path):
    """A file-level COW rewrite pair (identical delete+insert for one
    key) nets to an upsert that leaves the row unchanged."""
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), dst)
    feed = spark.createDataFrame(
        [(3, "a", 30, "delete"), (3, "a", 30, "insert")],
        SCHEMA + ", _change_type string",
    )
    apply_changes_into(spark, feed, dst, ["k"])
    assert _rows(read_table(spark, dst)) == _rows(_base(spark))


def test_replicate_rewrite_window_raises(spark, tmp_path):
    """A catch-up window crossing a compaction raises the feed's
    FeedResetRequired — re-seed instead of silently re-copying."""
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), src)
    replicate_seed(spark, src, dst, ["k"])
    commit_version(
        spark.createDataFrame([(200, "c", 2)], SCHEMA),
        src,
        carry_from=1,
    )
    compact_snapshot(spark, src)
    with pytest.raises(FeedResetRequired):
        replicate_incremental(spark, src, dst, ["k"])
    replicate_seed(spark, src, dst, ["k"])  # the documented recovery
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))


def test_stream_replicate_exactly_once(spark, tmp_path):
    """Streaming replication: seed pass, a mutation window (MOR
    delete + upsert + append), then a THIRD pass over the same
    checkpoint — the replica equals the source and the no-op pass
    neither duplicates rows nor mints versions."""
    from temp_data_pipeline_spark.streaming.sink import (
        stream_replicate_versioned,
    )

    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    commit_version(_base(spark), src)

    def one_pass():
        q = stream_replicate_versioned(spark, src, dst, ckpt, ["k"])
        q.awaitTermination(180)

    one_pass()
    assert _rows(read_table(spark, dst)) == _rows(_base(spark))

    commit_delete_mor(spark, src, "k = 0")
    commit_upsert_mor(
        spark.createDataFrame([(4, "b", 444), (300, "c", 3)], SCHEMA),
        src,
        ["k"],
    )
    commit_version(
        spark.createDataFrame([(301, "c", 4)], SCHEMA),
        src,
        carry_from=versions(spark, src)[-1],
    )
    one_pass()
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))

    n_versions = versions(spark, dst)[-1]
    one_pass()  # nothing new: no growth, no new replica versions
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))
    assert versions(spark, dst)[-1] == n_versions


def test_keyed_feed_update_then_delete_nets_to_delete(spark, tmp_path):
    """A key updated then deleted inside one window reaches the
    replica as one delete (the keyed feed nets it); the replica ends
    equal to the source."""
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), src)
    replicate_seed(spark, src, dst, ["k"])
    commit_upsert_mor(
        spark.createDataFrame([(5, "b", 555)], SCHEMA), src, ["k"]
    )
    commit_delete_mor(spark, src, "k = 5")
    feed = table_changes_keyed(spark, src, ["k"], 1)
    assert {r["_change_type"] for r in feed.collect()} == {"delete"}
    replicate_incremental(spark, src, dst, ["k"])
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))


def test_apply_prunes_position_scan_with_zonemaps(
    spark, tmp_path, monkeypatch
):
    """With zone maps on the key, a narrow-key apply opens only the
    files whose ranges can hold the affected keys — never the whole
    target (the O(table)-per-batch trap at 100 TB)."""
    import temp_data_pipeline_spark.operators.zonemap as ZM
    from temp_data_pipeline_spark.operators.zonemap import write_zone_maps

    dst = os.path.join(str(tmp_path), "dst")
    # 4 files with disjoint k ranges (repartitionByRange on k)
    big = spark.createDataFrame(
        [(i, "a", i) for i in range(1000)], SCHEMA
    ).repartitionByRange(4, "k")
    commit_version(big, dst)
    write_zone_maps(spark, dst, ["k"])

    opened: list[list[str]] = []
    real = ZM._read_files

    def recording(spark_, path_, version_, files_, **kw):
        opened.append(sorted(files_))
        return real(spark_, path_, version_, files_, **kw)

    monkeypatch.setattr(ZM, "_read_files", recording)
    feed = spark.createDataFrame(
        [(5, "a", 999, "update_postimage"), (7, "b", 70, "delete")],
        SCHEMA + ", _change_type string",
    )
    apply_changes_into(spark, feed, dst, ["k"])
    # the position scan went through the pruned path and opened a
    # strict subset of the table's files (keys 5 and 7 share a range)
    pruned = [fs for fs in opened if 0 < len(fs) < 4]
    assert pruned, f"no pruned scan recorded: {opened}"
    got = {r["k"]: r["v"] for r in read_table(spark, dst).collect()}
    assert got[5] == 999 and 7 not in got and len(got) == 999


def test_apply_without_zonemaps_falls_back(spark, tmp_path):
    """No sidecar: the apply still lands via the full position scan."""
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), dst)
    feed = spark.createDataFrame(
        [(1, "a", 111, "insert")], SCHEMA + ", _change_type string"
    )
    apply_changes_into(spark, feed, dst, ["k"])
    got = {r["k"]: r["v"] for r in read_table(spark, dst).collect()}
    assert got[1] == 111


def test_empty_window_advances_bookkeeping_without_scan(
    spark, tmp_path, monkeypatch
):
    """A source window with no row changes (e.g. an empty append
    commit) advances replica_of_version with ONE carry commit — the
    target position scan never runs."""
    import temp_data_pipeline_spark.operators.replicate as REPL

    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), src)
    replicate_seed(spark, src, dst, ["k"])
    commit_version(
        spark.createDataFrame([], SCHEMA), src, carry_from=1
    )

    def boom(*a, **k):
        raise AssertionError("position scan ran on an empty window")

    # patch the name replicate actually calls (bound at import)
    monkeypatch.setattr(REPL, "_visible_tagged_for_keys", boom)
    replicate_incremental(spark, src, dst, ["k"])
    assert replica_of_version(spark, dst) == 2
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))


def test_composite_key_replication(spark, tmp_path):
    """Multi-column keys: the apply joins on ALL key columns (a key
    differing in only one column is a different entity)."""
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    schema = "k1 long, k2 string, v long"
    commit_version(
        spark.createDataFrame(
            [(1, "a", 10), (1, "b", 11), (2, "a", 20)], schema
        ),
        src,
    )
    replicate_seed(spark, src, dst, ["k1", "k2"])
    commit_upsert_mor(
        spark.createDataFrame([(1, "a", 999), (3, "c", 30)], schema),
        src,
        ["k1", "k2"],
    )
    commit_delete_mor(spark, src, "k1 = 1 AND k2 = 'b'")
    replicate_incremental(spark, src, dst, ["k1", "k2"])
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))
    got = {
        (r["k1"], r["k2"]): r["v"] for r in read_table(spark, dst).collect()
    }
    # (1,'a') updated, (1,'b') deleted, (2,'a') untouched, (3,'c') new
    assert got == {(1, "a"): 999, (2, "a"): 20, (3, "c"): 30}


def test_replication_follows_add_column_evolution(spark, tmp_path):
    """An add-column evolution on the source flows through the keyed
    feed into the replica: the new column widens the replica schema,
    old replica rows read back NULL, and the replica equals the
    source."""
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    commit_version(_base(spark), src)
    replicate_seed(spark, src, dst, ["k"])
    # source gains a column via an evolving append
    commit_version(
        spark.createDataFrame(
            [(100, "c", 1, "tagged")], SCHEMA + ", note string"
        ),
        src,
        carry_from=1,
        allow_evolution=True,
    )
    replicate_incremental(spark, src, dst, ["k"])
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))
    got = {r["k"]: r["note"] for r in read_table(spark, dst).collect()}
    assert got[100] == "tagged" and got[0] is None
    # next plain window still applies cleanly on the widened replica
    commit_delete_mor(spark, src, "k = 1")
    replicate_incremental(spark, src, dst, ["k"])
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))


def test_metadata_only_window_is_one_carry_commit(
    spark, tmp_path, monkeypatch
):
    """A source backlog of commits that change no rows (persisted
    constraints, renames re-listing the same dirs) advances the
    replica's bookkeeping with one carry commit — no feed pull, no
    position scan, no isEmpty probe (verdict r8 #4's replication
    leg)."""
    import os

    from temp_data_pipeline_spark.operators import replicate as R
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        add_table_constraint,
        commit_version,
        versions,
    )

    src = os.path.join(str(tmp_path), "srcmd")
    dst = os.path.join(str(tmp_path), "dstmd")
    commit_version(
        spark.createDataFrame([(1, 10)], "k long, v long"), src
    )
    R.replicate_seed(spark, src, dst, ["k"])
    add_table_constraint(spark, src, "v_pos", "v > 0")

    def boom(*a, **kw):
        raise AssertionError("no feed pull for a metadata-only window")

    import temp_data_pipeline_spark.operators.changes as C

    monkeypatch.setattr(C, "table_changes_keyed", boom)
    monkeypatch.setattr(R, "apply_changes_into", boom)
    v = R.replicate_incremental(spark, src, dst, ["k"])
    assert R.replica_of_version(spark, dst) == versions(spark, src)[-1]
    assert {(r["k"], r["v"]) for r in read_table(spark, dst).collect()} == {
        (1, 10)
    }
    assert v == versions(spark, dst)[-1]
