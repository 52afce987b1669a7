"""SCD Type-2 dimension maintenance (operators/scd.py): interval
bookkeeping, closed-history immutability, and snapshot-at
reconstruction against the source's own time travel.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import (
    commit_delete_mor,
    commit_upsert_mor,
    read_table,
)
from temp_data_pipeline_spark.operators.scd import (
    scd2_catchup,
    scd2_init,
    scd2_of_version,
    scd2_snapshot_at,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    versions,
)

SCHEMA = "k long, part string, v long"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def _base(spark):
    return spark.createDataFrame(
        [(i, "a" if i < 4 else "b", i * 10) for i in range(8)], SCHEMA
    )


def _history(spark, src):
    """v1 base, v2 update k=2 + insert k=100, v3 delete part='b',
    v4 re-insert k=5 (previously deleted)."""
    commit_version(_base(spark), src)
    commit_upsert_mor(
        spark.createDataFrame([(2, "a", 999), (100, "c", 1)], SCHEMA),
        src,
        ["k"],
    )
    commit_delete_mor(spark, src, "part = 'b'")
    commit_upsert_mor(
        spark.createDataFrame([(5, "b", 555)], SCHEMA), src, ["k"]
    )


def test_scd2_intervals(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    dim = os.path.join(str(tmp_path), "dim")
    _history(spark, src)
    # seed retroactively impossible — init reflects LATEST; so build
    # the dim the intended way: init against v1 by replaying commits
    # is covered below via a fresh source; here init at latest then
    # assert the one-version dim is the v4 snapshot
    scd2_init(spark, src, dim, ["k"])
    assert scd2_of_version(spark, dim) == 4
    assert _rows(
        read_table(spark, dim).drop("_valid_from", "_valid_to")
    ) == _rows(read_table(spark, src))


def test_scd2_catchup_full_history(spark, tmp_path):
    """Init at v1, evolve the source, catch up: every interval
    boundary is a source version, snapshot_at(v) reconstructs each
    source snapshot, and closed rows never change afterwards."""
    src = os.path.join(str(tmp_path), "src")
    dim = os.path.join(str(tmp_path), "dim")
    commit_version(_base(spark), src)
    scd2_init(spark, src, dim, ["k"])

    commit_upsert_mor(
        spark.createDataFrame([(2, "a", 999), (100, "c", 1)], SCHEMA),
        src,
        ["k"],
    )
    scd2_catchup(spark, src, dim, ["k"])
    closed_after_v2 = _rows(
        read_table(spark, dim).filter(F.col("_valid_to").isNotNull())
    )

    commit_delete_mor(spark, src, "part = 'b'")
    commit_upsert_mor(
        spark.createDataFrame([(5, "b", 555)], SCHEMA), src, ["k"]
    )
    scd2_catchup(spark, src, dim, ["k"])
    assert scd2_of_version(spark, dim) == 4

    # every source version reconstructs from the dimension
    for v in versions(spark, src):
        assert _rows(scd2_snapshot_at(spark, dim, v)) == _rows(
            read_table(spark, src, v)
        ), f"snapshot_at({v}) diverged"
    # closed history is immutable: rows closed after v2 still there
    now_closed = _rows(
        read_table(spark, dim).filter(F.col("_valid_to").isNotNull())
    )
    for row in closed_after_v2:
        assert row in now_closed
    # k=2's history: (20, [1,2)) then (999, [2,∞))
    hist = sorted(
        (r["_valid_from"], r["_valid_to"], r["v"])
        for r in read_table(spark, dim).filter(F.col("k") == 2).collect()
    )
    assert hist == [(1, 2, 20), (2, None, 999)]
    # k=5 (part b): created v1, deleted v3, re-inserted v4
    hist5 = sorted(
        (r["_valid_from"], r["_valid_to"], r["v"])
        for r in read_table(spark, dim).filter(F.col("k") == 5).collect()
    )
    assert hist5 == [(1, 3, 50), (4, None, 555)]


def test_scd2_noop_and_reserved_columns(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    dim = os.path.join(str(tmp_path), "dim")
    commit_version(_base(spark), src)
    scd2_init(spark, src, dim, ["k"])
    before = versions(spark, dim)[-1]
    scd2_catchup(spark, src, dim, ["k"])  # already current
    assert versions(spark, dim)[-1] == before

    bad = os.path.join(str(tmp_path), "bad")
    commit_version(
        _base(spark).withColumn("_valid_from", F.lit(1)), bad
    )
    with pytest.raises(ValueError, match="reserved"):
        scd2_init(spark, bad, os.path.join(str(tmp_path), "d2"), ["k"])


def test_stream_scd2_dimension(spark, tmp_path):
    """Streaming SCD2 maintenance: the cdc version stream triggers
    per-version catch-ups; a restart over the same checkpoint no-ops;
    every source snapshot reconstructs from the dimension."""
    from temp_data_pipeline_spark.streaming.sink import stream_scd2_versioned

    src = os.path.join(str(tmp_path), "src")
    dim = os.path.join(str(tmp_path), "dim")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    commit_version(_base(spark), src)

    def one_pass():
        q = stream_scd2_versioned(spark, src, dim, ckpt, ["k"])
        q.awaitTermination(180)

    one_pass()  # seeds the dimension at v1
    assert scd2_of_version(spark, dim) == 1

    commit_upsert_mor(
        spark.createDataFrame([(2, "a", 999), (100, "c", 1)], SCHEMA),
        src,
        ["k"],
    )
    commit_delete_mor(spark, src, "part = 'b'")
    one_pass()  # catch-up: two per-version windows
    assert scd2_of_version(spark, dim) == 3
    for v in versions(spark, src):
        assert _rows(scd2_snapshot_at(spark, dim, v)) == _rows(
            read_table(spark, src, v)
        )
    before = versions(spark, dim)[-1]
    one_pass()  # restart on a current source: no new dim versions
    assert versions(spark, dim)[-1] == before


def test_scd2_follows_add_column_and_rejects_drop(spark, tmp_path):
    """An added source column widens the dimension (closed history
    reads NULL there); a dropped column fails loudly instead of
    silently nulling future history."""
    src = os.path.join(str(tmp_path), "src")
    dim = os.path.join(str(tmp_path), "dim")
    commit_version(_base(spark), src)
    scd2_init(spark, src, dim, ["k"])
    commit_version(
        spark.createDataFrame(
            [(100, "c", 999, "tagged")], SCHEMA + ", note string"
        ),
        src,
        carry_from=1,
        allow_evolution=True,
    )
    scd2_catchup(spark, src, dim, ["k"])
    # reconstruction compares on each source version's OWN columns —
    # the dimension (like the source's latest schema) carries the
    # added column as NULL for pre-evolution history
    def rows_r(df):  # None-tolerant ordering (mixed str/None columns)
        cols = sorted(df.columns)
        return sorted(
            (tuple(r[c] for c in cols) for r in df.collect()), key=repr
        )

    for v in versions(spark, src):
        src_v = read_table(spark, src, v)
        snap = scd2_snapshot_at(spark, dim, v).select(*src_v.columns)
        assert rows_r(snap) == rows_r(src_v)
    got = {r["k"]: r["note"] for r in read_table(spark, dim).collect()}
    assert got[100] == "tagged" and got[0] is None

    # a dropped column cannot be represented mid-history
    from pyspark.sql import functions as F

    feed = spark.createDataFrame(
        [(3, "a", "insert")], "k long, part string, _change_type string"
    )
    from temp_data_pipeline_spark.operators.scd import scd2_apply

    with pytest.raises(ValueError, match="dropped column"):
        scd2_apply(spark, feed, dim, ["k"], 99)


def test_catchup_backlog_single_scan_matches_per_version_chain(
    spark, tmp_path, monkeypatch
):
    """Verdict r8 #1: a K-version backlog catch-up runs ONE position
    scan of the dimension (not K) and lands ONE dim commit, while the
    resulting history — every interval boundary — is identical to the
    per-version scd2_apply chain."""
    import os

    from temp_data_pipeline_spark.operators import scd as S
    from temp_data_pipeline_spark.operators.changes import (
        table_changes_keyed,
    )
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        commit_upsert_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        versions,
    )

    SCHEMA = "k long, v long"

    def _df(rows):
        return spark.createDataFrame(rows, SCHEMA)

    # twin sources with the identical 4-window history; each dim is
    # seeded from version 1 BEFORE the backlog lands
    src_b = os.path.join(str(tmp_path), "src_b")
    dim_b = os.path.join(str(tmp_path), "dim_b")
    commit_version(_df([(1, 10), (2, 20), (3, 30)]), src_b)
    S.scd2_init(spark, src_b, dim_b, ["k"])

    # --- reference: apply per version
    src_c = os.path.join(str(tmp_path), "src_c")
    dim_c = os.path.join(str(tmp_path), "dim_c")
    commit_version(_df([(1, 10), (2, 20), (3, 30)]), src_c)
    S.scd2_init(spark, src_c, dim_c, ["k"])
    commit_upsert_mor(_df([(1, 11), (4, 40)]), src_c, ["k"])
    commit_delete_mor(spark, src_c, "k = 2")
    commit_upsert_mor(_df([(1, 12), (2, 21)]), src_c, ["k"])
    commit_upsert_mor(_df([(4, 41)]), src_c, ["k"])
    reflected = S.scd2_of_version(spark, dim_c)
    for v in versions(spark, src_c):
        if v <= reflected:
            continue
        feed = table_changes_keyed(spark, src_c, ["k"], reflected, v)
        S.scd2_apply(spark, feed, dim_c, ["k"], v)
        reflected = v
    expect = {
        (r["k"], r["v"], r["_valid_from"], r["_valid_to"])
        for r in read_table(spark, dim_c).collect()
    }

    # --- batched: same source history on src_b, one catchup
    commit_upsert_mor(_df([(1, 11), (4, 40)]), src_b, ["k"])
    commit_delete_mor(spark, src_b, "k = 2")
    commit_upsert_mor(_df([(1, 12), (2, 21)]), src_b, ["k"])
    commit_upsert_mor(_df([(4, 41)]), src_b, ["k"])
    dim_versions_before = versions(spark, dim_b)
    scans = []
    real = S._visible_tagged_for_keys

    def counting(*a, **kw):
        scans.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(S, "_visible_tagged_for_keys", counting)
    S.scd2_catchup(spark, src_b, dim_b, ["k"])
    monkeypatch.setattr(S, "_visible_tagged_for_keys", real)
    got = {
        (r["k"], r["v"], r["_valid_from"], r["_valid_to"])
        for r in read_table(spark, dim_b).collect()
    }
    assert got == expect
    assert len(scans) == 1  # ONE position scan for the whole backlog
    assert len(versions(spark, dim_b)) == len(dim_versions_before) + 1
    assert S.scd2_of_version(spark, dim_b) == versions(spark, src_b)[-1]
    # snapshot reconstruction still exact at every ingested version
    for v in versions(spark, src_b):
        snap = {
            (r["k"], r["v"])
            for r in S.scd2_snapshot_at(spark, dim_b, v).collect()
        }
        truth = {
            (r["k"], r["v"])
            for r in read_table(spark, src_b, v).collect()
        }
        assert snap == truth, v


def test_catchup_metadata_only_backlog_is_one_carry_commit(
    spark, tmp_path, monkeypatch
):
    """A backlog of commits that change no rows (constraints, renames
    recorded as same-dir manifests) advances the bookkeeping with one
    carry commit and ZERO feed pulls or scans."""
    import os

    from temp_data_pipeline_spark.operators import scd as S
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        add_table_constraint,
        commit_version,
        versions,
    )

    src = os.path.join(str(tmp_path), "srcm")
    dim = os.path.join(str(tmp_path), "dimm")
    commit_version(
        spark.createDataFrame([(1, 10)], "k long, v long"), src
    )
    S.scd2_init(spark, src, dim, ["k"])
    add_table_constraint(spark, src, "v_pos", "v > 0")

    def boom(*a, **kw):
        raise AssertionError("no scan for a metadata-only backlog")

    monkeypatch.setattr(S, "_visible_tagged_for_keys", boom)
    S.scd2_catchup(spark, src, dim, ["k"])
    assert S.scd2_of_version(spark, dim) == versions(spark, src)[-1]
    assert {(r["k"], r["v"]) for r in read_table(spark, dim).collect()} == {
        (1, 10)
    }


def test_backlog_catchup_prunes_position_scan_with_zonemaps(
    spark, tmp_path, monkeypatch
):
    """The batched catch-up's ONE position scan routes through the
    zone-map pruned path: with key stats on a range-laid-out
    dimension, a narrow-key backlog opens a strict subset of the
    dimension's files (the O(table)-per-catchup trap at 100 TB)."""
    import os

    import temp_data_pipeline_spark.operators.zonemap as ZM
    from temp_data_pipeline_spark.operators import scd as S
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_upsert_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version
    from temp_data_pipeline_spark.operators.zonemap import write_zone_maps

    src = os.path.join(str(tmp_path), "srcz")
    dim = os.path.join(str(tmp_path), "dimz")
    SCHEMA = "k long, v long"
    rows = [(i, 10 * i) for i in range(1000)]
    commit_version(
        spark.createDataFrame(rows, SCHEMA).repartitionByRange(4, "k"),
        src,
    )
    # dimension seeded with the same range layout, then zone-mapped
    snap = read_table(spark, src).withColumn(
        "_valid_from", F.lit(1).cast("long")
    ).withColumn("_valid_to", F.lit(None).cast("long"))
    commit_version(
        snap.repartitionByRange(4, "k"),
        dim,
        meta={"scd2_of": src, "scd2_of_version": 1, "scd2_keys": ["k"]},
    )
    write_zone_maps(spark, dim, ["k"])
    # two-version narrow-key backlog (keys 5 and 6 share one range)
    commit_upsert_mor(spark.createDataFrame([(5, 555)], SCHEMA), src, ["k"])
    commit_upsert_mor(spark.createDataFrame([(6, 666)], SCHEMA), src, ["k"])

    opened: list[list[str]] = []
    real = ZM._read_files

    def recording(spark_, path_, version_, files_, **kw):
        opened.append((path_, sorted(files_)))
        return real(spark_, path_, version_, files_, **kw)

    monkeypatch.setattr(ZM, "_read_files", recording)
    S.scd2_catchup(spark, src, dim, ["k"])
    dim_scans = [fs for p, fs in opened if p == dim and 0 < len(fs) < 4]
    assert dim_scans, f"no pruned dimension scan recorded: {opened}"
    got = {
        (r["k"], r["v"], r["_valid_from"], r["_valid_to"])
        for r in read_table(spark, dim).collect()
        if r["k"] in (5, 6)
    }
    assert got == {
        (5, 50, 1, 2), (5, 555, 2, None),
        (6, 60, 1, 3), (6, 666, 3, None),
    }


def test_emptiness_probe_folded_into_position_scan(
    spark, tmp_path, monkeypatch
):
    """Verdict r9 #4: with zone maps on the dimension keys, the
    position scan's eager bounds aggregation doubles as the feed
    emptiness probe (Observation on the feed lineage) — neither
    scd2_apply nor the batched catch-up calls DataFrame.isEmpty, an
    empty window still lands as a carry commit, and a statusTracker
    A/B of the SAME apply with the observed count artificially
    unavailable shows the fold saves exactly one job."""
    from temp_data_pipeline_spark.operators import scd as S
    from temp_data_pipeline_spark.operators.zonemap import write_zone_maps

    src = os.path.join(str(tmp_path), "srco")
    dim = os.path.join(str(tmp_path), "dimo")
    S2 = "k long, v long"
    commit_version(
        spark.createDataFrame([(i, 10 * i) for i in range(1, 101)], S2), src
    )
    scd2_init(spark, src, dim, ["k"])
    write_zone_maps(spark, dim, ["k"])

    df_cls = type(spark.range(1))  # the CONCRETE DataFrame class
    real_is_empty = df_cls.isEmpty
    calls: list[int] = []

    def counting(self):
        calls.append(1)
        return real_is_empty(self)

    monkeypatch.setattr(df_cls, "isEmpty", counting)
    meta = {"scd2_of": src, "scd2_of_version": 1, "scd2_keys": ["k"]}

    # non-empty window through the public apply — no isEmpty call
    feed = spark.createDataFrame([(5, 555)], S2).withColumn(
        "_change_type", F.lit("insert")
    )
    v = S.scd2_apply(spark, feed, dim, ["k"], 2, meta=meta)
    cur = {
        r["k"]: r["v"]
        for r in read_table(spark, dim)
        .filter(F.col("_valid_to").isNull())
        .collect()
    }
    assert cur[5] == 555 and cur[1] == 10
    assert not calls

    # the batched catch-up (production path) — no isEmpty either
    commit_upsert_mor(spark.createDataFrame([(7, 777)], S2), src, ["k"])
    write_zone_maps(spark, dim, ["k"], version=v)
    v = S.scd2_catchup(spark, src, dim, ["k"])
    cur = {
        r["k"]: r["v"]
        for r in read_table(spark, dim)
        .filter(F.col("_valid_to").isNull())
        .collect()
    }
    assert cur[7] == 777 and cur[5] == 555
    assert not calls

    # empty window: the observed n==0 routes to the carry commit
    write_zone_maps(spark, dim, ["k"], version=v)
    before = {
        (r["k"], r["v"], r["_valid_from"], r["_valid_to"])
        for r in read_table(spark, dim).collect()
    }
    v2 = S.scd2_apply(spark, feed.limit(0), dim, ["k"], 99, meta=meta)
    assert v2 == v + 1 and not calls
    assert {
        (r["k"], r["v"], r["_valid_from"], r["_valid_to"])
        for r in read_table(spark, dim).collect()
    } == before

    # statusTracker A/B of the SAME apply shape: forcing the fallback
    # (observed count unavailable) costs exactly one extra job — the
    # isEmpty probe the fold removed
    sc = spark.sparkContext
    write_zone_maps(spark, dim, ["k"], version=v2)
    sc.setJobGroup("scd-fold", "apply, emptiness folded")
    v3 = S.scd2_apply(
        spark,
        spark.createDataFrame([(8, 888)], S2).withColumn(
            "_change_type", F.lit("insert")
        ),
        dim, ["k"], 4, meta=meta,
    )
    jobs_fold = len(
        sc.statusTracker()._jtracker.getJobIdsForGroup("scd-fold")
    )
    assert not calls
    monkeypatch.setattr(S, "_observed_count", lambda obs: None)
    write_zone_maps(spark, dim, ["k"], version=v3)
    sc.setJobGroup("scd-fallback", "apply, fallback probe")
    S.scd2_apply(
        spark,
        spark.createDataFrame([(9, 999)], S2).withColumn(
            "_change_type", F.lit("insert")
        ),
        dim, ["k"], 5, meta=meta,
    )
    jobs_fallback = len(
        sc.statusTracker()._jtracker.getJobIdsForGroup("scd-fallback")
    )
    sc.setJobGroup("scd-probe-done", "")
    assert len(calls) == 1
    assert jobs_fallback == jobs_fold + 1
