"""File-level zone maps + Z-order clustering (operators/zonemap.py).

The contract: `read_version_skipped` returns EXACTLY what
`read_version(...).filter(...)` would — skipping only decides how few
files get opened — and after `optimize_zorder` a multi-column box
query must open strictly fewer files than the unclustered layout.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    read_version,
)
from temp_data_pipeline_spark.operators.zonemap import (
    optimize_zorder,
    read_version_skipped,
    read_zone_maps,
    select_files,
    write_zone_maps,
)


def _grid(spark, n=10000, files=8):
    # x walks 0..99 cyclically, y decorrelated — random-ish layout
    return (
        spark.range(0, n)
        .select(
            F.col("id"),
            (F.col("id") % 100).alias("x"),
            ((F.col("id") * 37) % 100).alias("y"),
        )
        .repartition(files)
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = os.path.join(str(tmp_path), "zm")
    commit_version(_grid(spark), path)
    write_zone_maps(spark, path, ["x", "y", "id"])
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_stats_match_per_file_truth(spark, table):
    zm = read_zone_maps(spark, table).collect()
    # sidecars key files RELATIVE to the table root (r7, relocation
    # safety) — re-derive the same form from the metadata column
    rel = F.concat(
        F.lit("v="), F.substring_index(F.col("_metadata.file_path"), "/v=", -1)
    )
    truth = {
        r["file"]: r
        for r in read_version(spark, table)
        .groupBy(rel.alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    assert len(zm) == len(truth) > 1
    for r in zm:
        t = truth[r["file"]]
        assert r["n_rows"] == t["n"]
        assert r["stats_x"]["min"] == t["mn"]
        assert r["stats_x"]["max"] == t["mx"]
        assert r["stats_x"]["nulls"] == 0


def test_skipped_read_is_transparent(spark, table):
    preds = [("x", ">=", 10), ("x", "<=", 12)]
    got = sorted(
        r["id"] for r in read_version_skipped(spark, table, preds).collect()
    )
    want = sorted(
        r["id"]
        for r in read_version(spark, table)
        .filter((F.col("x") >= 10) & (F.col("x") <= 12))
        .collect()
    )
    assert got == want and len(got) == 300


def test_zorder_box_query_opens_fewer_files(spark, table):
    v2 = optimize_zorder(spark, table, ["x", "y"], target_files=16)
    box = [("x", "<=", 20), ("y", "<=", 20)]
    before = select_files(spark, table, box, version=1)
    after = select_files(spark, table, box, version=v2)
    # unclustered: every file spans the full x/y range → none skip
    assert len(before) == 8
    # z-ordered: the corner box lives in a handful of z-contiguous files
    assert len(after) <= 4
    got = sorted(
        r["id"]
        for r in read_version_skipped(spark, table, box, version=v2).collect()
    )
    want = sorted(
        r["id"]
        for r in read_version(spark, table, version=1)
        .filter((F.col("x") <= 20) & (F.col("y") <= 20))
        .collect()
    )
    assert got == want


def test_all_null_file_skips_ranges_but_not_is_null(spark, tmp_path):
    path = os.path.join(str(tmp_path), "nulls")
    good = spark.range(0, 100).select(
        F.col("id"), F.col("id").cast("long").alias("x")
    )
    nulls = spark.range(100, 200).select(
        F.col("id"), F.lit(None).cast("long").alias("x")
    )
    commit_version(
        good.coalesce(1).unionByName(nulls.coalesce(1)).repartition(2, "id"),
        path,
    )
    # force two files with a clean split instead: one all-null file
    shutil.rmtree(path, ignore_errors=True)
    commit_version(good.coalesce(1), path)
    v = commit_version(nulls.coalesce(1), path, carry_from=1)
    write_zone_maps(spark, path, ["x"], version=v)
    # null-rejecting range predicate: the all-null file must not open
    assert len(select_files(spark, path, [("x", ">=", 0)], version=v)) == 1
    # IS NULL probe: only the all-null file opens
    sel = select_files(spark, path, [("x", "is_null")], version=v)
    assert len(sel) == 1
    got = read_version_skipped(spark, path, [("x", "is_null")], version=v)
    assert got.count() == 100
    shutil.rmtree(path, ignore_errors=True)


def test_carried_dirs_and_partition_columns_survive(spark, tmp_path):
    path = os.path.join(str(tmp_path), "carried")
    base = spark.createDataFrame(
        [(i, "a" if i < 50 else "b", i * 10) for i in range(100)],
        "k long, part string, val long",
    )
    commit_version(base, path, partition_by=["part"])
    extra = spark.createDataFrame(
        [(i, "c", i * 10) for i in range(100, 150)],
        "k long, part string, val long",
    )
    v = commit_version(extra, path, carry_from=1, partition_by=["part"])
    write_zone_maps(spark, path, ["val"], version=v)
    out = read_version_skipped(spark, path, [("val", ">=", 400)], version=v)
    # partition column must survive the explicit-file basePath scan
    assert "part" in out.columns
    want = {
        (r["k"], r["part"], r["val"])
        for r in read_version(spark, path, v)
        .filter(F.col("val") >= 400)
        .collect()
    }
    got = {(r["k"], r["part"], r["val"]) for r in out.collect()}
    assert got == want and len(got) == 110
    shutil.rmtree(path, ignore_errors=True)


def test_empty_survivor_set_returns_typed_empty_frame(spark, table):
    out = read_version_skipped(spark, table, [("x", ">", 10_000)])
    assert out.count() == 0
    assert set(out.columns) == {"id", "x", "y"}


def test_guards(spark, table):
    with pytest.raises(ValueError, match="unknown op"):
        select_files(spark, table, [("x", "!=", 3)])
    with pytest.raises(ValueError, match="no stats for column"):
        select_files(spark, table, [("nope", ">=", 3)])
    with pytest.raises(FileNotFoundError, match="no zone maps"):
        # version 1 of a fresh table has no sidecar
        path = table + "_fresh"
        commit_version(_grid(spark, n=100, files=1), path)
        try:
            read_zone_maps(spark, path)
        finally:
            shutil.rmtree(path, ignore_errors=True)


def test_rebuild_overwrites_atomically(spark, table):
    # second build for the same version replaces the sidecar in place
    write_zone_maps(spark, table, ["x"])
    zm = read_zone_maps(spark, table)
    assert "stats_x" in zm.columns and "stats_y" not in zm.columns


def test_stats_summary_metadata_only_equals_full_scan(spark, tmp_path):
    from pyspark.sql import functions as SF

    from temp_data_pipeline_spark.operators.zonemap import stats_summary

    path = os.path.join(str(tmp_path), "meta")
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("x"),
    )
    commit_version(df.repartition(4), path)
    write_zone_maps(spark, path, ["x", "id"])
    got = {r["col_name"]: r for r in stats_summary(spark, path).collect()}
    truth = df.agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.sum(SF.col("x").isNull().cast("long")).alias("nu"),
        SF.min("x").alias("mn"),
        SF.max("x").alias("mx"),
    ).collect()[0]
    assert got["x"]["n_rows"] == truth["n"] == 1000
    assert got["x"]["n_null"] == truth["nu"]
    assert got["x"]["min_s"] == str(truth["mn"])
    assert got["x"]["max_s"] == str(truth["mx"])
    assert got["id"]["n_null"] == 0 and got["id"]["min_s"] == "0"
    shutil.rmtree(path, ignore_errors=True)


class TestBloomIndex:
    def test_point_lookup_skips_files_and_is_transparent(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.zonemap import (
            bloom_select_files,
            read_version_bloom,
            write_bloom_index,
        )

        path = os.path.join(str(tmp_path), "bloom")
        # high-cardinality ids hashed across 8 files: every file spans
        # the full id range, so zone maps would prune NOTHING
        df = spark.range(0, 20000).select(
            F.col("id"), (F.col("id") * 7919 % 20000).alias("key")
        )
        commit_version(df.repartition(8, "id"), path)
        write_bloom_index(spark, path, "key")
        hits = bloom_select_files(spark, path, "key", 12345)
        # the key lives in exactly one file; fpp=1% over 8 files means
        # false positives are rare — allow up to half as slack
        assert 1 <= len(hits) <= 4
        out = read_version_bloom(spark, path, "key", 12345)
        want = [
            tuple(r)
            for r in read_version(spark, path)
            .filter(F.col("key") == 12345)
            .collect()
        ]
        assert sorted(tuple(r) for r in out.collect()) == sorted(want)
        assert len(want) == 1
        shutil.rmtree(path, ignore_errors=True)

    def test_absent_value_usually_selects_no_files(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.zonemap import (
            bloom_select_files,
            read_version_bloom,
            write_bloom_index,
        )

        path = os.path.join(str(tmp_path), "bloom2")
        df = spark.range(0, 5000).select(F.col("id"))
        commit_version(df.repartition(4), path)
        write_bloom_index(spark, path, "id")
        # probe 50 absent values: with fpp=1% and 4 files, expect ~2
        # file-level false positives total — assert well under the
        # no-skipping baseline of 200
        total = sum(
            len(bloom_select_files(spark, path, "id", v))
            for v in range(100000, 100050)
        )
        assert total <= 20
        assert read_version_bloom(spark, path, "id", 100001).count() == 0
        shutil.rmtree(path, ignore_errors=True)

    def test_carried_dirs_covered(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.zonemap import (
            read_version_bloom,
            write_bloom_index,
        )

        path = os.path.join(str(tmp_path), "bloom3")
        commit_version(spark.range(0, 100).select(F.col("id")), path)
        v = commit_version(
            spark.range(100, 200).select(F.col("id")), path, carry_from=1
        )
        write_bloom_index(spark, path, "id", version=v)
        # one value from the carried dir, one from the new dir
        assert read_version_bloom(spark, path, "id", 50, version=v).count() == 1
        assert read_version_bloom(spark, path, "id", 150, version=v).count() == 1
        shutil.rmtree(path, ignore_errors=True)

    def test_missing_index_raises(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.zonemap import bloom_select_files

        path = os.path.join(str(tmp_path), "bloom4")
        commit_version(spark.range(0, 10).select(F.col("id")), path)
        with pytest.raises(FileNotFoundError, match="no bloom index"):
            bloom_select_files(spark, path, "id", 3)
        shutil.rmtree(path, ignore_errors=True)


def test_equidepth_zorder_beats_linear_on_skew(spark, tmp_path):
    """Heavy-tailed x: linear cells park ~all rows in cell 0, so a
    range query INSIDE the dense mass prunes nothing; quantile cells
    keep spreading it. Both tiers must stay transparent."""
    from temp_data_pipeline_spark.operators.zonemap import optimize_zorder

    path = os.path.join(str(tmp_path), "skewz")
    n = 20000
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") ** 3).cast("double").alias("x"),  # dense near 0
        ((F.col("id") * 37) % 100).alias("y"),
    )
    commit_version(df.repartition(8), path)
    v_lin = optimize_zorder(spark, path, ["x", "y"], target_files=16)
    v_eq = optimize_zorder(
        spark, path, ["x", "y"], target_files=16, equidepth=True
    )
    # a box inside the dense mass: x of ids 1000..3000, all y
    lo, hi = 1000.0**3, 3000.0**3
    box = [("x", ">=", lo), ("x", "<=", hi)]
    n_lin = len(select_files(spark, path, box, version=v_lin))
    n_eq = len(select_files(spark, path, box, version=v_eq))
    # ids 1000..3000 are 10% of rows; the z-curve fragments the x-run
    # across y interleaves, so expect ~half the files skipped — while
    # linear cells can't separate them from the rest of the dense mass
    assert n_eq < n_lin
    assert n_eq <= 8
    got = sorted(
        r["id"]
        for r in read_version_skipped(spark, path, box, version=v_eq).collect()
    )
    want = sorted(
        r["id"]
        for r in read_version(spark, path, 1)
        .filter((F.col("x") >= lo) & (F.col("x") <= hi))
        .collect()
    )
    assert got == want and len(got) == 2001
    shutil.rmtree(path, ignore_errors=True)


def test_equidepth_null_and_constant_columns(spark, tmp_path):
    from temp_data_pipeline_spark.operators.zonemap import (
        optimize_zorder,
    )

    path = os.path.join(str(tmp_path), "eqnull")
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .cast("double")
        .alias("x"),
        F.lit(7.0).alias("c"),  # constant: approxQuantile → equal bounds
    )
    commit_version(df.repartition(4), path)
    v = optimize_zorder(
        spark, path, ["x", "c"], target_files=8, equidepth=True
    )
    out = read_version_skipped(
        spark, path, [("x", ">=", 100.0), ("x", "<=", 200.0)], version=v
    )
    want = (
        read_version(spark, path, 1)
        .filter((F.col("x") >= 100) & (F.col("x") <= 200))
        .count()
    )
    assert out.count() == want
    # null x rows survived the rewrite
    assert (
        read_version(spark, path, v).filter(F.col("x").isNull()).count() == 100
    )
    shutil.rmtree(path, ignore_errors=True)


class TestIncrementalZoneMaps:
    def test_append_updates_stats_at_batch_cost(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "inc")
        commit_version(
            spark.range(0, 1000).select(F.col("id"), (F.col("id") % 50).alias("x")),
            path,
        )
        write_zone_maps(spark, path, ["x"])
        v2 = commit_version(
            spark.range(1000, 1500).select(
                F.col("id"), (F.col("id") % 50 + 100).alias("x")
            ),
            path,
            carry_from=1,
        )
        write_zone_maps(spark, path, ["x"], version=v2, incremental_from=1)
        inc = {r["file"]: r for r in read_zone_maps(spark, path, v2).collect()}
        # full rebuild must agree row-for-row
        write_zone_maps(spark, path, ["x"], version=v2)
        full = {r["file"]: r for r in read_zone_maps(spark, path, v2).collect()}
        assert set(inc) == set(full)
        for f in full:
            assert inc[f]["n_rows"] == full[f]["n_rows"]
            assert inc[f]["stats_x"] == full[f]["stats_x"]
        # and skipping works over the merged sidecar
        write_zone_maps(spark, path, ["x"], version=v2, incremental_from=1)
        sel = select_files(spark, path, [("x", ">=", 100)], version=v2)
        assert all(f.startswith("v=2/") for f in sel)

    def test_cow_commit_drops_superseded_partition_stats(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import commit_merge_cow

        path = os.path.join(str(tmp_path), "inccow")
        base = spark.createDataFrame(
            [(i, "a" if i < 50 else "b", i) for i in range(100)],
            "k long, part string, val long",
        )
        commit_merge_cow(base, path, ["k"], "val", "part")
        write_zone_maps(spark, path, ["val"])
        # touch only partition 'a' (values shift up by 1000)
        upd = spark.createDataFrame(
            [(i, "a", i + 1000) for i in range(50)],
            "k long, part string, val long",
        )
        v2 = commit_merge_cow(upd, path, ["k"], "val", "part")
        write_zone_maps(spark, path, ["val"], version=v2, incremental_from=1)
        inc = {r["file"]: r for r in read_zone_maps(spark, path, v2).collect()}
        write_zone_maps(spark, path, ["val"], version=v2)
        full = {r["file"]: r for r in read_zone_maps(spark, path, v2).collect()}
        assert set(inc) == set(full)
        for f in full:
            assert inc[f]["stats_val"] == full[f]["stats_val"]
        # the superseded v=1 'a' partition's stats are gone: a query on
        # the OLD value range must not reopen it
        sel = select_files(spark, path, [("val", "<", 50)], version=v2)
        assert not any("/part=a/" in f and f.startswith("v=1/") for f in sel)

    def test_column_set_change_requires_full_rebuild(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "inccols")
        commit_version(spark.range(0, 10).select(F.col("id")), path)
        write_zone_maps(spark, path, ["id"])
        v2 = commit_version(
            spark.range(10, 20).select(F.col("id")), path, carry_from=1
        )
        with pytest.raises(ValueError, match="full rebuild"):
            write_zone_maps(
                spark, path, ["id", "nope"], version=v2, incremental_from=1
            )


def test_scan_version_composes_all_sidecars(spark, tmp_path):
    """Unified entry point: zone maps prune the range conjunct, the
    Bloom index prunes the equality, verdicts intersect; missing
    sidecars degrade gracefully to a full scan."""
    from temp_data_pipeline_spark.operators.zonemap import (
        scan_version,
        write_bloom_index,
    )

    path = os.path.join(str(tmp_path), "unified")
    df = spark.range(0, 8000).select(
        F.col("id"),
        (F.col("id") % 80).alias("x"),
        (F.col("id") * 7919 % 8000).alias("key"),
    )
    commit_version(df.repartition(8, "id"), path)
    preds = [("x", ">=", 10), ("x", "<=", 20), ("key", "=", 4242)]
    want = sorted(
        tuple(r)
        for r in read_version(spark, path)
        .filter((F.col("x") >= 10) & (F.col("x") <= 20) & (F.col("key") == 4242))
        .collect()
    )
    # no sidecars at all → plain scan, same rows
    got0 = sorted(tuple(r) for r in scan_version(spark, path, preds).collect())
    assert got0 == want
    # zone maps only
    write_zone_maps(spark, path, ["x"])
    got1 = sorted(tuple(r) for r in scan_version(spark, path, preds).collect())
    assert got1 == want
    # + bloom on the equality column: still identical rows
    write_bloom_index(spark, path, "key")
    got2 = sorted(tuple(r) for r in scan_version(spark, path, preds).collect())
    assert got2 == want
    shutil.rmtree(path, ignore_errors=True)


def test_vacuum_reaps_sidecars_of_expired_versions(spark, tmp_path):
    from temp_data_pipeline_spark.operators.versioned import vacuum
    from temp_data_pipeline_spark.operators.zonemap import write_bloom_index

    path = os.path.join(str(tmp_path), "reap")
    for lo in (0, 100, 200):
        commit_version(
            spark.range(lo, lo + 100).select(F.col("id")), path
        )
        write_zone_maps(spark, path, ["id"])
        write_bloom_index(spark, path, "id")
    vacuum(spark, path, keep_last=1, orphan_grace=0)
    left_zm = sorted(os.listdir(os.path.join(path, "_zonemaps")))
    left_bl = sorted(os.listdir(os.path.join(path, "_blooms")))
    assert left_zm == ["3.parquet"]
    assert left_bl == ["3.id.parquet"]
    # surviving sidecar still serves the surviving version
    assert len(select_files(spark, path, [("id", ">=", 250)])) >= 1
    shutil.rmtree(path, ignore_errors=True)


def test_scan_version_subtracts_deletion_vectors(spark, tmp_path):
    """The unified entry point must equal read_table + filter on a DV
    table — both on the pruned path (sidecars present) and the
    fallback path (no sidecars)."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.zonemap import scan_version

    path = os.path.join(str(tmp_path), "dvscan")
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 40).alias("x")
    )
    commit_version(df.repartition(4), path)
    commit_delete_mor(spark, path, "id % 5 = 0")
    preds = [("x", ">=", 10), ("x", "<=", 12)]
    want = sorted(
        r["id"]
        for r in read_table(spark, path)
        .filter((F.col("x") >= 10) & (F.col("x") <= 12))
        .collect()
    )
    # fallback path (no sidecars yet)
    got_fb = sorted(r["id"] for r in scan_version(spark, path, preds).collect())
    assert got_fb == want
    # pruned path (zone maps on the DV version)
    write_zone_maps(spark, path, ["x"])
    got_pr = sorted(r["id"] for r in scan_version(spark, path, preds).collect())
    assert got_pr == want
    assert all(i % 5 != 0 for i in want) and want
    shutil.rmtree(path, ignore_errors=True)


def test_zorder_can_preserve_hive_partitioning(spark, tmp_path):
    from temp_data_pipeline_spark.operators.versioned import (
        commit_merge_cow,
        read_manifest,
    )
    from temp_data_pipeline_spark.operators.zonemap import optimize_zorder

    path = os.path.join(str(tmp_path), "zpart")
    base = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i % 100, (i * 37) % 100)
         for i in range(4000)],
        "k long, part string, x long, y long",
    )
    commit_merge_cow(base, path, ["k"], "x", "part")
    v = optimize_zorder(
        spark, path, ["x", "y"], target_files=8, partition_by=["part"]
    )
    # layout preserved: hive subdirs exist and COW maintenance still works
    assert os.path.isdir(os.path.join(path, f"v={v}", "part=a"))
    assert read_manifest(spark, path, v)["_partition_by"] == ["part"]
    upd = spark.createDataFrame(
        [(0, "a", 999, 0)], "k long, part string, x long, y long"
    )
    v2 = commit_merge_cow(upd, path, ["k"], "x", "part")
    got = read_version(spark, path, v2)
    assert got.count() == 4000
    assert got.filter(F.col("k") == 0).first()["x"] == 999
    # skipping works through the partitioned, clustered layout
    sel = select_files(spark, path, [("x", "<=", 10), ("y", "<=", 10)], version=v)
    files = select_files(spark, path, [("x", ">=", 0)], version=v)
    assert len(sel) < len(files)
    shutil.rmtree(path, ignore_errors=True)


def test_truncated_string_bounds_skip_correctly(spark, tmp_path):
    """truncate={col: L} stores short BOUNDS for long text columns:
    sidecar stays small, skipping stays transparent (bounds only skip
    less, never wrongly), and prefix-sorted files still prune."""
    path = os.path.join(str(tmp_path), "trunc")
    # 4 files range-partitioned by text prefix; texts are long
    df = spark.range(0, 4000).select(
        F.col("id"),
        F.concat(
            F.lpad((F.col("id") % 26).cast("string"), 2, "0"),
            F.lit("_"),
            F.repeat(F.lit("lorem ipsum "), 50),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    commit_version(df.repartitionByRange(4, "text"), path)
    write_zone_maps(spark, path, ["text"], truncate={"text": 8})
    zm = read_zone_maps(spark, path).collect()
    for r in zm:
        assert len(r["stats_text"]["min"]) <= 8
        assert len(r["stats_text"]["max"]) <= 8
    # equality probe on a full long string: transparent
    needle = (
        read_version(spark, path).filter(F.col("id") == 123).first()["text"]
    )
    sel = select_files(spark, path, [("text", "=", needle)])
    assert 1 <= len(sel) <= 2  # prefix-sorted → at most a boundary pair
    got = read_version_skipped(spark, path, [("text", "=", needle)])
    assert [r["id"] for r in got.collect()] == [123]
    # range probe below every prefix: all files skip via the lower bound
    assert select_files(spark, path, [("text", "<", "00")]) == []


def test_truncated_non_ascii_bounds_never_skip_matches(spark, tmp_path):
    """ADVICE r6 (high): F.char wraps code points mod 256, so bumping
    a truncated max whose last char is non-ASCII ('ÿ'+1 → '\\x00',
    '中'+1 → '.') used to produce a bound BELOW the file's real
    strings — silently skipping files that contain matching rows. The
    bound is now NULL = unbounded outside ASCII, and NULL truncated
    bounds KEEP the file."""
    path = os.path.join(str(tmp_path), "truncnonascii")
    rows = [
        (1, "ÿÿÿÿÿÿ latin-1 tail " * 5),
        (2, "中文文档内容 cjk " * 5),
        (3, "ÿÿÿÿÿÿ another " * 5),
        (4, "中文更多内容 " * 5),
    ]
    commit_version(
        spark.createDataFrame(rows, "id long, text string").repartition(1),
        path,
    )
    write_zone_maps(spark, path, ["text"], truncate={"text": 4})
    zm = read_zone_maps(spark, path).collect()
    # the truncated prefixes end in non-ASCII chars → max must be NULL
    assert all(r["stats_text"]["max"] is None for r in zm)
    for needle_id in (1, 2, 3, 4):
        needle = next(r[1] for r in rows if r[0] == needle_id)
        sel = select_files(spark, path, [("text", "=", needle)])
        assert len(sel) == 1, f"file wrongly skipped for id={needle_id}"
        got = read_version_skipped(spark, path, [("text", "=", needle)])
        assert [r["id"] for r in got.collect()] == [needle_id]
    # ">" probes lean on the (NULL) max bound too — must keep the file
    assert len(select_files(spark, path, [("text", ">", "中")])) == 1
    # the min bound (a real prefix) still skips what it can: every
    # text starts at or above U+00FF, so a probe below "A" prunes
    assert select_files(spark, path, [("text", "<", "A")]) == []


def test_sidecars_survive_table_relocation(spark, tmp_path):
    """Sidecars key files RELATIVE to the table root (like manifest
    data_dirs), so a copied table's skip verdicts keep resolving."""
    from temp_data_pipeline_spark.operators.zonemap import (
        scan_version,
        write_bloom_index,
    )

    src = os.path.join(str(tmp_path), "reloc_src")
    commit_version(
        spark.range(0, 400).select(
            F.col("id"), (F.col("id") % 20).alias("x")
        ).repartitionByRange(4, "id"),
        src,
    )
    write_zone_maps(spark, src, ["id", "x"])
    write_bloom_index(spark, src, "id")
    dst = os.path.join(str(tmp_path), "reloc_dst")
    shutil.copytree(src, dst)
    shutil.rmtree(src)  # the old location is GONE — no silent fallback
    sel = select_files(spark, dst, [("id", ">=", 300)])
    # range boundaries are sampled → the probe survives 1-2 files
    assert 1 <= len(sel) <= 2 and all(f.startswith("v=1/") for f in sel)
    got = sorted(
        r["id"]
        for r in scan_version(spark, dst, [("id", ">=", 390)]).collect()
    )
    assert got == list(range(390, 400))


def test_bounded_skip_list_join_path_matches_collect_path(spark, tmp_path):
    """Verdict r6 #3: past ``max_driver_files`` the skipped readers
    must keep the intersection distributed (semi-join into the scan)
    instead of collecting the survivor list — same rows, bounded
    driver. Forcing the cap to 0 takes the join path on every file."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
    )
    from temp_data_pipeline_spark.operators.zonemap import (
        scan_version,
        write_bloom_index,
    )

    path = os.path.join(str(tmp_path), "cap")
    commit_version(
        spark.range(0, 800)
        .select(F.col("id"), (F.col("id") % 40).alias("x"))
        .repartitionByRange(8, "id"),
        path,
    )
    write_zone_maps(spark, path, ["id", "x"])
    write_bloom_index(spark, path, "x")
    preds = [("id", ">=", 100), ("id", "<", 700), ("x", "=", 7)]
    want = sorted(
        r["id"] for r in read_version_skipped(spark, path, preds).collect()
    )
    got = sorted(
        r["id"]
        for r in read_version_skipped(
            spark, path, preds, max_driver_files=0
        ).collect()
    )
    assert got == want and len(want) > 0
    # scan_version composes the join path with Bloom verdicts AND a
    # deletion vector
    v2 = commit_delete_mor(spark, path, "id % 80 = 7")
    want2 = sorted(
        r["id"] for r in scan_version(spark, path, preds, v2).collect()
    )
    got2 = sorted(
        r["id"]
        for r in scan_version(
            spark, path, preds, v2, max_driver_files=0
        ).collect()
    )
    assert got2 == want2
    assert set(want) - set(want2) == {r for r in want if r % 80 == 7}


def test_missing_carried_dir_fails_loudly(spark, tmp_path):
    """ADVICE r6 (low): a mis-vacuumed carried dir must propagate,
    not be silently omitted from stats builds (an under-covering
    sidecar would wrongly skip the missing dir's rows forever)."""
    path = os.path.join(str(tmp_path), "gone")
    commit_version(spark.range(0, 100).select(F.col("id")), path)
    commit_version(
        spark.range(100, 200).select(F.col("id")), path, carry_from=1
    )
    shutil.rmtree(os.path.join(path, "v=1"))
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        write_zone_maps(spark, path, ["id"], version=2)


def test_incremental_bloom_equals_full_rebuild(spark, tmp_path):
    from temp_data_pipeline_spark.operators.zonemap import (
        bloom_select_files,
        read_version_bloom,
        write_bloom_index,
    )

    path = os.path.join(str(tmp_path), "incbloom")
    commit_version(spark.range(0, 2000).select(F.col("id")), path)
    write_bloom_index(spark, path, "id")
    v2 = commit_version(
        spark.range(2000, 2500).select(F.col("id")), path, carry_from=1
    )
    write_bloom_index(spark, path, "id", version=v2, incremental_from=1)
    # probes hit across both the carried and the new dirs
    assert read_version_bloom(spark, path, "id", 100, version=v2).count() == 1
    assert read_version_bloom(spark, path, "id", 2400, version=v2).count() == 1
    # absent values still skip nearly everything
    total = sum(
        len(bloom_select_files(spark, path, "id", v, version=v2))
        for v in range(90000, 90030)
    )
    assert total <= 10
    # inherited (m, k): every row shares one probe family
    bl = spark.read.parquet(f"{path}/_blooms/{v2}.id.parquet")
    assert bl.select("m", "k").distinct().count() == 1


def test_stats_summary_refuses_truncated_bounds(spark, tmp_path):
    from temp_data_pipeline_spark.operators.zonemap import stats_summary

    path = os.path.join(str(tmp_path), "truncsum")
    commit_version(
        spark.range(0, 100).select(
            F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("text")
        ),
        path,
    )
    write_zone_maps(spark, path, ["id", "text"], truncate={"text": 4})
    with pytest.raises(ValueError, match="allow_bounds"):
        stats_summary(spark, path)
    got = {
        r["col_name"]: r
        for r in stats_summary(spark, path, allow_bounds=True).collect()
    }
    assert got["id"]["min_s"] == "0"  # untruncated column stays exact
    assert got["text"]["min_s"] == "doc-"  # explicit bound
