"""Incrementally maintained aggregate views (operators/matview.py).

Invariant under test: after any chain of base commits (appends,
merges, deletes), `refresh_agg_view` must leave the view equal to a
full `agg(base@latest)` recompute — while physically rewriting only
the view partitions whose groups the diff touched.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.matview import (
    build_agg_view,
    refresh_agg_view,
    view_base_version,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_delete_cow,
    commit_merge_cow,
    read_manifest,
    read_version,
    versions,
)

SCHEMA = "k long, day string, val long, ts long"
BASE = [
    (1, "d1", 10, 1), (2, "d1", 20, 1),
    (3, "d2", 30, 1), (4, "d3", 40, 1),
]


def _agg(df):
    return df.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("val").cast("long").alias("total"),
        F.max("val").cast("long").alias("mx"),  # NOT subtractable
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _view_rows(spark, vp):
    return {
        r["day"]: (r["n"], r["total"], r["mx"])
        for r in read_version(spark, vp).collect()
    }


def _full(spark, bp):
    return {
        r["day"]: (r["n"], r["total"], r["mx"])
        for r in _agg(read_version(spark, bp)).collect()
    }


class TestMatView:
    def _seed(self, spark, tmp_path):
        bp, vp = str(tmp_path / "base"), str(tmp_path / "view")
        commit_merge_cow(_df(spark, BASE), bp, ["k"], "ts", "day")
        build_agg_view(spark, bp, vp, _agg, ["day"])
        return bp, vp

    def test_build_matches_full_agg(self, spark, tmp_path):
        bp, vp = self._seed(spark, tmp_path)
        assert _view_rows(spark, vp) == _full(spark, bp)
        assert view_base_version(spark, vp) == 1

    def test_refresh_after_merge_touches_only_changed_groups(self, spark, tmp_path):
        bp, vp = self._seed(spark, tmp_path)
        commit_merge_cow(
            _df(spark, [(2, "d1", 25, 2), (9, "d1", 5, 2)]),
            bp, ["k"], "ts", "day",
        )
        v = refresh_agg_view(spark, bp, vp, _agg, ["day"])
        assert _view_rows(spark, vp) == _full(spark, bp)
        assert view_base_version(spark, vp) == 2
        # COW: only the d1 view partition was rewritten
        man = read_manifest(spark, vp, v)
        assert "v=1/day=d2" in man["data_dirs"]
        assert "v=1/day=d3" in man["data_dirs"]
        subdirs = sorted(
            d for d in os.listdir(os.path.join(vp, f"v={v}"))
            if d.startswith("day=")
        )
        assert subdirs == ["day=d1"]

    def test_refresh_after_delete_drops_vanished_group(self, spark, tmp_path):
        bp, vp = self._seed(spark, tmp_path)
        commit_delete_cow(spark, bp, "day = 'd2'", "day")
        refresh_agg_view(spark, bp, vp, _agg, ["day"])
        got = _view_rows(spark, vp)
        assert "d2" not in got
        assert got == _full(spark, bp)

    def test_refresh_noop_when_current(self, spark, tmp_path):
        bp, vp = self._seed(spark, tmp_path)
        v = refresh_agg_view(spark, bp, vp, _agg, ["day"])
        assert v == versions(spark, vp)[-1] == 1

    def test_chained_refreshes_and_time_travel(self, spark, tmp_path):
        bp, vp = self._seed(spark, tmp_path)
        v1_rows = _view_rows(spark, vp)
        commit_merge_cow(_df(spark, [(5, "d2", 100, 2)]), bp, ["k"], "ts", "day")
        refresh_agg_view(spark, bp, vp, _agg, ["day"])
        commit_delete_cow(spark, bp, "k = 4", "day")  # empties d3
        refresh_agg_view(spark, bp, vp, _agg, ["day"])
        assert _view_rows(spark, vp) == _full(spark, bp)
        # the view's own history is intact
        got_v1 = {
            r["day"]: (r["n"], r["total"], r["mx"])
            for r in read_version(spark, vp, 1).collect()
        }
        assert got_v1 == v1_rows

    def test_max_shrinks_correctly(self, spark, tmp_path):
        # the aggregate a delta-maintenance scheme can't fix: deleting
        # the max row must LOWER mx — group recompute handles it
        bp, vp = self._seed(spark, tmp_path)
        commit_delete_cow(spark, bp, "k = 2", "day")  # d1's max (20)
        refresh_agg_view(spark, bp, vp, _agg, ["day"])
        assert _view_rows(spark, vp)["d1"] == (1, 10, 10)

    def test_partition_col_must_be_key(self, spark, tmp_path):
        bp, vp = self._seed(spark, tmp_path)
        with pytest.raises(ValueError, match="must be one of the view keys"):
            refresh_agg_view(
                spark, bp, vp, _agg, ["day"], partition_col="total"
            )

    def test_untouched_multirow_group_not_rewritten(self, spark, tmp_path):
        # groups are change-detected by per-group fingerprint, so an
        # untouched group with SEVERAL distinct rows must not be
        # recomputed — a row-level diff on group keys would pair its
        # rows m-by-n and flag it changed every refresh
        bp, vp = str(tmp_path / "base"), str(tmp_path / "view")
        commit_merge_cow(_df(spark, BASE), bp, ["k"], "ts", "day")
        build_agg_view(spark, bp, vp, _agg, ["day"])
        # touch ONLY d2; d1 keeps its two distinct rows untouched
        commit_merge_cow(
            _df(spark, [(3, "d2", 35, 2)]), bp, ["k"], "ts", "day"
        )
        refresh_agg_view(spark, bp, vp, _agg, ["day"])
        assert _view_rows(spark, vp) == _full(spark, bp)
        vlatest = versions(spark, vp)[-1]
        man = read_manifest(spark, vp, vlatest)
        own = os.path.join(vp, f"v={vlatest}")
        rewritten = sorted(
            n for n in os.listdir(own)
            if os.path.isdir(os.path.join(own, n))
        )
        assert rewritten == ["day=d2"]          # only the touched group
        assert any("day=d1" in d for d in man["data_dirs"])  # carried


def test_refresh_on_mor_base(spark, tmp_path):
    """The view sits on a MERGE-ON-READ base: a DV delete shrinks a
    group, an upsert moves a key between groups and vanishes another,
    and each refresh equals the full DV-resolved recompute."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        commit_upsert_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version

    def full_mor(bp):
        return {
            r["day"]: (r["n"], r["total"], r["mx"])
            for r in _agg(read_table(spark, bp)).collect()
        }

    bp = os.path.join(str(tmp_path), "base")
    vp = os.path.join(str(tmp_path), "view")
    commit_version(_df(spark, BASE), bp)
    build_agg_view(spark, bp, vp, _agg, ["day"])

    # DV delete: d1 shrinks to one row
    commit_delete_mor(spark, bp, "k = 2")
    refresh_agg_view(spark, bp, vp, _agg, ["day"])
    assert _view_rows(spark, vp) == full_mor(bp)

    # upsert: k=3 moves d2 -> d9 (d2 vanishes), fresh k=50 lands in d1
    commit_upsert_mor(
        _df(spark, [(3, "d9", 300, 2), (50, "d1", 5, 2)]), bp, ["k"]
    )
    refresh_agg_view(spark, bp, vp, _agg, ["day"])
    got = _view_rows(spark, vp)
    assert got == full_mor(bp)
    assert "d2" not in got and got["d9"] == (1, 300, 300)

    # untouched group d3's view row survived both refreshes unchanged
    assert got["d3"] == (1, 40, 40)


def test_build_on_mor_base_is_dv_resolved(spark, tmp_path):
    """build_agg_view over a base that already carries a DV must
    aggregate only VISIBLE rows."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version

    bp = os.path.join(str(tmp_path), "base")
    vp = os.path.join(str(tmp_path), "view")
    commit_version(_df(spark, BASE), bp)
    commit_delete_mor(spark, bp, "day = 'd1'")
    build_agg_view(spark, bp, vp, _agg, ["day"])
    got = _view_rows(spark, vp)
    assert "d1" not in got and set(got) == {"d2", "d3"}
