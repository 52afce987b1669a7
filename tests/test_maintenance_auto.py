"""Policy-driven auto-maintenance (operators/maintenance.py): the
nightly driver runs the MINIMUM actions a table needs, in dependency
order, and is idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import (
    commit_delete_mor,
    has_deletes,
    read_table,
)
from temp_data_pipeline_spark.operators.maintenance import (
    MaintenancePolicy,
    maintain_table,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    read_manifest,
    versions,
)
from temp_data_pipeline_spark.operators.zonemap import select_files


def _table(spark, tmp_path, name, n=1000):
    path = os.path.join(str(tmp_path), name)
    commit_version(
        spark.range(0, n).select(
            F.col("id"), (F.col("id") % 50).alias("x")
        ),
        path,
    )
    return path


def test_healthy_table_is_a_noop(spark, tmp_path):
    path = _table(spark, tmp_path, "ok")
    assert maintain_table(spark, path) == []
    assert versions(spark, path) == [1]


def test_long_chain_compacts_then_idempotent(spark, tmp_path):
    path = _table(spark, tmp_path, "chain")
    for lo in range(1, 5):
        commit_version(
            spark.range(lo * 1000, lo * 1000 + 100).select(
                F.col("id"), (F.col("id") % 50).alias("x")
            ),
            path,
            carry_from=versions(spark, path)[-1],
        )
    pol = MaintenancePolicy(max_chain=3, keep_last=2)
    acts = maintain_table(spark, path, pol)
    assert any("compact_snapshot" in a for a in acts)
    latest = versions(spark, path)[-1]
    assert len(read_manifest(spark, path, latest)["data_dirs"]) == 1
    # second run: nothing left to do (vacuum already trimmed)
    assert maintain_table(spark, path, pol) == []


def test_dv_heavy_table_materializes_and_reclusters(spark, tmp_path):
    path = _table(spark, tmp_path, "dvheavy")
    commit_delete_mor(spark, path, "x < 25")  # 50% deleted
    pol = MaintenancePolicy(
        max_dv_frac=0.05, zorder=["x", "id"], stats_columns=["x"],
        keep_last=2,
    )
    acts = maintain_table(spark, path, pol)
    assert any("materialize_deletes" in a for a in acts)
    assert any("optimize_zorder" in a for a in acts)
    latest = versions(spark, path)[-1]
    assert not has_deletes(spark, path, latest)
    assert read_table(spark, path).count() == 500
    # stats were (re)built for the clustered version and actually prune
    files_all = select_files(spark, path, [("x", ">=", 0)])
    files_box = select_files(spark, path, [("x", ">=", 30), ("x", "<=", 31)])
    assert len(files_box) < len(files_all)
    assert maintain_table(spark, path, pol) == []


def test_append_only_refreshes_sidecars_incrementally(spark, tmp_path):
    from temp_data_pipeline_spark.operators.zonemap import (
        read_version_bloom,
        write_bloom_index,
        write_zone_maps,
    )

    path = _table(spark, tmp_path, "sidecars")
    write_zone_maps(spark, path, ["x"])
    write_bloom_index(spark, path, "id")
    commit_version(
        spark.range(5000, 5100).select(
            F.col("id"), (F.col("id") % 50).alias("x")
        ),
        path,
        carry_from=1,
    )
    pol = MaintenancePolicy(
        max_chain=10, stats_columns=["x"], bloom_columns=["id"],
        keep_last=5,
    )
    acts = maintain_table(spark, path, pol)
    assert any("write_zone_maps" in a for a in acts)
    assert any("write_bloom_index" in a for a in acts)
    # no rewrite happened (chain under threshold) — versions unchanged
    assert versions(spark, path) == [1, 2]
    assert read_version_bloom(spark, path, "id", 5050).count() == 1
    assert maintain_table(spark, path, pol) == []


class TestDvRewriteMatrix:
    """Verdict r6 #4: the DV × rewrite-maintenance interaction matrix —
    direct rewrites refuse while a DV is live, maintain_table orders
    materialize before the rewrite, and vacuum honors the DV grace
    period. fsck must be green after every path."""

    def test_direct_rewrites_refuse_on_live_dv(self, spark, tmp_path):
        import pytest

        from temp_data_pipeline_spark.operators.versioned import (
            compact_snapshot,
            verify_table,
        )
        from temp_data_pipeline_spark.operators.zonemap import optimize_zorder

        path = _table(spark, tmp_path, "refuse")
        commit_delete_mor(spark, path, "x = 7")
        with pytest.raises(ValueError, match="optimize_zorder"):
            optimize_zorder(spark, path, ["x"])
        with pytest.raises(ValueError, match="compact_snapshot"):
            compact_snapshot(spark, path)
        # the refused rewrites left no partial state behind
        assert versions(spark, path) == [1, 2]
        assert verify_table(spark, path) == []

    def test_materialize_orders_before_zorder(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import verify_table

        path = _table(spark, tmp_path, "order")
        commit_delete_mor(spark, path, "x < 10")
        pol = MaintenancePolicy(
            max_dv_frac=0.5, zorder=["x", "id"], keep_last=10
        )
        # 20% deleted < max_dv_frac, but a zorder policy FORCES the
        # materialization first (rewrites refuse on live DVs)
        acts = maintain_table(spark, path, pol)
        i_mat = next(
            i for i, a in enumerate(acts) if "materialize_deletes" in a
        )
        i_z = next(i for i, a in enumerate(acts) if "optimize_zorder" in a)
        assert i_mat < i_z
        latest = versions(spark, path)[-1]
        assert not has_deletes(spark, path, latest)
        assert read_table(spark, path).count() == 800
        assert verify_table(spark, path) == []

    def test_vacuum_honors_dv_grace_then_reaps(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.deletion_vectors import (
            materialize_deletes,
        )
        from temp_data_pipeline_spark.operators.versioned import (
            vacuum,
            verify_table,
        )

        path = _table(spark, tmp_path, "dvgrace")
        commit_delete_mor(spark, path, "x = 3")       # v2 (+ dv sidecar)
        materialize_deletes(spark, path)              # v3, DV-free
        dv_dir = os.path.join(path, "_dv")
        assert len(os.listdir(dv_dir)) == 1
        # keep only the materialized version: the DV'd history expires
        # but the young sidecar survives its grace period (an in-flight
        # reader of v2 may still be subtracting it)
        vacuum(spark, path, keep_last=1, orphan_grace=3600)
        assert versions(spark, path) == [3]
        assert len(os.listdir(dv_dir)) == 1
        # fsck names it as unreferenced (vacuum-reclaimable), data fine
        issues = verify_table(spark, path)
        assert all("deletion vector" in i for i in issues)
        # past the grace period the sidecar is reaped
        vacuum(spark, path, keep_last=1, orphan_grace=0)
        assert os.listdir(dv_dir) == []
        assert verify_table(spark, path) == []
        assert read_table(spark, path).count() == 980

    def test_maintain_full_lifecycle_fsck_green(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import verify_table

        path = _table(spark, tmp_path, "lifecycle")
        commit_delete_mor(spark, path, "x < 25")
        pol = MaintenancePolicy(
            max_dv_frac=0.05, zorder=["x", "id"], stats_columns=["x"],
            bloom_columns=["id"], keep_last=1,
        )
        acts = maintain_table(spark, path, pol)
        # the young DV sidecar survives its grace period (in-flight
        # readers of the expired DV versions may still subtract it);
        # nothing else may be wrong
        issues = verify_table(spark, path)
        assert acts and all("deletion vector" in i for i in issues)
        # idempotent: a second run is a no-op
        assert maintain_table(spark, path, pol) == []
        # once the grace period lapses the sidecar is reaped → green
        from temp_data_pipeline_spark.operators.versioned import vacuum

        vacuum(spark, path, keep_last=1, orphan_grace=0)
        assert verify_table(spark, path) == []


def test_policy_incremental_compaction_spares_the_big_dir(spark, tmp_path):
    """small_dir_bytes opt-in: the small-dir tail collapses at
    O(small) and the full compact_snapshot never runs when the chain
    drops under max_chain."""
    import os

    from temp_data_pipeline_spark.operators.maintenance import (
        MaintenancePolicy,
        maintain_table,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_manifest,
        read_version,
        versions,
    )

    path = os.path.join(str(tmp_path), "t")
    commit_version(
        spark.createDataFrame(
            [(i, i) for i in range(5000)], "k long, v long"
        ).coalesce(2),
        path,
    )
    big_size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs_ in os.walk(os.path.join(path, "v=1"))
        for f in fs_
        if f.endswith(".parquet")
    )
    for i in range(4):
        commit_version(
            spark.createDataFrame([(10000 + i, i)], "k long, v long"),
            path,
            carry_from=versions(spark, path)[-1],
        )
    pol = MaintenancePolicy(
        max_chain=3, keep_last=10, small_dir_bytes=big_size
    )
    actions = maintain_table(spark, path, pol)
    assert any(a.startswith("compact_incremental") for a in actions)
    assert not any(a.startswith("compact_snapshot") for a in actions)
    man = read_manifest(spark, path, versions(spark, path)[-1])
    assert "v=1" in man["data_dirs"] and len(man["data_dirs"]) == 2
    assert read_version(spark, path).count() == 5004
    # idempotent: second run is a no-op
    assert maintain_table(spark, path, pol) == []


def test_quarantine_sibling_maintained_with_main(spark, tmp_path):
    """Verdict r9 #6: maintaining a gated table also compacts and
    expires its <path>_quarantine sibling, and the replay linkage
    keeps working afterwards (no double appends, remainder exact)."""
    from temp_data_pipeline_spark.operators.expectations import (
        commit_with_expectations,
        replay_quarantine,
    )

    path = os.path.join(str(tmp_path), "gated")
    qpath = f"{path}_quarantine"
    exp = {"v_pos": "v > 0"}
    # five gated commits, each quarantining one bad row -> a 5-version
    # quarantine chain of tiny dirs
    for i in range(5):
        commit_with_expectations(
            spark.createDataFrame(
                [(10 * i + 1, 5), (10 * i + 2, -i - 1)], "k long, v long"
            ),
            path,
            exp,
        )
    assert len(versions(spark, qpath)) == 5
    pol = MaintenancePolicy(max_chain=2, keep_last=2)
    actions = maintain_table(spark, path, pol)
    q_actions = [a for a in actions if a.startswith("quarantine: ")]
    assert any("compact" in a for a in q_actions)
    assert any("vacuum" in a for a in q_actions)
    assert len(versions(spark, qpath)) <= 2
    # idempotent: a second pass is quiet on the quarantine too
    assert [
        a
        for a in maintain_table(spark, path, pol)
        if a.startswith("quarantine: ")
    ] == []
    # the quarantine content survived maintenance intact
    from temp_data_pipeline_spark.operators.versioned import read_version

    bad = {
        (r["k"], r["v"]) for r in read_version(spark, qpath).collect()
    }
    assert bad == {(10 * i + 2, -i - 1) for i in range(5)}
    # replay after a gate fix: all five quarantined rows pass and
    # append exactly once; the remainder rewrite still lands
    v, n_pass, n_still = replay_quarantine(
        spark, path, {"v_any": "v IS NOT NULL"}
    )
    assert (n_pass, n_still) == (5, 0)
    main = {
        (r["k"], r["v"]) for r in read_table(spark, path).collect()
    }
    assert {(10 * i + 2, -i - 1) for i in range(5)} <= main
    assert len(main) == 10
    # maintaining again after the replay keeps the linkage invariants
    # (pending-replay walk sees a completed replay -> no double append)
    maintain_table(spark, path, pol)
    v2, n_pass2, n_still2 = replay_quarantine(
        spark, path, {"v_any": "v IS NOT NULL"}
    )
    assert (n_pass2, n_still2) == (0, 0)
    assert len(
        {(r["k"], r["v"]) for r in read_table(spark, path).collect()}
    ) == 10


def test_unrelated_quarantine_suffix_table_not_maintained(spark, tmp_path):
    """ADVICE r10 #3: a table that merely LIVES at '<path>_quarantine'
    (no _quarantine_of linkage in its manifest) must not inherit the
    parent's compaction/expiry policy."""
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        versions,
    )

    path = os.path.join(str(tmp_path), "main")
    other = f"{path}_quarantine"  # unrelated table, unlucky name
    commit_version(spark.createDataFrame([(1, 5)], "k long, v long"), path)
    for i in range(4):
        commit_version(
            spark.createDataFrame([(10 + i, i)], "k long, v long"),
            other,
            carry_from=(i if i else None),
        )
    n_before = len(versions(spark, other))
    actions = maintain_table(
        spark, path, MaintenancePolicy(max_chain=2, keep_last=1)
    )
    assert not [a for a in actions if a.startswith("quarantine: ")]
    assert len(versions(spark, other)) == n_before  # untouched
