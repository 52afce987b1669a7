"""Persisted MinHash dedup index: build / append / probe / vacuum.

Contract under test: probing a batch against an index returns exactly
the signature-Jaccard-verified candidates an ad-hoc banded join over
(index ∪ batch) would produce for cross-set pairs; appends are
O(batch) metadata-level (new immutable dirs, manifest swap) and a
probe over build(A)+append(B) equals a probe over build(A ∪ B).
"""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.llm.dedup_index import (
    append_documents,
    build_dedup_index,
    filter_new,
    probe_neardups,
    read_dedup_manifest,
    vacuum_dedup_index,
)

SCHEMA = "doc_id long, text string"

# ten shared tokens -> 8 shared 3-shingles; near-dup pairs differ by
# one trailing token, unrelated docs share nothing
BASE_TXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
CORPUS = [
    (1, BASE_TXT + " one"),
    (2, "totally different words about spark and parquet files here"),
    (3, "yet another unrelated document concerning window functions"),
]
NEAR_DUP = (10, BASE_TXT + " two")        # near-dup of doc 1
FRESH = (11, "completely novel content nothing shares these tokens")


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


class TestDedupIndex:
    def test_build_probe_finds_planted_neardup(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        man = build_dedup_index(_df(spark, CORPUS), p, k=8, bands=4)
        assert man["n_docs"] == 3
        got = probe_neardups(
            spark, p, _df(spark, [NEAR_DUP, FRESH]), threshold=0.5
        ).collect()
        pairs = {(r["id_new"], r["id_indexed"]) for r in got}
        assert (10, 1) in pairs
        assert all(r["id_new"] != 11 for r in got)
        # verified n_eq is a real count in [ceil(0.5*8), 8]
        assert all(4 <= r["n_eq"] <= 8 for r in got)

    def test_filter_new_keeps_only_survivors(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        build_dedup_index(_df(spark, CORPUS), p, k=8, bands=4)
        surv = filter_new(
            spark, p, _df(spark, [NEAR_DUP, FRESH]), threshold=0.5
        )
        assert [r["doc_id"] for r in surv.collect()] == [11]

    def test_append_equals_rebuild(self, spark, tmp_path):
        a = [CORPUS[0], CORPUS[1]]
        b = [CORPUS[2], (4, BASE_TXT + " four")]
        probe = [NEAR_DUP, FRESH]
        inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
        build_dedup_index(_df(spark, a), inc, k=8, bands=4)
        append_documents(_df(spark, b), inc)
        build_dedup_index(_df(spark, a + b), full, k=8, bands=4)
        got_inc = {
            tuple(r)
            for r in probe_neardups(spark, inc, _df(spark, probe)).collect()
        }
        got_full = {
            tuple(r)
            for r in probe_neardups(spark, full, _df(spark, probe)).collect()
        }
        assert got_inc == got_full
        matched = {(a, b) for a, b, _ in got_inc}
        assert {(10, 1), (10, 4)} <= matched
        # metadata-level: append added dirs, never rewrote the build's
        man = read_dedup_manifest(spark, inc)
        assert len(man["bands_dirs"]) == 2 and len(man["sigs_dirs"]) == 2
        assert man["n_docs"] == 4

    def test_probe_prunes_band_shards(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        build_dedup_index(_df(spark, CORPUS), p, k=8, bands=4, n_shards=64)
        plan = (
            probe_neardups(spark, p, _df(spark, [NEAR_DUP]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the index band scan must carry a partition filter on _bh
        assert "PartitionFilters: [_bh" in plan.replace("PartitionFilters: [ _bh", "PartitionFilters: [_bh") or "_bh#" in plan.split("PartitionFilters")[1][:200]

    def test_crashed_build_is_invisible_and_vacuumable(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        os.makedirs(os.path.join(p, "bands-deadbeef"))
        with pytest.raises(FileNotFoundError):
            read_dedup_manifest(spark, p)
        build_dedup_index(_df(spark, CORPUS), p, k=8, bands=4)
        # grace protects the (fake in-flight) orphan, zero grace reaps it
        assert vacuum_dedup_index(spark, p, orphan_grace=3600.0) == []
        assert vacuum_dedup_index(spark, p, orphan_grace=0.0) == ["bands-deadbeef"]
        # live dirs always survive
        man = read_dedup_manifest(spark, p)
        for d in man["bands_dirs"] + man["sigs_dirs"]:
            assert os.path.isdir(os.path.join(p, d))

    def test_empty_batch_append_is_noop(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        m1 = build_dedup_index(_df(spark, CORPUS), p, k=8, bands=4)
        m2 = append_documents(_df(spark, []), p)
        assert m2 == m1
        visible = sorted(n for n in os.listdir(p) if not n.startswith("."))
        assert visible == sorted(
            m1["bands_dirs"] + m1["sigs_dirs"] + ["index-1.json"]
        )

    def test_ingest_loop_dedups_across_batches(self, spark, tmp_path):
        # the serving pattern end-to-end: probe -> filter -> append
        p = str(tmp_path / "idx")
        batches = [
            [CORPUS[0], CORPUS[1]],
            [NEAR_DUP, FRESH],               # 10 dups 1; 11 fresh
            [(20, CORPUS[0][1]), (21, FRESH[1])],  # exact copies
        ]
        build_dedup_index(_df(spark, batches[0]), p, k=8, bands=4)
        kept = [1, 2]
        for b in batches[1:]:
            surv = filter_new(spark, p, _df(spark, b), threshold=0.5)
            append_documents(surv, p)
            kept += [r["doc_id"] for r in surv.orderBy("doc_id").collect()]
        # 10 near-dups 1; 20 exactly copies 1; 21 exactly copies 11 —
        # 11 entered the index via batch 2's append, so batch 3 must
        # be checked against it (cross-batch dedup, the whole point)
        assert kept == [1, 2, 11]
        assert read_dedup_manifest(spark, p)["n_docs"] == 3

    def test_k_bands_mismatch_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="multiple of bands"):
            build_dedup_index(
                _df(spark, CORPUS), str(tmp_path / "x"), k=10, bands=4
            )


class TestCompact:
    def test_compact_collapses_dirs_probe_unchanged(self, spark, tmp_path):
        from temp_data_pipeline_spark.llm.dedup_index import (
            compact_dedup_index,
            vacuum_dedup_index,
        )

        p = str(tmp_path / "idx")
        build_dedup_index(_df(spark, CORPUS[:1]), p, k=8, bands=4)
        append_documents(_df(spark, CORPUS[1:2]), p)
        append_documents(_df(spark, CORPUS[2:]), p)
        before = {
            tuple(r)
            for r in probe_neardups(spark, p, _df(spark, [NEAR_DUP])).collect()
        }
        man = compact_dedup_index(spark, p)
        assert len(man["bands_dirs"]) == 1 and len(man["sigs_dirs"]) == 1
        assert man["n_docs"] == 3
        after = {
            tuple(r)
            for r in probe_neardups(spark, p, _df(spark, [NEAR_DUP])).collect()
        }
        assert before == after
        # old dirs reclaimable only after compaction made them orphans
        dropped = vacuum_dedup_index(spark, p, orphan_grace=0.0)
        assert len(dropped) == 6  # 3 builds x (bands + sigs)
        assert {
            tuple(r)
            for r in probe_neardups(spark, p, _df(spark, [NEAR_DUP])).collect()
        } == before

    def test_compact_single_dir_is_noop(self, spark, tmp_path):
        from temp_data_pipeline_spark.llm.dedup_index import (
            compact_dedup_index,
        )

        p = str(tmp_path / "idx")
        m1 = build_dedup_index(_df(spark, CORPUS), p, k=8, bands=4)
        assert compact_dedup_index(spark, p) == m1
