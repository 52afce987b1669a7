"""Commit-time conflict detection for the LLM index manifests
(llm/index_commit.py) — the round-7 versioned-table protocol ported
to the IVF vector index and the MinHash dedup index.

The lost-update anomaly verdict r7 named: two concurrent appends both
read manifest M; under the old single ``index.json`` overwrite the
second swap silently dropped the first's dirs. Now the rename onto
``index-<B+1>.json`` is the single atomic arbiter — the loser raises
the retryable ``CommitConflictError`` (its freshly-written dirs
reclaimed eagerly), and a retry, re-based on the winner's manifest,
yields the UNION of both batches. Mirrors tests/test_conflicts.py's
MOR race suite.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import temp_data_pipeline_spark.llm.dedup_index as DI
import temp_data_pipeline_spark.llm.index_commit as IC
import temp_data_pipeline_spark.llm.vector_index as VI
from temp_data_pipeline_spark.operators.versioned import CommitConflictError

SF_SMOKE = "/root/testdata/sf0.001"


def _embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _centroids(spark, n=8):
    e = _embeddings(spark)
    return [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    ]


SCHEMA = "doc_id long, text string"
BASE_TXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


class TestIvfRace:
    def test_interleaved_appends_conflict_then_union(
        self, spark, tmp_path, monkeypatch
    ):
        e = _embeddings(spark)
        path = str(tmp_path / "ivf")
        VI.build_ivf_index(
            e.filter("vec_id < 30"), path, centroids=_centroids(spark)
        )
        # writer A plans against the freshly-built version 1 ...
        stale = IC.read_index_state(spark, path, kind="IVF")
        # ... but writer B lands first (version 2)
        VI.add_vectors(e.filter("vec_id >= 30 and vec_id < 40"), path)
        assert IC.index_versions(spark, path) == [1, 2]
        n_before = VI.read_ivf_manifest(spark, path)["n_vectors"]
        dirs_before = set(VI.read_ivf_manifest(spark, path)["cells_dirs"])
        # A's commit against the stale base must raise, not drop B
        monkeypatch.setattr(
            VI, "read_index_state", lambda s, p, kind=None: stale
        )
        with pytest.raises(CommitConflictError):
            VI.add_vectors(e.filter("vec_id >= 40 and vec_id < 50"), path)
        monkeypatch.undo()
        # loser's dirs were reclaimed eagerly — nothing unreferenced
        on_disk = {
            d for d in os.listdir(path) if d.startswith("cells-")
        }
        assert on_disk == dirs_before
        # B's outcome is intact
        assert VI.read_ivf_manifest(spark, path)["n_vectors"] == n_before
        # the RETRY re-bases on the winner's manifest → union outcome
        VI.add_vectors(e.filter("vec_id >= 40 and vec_id < 50"), path)
        man = VI.read_ivf_manifest(spark, path)
        assert man["n_vectors"] == e.filter("vec_id < 50").count()
        assert IC.index_versions(spark, path) == [1, 2, 3]

    def test_manifest_rename_is_the_arbiter(
        self, spark, tmp_path, monkeypatch
    ):
        """The narrow race the entry check can't see: a competitor's
        manifest lands between the latest-version scan and our rename.
        rename-onto-existing must surface as a conflict."""
        e = _embeddings(spark)
        path = str(tmp_path / "ivf")
        VI.build_ivf_index(
            e.filter("vec_id < 20"), path, centroids=_centroids(spark)
        )
        monkeypatch.setattr(IC, "_latest", lambda s, p: 1)
        # competitor's index-2.json appears out-of-band
        man = VI.read_ivf_manifest(spark, path)
        with open(os.path.join(path, "index-2.json"), "w") as fh:
            json.dump(man, fh)
        with pytest.raises(CommitConflictError):
            VI.add_vectors(e.filter("vec_id >= 20 and vec_id < 30"), path)
        monkeypatch.undo()
        # the loser cleaned up its temp and dirs; winner state intact
        assert IC.index_versions(spark, path) == [1, 2]
        assert not any(n.endswith(".tmp") for n in os.listdir(path))
        assert set(os.listdir(path)) >= set(man["cells_dirs"])

    def test_legacy_index_json_reads_as_version_zero(self, spark, tmp_path):
        e = _embeddings(spark)
        path = str(tmp_path / "ivf")
        VI.build_ivf_index(
            e.filter("vec_id < 20"), path, centroids=_centroids(spark)
        )
        # rewind the layout to the pre-r8 single-file form
        os.rename(
            os.path.join(path, "index-1.json"),
            os.path.join(path, "index.json"),
        )
        base, man = IC.read_index_state(spark, path, kind="IVF")
        assert base == 0 and man["nlist"] == 8
        # first logged commit on a legacy index lands at index-1.json
        VI.add_vectors(e.filter("vec_id >= 20 and vec_id < 25"), path)
        assert IC.index_versions(spark, path) == [1]
        got = VI.read_ivf_manifest(spark, path)
        assert got["n_vectors"] == e.filter("vec_id < 25").count()

    def test_vacuum_expires_manifests_and_unreferenced_dirs(
        self, spark, tmp_path
    ):
        e = _embeddings(spark)
        path = str(tmp_path / "ivf")
        VI.build_ivf_index(
            e.filter("vec_id < 20"), path, centroids=_centroids(spark)
        )
        old_dir = VI.read_ivf_manifest(spark, path)["cells_dirs"][0]
        # rebuild supersedes the first build's dir
        VI.build_ivf_index(
            e.filter("vec_id < 25"), path, centroids=_centroids(spark)
        )
        assert IC.index_versions(spark, path) == [1, 2]
        # keep_manifests=2 keeps version 1 alive → its dir survives
        VI.vacuum_ivf_index(spark, path, orphan_grace=0.0, keep_manifests=2)
        assert os.path.isdir(os.path.join(path, old_dir))
        # keep_manifests=1 expires version 1 → its dir is reclaimable
        VI.vacuum_ivf_index(spark, path, orphan_grace=0.0, keep_manifests=1)
        assert IC.index_versions(spark, path) == [2]
        assert not os.path.exists(os.path.join(path, old_dir))
        live = VI.read_ivf_manifest(spark, path)["cells_dirs"]
        for d in live:
            assert os.path.isdir(os.path.join(path, d))


class TestDedupRace:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, SCHEMA)

    def test_interleaved_appends_conflict_then_union(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        DI.build_dedup_index(
            self._df(spark, [(1, BASE_TXT + " one")]), path, k=8, bands=4
        )
        stale = IC.read_index_state(spark, path, kind="dedup")
        # writer B lands batch {2} first
        DI.append_documents(
            self._df(spark, [(2, "spark parquet files words here today")]),
            path,
        )
        man_b = DI.read_dedup_manifest(spark, path)
        dirs_b = set(man_b["bands_dirs"]) | set(man_b["sigs_dirs"])
        # writer A replays its stale plan for batch {3}
        monkeypatch.setattr(
            DI, "read_index_state", lambda s, p, kind=None: stale
        )
        with pytest.raises(CommitConflictError):
            DI.append_documents(
                self._df(spark, [(3, "window functions unrelated doc")]),
                path,
            )
        monkeypatch.undo()
        # loser's dirs reclaimed; B intact
        on_disk = {
            d
            for d in os.listdir(path)
            if d.startswith(("bands-", "sigs-"))
        }
        assert on_disk == dirs_b
        assert DI.read_dedup_manifest(spark, path)["n_docs"] == 2
        # retry yields the union: all three docs indexed
        DI.append_documents(
            self._df(spark, [(3, "window functions unrelated doc")]), path
        )
        man = DI.read_dedup_manifest(spark, path)
        assert man["n_docs"] == 3
        # and the index actually answers for every batch: an exact
        # copy of each doc probes back to its id
        got = DI.probe_neardups(
            spark,
            path,
            self._df(
                spark,
                [
                    (11, BASE_TXT + " one"),
                    (12, "spark parquet files words here today"),
                    (13, "window functions unrelated doc"),
                ],
            ),
            threshold=0.99,
        ).collect()
        pairs = {(r["id_new"], r["id_indexed"]) for r in got}
        assert {(11, 1), (12, 2), (13, 3)} <= pairs

    def test_compaction_racing_append_conflicts(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        DI.build_dedup_index(
            self._df(spark, [(1, BASE_TXT + " one")]), path, k=8, bands=4
        )
        DI.append_documents(
            self._df(spark, [(2, "spark parquet files words here today")]),
            path,
        )
        stale = IC.read_index_state(spark, path, kind="dedup")
        DI.append_documents(
            self._df(spark, [(3, "window functions unrelated doc")]), path
        )
        monkeypatch.setattr(
            DI, "read_index_state", lambda s, p, kind=None: stale
        )
        with pytest.raises(CommitConflictError):
            DI.compact_dedup_index(spark, path)
        monkeypatch.undo()
        # batch {3} survived the losing compaction
        assert DI.read_dedup_manifest(spark, path)["n_docs"] == 3
        # a clean retry compacts the full chain
        man = DI.compact_dedup_index(spark, path)
        assert len(man["bands_dirs"]) == 1 and len(man["sigs_dirs"]) == 1
        assert man["n_docs"] == 3
