"""Commit-time conflict detection (operators/versioned.py).

The lost-update anomaly verdict r6 named: two writers plan mutations
against the same base version; without a conflict check the loser's
manifest silently drops the winner's changes (a MOR delete's carried
dirs embed the base it read). With ``expected_base`` the manifest
rename at ``base+1`` is the single atomic arbiter — the loser raises
``CommitConflictError`` and a retry, re-planned against the winner's
version, produces the UNION outcome.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators import versioned as V
from temp_data_pipeline_spark.operators.deletion_vectors import (
    _commit_with_dv,
    _visible_tagged,
    commit_delete_mor,
    commit_upsert_mor,
    read_table,
)
from temp_data_pipeline_spark.operators.versioned import (
    CommitConflictError,
    commit_version,
    read_manifest,
    read_version,
    verify_table,
    versions,
)


def _mk(spark, tmp_path, name, rows):
    path = os.path.join(str(tmp_path), name)
    commit_version(
        spark.createDataFrame(rows, "k long, user string, val long"), path
    )
    return path


class TestExpectedBase:
    def test_stale_base_raises_before_writing(self, spark, tmp_path):
        path = _mk(spark, tmp_path, "t1", [(1, "a", 10)])
        commit_version(
            spark.createDataFrame([(2, "b", 20)], "k long, user string, val long"),
            path,
            carry_from=1,
        )
        with pytest.raises(CommitConflictError) as exc:
            commit_version(
                spark.createDataFrame(
                    [(3, "c", 30)], "k long, user string, val long"
                ),
                path,
                carry_from=1,
                expected_base=1,
            )
        assert exc.value.expected_base == 1 and exc.value.actual == 2
        # fast-fail: no data dir was written for the losing commit
        assert versions(spark, path) == [1, 2]
        assert not os.path.exists(os.path.join(path, "v=3"))

    def test_expected_base_zero_guards_first_commit(self, spark, tmp_path):
        path = _mk(spark, tmp_path, "t2", [(1, "a", 10)])
        with pytest.raises(CommitConflictError):
            commit_version(
                spark.createDataFrame([(9, "z", 0)], "k long, user string, val long"),
                path,
                expected_base=0,
            )

    def test_manifest_rename_is_the_arbiter(self, spark, tmp_path, monkeypatch):
        """Stage the narrow race the entry check can't see: a
        competitor's manifest lands between the version scan and our
        rename. The rename-onto-existing failure must surface as a
        conflict, not a silent renumber past the winner."""
        path = _mk(spark, tmp_path, "t3", [(1, "a", 10)])
        real_versions = V.versions
        monkeypatch.setattr(V, "versions", lambda s, p: [1])
        # competitor commits version 2 out-of-band (write its manifest
        # directly so our patched versions() never reveals it)
        man = dict(read_manifest(spark, path, 1))
        man["version"] = 2
        import json

        with open(os.path.join(path, "_manifest", "2.json"), "w") as fh:
            json.dump(man, fh)
        with pytest.raises(CommitConflictError):
            commit_version(
                spark.createDataFrame(
                    [(5, "e", 50)], "k long, user string, val long"
                ),
                path,
                expected_base=1,
            )
        monkeypatch.setattr(V, "versions", real_versions)
        # the loser cleaned up: only the winner's state remains
        assert versions(spark, path) == [1, 2]
        assert not any(
            d.startswith("v=") and d not in ("v=1",)
            for d in os.listdir(path)
        )

    def test_default_commits_keep_renumbering(self, spark, tmp_path):
        """Without expected_base the historical behavior stands:
        independent appends never conflict, they just take the next
        slot."""
        path = _mk(spark, tmp_path, "t4", [(1, "a", 10)])
        v2 = commit_version(
            spark.createDataFrame([(2, "b", 20)], "k long, user string, val long"),
            path,
        )
        assert v2 == 2


class TestMorRace:
    def test_interleaved_mor_deletes_conflict_then_union(self, spark, tmp_path):
        path = _mk(
            spark,
            tmp_path,
            "mor",
            [(i, f"u{i % 4}", i) for i in range(20)],
        )
        base = versions(spark, path)[-1]
        man = read_manifest(spark, path, base)
        # writer A plans its delete (finds positions) against base...
        dv_a = (
            _visible_tagged(spark, path, base, man)
            .filter(F.col("user") == "u1")
            .select(
                F.col("_dv_file").alias("file"), F.col("_dv_pos").alias("pos")
            )
        )
        dv_a = spark.createDataFrame(dv_a.collect(), "file string, pos long")
        # ...but writer B lands first
        vb = commit_delete_mor(spark, path, "user = 'u2'")
        assert vb == base + 1
        # A's commit against the stale base must raise, not drop B's
        # deletions
        with pytest.raises(CommitConflictError):
            _commit_with_dv(spark, path, base, man, dv_a, None, None)
        # loser's DV sidecar was reclaimed eagerly — no orphan remains
        issues = [i for i in verify_table(spark, path) if "deletion vector" in i]
        assert issues == []
        # B's outcome is intact
        got = {r["user"] for r in read_table(spark, path).collect()}
        assert got == {"u0", "u1", "u3"}
        # the RETRY re-plans against the new latest → union outcome
        commit_delete_mor(spark, path, "user = 'u1'")
        got = {r["user"] for r in read_table(spark, path).collect()}
        assert got == {"u0", "u3"}

    def test_upsert_schema_mismatch_raises(self, spark, tmp_path):
        path = _mk(spark, tmp_path, "ups", [(1, "a", 10), (2, "b", 20)])
        # missing column
        with pytest.raises(ValueError, match="schema mismatch"):
            commit_upsert_mor(
                spark.createDataFrame([(1, "z")], "k long, user string"),
                path,
                ["k"],
            )
        # retyped column
        with pytest.raises(ValueError, match="retypes"):
            commit_upsert_mor(
                spark.createDataFrame(
                    [(1, "z", 1.5)], "k long, user string, val double"
                ),
                path,
                ["k"],
            )
        # the failed attempts committed nothing
        assert versions(spark, path) == [1]
        # a well-typed batch still lands
        commit_upsert_mor(
            spark.createDataFrame(
                [(1, "z", 99), (7, "n", 70)], "k long, user string, val long"
            ),
            path,
            ["k"],
        )
        got = {(r["k"], r["user"]) for r in read_table(spark, path).collect()}
        assert got == {(1, "z"), (2, "b"), (7, "n")}


class TestCowRace:
    def test_cow_merge_conflicts_on_stale_base(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_merge_cow,
        )

        path = os.path.join(str(tmp_path), "cow")
        base = spark.createDataFrame(
            [(i, "a" if i < 5 else "b", i) for i in range(10)],
            "k long, part string, ts long",
        )
        commit_merge_cow(base, path, ["k"], "ts", "part")
        # two writers both plan against v1; B lands first
        upd_b = spark.createDataFrame(
            [(0, "a", 100)], "k long, part string, ts long"
        )
        commit_merge_cow(upd_b, path, ["k"], "ts", "part")
        # A (planned against v1 but committing later) re-resolves the
        # base internally, so a sequential call succeeds — stage A's
        # stale plan via the raw commit path instead
        with pytest.raises(CommitConflictError):
            commit_version(
                spark.createDataFrame(
                    [(1, "a", 200)], "k long, part string, ts long"
                ),
                path,
                partition_by=["part"],
                carry_dirs=["v=1/part=b"],
                expected_base=1,
            )
        assert versions(spark, path) == [1, 2]


class TestCommitWithRetries:
    def test_sequential_conflicts_retry_to_union(self, spark, tmp_path):
        """The helper packages the replan loop: a plan that loses its
        first attempt (staged stale base) succeeds on retry, and the
        outcome is the union of both writers' changes."""
        from temp_data_pipeline_spark.operators.versioned import (
            commit_with_retries,
        )

        path = _mk(spark, tmp_path, "rt", [(i, f"u{i % 3}", i) for i in range(9)])
        attempts = {"n": 0}

        def plan():
            attempts["n"] += 1
            if attempts["n"] == 1:
                # stage a competitor landing between plan and commit
                commit_delete_mor(spark, path, "user = 'u2'")
                base = versions(spark, path)[0]  # stale on purpose
                raise CommitConflictError(path, base, versions(spark, path)[-1])
            return commit_delete_mor(spark, path, "user = 'u1'")

        v = commit_with_retries(plan, max_attempts=3)
        assert v == versions(spark, path)[-1]
        from temp_data_pipeline_spark.operators.deletion_vectors import (
            read_table as _rt,
        )

        assert {r["user"] for r in _rt(spark, path).collect()} == {"u0"}
        assert attempts["n"] == 2

    def test_exhausted_attempts_reraise(self, spark, tmp_path):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_with_retries,
        )

        calls = {"n": 0}

        def always_conflicts():
            calls["n"] += 1
            raise CommitConflictError("p", 1, 2)

        with pytest.raises(CommitConflictError):
            commit_with_retries(always_conflicts, max_attempts=4)
        assert calls["n"] == 4

    def test_non_conflict_errors_propagate_immediately(self, spark):
        from temp_data_pipeline_spark.operators.versioned import (
            commit_with_retries,
        )

        calls = {"n": 0}

        def boom():
            calls["n"] += 1
            raise ValueError("not retryable")

        with pytest.raises(ValueError):
            commit_with_retries(boom, max_attempts=5)
        assert calls["n"] == 1

    def test_threaded_contention_all_land(self, spark, tmp_path):
        """N genuinely concurrent MOR writers, each wrapped in
        commit_with_retries: every one eventually commits and the
        final table is the union of all deletions (verdict r7 #4's
        done-criterion)."""
        import threading

        from temp_data_pipeline_spark.operators.deletion_vectors import (
            read_table as _rt,
        )
        from temp_data_pipeline_spark.operators.versioned import (
            commit_with_retries,
        )

        path = _mk(
            spark, tmp_path, "thr", [(i, f"u{i % 6}", i) for i in range(24)]
        )
        errors: list[Exception] = []

        def worker(u: str) -> None:
            try:
                commit_with_retries(
                    lambda: commit_delete_mor(spark, path, f"user = '{u}'"),
                    max_attempts=12,
                    backoff=0.05,
                )
            except Exception as exc:  # surfaced in the main thread
                errors.append(exc)

        threads = [
            threading.Thread(target=worker, args=(f"u{i}",)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        got = {r["user"] for r in _rt(spark, path).collect()}
        assert got == {"u3", "u4", "u5"}
        # the log is healthy: contiguous versions, fsck-clean
        assert verify_table(spark, path) == []


class TestSlotClaimOwnership:
    """ADVICE r8 #1: Hadoop rename onto a dir that appeared between the
    exists probe and the rename returns TRUE by moving the staging
    INTO it (local FS falls through to FileUtil.copy; HDFS documents
    move-into) — so a true rename is not proof of the slot claim. The
    claimer must verify ownership via its sentinel and recover the
    nested staging on a lost race, never touching the winner's data."""

    def test_lost_probe_race_recovers_and_retries(self, spark, tmp_path):
        path = _mk(spark, tmp_path, "slot1", [(1, "a", 10)])
        fs, jvm = V._fs(spark, path)
        Path = jvm.org.apache.hadoop.fs.Path
        # the loser's staging, exactly as commit_version stages it
        token = "feedfacecafe"
        staging = os.path.join(path, f".tmp-{token}")
        os.makedirs(staging)
        with open(os.path.join(staging, "part-0.txt"), "w") as fh:
            fh.write("loser")
        claim = f"._claim-{token}"
        open(os.path.join(staging, claim), "w").close()
        # the winner already occupies v=2 with committed bytes
        os.makedirs(os.path.join(path, "v=2"))
        with open(os.path.join(path, "v=2", "part-0.txt"), "w") as fh:
            fh.write("winner")
        # first probe lies ("v=2 is free") — the race window; later
        # probes see the real filesystem
        lied = []

        def probe(p):
            if not lied:
                lied.append(True)
                return False
            return fs.exists(Path(p))

        data, slot = V._claim_slot(
            fs, Path, path, staging, claim, token, 2, probe=probe
        )
        assert slot == 3 and data.endswith("v=3")
        # the winner's dir is intact — no deletion, no nested leftovers
        with open(os.path.join(path, "v=2", "part-0.txt")) as fh:
            assert fh.read() == "winner"
        assert sorted(os.listdir(os.path.join(path, "v=2"))) == ["part-0.txt"]
        # the loser's bytes landed whole at v=3, sentinel consumed
        with open(os.path.join(path, "v=3", "part-0.txt")) as fh:
            assert fh.read() == "loser"
        assert claim not in os.listdir(os.path.join(path, "v=3"))

    def test_conflict_cleanup_only_after_verified_ownership(
        self, spark, tmp_path, monkeypatch
    ):
        """The full end-to-end shape of the r8 finding: a MOR-style
        commit loses BOTH the slot probe and the manifest race. Its
        conflict cleanup must delete ITS OWN recovered data dir, and
        the winner's committed version must survive untouched."""
        path = _mk(spark, tmp_path, "slot2", [(1, "a", 10), (2, "b", 20)])
        # winner commits version 2 (carry append)
        commit_version(
            spark.createDataFrame([(3, "c", 30)], "k long, user string, val long"),
            path,
            carry_from=1,
        )
        winner_rows = {r["k"] for r in read_version(spark, path, 2).collect()}
        # loser planned against version 1; its commit must conflict and
        # clean up only its own dir
        with pytest.raises(CommitConflictError):
            commit_version(
                spark.createDataFrame([(9, "z", 90)], "k long, user string, val long"),
                path,
                carry_from=1,
                expected_base=1,
            )
        assert versions(spark, path) == [1, 2]
        assert {r["k"] for r in read_version(spark, path, 2).collect()} == winner_rows
        # nothing of the loser persists: no stray v= dirs, no staging
        stray = [
            d for d in os.listdir(path)
            if (d.startswith("v=") and d not in ("v=1", "v=2"))
            or d.startswith(".tmp-")
        ]
        assert stray == []


class TestCommitArbiterSeam:
    """Verdict r8 #6: object stores without atomic rename plug a
    conditional-put/lock arbiter through set_commit_arbiter; every
    manifest publish (versioned tables AND the LLM index commit log)
    routes through the seam."""

    def _conditional_put(self):
        claimed: set[str] = set()

        def cput(spark, final, payload):
            if final in claimed or os.path.exists(final):
                return False
            claimed.add(final)
            with open(final, "wb") as fh:
                fh.write(payload)
            return True

        return cput

    def test_protocol_unchanged_through_custom_arbiter(self, spark, tmp_path):
        V.set_commit_arbiter(self._conditional_put())
        try:
            path = os.path.join(str(tmp_path), "arb1")
            commit_version(
                spark.createDataFrame([(1, "a", 10)], "k long, user string, val long"),
                path,
            )
            commit_version(
                spark.createDataFrame([(2, "b", 20)], "k long, user string, val long"),
                path,
                carry_from=1,
            )
            with pytest.raises(CommitConflictError):
                commit_version(
                    spark.createDataFrame(
                        [(3, "c", 30)], "k long, user string, val long"
                    ),
                    path,
                    carry_from=1,
                    expected_base=1,
                )
            assert versions(spark, path) == [1, 2]
            assert {r["k"] for r in read_version(spark, path).collect()} == {1, 2}
            assert verify_table(spark, path) == []
        finally:
            V.set_commit_arbiter(None)

    def test_hook_closes_a_non_atomic_store_race(
        self, spark, tmp_path, monkeypatch
    ):
        """On a store whose publish is blind overwrite (the raw-S3
        failure mode), the manifest race stays OPEN: the stale writer
        'wins' too and silently replaces the winner's manifest. The
        same staged race through a conditional-put arbiter is closed.
        This pins the seam as the exact point where atomicity is
        required."""
        import json

        def blind(spark_, final, payload):
            with open(final, "wb") as fh:
                fh.write(payload)
            return True

        def stage(name):
            path = _mk(spark, tmp_path, name, [(1, "a", 10)])
            # competitor's manifest lands between the version scan and
            # our publish (hidden from the patched versions())
            man = dict(read_manifest(spark, path, 1))
            man["version"] = 2
            with open(os.path.join(path, "_manifest", "2.json"), "w") as fh:
                json.dump(man, fh)
            return path

        path = stage("arbopen")
        path2 = stage("arbclosed")
        real_versions = V.versions
        monkeypatch.setattr(V, "versions", lambda s, p: [1])
        try:
            V.set_commit_arbiter(blind)
            # race OPEN: the stale commit overwrites the winner's manifest
            v = commit_version(
                spark.createDataFrame([(5, "e", 50)], "k long, user string, val long"),
                path,
                expected_base=1,
            )
            assert v == 2  # silent lost update — the broken-store anomaly

            V.set_commit_arbiter(self._conditional_put())
            # race CLOSED by the conditional-put hook alone
            with pytest.raises(CommitConflictError):
                commit_version(
                    spark.createDataFrame(
                        [(5, "e", 50)], "k long, user string, val long"
                    ),
                    path2,
                    expected_base=1,
                )
        finally:
            V.set_commit_arbiter(None)
            monkeypatch.setattr(V, "versions", real_versions)

    def test_index_commit_routes_through_seam(self, spark, tmp_path):
        from temp_data_pipeline_spark.llm.index_commit import (
            commit_index_manifest,
            read_index_state,
        )

        calls: list[str] = []
        put = self._conditional_put()

        def spy(spark_, final, payload):
            calls.append(final)
            return put(spark_, final, payload)

        V.set_commit_arbiter(spy)
        try:
            path = os.path.join(str(tmp_path), "idx")
            v = commit_index_manifest(
                spark, path, {"dirs": ["a"]}, expected_base=0
            )
            assert v == 1
            assert any(c.endswith("index-1.json") for c in calls)
            got_v, man = read_index_state(spark, path)
            assert got_v == 1 and man == {"dirs": ["a"]}
            with pytest.raises(CommitConflictError):
                commit_index_manifest(
                    spark, path, {"dirs": ["b"]}, expected_base=0
                )
        finally:
            V.set_commit_arbiter(None)
