"""End-to-end shard preparation (llm/pipeline.py): gates, dedup,
packing layout, versioned commit, re-run isolation."""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.llm.pipeline import prepare_training_shards
from temp_data_pipeline_spark.operators.versioned import read_version, versions

GOOD = (
    "the data and that pipeline have with many good tokens here to "
    "be kept because they look like real sentences with the usual "
    "words and enough length to clear the gopher gates easily today "
    "and the second half of this paragraph keeps adding varied plain "
    "prose so that the fifty word minimum of the gopher rule suite "
    "is comfortably satisfied by every surviving document in the set"
)


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),               # exact duplicate of 1 -> dropped
        (3, GOOD + " extra tail words for variety and more content"),
        (4, "spam spam spam spam spam spam spam spam"),  # repetition gate
        (5, "x"),                # too short -> gopher gate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_gates_dedups_packs_and_commits(spark, tmp_path):
    path = str(tmp_path / "shards")
    man = prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},  # hashed-classifier gate off
    )
    assert man["version"] == 1
    assert man["n_docs_raw"] == 5
    assert man["n_docs_kept"] == 2  # 1 (canonical of {1,2}) and 3

    out = {r["doc_id"]: r for r in read_version(spark, path).collect()}
    assert set(out) == {1, 3}
    # packing invariants: doc 1 starts the stream; doc 3 starts right
    # after doc 1's tokens; offsets locate them within seq_len packs
    assert out[1]["begin"] == 0 and out[1]["pack_id"] == 0
    assert out[3]["begin"] == out[1]["n_tokens"]
    assert out[3]["pack_id"] == out[3]["begin"] // 16
    assert out[3]["pack_off"] == out[3]["begin"] % 16
    assert out[3]["shard"] == out[3]["pack_id"] // 2
    assert man["n_tokens_kept"] == out[1]["n_tokens"] + out[3]["n_tokens"]
    # pack/shard counts are TOKEN geometry, not document start packs:
    # the stream fills ceil(tokens/16) packs even though both docs
    # START in the first packs (review r5 finding)
    assert man["n_packs"] == -(-man["n_tokens_kept"] // 16)
    assert man["n_shards"] == -(-man["n_packs"] // 2)


def test_pipeline_recommit_is_new_version(spark, tmp_path):
    path = str(tmp_path / "shards")
    m1 = prepare_training_shards(
        _docs(spark), path, seq_len=16, gate_kwargs={"min_score": -1e9})
    m2 = prepare_training_shards(
        _docs(spark), path, seq_len=16, gate_kwargs={"min_score": -1e9})
    assert (m1["version"], m2["version"]) == (1, 2)
    assert versions(spark, path) == [1, 2]
    # time travel: v1 is still exactly readable after v2 commits
    v1 = {(r["doc_id"], r["pack_id"]) for r in read_version(spark, path, 1).collect()}
    v2 = {(r["doc_id"], r["pack_id"]) for r in read_version(spark, path, 2).collect()}
    assert v1 == v2  # same input -> identical layout, different version


def test_pipeline_empty_survivors(spark, tmp_path):
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards

    path = str(tmp_path / "s")
    df = spark.createDataFrame([(1, "x"), (2, "y y y y y y")],
                               "doc_id long, text string")
    man = prepare_training_shards(df, path)
    assert man["n_docs_kept"] == 0 and man["n_packs"] == 0
    # an EMPTY partitioned snapshot has no part files; the manifest
    # schema makes it readable instead of UNABLE_TO_INFER_SCHEMA,
    # and appends to it must work (review r5 finding)
    assert read_version(spark, path).count() == 0
    good = spark.createDataFrame([(7, GOOD)], "doc_id long, text string")
    m2 = append_training_shards(good, path, gate_kwargs={"min_score": -1e9})
    assert m2["version"] == 2 and m2["n_docs_kept"] == 1
    assert read_version(spark, path).count() == 1


def test_append_continues_stream_and_dedups_corpus_wide(spark, tmp_path):
    path = str(tmp_path / "shards")
    m1 = prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards

    new = spark.createDataFrame(
        [
            (10, GOOD),  # content duplicate of committed doc 1 -> dropped
            (11, GOOD + " a genuinely new closing sentence follows here"),
            (12, "y"),   # gopher-gated
        ],
        "doc_id long, text string",
    )
    m2 = append_training_shards(
        new, path, gate_kwargs={"min_score": -1e9}
    )
    assert m2["version"] == 2
    assert m2["n_docs_raw"] == m1["n_docs_raw"] + 3
    assert m2["n_docs_kept"] == m1["n_docs_kept"] + 1  # only doc 11

    out = {r["doc_id"]: r for r in read_version(spark, path).collect()}
    assert set(out) == {1, 3, 11}
    # v1 rows are byte-identical (frozen pack layout)...
    v1 = {r["doc_id"]: r for r in read_version(spark, path, 1).collect()}
    for d in (1, 3):
        assert (out[d]["begin"], out[d]["pack_id"], out[d]["pack_off"]) == (
            v1[d]["begin"], v1[d]["pack_id"], v1[d]["pack_off"])
    # ...and the new doc continues exactly after the committed tokens
    assert out[11]["begin"] == m1["n_tokens_kept"]
    assert out[11]["pack_id"] == out[11]["begin"] // 16
    assert out[11]["pack_off"] == out[11]["begin"] % 16
    assert m2["n_tokens_kept"] == m1["n_tokens_kept"] + out[11]["n_tokens"]


def test_append_requires_existing_table(spark, tmp_path):
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards

    with pytest.raises(FileNotFoundError):
        append_training_shards(_docs(spark), str(tmp_path / "none"))


def test_append_id_collision_does_not_lose_new_content(spark, tmp_path):
    """review r5: a batch-duplicate pair whose canonical copy's id is
    already committed used to lose BOTH copies — genuinely new
    content vanished. Colliding ids now leave the batch before
    canonical selection, so the surviving copy is re-elected."""
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards

    path = str(tmp_path / "shards")
    prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    new_text = GOOD + " a closing run of words never committed before"
    new = spark.createDataFrame(
        [(1, new_text), (77, new_text)],  # id 1 already committed
        "doc_id long, text string",
    )
    m = append_training_shards(new, path, gate_kwargs={"min_score": -1e9})
    out = {r["doc_id"]: r["text"] for r in read_version(spark, path).collect()}
    assert 77 in out and out[77] == new_text  # content survived via id 77
    assert out[1] != new_text                 # committed doc 1 untouched
    assert m["n_docs_kept"] == 3


def test_append_commit_is_metadata_level(spark, tmp_path):
    """The last scale-killer (verdict r5): a backfill must write ONLY
    the new batch's bytes. Version 2's own data dir holds just the new
    doc; the committed corpus is reached by REFERENCE to version 1's
    dir via the manifest's data_dirs — no byte of v1 is rewritten."""
    import glob

    from temp_data_pipeline_spark.llm.pipeline import append_training_shards
    from temp_data_pipeline_spark.operators.versioned import read_manifest

    path = str(tmp_path / "shards")
    prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    v1_files = sorted(glob.glob(f"{path}/v=1/**/*.parquet", recursive=True))
    v1_mtimes = {f: os.path.getmtime(f) for f in v1_files}
    new = spark.createDataFrame(
        [(11, GOOD + " a genuinely new closing sentence follows here")],
        "doc_id long, text string",
    )
    append_training_shards(new, path, gate_kwargs={"min_score": -1e9})

    # v2's own dir contains ONLY the new document's rows
    own = spark.read.parquet(f"{path}/v=2")
    assert {r["doc_id"] for r in own.collect()} == {11}
    # v1 files were neither rewritten nor touched
    assert sorted(glob.glob(f"{path}/v=1/**/*.parquet", recursive=True)) == v1_files
    assert {f: os.path.getmtime(f) for f in v1_files} == v1_mtimes
    # the manifest records the reference chain, oldest first
    man = read_manifest(spark, path, 2)
    assert man["data_dirs"] == ["v=1", "v=2"]  # relative: table relocatable
    # and the logical snapshot is still the full corpus
    assert {r["doc_id"] for r in read_version(spark, path, 2).collect()} == {1, 3, 11}


def test_append_chain_and_vacuum_keeps_referenced_dirs(spark, tmp_path):
    """Chained appends reference every ancestor dir; vacuum may expire
    the ancestors' version NUMBERS but must keep their bytes while any
    kept manifest references them (Iceberg expire-snapshots shape)."""
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards
    from temp_data_pipeline_spark.operators.versioned import (
        read_manifest,
        vacuum,
        versions,
    )

    path = str(tmp_path / "shards")
    prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    for i, tail in enumerate(["first new tail here", "second new tail here"]):
        new = spark.createDataFrame(
            [(20 + i, GOOD + " " + tail)], "doc_id long, text string"
        )
        append_training_shards(new, path, gate_kwargs={"min_score": -1e9})
    man3 = read_manifest(spark, path, 3)
    assert man3["data_dirs"] == [f"v={v}" for v in (1, 2, 3)]
    assert {r["doc_id"] for r in read_version(spark, path).collect()} == {1, 3, 20, 21}

    # expire v1 and v2: their manifests go, their data stays (v3 refs it)
    dropped = vacuum(spark, path, keep_last=1)
    assert dropped == [1, 2]
    assert versions(spark, path) == [3]
    assert os.path.exists(f"{path}/v=1") and os.path.exists(f"{path}/v=2")
    assert {r["doc_id"] for r in read_version(spark, path).collect()} == {1, 3, 20, 21}
    with pytest.raises(FileNotFoundError):
        read_version(spark, path, 1)
    # a later vacuum must STILL not reap the referenced orphans, even
    # with the in-flight grace window waived
    vacuum(spark, path, keep_last=1, orphan_grace=0)
    assert os.path.exists(f"{path}/v=1") and os.path.exists(f"{path}/v=2")
    assert read_version(spark, path).count() == 4


def test_append_empty_batch_is_metadata_only(spark, tmp_path):
    """A backfill where every document is gated/deduped away still
    commits a valid (purely referencing) version."""
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards

    path = str(tmp_path / "shards")
    m1 = prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    dup = spark.createDataFrame([(99, GOOD)], "doc_id long, text string")
    m2 = append_training_shards(dup, path, gate_kwargs={"min_score": -1e9})
    assert m2["version"] == 2
    assert m2["n_docs_kept"] == m1["n_docs_kept"]
    assert m2["n_tokens_kept"] == m1["n_tokens_kept"]
    assert {r["doc_id"] for r in read_version(spark, path, 2).collect()} == {1, 3}


def test_carry_from_schema_mismatch_raises(spark, tmp_path):
    from temp_data_pipeline_spark.operators.versioned import commit_version

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k long, val string")
    commit_version(df, path)
    other = spark.createDataFrame([(2,)], "k long")
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_version(other, path, carry_from=1)


def test_snapshot_diff_across_carried_versions(spark, tmp_path):
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards
    from temp_data_pipeline_spark.operators.versioned import snapshot_diff

    path = str(tmp_path / "shards")
    prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    new = spark.createDataFrame(
        [(11, GOOD + " a genuinely new closing sentence follows here")],
        "doc_id long, text string",
    )
    append_training_shards(new, path, gate_kwargs={"min_score": -1e9})
    got = {
        r["doc_id"]: r["change_type"]
        for r in snapshot_diff(spark, path, 1, 2, ["doc_id"]).collect()
    }
    assert got == {11: "added"}  # carried rows are bit-identical -> silent


def test_compact_snapshot_collapses_carry_chain(spark, tmp_path):
    """After appends, compaction rewrites the live snapshot as one
    self-contained version (single data dir, identical rows, manifest
    stats carried over), and vacuum can then reclaim every superseded
    dir — the Delta OPTIMIZE shape closing the append lifecycle."""
    from temp_data_pipeline_spark.llm.pipeline import append_training_shards
    from temp_data_pipeline_spark.operators.versioned import (
        compact_snapshot,
        read_manifest,
        vacuum,
        versions,
    )

    path = str(tmp_path / "shards")
    prepare_training_shards(
        _docs(spark), path, seq_len=16, packs_per_shard=2,
        gate_kwargs={"min_score": -1e9},
    )
    for i, tail in enumerate(["first new tail here", "second new tail here"]):
        new = spark.createDataFrame(
            [(20 + i, GOOD + " " + tail)], "doc_id long, text string"
        )
        append_training_shards(new, path, gate_kwargs={"min_score": -1e9})
    before = sorted(map(tuple, read_version(spark, path).collect()))
    assert len(read_manifest(spark, path)["data_dirs"]) == 3

    v4 = compact_snapshot(spark, path, partition_by=["shard"])
    man = read_manifest(spark, path, v4)
    assert man["data_dirs"] == [f"v={v4}"]                 # self-contained
    assert man["seq_len"] == 16 and man["compacted_from"] == 3
    assert man["n_tokens_kept"] == read_manifest(spark, path, 3)["n_tokens_kept"]
    assert sorted(map(tuple, read_version(spark, path, v4).collect())) == before

    # once history expires, nothing references the old dirs any more
    dropped = vacuum(spark, path, keep_last=1, orphan_grace=0)
    assert dropped == [1, 2, 3]
    assert versions(spark, path) == [v4]
    for v in (1, 2, 3):
        assert not os.path.exists(f"{path}/v={v}")
    assert sorted(map(tuple, read_version(spark, path).collect())) == before
