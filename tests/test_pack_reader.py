"""Pack reader (llm/pipeline.py read_pack_range / materialize_packs
and chunk.reassemble_packs): the loader-side contract — reassembling
any training sequence from the committed shard table, across shard
and version boundaries, with partition pruning."""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.llm.pipeline import (
    append_training_shards,
    materialize_packs,
    prepare_training_shards,
    read_pack,
    read_pack_range,
)
from temp_data_pipeline_spark.operators.versioned import read_manifest

from tests.test_pipeline_shards import GOOD, _docs

SEQ = 16
PPS = 2


def _table(spark, tmp_path):
    path = str(tmp_path / "shards")
    man = prepare_training_shards(
        _docs(spark), path, seq_len=SEQ, packs_per_shard=PPS,
        gate_kwargs={"min_score": -1e9},
    )
    return path, man


def _expected_stream(spark, path):
    """Ground truth: survivors' tokens concatenated in stream order."""
    from temp_data_pipeline_spark.operators.versioned import read_version

    rows = sorted(
        read_version(spark, path).collect(), key=lambda r: r["begin"]
    )
    out = []
    for r in rows:
        out.extend(r["text"].split(" "))
    return out


def test_materialize_all_packs_reassembles_the_stream(spark, tmp_path):
    path, man = _table(spark, tmp_path)
    stream = _expected_stream(spark, path)
    packs = {
        r["pack_id"]: r
        for r in materialize_packs(spark, path, 0, man["n_packs"]).collect()
    }
    assert set(packs) == set(range(man["n_packs"]))
    got = []
    for p in range(man["n_packs"]):
        toks = packs[p]["tokens"]
        assert packs[p]["n_tokens"] == len(toks)
        if p < man["n_packs"] - 1:
            assert len(toks) == SEQ  # full training sequences
        got.extend(toks)
    assert got == stream


def test_pack_straddles_shard_boundary(spark, tmp_path):
    """GOOD is ~60 tokens at seq_len 16 / 2 packs per shard: doc 1
    spans packs 0..3, i.e. crosses the shard 0 -> 1 boundary. Reading
    a shard-1 pack must reach back to the document filed under its
    STARTING shard."""
    path, man = _table(spark, tmp_path)
    probe = PPS  # first pack of shard 1
    contributors = read_pack(spark, path, probe).collect()
    assert any(r["shard"] < probe // PPS for r in contributors)
    # and the slice bounds cover exactly seq_len tokens
    total = sum(r["tok_hi"] - r["tok_lo"] for r in contributors)
    assert total == SEQ


def test_pack_range_slices_are_half_open_and_exact(spark, tmp_path):
    path, man = _table(spark, tmp_path)
    rng = read_pack_range(spark, path, 1, 3).collect()
    total = sum(r["tok_hi"] - r["tok_lo"] for r in rng)
    assert total == 2 * SEQ
    for r in rng:
        assert 0 <= r["tok_lo"] < r["tok_hi"] <= r["n_tokens"]


def test_materialize_across_append_version_boundary(spark, tmp_path):
    """The pack at the old-corpus frontier mixes carried (v1) tokens
    with the appended batch's tokens — the stream contract loaders
    rely on to resume mid-stream across backfills."""
    path, m1 = _table(spark, tmp_path)
    new = spark.createDataFrame(
        [(11, GOOD + " a genuinely new closing sentence follows here")],
        "doc_id long, text string",
    )
    m2 = append_training_shards(new, path, gate_kwargs={"min_score": -1e9})
    boundary_pack = m1["n_tokens_kept"] // SEQ
    row = materialize_packs(
        spark, path, boundary_pack, boundary_pack + 1
    ).first()
    stream = _expected_stream(spark, path)
    assert row["tokens"] == stream[boundary_pack * SEQ : (boundary_pack + 1) * SEQ]
    # the boundary pack genuinely mixes old and new documents
    contributors = {r["doc_id"] for r in read_pack(spark, path, boundary_pack).collect()}
    assert 11 in contributors and contributors - {11}
    # full reassembly still exact after the append
    got = []
    for r in sorted(
        materialize_packs(spark, path, 0, m2["n_packs"]).collect(),
        key=lambda r: r["pack_id"],
    ):
        got.extend(r["tokens"])
    assert got == stream


def test_time_travel_pack_read(spark, tmp_path):
    path, m1 = _table(spark, tmp_path)
    new = spark.createDataFrame(
        [(11, GOOD + " a genuinely new closing sentence follows here")],
        "doc_id long, text string",
    )
    append_training_shards(new, path, gate_kwargs={"min_score": -1e9})
    v1_docs = {
        r["doc_id"] for r in read_pack_range(spark, path, 0, 99, version=1).collect()
    }
    assert 11 not in v1_docs


def test_pack_range_prunes_shard_partitions(spark, tmp_path):
    """Both pruning bounds must reach the scan as PartitionFilters:
    the upper from the last requested pack's shard, the lower from the
    manifest's max_doc_tokens."""
    path, man = _table(spark, tmp_path)
    assert man["max_doc_tokens"] > 0  # recorded for the lower bound
    plan = read_pack_range(spark, path, 2, 4)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "shard" in plan


def test_empty_range_raises(spark, tmp_path):
    path, _ = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="empty pack range"):
        read_pack_range(spark, path, 3, 3)
