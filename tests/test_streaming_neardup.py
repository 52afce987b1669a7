"""Cross-batch streaming near-dup ingest vs the batch keep-lowest-id
policy (streaming/neardup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import simhash_neardup_pairs
from temp_data_pipeline_spark.streaming.neardup import (
    neardup_ingest_batch,
    stream_neardup_ingest,
)

# 200-token docs: a single-token edit stays within hamming<=3 of its
# base on the 60-bit signature, while distinct vocabularies are ~30
# bits apart — verified empirically for this fixture set.
def _long(prefix: str, edit_at: int | None = None) -> str:
    toks = [f"{prefix}{i}" for i in range(200)]
    if edit_at is not None:
        toks[edit_at] = "EDITED"
    return " ".join(toks)


_DOCS = [
    (0, _long("token")),
    (1, _long("alpha")),
    (2, _long("token", edit_at=100)),  # near-dup of 0
    (3, _long("bravo")),
    (4, _long("alpha", edit_at=50)),  # near-dup of 1
    (5, _long("delta")),
    (6, _long("token", edit_at=20)),  # near-dup of 0
    (7, _long("omega")),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_batches_match_batch_dedup(spark, tmp_path):
    """Union of per-batch survivors == batch keep-lowest-id dedup when
    ids arrive in order (the equivalence the module docstring pins)."""
    idx = str(tmp_path / "index")
    full = _df(spark, _DOCS)

    survivors: set[int] = set()
    for lo, hi in ((0, 3), (3, 6), (6, 8)):
        out = neardup_ingest_batch(_df(spark, _DOCS[lo:hi]), idx)
        survivors |= {r["doc_id"] for r in out.collect()}

    pairs = simhash_neardup_pairs(full, hash_fn="md5", nbits=60)
    dup = {r["id_b"] for r in pairs.collect()}
    want = {i for i, _ in _DOCS} - dup
    assert survivors == want
    # the near-dups of doc 0 and doc 1 must actually have been dropped
    assert 2 not in survivors and 4 not in survivors and 6 not in survivors


def test_cross_batch_only_first_arrival_survives(spark, tmp_path):
    idx = str(tmp_path / "index2")
    out1 = neardup_ingest_batch(_df(spark, _DOCS[:2]), idx)
    assert {r["doc_id"] for r in out1.collect()} == {0, 1}
    # batch 2 contains ONLY near-dups of batch 1 -> nothing survives
    out2 = neardup_ingest_batch(_df(spark, [_DOCS[2], _DOCS[4]]), idx)
    assert out2.count() == 0


def test_streaming_sink_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, _DOCS).repartition(1).write.parquet(src)
    q = stream_neardup_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        index_dir=str(tmp_path / "idx"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    pairs = simhash_neardup_pairs(_df(spark, _DOCS), hash_fn="md5", nbits=60)
    dup = {r["id_b"] for r in pairs.collect()}
    assert got == {i for i, _ in _DOCS} - dup


def test_index_survives_restart(spark, tmp_path):
    """A second streaming run over NEW files must still see the first
    run's index (state lives on disk, not in a session)."""
    idx, out = str(tmp_path / "idx3"), str(tmp_path / "out3")
    neardup_ingest_batch(_df(spark, _DOCS[:2]), idx)
    src = str(tmp_path / "src3")
    _df(spark, [_DOCS[2], (9, _long("fresh"))]).repartition(1).write.parquet(src)
    q = stream_neardup_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        index_dir=idx,
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {9}  # doc 2 is a near-dup of indexed doc 0


def test_replayed_batch_does_not_match_itself(spark, tmp_path):
    """Crash-replay regression: if a batch's bands landed in the index
    but the survivor write never committed, re-running the SAME batch
    must emit the same survivors — not drop everything as hamming-0
    self-matches."""
    idx = str(tmp_path / "index")
    first = _df(spark, _DOCS[0:3])
    want = {r["doc_id"] for r in neardup_ingest_batch(first, idx).collect()}
    assert want == {0, 1}  # doc 2 is a near-dup of 0

    # simulate the crash: bands are in the index; the batch replays
    got = {r["doc_id"] for r in neardup_ingest_batch(first, idx).collect()}
    assert got == want


def test_cap_is_global_across_batches(spark, tmp_path):
    """A band bucket that fills to max_bucket in batch 1 must stop
    generating candidates in batch 2 — the batch operator's (and the
    oracle's) lowest-N global cap, not a fresh per-batch cap."""
    idx = str(tmp_path / "index")
    base = _long("token")
    # batch 1: two byte-identical docs — every band bucket fills to
    # exactly the cap with ids {0, 1}
    b1 = _df(spark, [(0, base), (1, base)])
    s1 = {r["doc_id"] for r in
          neardup_ingest_batch(b1, idx, max_bucket=2).collect()}
    assert s1 == {0}  # 1 drops against 0
    # batch 2: a third identical doc; all its band buckets already
    # hold ids {0, 1} = cap, so doc 2 pairs with NOTHING and survives
    # (exactly what the batch QUALIFY <= 2 cap yields for rank-3 rows)
    b2 = _df(spark, [(2, base)])
    s2 = {r["doc_id"] for r in
          neardup_ingest_batch(b2, idx, max_bucket=2).collect()}
    assert s2 == {2}
