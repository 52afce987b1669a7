"""Streaming NEAR-duplicate ingest: cross-batch SimHash dedup.

``streaming/ingest.py::stream_dedup_documents`` drops EXACT repeats
(content-hash keyed state). This module drops near-duplicates — small
edits, re-crawls with boilerplate drift — across micro-batches, the
ingest-time counterpart of the batch ``llm/dedup.py::
simhash_neardup_pairs`` + keep-first policy.

Design: foreachBatch + a persistent band-index table, NOT an
in-memory state store. Each batch:

1. computes 60-bit SimHash signatures — token hashing is JVM-side,
   the bit-majority vote runs in the same Arrow numpy kernel the
   batch operator uses (llm/dedup.py::simhash, kernel="arrow"),
2. explodes them into 4 x 16-bit band keys,
3. equi-joins the batch's band keys against the on-disk band index
   (prior batches' survivors) and verifies candidates with
   ``bit_count(xor) <= max_hamming`` — identical verify to batch,
4. also runs within-batch pair dedup (keep lowest id),
5. appends the survivors' bands to the index and emits survivors.

Why a table and not ``applyInPandasWithState``: near-dup needs each
doc checked against 4 independent band buckets, and a doc is a dup if
ANY bucket matches — that cross-key reduction would be a second
stateful operator in the same streaming query (restricted), while a
band TABLE keeps the state queryable, compactable with the lake
maintenance ops, and shared across restarts. At 100 TB the index is
a fraction of corpus bytes (4 longs + id per doc), the join is a
plain hash-partitioned equi-join, and survivors-append is the same
idempotent pattern as the upsert sink. This is how production ingest
dedup is built; the state store is the wrong tool for it.

Semantics: a doc is dropped iff it is within ``max_hamming`` of ANY
earlier-arrived doc — including docs that were themselves dropped
(the index records every seen doc's bands, not just survivors;
near-dups of dropped boilerplate are still boilerplate). Within a
batch "earlier" means lower id. When ids arrive in order this is
EXACTLY the batch ``simhash_neardup_pairs`` drop-any-id_b policy, so
the streaming result is oracle-checkable against the batch SQL —
pinned by tests/test_streaming_neardup.py and the q_stream_neardup
conformance query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import cap_bucket, hamming64, simhash

_BANDS = 4
_BAND_SCHEMA = "doc_id long, chunk_id int, chunk long, _sig long"


def _index_exists(spark: SparkSession, index_dir: str) -> bool:
    """Scheme-agnostic (Hadoop FS) probe for a non-empty band index —
    os.path would silently report 'no index' on HDFS/S3 and disable
    cross-batch dedup forever."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    glob = jvm.org.apache.hadoop.fs.Path(index_dir + "/*.parquet")
    return len(fs.globStatus(glob) or []) > 0


def _banded_sigs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    nbits: int,
    hash_fn: str,
    max_bucket: int | None,
) -> DataFrame:
    """(id, chunk_id, chunk, sig) band rows for a (micro-)batch."""
    sigs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(simhash(text_col, nbits=nbits, hash_fn=hash_fn))).alias(
            "_sig"
        ),
    )
    chunks = sigs.select(
        "doc_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_sig"), 16 * i).bitwiseAND(0xFFFF)
                    for i in range(_BANDS)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    return cap_bucket(chunks, ["chunk_id", "chunk"], "doc_id", max_bucket).select(
        "doc_id", "chunk_id", "chunk", "_sig"
    )


def neardup_ingest_batch(
    docs: DataFrame,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    nbits: int = 60,
    hash_fn: str = "md5",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """One ingest step: drop near-dups of the index AND of earlier
    (lower-id) docs in this batch, append survivors' bands to the
    index, return the surviving doc rows.

    Callable directly (incremental batch ingest) or from the
    foreachBatch sink below — one definition, two engines, exactly
    like the batch/streaming session aggregation.
    """
    spark = docs.sparkSession
    bands = _banded_sigs(
        docs, text_col, id_col, nbits, hash_fn, max_bucket
    ).localCheckpoint()

    # 1) cross-batch: candidates share a band with an indexed doc.
    if _index_exists(spark, index_dir):
        idx = spark.read.schema(_BAND_SCHEMA).parquet(index_dir)
        # REPLAY SAFETY: a crash between the band append and the
        # survivor write makes foreachBatch re-run this batch with its
        # own bands already indexed — without exclusion every doc
        # matches itself (hamming 0) and the whole batch silently
        # vanishes from the output. Anti-joining the batch's ids out
        # of the index side makes the step idempotent: within-batch
        # ordering is re-derived by step 2, cross-batch matches are
        # unaffected (a genuine re-arrival carries a different id).
        idx = idx.join(bands.select("doc_id").distinct(), "doc_id", "left_anti")
        # a replayed append also leaves duplicate index ROWS; dedupe
        # so the cap ranking below counts each doc once per band
        idx = idx.dropDuplicates(["doc_id", "chunk_id"])
        # GLOBAL CAP PARITY: the batch operator (and the conformance
        # oracle's QUALIFY) caps each band bucket at the `max_bucket`
        # LOWEST ids over the whole corpus; the per-batch cap inside
        # _banded_sigs only bounds this batch. Re-rank index ∪ batch
        # together so a bucket that filled up in earlier batches stops
        # pairing — ids arrive in order (the documented equivalence
        # precondition), so earlier rows always outrank later ones and
        # the combined cap reproduces the batch cap exactly.
        # Only buckets this batch TOUCHES can pair this batch, so the
        # index is semi-joined to the batch's bucket keys before the
        # re-rank — per-batch work stays O(batch × occupancy), not
        # O(total index), and the output is identical.
        touched = bands.select("chunk_id", "chunk").distinct()
        idx = idx.join(touched, ["chunk_id", "chunk"], "left_semi")
        combined = cap_bucket(
            idx.unionByName(bands), ["chunk_id", "chunk"], "doc_id", max_bucket
        ).localCheckpoint()
        batch_ids = bands.select("doc_id").distinct()
        b_side = combined.join(batch_ids, "doc_id", "left_semi")
        i_side = combined.join(batch_ids, "doc_id", "left_anti")
        cross_dup = (
            b_side.alias("b")
            .join(
                i_side.alias("i"),
                (F.col("b.chunk_id") == F.col("i.chunk_id"))
                & (F.col("b.chunk") == F.col("i.chunk")),
            )
            .filter(hamming64(F.col("b._sig"), F.col("i._sig")) <= max_hamming)
            .select(F.col("b.doc_id"))
            .distinct()
        )
        pair_bands = b_side  # within-batch pairs obey the global cap too
    else:
        from temp_data_pipeline_spark.session import local_df

        cross_dup = local_df(spark, [], "doc_id long")
        pair_bands = bands

    # 2) within-batch: drop any doc pairing with a lower id — the
    # same band self-join as llm/dedup.simhash_neardup_pairs, run on
    # the ALREADY-checkpointed band table so signatures compute once
    # per batch (calling the standalone operator would re-tokenize and
    # re-hash everything a second time)
    a, b = pair_bands.alias("a"), pair_bands.alias("b")
    within_dup = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming64(F.col("a._sig"), F.col("b._sig")) <= max_hamming)
        .select(F.col("b.doc_id"))
        .distinct()
    )

    dup_ids = cross_dup.union(within_dup).distinct()
    # survivors MUST materialize here: its plan reads the index
    # parquet lazily, and a later evaluation would see bands appended
    # by subsequent batches (wrong snapshot)
    survivors = docs.join(
        dup_ids.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    ).localCheckpoint()

    # 3) append EVERY seen doc's bands (survivors and dropped alike)
    # so later arrivals match against anything earlier — the exact
    # batch drop-any-lower-id policy; see module docstring
    bands.write.mode("append").parquet(index_dir)
    return survivors


def stream_neardup_ingest(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    available_now: bool = True,
):
    """Attach the near-dup ingest as a foreachBatch sink: survivors
    land in ``out_dir`` (parquet append), the band index in
    ``index_dir``. Returns the started StreamingQuery.

    Restart note: foreachBatch may replay the last uncommitted batch;
    the ingest step is replay-idempotent because the batch's own ids
    are anti-joined out of the index side (a crashed run's premature
    band append can never make a doc match itself) and duplicate index
    rows are deduped before cap ranking — survivor output replays
    identically; compaction dedupes the index at rest (maintenance
    ops).
    """

    def _run(batch_df: DataFrame, batch_id: int) -> None:
        survivors = neardup_ingest_batch(
            batch_df,
            index_dir,
            text_col=text_col,
            id_col=id_col,
            max_hamming=max_hamming,
        )
        survivors.write.mode("append").parquet(out_dir)

    writer = stream.writeStream.foreachBatch(_run).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
