"""End-to-end training-shard preparation: raw corpus in, versioned
packed shards out.

The composition a data team actually runs before training — every
stage is an operator this engine already conformance-checks, wired
into one pipeline with one more property the pieces alone don't give:
the output is a VERSIONED, atomically-committed table, so a training
run can pin "shards v3" forever while tomorrow's backfill commits v4
(operators/versioned.py time travel).

  raw documents
    → curation gates + canonical exact dedup   (curate.curation_gate_columns:
      ONE scan of map-only exprs + ONE fingerprint window)
    → concat-and-chunk packing to seq_len      (chunk.pack_documents:
      two-level prefix sum, no global window)
    → shard assignment                         (pack_id // packs_per_shard —
      pure arithmetic, keeps every training sequence's tokens in one
      shard directory)
    → atomic versioned commit, partitioned by shard
      (readers of version N see all of it or none of it)

Scale shape: one full scan for the gates, one token-count scan for
packing offsets, one partitioned write. Nothing quadratic, no
driver-side data paths; the only collects are pack_documents'
bucket-offset table (n_buckets rows) and the final stats row that
goes into the commit manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.chunk import pack_documents
from temp_data_pipeline_spark.llm.curate import curation_gate_columns
from temp_data_pipeline_spark.operators.versioned import commit_version


def prepare_training_shards(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 1024,
    packs_per_shard: int = 64,
    gate_kwargs: dict | None = None,
) -> dict:
    """Run the full curation→pack→shard pipeline and commit the
    result as the next version of the shard table at ``path``.

    Output rows: (id, text, n_tokens, begin, pack_id, pack_off,
    shard) — everything a sequence loader needs to reassemble the
    token stream of any pack: documents are concatenated in id order
    and split every ``seq_len`` tokens, and a document's tokens start
    at offset ``pack_off`` of ``pack_id`` (straddling packs exactly
    as trainers consume them). ``shard`` groups ``packs_per_shard``
    consecutive packs per directory.

    Returns the manifest: version number plus corpus statistics
    (documents in/kept, tokens kept, packs, shards) — the numbers the
    funnel report publishes, pinned to the committed version.
    """
    gates = curation_gate_columns(
        df,
        text_col=text_col,
        id_col=id_col,
        keep=[text_col],
        **(gate_kwargs or {}),
    )
    survivors = gates.filter(F.col("_all")).select(id_col, text_col)

    packed = pack_documents(
        survivors, id_col=id_col, text_col=text_col, seq_len=seq_len
    )
    sharded = (
        survivors.join(packed, id_col)
        .withColumn(
            "shard",
            F.floor(F.col("pack_id") / F.lit(packs_per_shard)).cast("bigint"),
        )
    )

    stats_row = sharded.agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
        (F.max("pack_id") + 1).cast("long").alias("n_packs"),
        F.count_distinct(F.col("shard")).cast("long").alias("n_shards"),
    ).first()
    n_raw = df.count()

    version = commit_version(
        sharded,
        path,
        partition_by=["shard"],
        meta={
            "pipeline": "prepare_training_shards",
            "seq_len": seq_len,
            "packs_per_shard": packs_per_shard,
            "n_docs_raw": int(n_raw),
            "n_docs_kept": int(stats_row["n_docs_kept"] or 0),
            "n_tokens_kept": int(stats_row["n_tokens_kept"] or 0),
            "n_packs": int(stats_row["n_packs"] or 0),
            "n_shards": int(stats_row["n_shards"] or 0),
        },
    )
    return {
        "version": version,
        "n_docs_raw": int(n_raw),
        "n_docs_kept": int(stats_row["n_docs_kept"] or 0),
        "n_tokens_kept": int(stats_row["n_tokens_kept"] or 0),
        "n_packs": int(stats_row["n_packs"] or 0),
        "n_shards": int(stats_row["n_shards"] or 0),
    }
