"""End-to-end corpus pipelines: curation composition and versioned
training-shard preparation.

Two tiers:

- `curate_corpus` / `curation_report`: quality gate → exact dedup →
  MinHash-LSH near-dup removal → deterministic split, returned as a
  labeled DataFrame (stage order matters at scale: the map-only gate
  shrinks everything downstream, exact dedup collapses duplicate mass
  BEFORE LSH so band buckets stay small, the expensive verify runs
  last on the smallest frame).
- `prepare_training_shards` / `append_training_shards`: raw corpus in,
  versioned packed shards out.

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

from dataclasses import dataclass

from temp_data_pipeline_spark.llm.chunk import pack_documents
from temp_data_pipeline_spark.llm.curate import curation_gate_columns, hash_split
from temp_data_pipeline_spark.llm.dedup import exact_dedup, minhash_dedup
from temp_data_pipeline_spark.llm.text import gopher_filter
from temp_data_pipeline_spark.operators.versioned import commit_version


@dataclass
class CurationStats:
    n_input: int
    n_quality: int
    n_exact: int
    n_neardup: int
    splits: dict


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    split_weights: dict[str, int] | None = None,
    salt: str = "",
    quality_rules: dict | None = None,
) -> DataFrame:
    """Quality-gate, dedup (exact then near), and split a document
    frame. Returns the surviving rows with a `split` column.
    `quality_rules` overrides Gopher thresholds per corpus (e.g.
    `{"min_stopword_hits": 0}` for non-English text)."""
    gated = gopher_filter(df, text_col, **(quality_rules or {}))
    exact = exact_dedup(gated, text_col, id_col)
    near = minhash_dedup(
        exact, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    return hash_split(near, id_col, weights=split_weights, salt=salt)


def curation_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    salt: str = "",
    quality_rules: dict | None = None,
) -> CurationStats:
    """Stage-by-stage survivor counts for the same pipeline."""
    gated = gopher_filter(df, text_col, **(quality_rules or {}))
    exact = exact_dedup(gated, text_col, id_col)
    near = minhash_dedup(
        exact, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    labeled = hash_split(near, id_col, salt=salt)
    split_counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    return CurationStats(
        n_input=df.count(),
        n_quality=gated.count(),
        n_exact=exact.count(),
        n_neardup=near.count(),
        splits=split_counts,
    )



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


def append_training_shards(
    df_new: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    gate_kwargs: dict | None = None,
) -> dict:
    """Incremental backfill of an existing shard table: gate, dedup,
    and pack ONLY the new documents, continue the token stream where
    the last committed version ended, and commit old + new rows as
    the next version.

    The expensive work — gating, tokenizing, packing — runs over the
    NEW batch alone; existing rows are carried through untouched (the
    full-snapshot versioning trade re-writes their bytes but never
    recomputes them, and at 100 TB compute dominates the copy).
    Dedup is corpus-wide: a new document whose fingerprint (or id)
    already exists in the table is dropped, exactly as if both had
    been in one batch. New documents append AFTER the existing stream
    in id order — the pack stream's contract is (commit order, then
    id within each batch), so earlier versions' pack layout is frozen
    forever and trainers can resume mid-stream across backfills.

    seq_len / packs_per_shard come from the previous commit's
    manifest — an append can't silently change the geometry.
    """
    from temp_data_pipeline_spark.operators.versioned import (
        read_manifest,
        read_version,
    )

    spark = df_new.sparkSession
    prev_man = read_manifest(spark, path)
    seq_len = int(prev_man["seq_len"])
    packs_per_shard = int(prev_man["packs_per_shard"])
    prev_tokens = int(prev_man["n_tokens_kept"])
    prev = read_version(spark, path)

    gates = curation_gate_columns(
        df_new,
        text_col=text_col,
        id_col=id_col,
        keep=[text_col],
        **(gate_kwargs or {}),
    )
    survivors = gates.filter(F.col("_all")).select(
        id_col, text_col, F.md5(F.col(text_col)).alias("_fp")
    )
    # corpus-wide dedup: drop new docs whose content (or id) already
    # committed — fingerprints recompute from the carried text in one
    # map-side expression over the previous snapshot
    prev_keys = prev.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp")
    )
    survivors = (
        survivors.join(prev_keys.select("_fp"), "_fp", "left_anti")
        .join(prev_keys.select(id_col), id_col, "left_anti")
        .select(id_col, text_col)
    )

    packed = pack_documents(
        survivors, id_col=id_col, text_col=text_col, seq_len=seq_len
    )
    # continue the stream: shift begins past the committed tokens and
    # re-derive pack coordinates from the shifted offsets
    shifted = (
        survivors.join(packed, id_col)
        .withColumn("begin", F.col("begin") + F.lit(prev_tokens))
        .withColumn("pack_id", F.floor(F.col("begin") / F.lit(seq_len)).cast("bigint"))
        .withColumn("pack_off", (F.col("begin") % F.lit(seq_len)).cast("bigint"))
        .withColumn(
            "shard",
            F.floor(F.col("pack_id") / F.lit(packs_per_shard)).cast("bigint"),
        )
        .select(*prev.columns)
    )
    combined = prev.unionByName(shifted)

    stats_row = combined.agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
        (F.max("pack_id") + 1).cast("long").alias("n_packs"),
        F.count_distinct(F.col("shard")).cast("long").alias("n_shards"),
    ).first()
    n_raw = int(prev_man["n_docs_raw"]) + df_new.count()

    version = commit_version(
        combined,
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
