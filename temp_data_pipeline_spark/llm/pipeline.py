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
      pure arithmetic; documents are grouped by their STARTING pack,
      so shard dirs give approximate locality — straddling documents
      are found by an offset range query on `begin`)
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
    """Stage-by-stage survivor counts for the same pipeline, in TWO
    Spark jobs total (verdict r5: four separate ``.count()`` calls
    re-ran the upstream chain per counter — the MinHash-LSH stage
    alone executed three times).

    Job 1 — one map-only scan: input count, quality-gate survivors
    (sum of the gopher flag), and exact-dedup survivors
    (count-distinct text among gated rows ≡ `exact_dedup`'s one
    canonical row per distinct text). Job 2 — the LSH pipeline runs
    ONCE for the split histogram; the near-dup survivor count is the
    histogram's total, not a separate action.
    """
    from temp_data_pipeline_spark.llm.text import gopher_flags

    ok = gopher_flags(text_col, **(quality_rules or {}))["gopher_pass"]
    head = df.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(ok.cast("long")).alias("n_quality"),
        F.count_distinct(
            F.when(ok, F.col(text_col))
        ).alias("n_exact"),
    ).first()
    # the report describes curate_corpus — run THAT pipeline, don't
    # restate its stages (a gate added there must show up here)
    labeled = curate_corpus(
        df,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        salt=salt,
        quality_rules=quality_rules,
    )
    split_counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    return CurationStats(
        n_input=int(head["n_input"] or 0),
        n_quality=int(head["n_quality"] or 0),
        n_exact=int(head["n_exact"] or 0),
        n_neardup=sum(split_counts.values()),
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
    as trainers consume them). ``shard`` groups documents whose
    STARTING pack falls in the same ``packs_per_shard`` window —
    approximate locality, not containment: to materialize pack P a
    loader range-scans ``begin < (P+1)·seq_len AND begin + n_tokens >
    P·seq_len``, which may reach documents filed under earlier shards
    (any document longer than a shard's token budget must).

    Returns the manifest: version number plus corpus statistics
    (documents in/kept, tokens kept, packs, shards) — the numbers the
    funnel report publishes, pinned to the committed version.
    """
    # persist the gate frame: the gates (md5 window + gopher exprs)
    # feed n_raw, the survivor set, packing, stats, AND the final
    # write — without a cache boundary the whole DAG re-executes for
    # each of those actions, ~4x the dominant scan cost
    gates = curation_gate_columns(
        df,
        text_col=text_col,
        id_col=id_col,
        keep=[text_col],
        **(gate_kwargs or {}),
    ).persist()
    try:
        n_raw = gates.count()
        # _fp (the gate frame's md5) is STORED in the table: appends
        # dedup against this thin column instead of re-hashing every
        # committed text byte (at 100 TB that re-hash was the last
        # O(corpus) cost on the backfill path — review r6)
        survivors = gates.filter(F.col("_all")).select(id_col, text_col, "_fp")

        packed = pack_documents(
            survivors, id_col=id_col, text_col=text_col, seq_len=seq_len
        )
        sharded = survivors.join(packed, id_col).withColumn(
            "shard",
            F.floor(F.col("pack_id") / F.lit(packs_per_shard)).cast("bigint"),
        )

        stats = _shard_stats(sharded, seq_len, packs_per_shard)
        version = commit_version(
            sharded,
            path,
            partition_by=["shard"],
            meta={
                "pipeline": "prepare_training_shards",
                "seq_len": seq_len,
                "packs_per_shard": packs_per_shard,
                "n_docs_raw": int(n_raw),
                **stats,
            },
        )
    finally:
        gates.unpersist()
    return {"version": version, "n_docs_raw": int(n_raw), **stats}


def _batch_stats(frame: DataFrame) -> tuple[int, int, int]:
    """(docs, tokens, max doc tokens) of one batch — ONE aggregate."""
    row = frame.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n_tokens").cast("long").alias("t"),
        F.max("n_tokens").cast("long").alias("m"),
    ).first()
    return int(row["d"] or 0), int(row["t"] or 0), int(row["m"] or 0)


def _shard_stats(sharded: DataFrame, seq_len: int, packs_per_shard: int) -> dict:
    """Manifest statistics. Pack/shard counts derive from the TOKEN
    total, not document start packs: the stream fills
    ceil(tokens/seq_len) packs regardless of where documents begin
    (a single 67-token doc at seq_len=16 occupies 5 packs, though its
    start pack is 0). ``max_doc_tokens`` bounds how far back a pack's
    content can start — the pack reader's lower partition-pruning
    bound (`read_pack_range`)."""
    n_docs, n_tokens, max_doc = _batch_stats(sharded)
    return _geometry_stats(n_docs, n_tokens, max_doc, seq_len, packs_per_shard)


def _geometry_stats(
    n_docs: int, n_tokens: int, max_doc: int, seq_len: int, packs_per_shard: int
) -> dict:
    n_packs = -(-n_tokens // seq_len) if n_tokens else 0
    n_shards = -(-n_packs // packs_per_shard) if n_packs else 0
    return {
        "n_docs_kept": n_docs,
        "n_tokens_kept": n_tokens,
        "max_doc_tokens": max_doc,
        "n_packs": n_packs,
        "n_shards": n_shards,
    }


def read_pack_range(
    spark,
    path: str,
    pack_lo: int,
    pack_hi: int,
    *,
    version: int | None = None,
) -> DataFrame:
    """Documents whose token stream overlaps packs [pack_lo, pack_hi)
    of a committed shard table — the loader-side range query the shard
    layout documents (`prepare_training_shards`), implemented once
    instead of hand-written per trainer. Adds (tok_lo, tok_hi): the
    half-open token slice of each document that falls inside the
    range.

    Partition pruning, both sides: a document STARTS in or before the
    last requested pack, so ``shard <= (pack_hi-1)//packs_per_shard``
    always prunes the upper tail at planning time; and since no
    document exceeds the manifest's ``max_doc_tokens``, anything
    overlapping pack_lo starts at ``begin >= pack_lo*seq_len -
    max_doc_tokens + 1``, which prunes the lower shards too. At 100 TB
    a trainer materializing one shard's packs scans a handful of
    ``shard=`` directories, not the table.
    """
    from temp_data_pipeline_spark.operators.versioned import (
        read_manifest,
        read_version,
    )

    if pack_hi <= pack_lo:
        raise ValueError(f"empty pack range [{pack_lo}, {pack_hi})")
    man = read_manifest(spark, path, version)
    seq_len = int(man["seq_len"])
    pps = int(man["packs_per_shard"])
    lo_tok, hi_tok = pack_lo * seq_len, pack_hi * seq_len
    df = read_version(spark, path, version)
    pred = (
        (F.col("begin") < hi_tok)
        & (F.col("begin") + F.col("n_tokens") > lo_tok)
        & (F.col("shard") <= (pack_hi - 1) // pps)
    )
    max_doc = int(man.get("max_doc_tokens", 0))
    if max_doc > 0:
        min_begin = lo_tok - max_doc + 1
        if min_begin > 0:
            pred = pred & (F.col("shard") >= (min_begin // seq_len) // pps)
    return df.filter(pred).withColumns(
        {
            "tok_lo": F.greatest(F.lit(lo_tok) - F.col("begin"), F.lit(0)).cast(
                "bigint"
            ),
            "tok_hi": F.least(
                F.col("n_tokens"), F.lit(hi_tok) - F.col("begin")
            ).cast("bigint"),
        }
    )


def read_pack(
    spark, path: str, pack_id: int, *, version: int | None = None
) -> DataFrame:
    """The documents contributing to ONE training sequence."""
    return read_pack_range(spark, path, pack_id, pack_id + 1, version=version)


def materialize_packs(
    spark,
    path: str,
    pack_lo: int,
    pack_hi: int,
    *,
    version: int | None = None,
) -> DataFrame:
    """Fully reassembled training sequences from a committed shard
    table: (pack_id, n_tokens, tokens array<string>) for every pack in
    [pack_lo, pack_hi) — `read_pack_range`'s pruned scan fed through
    `chunk.reassemble_packs`. Pack boundaries ignore shard and version
    boundaries by construction: a document committed under shard k-1
    or carried from an earlier version contributes its straddling
    tokens exactly where the stream contract places them."""
    from temp_data_pipeline_spark.llm.chunk import reassemble_packs
    from temp_data_pipeline_spark.operators.versioned import read_manifest

    man = read_manifest(spark, path, version)
    return reassemble_packs(
        read_pack_range(spark, path, pack_lo, pack_hi, version=version),
        int(man["seq_len"]),
        pack_lo,
        pack_hi,
    )


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

    Compute and WRITE are O(batch): gating, tokenizing, and packing
    run over the new batch alone, and the commit is METADATA-LEVEL
    (``commit_version(..., carry_from=prev)``) — the new version's
    manifest references the previous version's data dirs instead of
    copying them, so a daily backfill against a 100 TB corpus writes
    the day's partitions plus one JSON file, never the corpus. The
    only corpus-sized touch left is the dedup anti-join's READ of two
    thin committed columns (id + the stored ``_fp`` fingerprint —
    parquet column pruning; no text bytes, no re-hashing).
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
    prev_version = int(prev_man["version"])
    seq_len = int(prev_man["seq_len"])
    packs_per_shard = int(prev_man["packs_per_shard"])
    prev_tokens = int(prev_man["n_tokens_kept"])
    prev = read_version(spark, path, prev_version)

    # id-colliding rows leave the batch FIRST — before intra-batch
    # canonical selection. Done after, a batch duplicate pair whose
    # canonical copy's id is already committed would have its other
    # copy dropped as "duplicate" and then lose the canonical to the
    # id collision: genuinely new content silently vanishes. Removing
    # collisions up front re-elects a surviving copy as canonical.
    fresh = df_new.join(
        prev.select(id_col), id_col, "left_anti"
    )
    gates = curation_gate_columns(
        fresh,
        text_col=text_col,
        id_col=id_col,
        keep=[text_col],
        **(gate_kwargs or {}),
    )
    # corpus-wide content dedup: _fp is already the gate frame's md5.
    # Tables written since r6 store _fp, so the anti-join reads ONE
    # pruned column of the committed corpus; legacy tables fall back
    # to hashing their text once more.
    prev_fp = (
        prev.select("_fp")
        if "_fp" in prev.columns
        else prev.select(F.md5(F.col(text_col)).alias("_fp"))
    )
    survivors = (
        gates.filter(F.col("_all"))
        .select(id_col, text_col, "_fp")
        .join(prev_fp, "_fp", "left_anti")
        .persist()  # feeds packing bounds, the join, stats, the write
    )
    try:
        packed = pack_documents(
            survivors, id_col=id_col, text_col=text_col, seq_len=seq_len
        )
        # continue the stream: shift begins past the committed tokens
        # and re-derive pack coordinates from the shifted offsets
        shifted = (
            survivors.join(packed, id_col)
            .withColumn("begin", F.col("begin") + F.lit(prev_tokens))
            .withColumn(
                "pack_id", F.floor(F.col("begin") / F.lit(seq_len)).cast("bigint")
            )
            .withColumn("pack_off", (F.col("begin") % F.lit(seq_len)).cast("bigint"))
            .withColumn(
                "shard",
                F.floor(F.col("pack_id") / F.lit(packs_per_shard)).cast("bigint"),
            )
            .select(*prev.columns)
        )

        # totals come from prev manifest + ONE aggregate of the batch —
        # no scan of the carried corpus for bookkeeping either
        b_docs, b_tokens, b_max = _batch_stats(shifted)
        # a legacy manifest with NO max_doc_tokens means the true max
        # is unknown — record 0 (pack-reader pruning disabled), never
        # the batch max alone: an understated bound would make
        # read_pack_range prune away straddling old documents
        prev_max = prev_man.get("max_doc_tokens")
        new_max = max(int(prev_max), b_max) if prev_max is not None else 0
        stats = _geometry_stats(
            int(prev_man["n_docs_kept"]) + b_docs,
            prev_tokens + b_tokens,
            new_max,
            seq_len,
            packs_per_shard,
        )
        n_raw = int(prev_man["n_docs_raw"]) + df_new.count()
        version = commit_version(
            shifted,
            path,
            partition_by=["shard"],
            carry_from=prev_version,
            meta={
                "pipeline": "prepare_training_shards",
                "seq_len": seq_len,
                "packs_per_shard": packs_per_shard,
                "n_docs_raw": int(n_raw),
                **stats,
            },
        )
    finally:
        survivors.unpersist()
    return {"version": version, "n_docs_raw": int(n_raw), **stats}
