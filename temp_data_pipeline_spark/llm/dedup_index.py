"""Persisted MinHash dedup index: near-dup-check each incoming batch
against the WHOLE historic corpus without rescanning it.

`dedup.minhash_dedup` recomputes shingles + signatures for everything
it sees — right for a one-shot corpus pass, wrong for continuous
ingestion, where checking today's 0.1 TB batch would re-read 100 TB
of history every day. This module persists what the check actually
needs (band keys for candidate generation, signatures for
verification — a few hundred bytes/doc, not the text), with the same
manifest-swap protocol as `llm/vector_index.py`:

  <path>/bands-<token>/_bh=<s>/...parquet  (id, band, band_hash) rows,
                                           partitioned by a band-hash
                                           shard; one immutable dir per
                                           build or append batch
  <path>/sigs-<token>/...parquet           (id, sig) k-minhash arrays
  <path>/index-<n>.json                    manifest commit log: params
                                           + dirs + n_docs; the rename
                                           of <n+1> is the ONLY commit
                                           point (llm/index_commit.py)

A probe computes the batch's signatures (O(batch)), prunes the index
band read to the ``_bh=`` shards the batch actually hashes into
(planning-time partition pruning — a small batch touches a small
fraction of ``n_shards``), equi-joins on (band, band_hash) for
candidates, and verifies each candidate by SIGNATURE Jaccard — the
fraction of equal minhash positions, the standard estimator. Exact
shingle Jaccard (what `minhash_dedup` verifies with) would require
storing every document's shingle set, i.e. a second copy of the
corpus; the estimator is the price of an index that is ~1000× smaller
than its corpus. n_eq/k ≥ threshold with k=16 is within ±0.25 of true
Jaccard at 95% confidence — tighten k for tighter bounds.

Band buckets are capped at ``max_bucket`` lowest ids per build/append
batch (`dedup.cap_bucket`), so one mass-duplicated banner page cannot
make a probe join quadratic; the cap is part of the stored contract
and recorded in the manifest.

Concurrency matches vector_index: probes are always safe (one atomic
manifest read resolves all data), and writers serialize through the
numbered-manifest commit log (llm/index_commit.py, since round 8):
two concurrent appends both plan against index version B, the rename
onto ``index-<B+1>.json`` arbitrates, and the loser raises the
retryable ``versioned.CommitConflictError`` with its dirs reclaimed —
a retry re-bases on the winner's manifest and the final index holds
BOTH batches, never the silent lost-update the old single
``index.json`` overwrite allowed.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import (
    cap_bucket,
    minhash_signature,
    shingles_of,
    tokenized,
)
from temp_data_pipeline_spark.llm.index_commit import (
    commit_or_reclaim,
    live_index_refs,
    read_index_state,
)
from temp_data_pipeline_spark.operators.versioned import _fs

__all__ = [
    "append_documents",
    "build_dedup_index",
    "compact_dedup_index",
    "filter_new",
    "probe_neardups",
    "read_dedup_manifest",
    "vacuum_dedup_index",
]


def _signatures(
    df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    n_shingle: int,
    k: int,
    hash_fn: str,
) -> DataFrame:
    """(id, sig) — k-minhash signature per document. Explode-of-1
    barriers keep tokens/shingles/signature as real attributes (the
    same anti-re-evaluation shape as dedup.minhash_dedup)."""
    tok = tokenized(df, text_col, [id_col])
    sh = tok.select(
        F.col(id_col),
        F.explode(F.array(shingles_of(F.col("_tok"), n_shingle))).alias("_sh"),
    )
    return sh.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(minhash_signature(F.col("_sh"), k, hash_fn=hash_fn))
        ).alias("sig"),
    )


def _banded(sig_df: DataFrame, *, k: int, bands: int, n_shards: int) -> DataFrame:
    """(id, band, band_hash, _bh) band keys of each signature. The
    band hash is xxhash64 of the comma-joined slice — equality of
    hashes stands in for equality of slices (what an oracle joins on
    directly), independent of the signature hash family."""
    rows_per = k // bands
    banded = sig_df.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per + 1, rows_per),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    return banded.withColumn(
        "_bh", F.pmod(F.col("band_hash"), F.lit(n_shards)).cast("int")
    )


def _write_batch(
    df: DataFrame, path: str, man: dict
) -> tuple[list[str], list[str], int]:
    """Shared build/append body: signatures + capped bands for one
    batch land as fresh uniquely-named dirs. Returns
    (bands_dir, sigs_dir, n_docs) — empty lists for an empty batch
    (no orphan dirs, no unreadable empty partitioned writes)."""
    spark = df.sparkSession
    sig = _signatures(
        df,
        text_col=man["text_col"],
        id_col=man["id_col"],
        n_shingle=man["n_shingle"],
        k=man["k"],
        hash_fn=man["hash_fn"],
    )
    sigs_name = f"sigs-{uuid.uuid4().hex[:8]}"
    sig.write.mode("errorifexists").parquet(f"{path}/{sigs_name}")
    # read the materialized signatures back: the band pass then reads
    # the tiny sig parquet instead of re-running shingle+minhash, and
    # an empty batch is detected from the same read
    sig_stored = spark.read.schema(sig.schema).parquet(f"{path}/{sigs_name}")
    n = sig_stored.count()
    if n == 0:
        _fs(spark, path)[0].delete(
            spark._jvm.org.apache.hadoop.fs.Path(f"{path}/{sigs_name}"), True
        )
        return [], [], 0
    bands_name = f"bands-{uuid.uuid4().hex[:8]}"
    banded = _banded(
        sig_stored, k=man["k"], bands=man["bands"], n_shards=man["n_shards"]
    )
    capped = cap_bucket(banded, ["band", "band_hash"], "id", man["max_bucket"])
    # cluster by shard before the partitioned write: without it every
    # shuffle task writes a sliver into every _bh= dir (tasks × shards
    # small files); clustered, each dir gets ~one file and the probe
    # scan opens n_shards files, not n_shards × tasks
    capped.repartition(F.col("_bh")).write.mode("errorifexists").partitionBy(
        "_bh"
    ).parquet(f"{path}/{bands_name}")
    return [bands_name], [sigs_name], n


def build_dedup_index(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
    n_shards: int = 64,
    max_bucket: int | None = 1000,
) -> dict:
    """Materialize the dedup index at ``path``; returns the manifest.
    ``k`` must divide evenly into ``bands``. ``n_shards`` sets the
    ``_bh=`` partition fanout — size it so a typical probe batch's
    distinct band hashes touch a minority of shards (1024 at corpus
    scale; small here so local tests exercise multi-shard layouts).
    """
    if k % bands != 0:
        raise ValueError(f"k={k} must be a multiple of bands={bands}")
    man = {
        "format": "minhash-dedup-v1",
        "text_col": text_col,
        "id_col": id_col,
        "n_shingle": int(n_shingle),
        "k": int(k),
        "bands": int(bands),
        "hash_fn": hash_fn,
        "n_shards": int(n_shards),
        "max_bucket": max_bucket,
    }
    spark = df.sparkSession
    try:
        base, _ = read_index_state(spark, path, kind="dedup")
    except FileNotFoundError:
        base = 0
    bands_dirs, sigs_dirs, n = _write_batch(df, path, man)
    man.update(bands_dirs=bands_dirs, sigs_dirs=sigs_dirs, n_docs=n)
    commit_or_reclaim(spark, path, man, base, bands_dirs + sigs_dirs)
    return man


def append_documents(df: DataFrame, path: str) -> dict:
    """Append a batch under the PINNED index parameters: one new
    immutable bands dir + sigs dir, manifest swap. O(batch) compute
    and IO — the metadata-level append, same move as
    vector_index.add_vectors / versioned carry_from. The bucket cap
    applies within this batch's dir (per-dir caps keep appends
    append-only; a compaction pass may re-cap globally). Two racing
    appends serialize through the manifest commit log: the loser
    raises the retryable ``CommitConflictError`` (its dirs reclaimed);
    calling append_documents again re-bases on the winner and the
    index ends up holding both batches."""
    spark = df.sparkSession
    base, man = read_index_state(spark, path, kind="dedup")
    bands_dirs, sigs_dirs, n = _write_batch(df, path, man)
    if n == 0:
        return man
    man = {
        **man,
        "bands_dirs": man["bands_dirs"] + bands_dirs,
        "sigs_dirs": man["sigs_dirs"] + sigs_dirs,
        "n_docs": int(man["n_docs"]) + n,
    }
    commit_or_reclaim(spark, path, man, base, bands_dirs + sigs_dirs)
    return man


def read_dedup_manifest(spark: SparkSession, path: str) -> dict:
    """The LIVE manifest: highest-numbered ``index-<n>.json``, falling
    back to a legacy single-file ``index.json`` (version 0)."""
    return read_index_state(spark, path, kind="dedup")[1]


def _read_union(spark: SparkSession, path: str, dirs: list[str], schema=None):
    from functools import reduce

    frames = []
    for d in dirs:
        r = spark.read.schema(schema) if schema is not None else spark.read
        frames.append(r.parquet(f"{path}/{d}"))
    return reduce(lambda a, b: a.unionByName(b), frames)


def probe_neardups(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    *,
    threshold: float = 0.5,
    min_eq: int | None = None,
) -> DataFrame:
    """Near-dup candidates of ``batch`` against the index, verified by
    signature Jaccard. Returns (id_new, id_indexed, n_eq) — one row
    per verified candidate pair with n_eq equal minhash positions,
    n_eq ≥ ``min_eq`` (default ceil(threshold·k)).

    Scan shape: batch signatures are computed once and broadcast-side
    small relative to the index; the index band read is PRUNED to the
    ``_bh=`` shards the batch hashes into at planning time, and the
    candidate join is an equi-join on (band, band_hash) — never a
    cartesian. Verification joins candidates back to the two
    signature tables by id.
    """
    import math

    man = read_dedup_manifest(spark, path)
    if not man["bands_dirs"]:
        # empty index: no matches, id columns typed like the batch ids
        return batch.select(
            F.col(man["id_col"]).alias("id_new"),
            F.col(man["id_col"]).alias("id_indexed"),
            F.lit(0).alias("n_eq"),
        ).limit(0)
    need = int(min_eq) if min_eq is not None else math.ceil(threshold * man["k"])
    sig = _signatures(
        batch,
        text_col=man["text_col"],
        id_col=man["id_col"],
        n_shingle=man["n_shingle"],
        k=man["k"],
        hash_fn=man["hash_fn"],
    ).localCheckpoint()
    banded = _banded(
        sig, k=man["k"], bands=man["bands"], n_shards=man["n_shards"]
    )
    # bounded collect: at most n_shards ints — the partition-pruning set
    shards = [r["_bh"] for r in banded.select("_bh").distinct().collect()]
    idx_bands = _read_union(spark, path, man["bands_dirs"]).filter(
        F.col("_bh").isin(shards)
    )
    cand = (
        banded.alias("n")
        .join(
            idx_bands.alias("i"),
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.band_hash") == F.col("i.band_hash")),
        )
        .select(
            F.col("n.id").alias("id_new"), F.col("i.id").alias("id_indexed")
        )
        .distinct()
    )
    idx_sigs = _read_union(spark, path, man["sigs_dirs"])
    n_eq = F.aggregate(
        F.zip_with(
            F.col("_sa"),
            F.col("_sb"),
            lambda a, b: F.when(a == b, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(
            sig.select(F.col("id").alias("id_new"), F.col("sig").alias("_sa")),
            "id_new",
        )
        .join(
            idx_sigs.select(
                F.col("id").alias("id_indexed"), F.col("sig").alias("_sb")
            ),
            "id_indexed",
        )
        .withColumn("n_eq", n_eq)
        .filter(F.col("n_eq") >= need)
        .select("id_new", "id_indexed", "n_eq")
    )


def filter_new(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    *,
    threshold: float = 0.5,
    min_eq: int | None = None,
) -> DataFrame:
    """Batch rows with NO verified near-dup in the index — the
    survivors an ingest loop appends (`append_documents`) after this
    call. Anti-join on the probe's matched ids."""
    man = read_dedup_manifest(spark, path)
    matched = (
        probe_neardups(spark, path, batch, threshold=threshold, min_eq=min_eq)
        .select(F.col("id_new").alias(man["id_col"]))
        .distinct()
    )
    return batch.join(matched, man["id_col"], "left_anti")


def compact_dedup_index(spark: SparkSession, path: str) -> dict:
    """Collapse an append chain back to ONE bands dir + ONE sigs dir,
    re-applying the bucket cap GLOBALLY. Per-append caps keep appends
    O(batch) but weaken over time: 50 appends each capped at 1000 can
    leave one bucket holding 50·1000 rows across dirs, and a probe
    join pays the full product. Compaction restores the build-time
    bound (and per-shard file counts) without touching signatures —
    run it on the same cadence as parquet small-file compaction.
    Old dirs stay until `vacuum_dedup_index` (readers on the old
    manifest keep working; the swap is atomic). A compaction racing
    an append raises the retryable ``CommitConflictError`` — never a
    silently dropped batch."""
    base, man = read_index_state(spark, path, kind="dedup")
    if len(man["bands_dirs"]) <= 1 and len(man["sigs_dirs"]) <= 1:
        return man
    sigs = _read_union(spark, path, man["sigs_dirs"])
    sigs_name = f"sigs-{uuid.uuid4().hex[:8]}"
    sigs.write.mode("errorifexists").parquet(f"{path}/{sigs_name}")
    bands = _read_union(spark, path, man["bands_dirs"])
    capped = cap_bucket(bands, ["band", "band_hash"], "id", man["max_bucket"])
    bands_name = f"bands-{uuid.uuid4().hex[:8]}"
    capped.repartition(F.col("_bh")).write.mode("errorifexists").partitionBy(
        "_bh"
    ).parquet(f"{path}/{bands_name}")
    man = {**man, "bands_dirs": [bands_name], "sigs_dirs": [sigs_name]}
    commit_or_reclaim(spark, path, man, base, [bands_name, sigs_name])
    return man


def vacuum_dedup_index(
    spark: SparkSession,
    path: str,
    orphan_grace: float = 86400.0,
    *,
    keep_manifests: int = 1,
) -> list[str]:
    """Expire old index manifests (keep the newest ``keep_manifests``)
    and delete bands/sigs dirs NO kept manifest references (crashed
    builds, compacted-away chains). ``orphan_grace`` protects an
    in-flight writer's dirs, as in vacuum_ivf_index."""
    import time

    from temp_data_pipeline_spark.llm.index_commit import (
        expire_index_manifests,
    )

    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    read_dedup_manifest(spark, path)  # raises when no index exists
    expire_index_manifests(spark, path, keep_last=keep_manifests)
    live = live_index_refs(
        spark, path, lambda m: list(m["bands_dirs"]) + list(m["sigs_dirs"])
    )
    dropped: list[str] = []
    now_ms = time.time() * 1000.0
    root = Path(path)
    if not fs.exists(root):
        return dropped
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith(("bands-", "sigs-")) or name in live:
            continue
        if now_ms - st.getModificationTime() >= orphan_grace * 1000.0:
            fs.delete(st.getPath(), True)
            dropped.append(name)
    return dropped
