"""Persisted IVF vector index: build once, probe many times with
partition pruning; append batches without a rebuild.

`similarity.ivf_topk` re-assigns every vector to a cell on every
query — right for one-shot queries, wasteful for a serving pattern.
This module materializes the index the way a vector store does
(FAISS IVF / Milvus style, re-expressed as a lake layout):

  <path>/cells-<token>/_cell=<c>/...parquet   vectors by coarse cell,
                                              one immutable dir per
                                              build or append batch
  <path>/index-<n>.json                       manifest commit log:
                                              centroids, dim, cells_dirs,
                                              counts; highest n is live

Readers resolve data ONLY through the manifest: a build writes its
cell files under a fresh uniquely-named dir and commits the next
numbered manifest last via a SINGLE atomic rename
(llm/index_commit.py), so a concurrent probe sees either the complete
old index or the complete new one — never new cell files with old
centroids (ADVICE r5: the previous in-place ``cells/`` overwrite had
exactly that window, and destroyed data the live manifest still
referenced). Old dirs stay on disk until `vacuum_ivf_index`.

A probe ranks the manifest's centroids driver-side (nlist × dim
floats — trivially small), then reads ONLY the nprobe matching
``_cell=`` directories: because ``_cell`` is a PARTITION column, the
`IN` filter prunes at planning time and the scan touches
nprobe/nlist of the data — at 100 TB with nlist=1024 and nprobe=8,
that's <1% of bytes per query, the whole point of IVF at rest.
Exact cosine re-ranks within the probed cells.

`add_vectors` completes the serving lifecycle: a new batch is
assigned against the PINNED centroids and lands as one more
uniquely-named dir appended to ``cells_dirs`` — an O(batch) append,
the same metadata-level move as versioned.py's carry_from commits.
Probing the appended index equals probing a full rebuild over the
merged set, because cell assignment depends only on the (unchanged)
centroids.

Since round 8 the manifest is a COMMIT LOG (``index-<n>.json``,
llm/index_commit.py) with the rename at exactly n+1 as the arbiter
between racing writers: concurrent builds/appends/vacuums no longer
need a single-writer contract — the loser raises the retryable
``versioned.CommitConflictError`` instead of silently dropping the
winner's dirs (the lost-update race round 7 closed for versioned
tables). Legacy single-file ``index.json`` manifests read back as
version 0 and upgrade on the first logged commit.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.similarity import (
    assign_cells,
    cosine_sim,
    fit_kmeans,
    _vec_lit,
)
from temp_data_pipeline_spark.llm.index_commit import (
    commit_or_reclaim,
    live_index_refs,
    read_index_state,
)
from temp_data_pipeline_spark.operators.versioned import _fs


def _cells_dirs(man: dict) -> list[str]:
    # pre-r6 manifests used a single fixed "cells" dir
    return list(man.get("cells_dirs") or ["cells"])


def _read_cells(spark: SparkSession, path: str, man: dict) -> DataFrame:
    """All cell files of the manifested index. Per-dir scans unioned
    by name (same reasoning as versioned.read_version): partition
    discovery of ``_cell=`` runs per root, and a partition filter
    pushes into every branch."""
    from functools import reduce

    frames = [spark.read.parquet(f"{path}/{d}") for d in _cells_dirs(man)]
    return reduce(lambda a, b: a.unionByName(b), frames)


def build_ivf_index(
    df: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
    sample_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
) -> dict:
    """Materialize the IVF index at ``path``; returns the manifest.

    ``centroids`` pins the coarse quantizer (oracle replay / external
    training); otherwise `fit_kmeans` trains on a bounded seeded
    sample. Cell files land under a fresh ``cells-<token>`` dir; the
    manifest rename is the single commit point, so a crashed build
    leaves no readable index and a REBUILD never disturbs the data a
    live manifest references. A build racing another writer raises
    the retryable ``CommitConflictError`` (its dir is reclaimed) —
    a rebuild that lost to a concurrent append would silently drop
    that batch if it won by overwrite.
    """
    spark = df.sparkSession
    try:
        base, _ = read_index_state(spark, path, kind="IVF")
    except FileNotFoundError:
        base = 0
    cents = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else fit_kmeans(df, vec_col, n_centroids, sample_size, iters, seed)
    )
    cells_name = f"cells-{uuid.uuid4().hex[:8]}"
    assigned = assign_cells(df, cents, vec_col, id_col)
    assigned.write.mode("errorifexists").partitionBy("_cell").parquet(
        f"{path}/{cells_name}"
    )
    # explicit schema: an all-filtered (empty) build still reads back
    n = (
        spark.read.schema(assigned.schema)
        .parquet(f"{path}/{cells_name}")
        .count()
    )
    manifest = {
        "format": "ivf-parquet-v2",
        "centroids": cents,
        "nlist": len(cents),
        "dim": len(cents[0]),
        "vec_col": vec_col,
        "id_col": id_col,
        "cells_dirs": [cells_name],
        "n_vectors": n,
    }
    commit_or_reclaim(spark, path, manifest, base, [cells_name])
    return manifest


def add_vectors(df: DataFrame, path: str) -> dict:
    """Append a batch to an existing index without a rebuild: assign
    against the manifest's PINNED centroids, write one new immutable
    ``cells-<token>`` dir, swap the manifest. O(batch) compute and IO;
    returns the (possibly unchanged, for an empty batch) manifest.
    Cell membership depends only on the centroids, so probes over the
    appended index return exactly what a full rebuild over the merged
    set would.

    Concurrency contract: PROBES are always safe against any writer
    (they resolve data only through one atomic manifest read), and
    since round 8 writers serialize through the numbered-manifest
    commit log (llm/index_commit.py): two concurrent appends both
    plan against version B, the rename onto ``index-<B+1>.json``
    arbitrates, and the loser raises the retryable
    ``CommitConflictError`` with its dir reclaimed — a RETRY (just
    call add_vectors again) re-bases on the winner's manifest and
    the final index holds BOTH batches, never a silent drop.
    """
    spark = df.sparkSession
    base, man = read_index_state(spark, path, kind="IVF")
    assigned = assign_cells(df, man["centroids"], man["vec_col"], man["id_col"])
    if assigned.isEmpty():
        # nothing to append: no orphan dir, no manifest churn (an
        # empty partitioned dir would also break schema inference on
        # the read-back — the empty-snapshot trap versioned.py guards)
        return man
    cells_name = f"cells-{uuid.uuid4().hex[:8]}"
    assigned.write.mode("errorifexists").partitionBy("_cell").parquet(
        f"{path}/{cells_name}"
    )
    n_new = (
        spark.read.schema(assigned.schema)
        .parquet(f"{path}/{cells_name}")
        .count()
    )
    manifest = {
        **man,
        "cells_dirs": _cells_dirs(man) + [cells_name],
        "n_vectors": int(man["n_vectors"]) + n_new,
    }
    commit_or_reclaim(spark, path, manifest, base, [cells_name])
    return manifest


def read_ivf_manifest(spark: SparkSession, path: str) -> dict:
    """The LIVE manifest: highest-numbered ``index-<n>.json``, falling
    back to a legacy single-file ``index.json`` (version 0)."""
    return read_index_state(spark, path, kind="IVF")[1]


def vacuum_ivf_index(
    spark: SparkSession,
    path: str,
    orphan_grace: float = 86400.0,
    *,
    keep_manifests: int = 1,
) -> list[str]:
    """Expire old index manifests (keep the newest ``keep_manifests``)
    and delete cell dirs NO kept manifest references — left behind by
    rebuilds and crashed builds. ``orphan_grace`` protects an
    in-flight build's dir (written, manifest not yet committed) and
    any probe holding a just-expired manifest, exactly like
    versioned.vacuum's orphan window. Returns the deleted dir names."""
    import time

    from temp_data_pipeline_spark.llm.index_commit import (
        expire_index_manifests,
    )

    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    read_ivf_manifest(spark, path)  # raises when no index exists
    expire_index_manifests(spark, path, keep_last=keep_manifests)
    live = live_index_refs(spark, path, _cells_dirs)
    dropped = []
    now_ms = time.time() * 1000.0
    root = Path(path)
    if not fs.exists(root):
        return dropped
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("cells") or name in live:
            continue
        if now_ms - st.getModificationTime() >= orphan_grace * 1000.0:
            fs.delete(st.getPath(), True)
            dropped.append(name)
    return dropped


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a persisted index: rank centroids driver-side, scan ONLY
    the nprobe matching ``_cell=`` partitions (planning-time partition
    pruning — verify with PartitionFilters in the explain), exact
    cosine re-rank inside them."""
    import numpy as np

    man = read_ivf_manifest(spark, path)
    cents = np.array(man["centroids"], dtype=float)
    qd = ((cents - np.array(query_vec, dtype=float)) ** 2).sum(1)
    # stable: equidistant centroids (possible with corpus-pinned
    # quantizers) must break ties by ascending cell index, matching
    # the oracle's ORDER BY d, k — default argsort is unstable
    probe_cells = [int(c) for c in np.argsort(qd, kind="stable")[:nprobe]]
    q = _vec_lit(query_vec)
    cells = _read_cells(spark, path, man).filter(
        F.col("_cell").isin(probe_cells)
    )
    return (
        cells.select(
            F.col(man["id_col"]),
            cosine_sim(F.col(man["vec_col"]), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(man["id_col"]))
        .limit(k)
    )
