"""Persisted IVF vector index: build once, probe many times with
partition pruning; append batches without a rebuild.

`similarity.ivf_topk` re-assigns every vector to a cell on every
query — right for one-shot queries, wasteful for a serving pattern.
This module materializes the index the way a vector store does
(FAISS IVF / Milvus style, re-expressed as a lake layout):

  <path>/cells-<token>/_cell=<c>/...parquet   vectors by coarse cell,
                                              one immutable dir per
                                              build or append batch
  <path>/index.json                           manifest: centroids, dim,
                                              cells_dirs, counts

Readers resolve data ONLY through the manifest: a build writes its
cell files under a fresh uniquely-named dir and swaps ``index.json``
last via a SINGLE atomic rename (operators/versioned.py
atomic_write_text), so a concurrent probe sees either the complete
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
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.similarity import (
    assign_cells,
    cosine_sim,
    fit_kmeans,
    _vec_lit,
)
from temp_data_pipeline_spark.operators.versioned import (
    _fs,
    atomic_write_text,
    read_text,
)


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
    live manifest references.
    """
    spark = df.sparkSession
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
    atomic_write_text(spark, f"{path}/index.json", json.dumps(manifest))
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
    (they resolve data only through one atomic manifest read), but
    maintenance — build / add_vectors / vacuum — requires a SINGLE
    writer, like FAISS/Annoy index files: two concurrent appends both
    read manifest M and the second swap would silently drop the
    first's dir. Serialize maintenance (one ingest job per index);
    multi-writer commit logs are what `operators/versioned.py` is for.
    """
    spark = df.sparkSession
    man = read_ivf_manifest(spark, path)
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
    atomic_write_text(spark, f"{path}/index.json", json.dumps(manifest))
    return manifest


def read_ivf_manifest(spark: SparkSession, path: str) -> dict:
    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    p = Path(f"{path}/index.json")
    if not fs.exists(p):
        raise FileNotFoundError(
            f"no IVF index at {path} (index.json missing — build crashed "
            "or still in flight; only manifested indexes are readable)"
        )
    return json.loads(read_text(spark, f"{path}/index.json"))


def vacuum_ivf_index(
    spark: SparkSession, path: str, orphan_grace: float = 86400.0
) -> list[str]:
    """Delete cell dirs the CURRENT manifest no longer references —
    left behind by rebuilds and crashed builds. ``orphan_grace``
    protects an in-flight build's dir (written, manifest not yet
    swapped), exactly like versioned.vacuum's orphan window. Returns
    the deleted dir names."""
    import time

    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    live = set(_cells_dirs(read_ivf_manifest(spark, path)))
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
