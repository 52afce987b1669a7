"""Persisted IVF vector index: build once, probe many times with
partition pruning.

`similarity.ivf_topk` re-assigns every vector to a cell on every
query — right for one-shot queries, wasteful for a serving pattern.
This module materializes the index the way a vector store does
(FAISS IVF / Milvus style, re-expressed as a lake layout):

  <path>/cells/_cell=<c>/...parquet   vectors partitioned by coarse cell
  <path>/index.json                   manifest: centroids, dim, counts
                                      (write-temp-then-rename, atomic —
                                      readers never see a half-built
                                      index; same protocol as
                                      operators/versioned.py)

A probe ranks the manifest's centroids driver-side (nlist × dim
floats — trivially small), then reads ONLY the nprobe matching
``_cell=`` directories: because ``_cell`` is a PARTITION column, the
`IN` filter prunes at planning time and the scan touches
nprobe/nlist of the data — at 100 TB with nlist=1024 and nprobe=8,
that's <1% of bytes per query, the whole point of IVF at rest.
Exact cosine re-ranks within the probed cells.

Build cost is one distributed write (the cell assignment is the same
map-side Arrow kernel `assign_cells` the ad-hoc path uses) plus one
driver-side manifest rename. The index is immutable; rebuild-and-
swap for refresh, exactly like the snapshot tables.
"""

from __future__ import annotations

import json

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
    sample. The manifest lands last via temp+rename, so a crashed
    build leaves no readable index.
    """
    spark = df.sparkSession
    cents = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else fit_kmeans(df, vec_col, n_centroids, sample_size, iters, seed)
    )
    assigned = assign_cells(df, cents, vec_col, id_col)
    assigned.write.mode("overwrite").partitionBy("_cell").parquet(f"{path}/cells")
    n = spark.read.parquet(f"{path}/cells").count()
    manifest = {
        "format": "ivf-parquet-v1",
        "centroids": cents,
        "nlist": len(cents),
        "dim": len(cents[0]),
        "vec_col": vec_col,
        "id_col": id_col,
        "n_vectors": n,
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
    cells = spark.read.parquet(f"{path}/cells").filter(
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
