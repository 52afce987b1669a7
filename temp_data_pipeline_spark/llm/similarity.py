"""Similarity search over embedding columns.

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  One map stage (score every vector, JVM-side arithmetic) + a top-k
  sort that Spark executes as per-partition TakeOrdered + driver merge
  of k rows (NOT a global sort of all scores).
- `ann_lsh_topk`: the scale path — random-hyperplane signatures
  bucket the corpus; only vectors sharing ≥1 signature band with the
  query are scored. At 100 TB the bucket join prunes the scan to a
  tiny candidate slice; recall is tunable via nbits/bands.
- `ivf_topk`: IVF-style variant — coarse centroids from a seeded
  sample (driver k-means on a few thousand rows), every vector
  assigned to its nearest centroid map-side; queries probe the
  `nprobe` nearest centroid cells only. Demonstrates the
  partition-pruned ANN layout used by vector stores.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import (
    cosine_sim,
    l2_normalize_udf,
    pair_dot_udf,
    plane_bands_udf,
)
from temp_data_pipeline_spark.session import ensure_parallelism


def _vec_lit(vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = _vec_lit(query_vec)
    scored = ensure_parallelism(df).select(
        F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def ann_lsh_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH-pruned ANN: candidates share at least one signature band
    with the query, then exact cosine re-rank of candidates only."""
    import random

    dim = len(query_vec)
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(nbits)]

    # band signature via one Arrow-batched numpy matmul per batch
    # (plane_bands_udf) — the UDF result is a real attribute, so the
    # band-match filter's per-band element_at reads don't recompute it
    with_sig = ensure_parallelism(df).select(
        F.col(id_col),
        F.col(vec_col),
        plane_bands_udf(planes, bands)(F.col(vec_col)).alias("_sig"),
    )

    # query signature computed driver-side with the same planes
    qsig = []
    per_band = nbits // bands
    for b in range(bands):
        acc = 0
        for i in range(per_band):
            dot = sum(x * y for x, y in zip(query_vec, planes[b * per_band + i]))
            if dot >= 0:
                acc += 1 << i
        qsig.append(acc)

    match_any = None
    for b, qv in enumerate(qsig):
        cond = F.element_at(F.col("_sig"), b + 1) == qv
        match_any = cond if match_any is None else (match_any | cond)

    cand = with_sig.filter(match_any)
    q = _vec_lit(query_vec)
    return (
        cand.select(F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def fit_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Driver-fit coarse k-means on a bounded seeded sample.

    The collect is a bounded `sample_size`-row sample (the IVF /
    SemDeDup coarse quantizer needs a few thousand rows regardless of
    corpus size — this is the standard vector-store training shape,
    not a driver-side data path). Deterministic for a fixed input:
    fixed seed, fixed iteration count, numpy's deterministic argmin /
    mean. Returns plain Python floats so callers can embed the
    centroids as literals (Spark `F.lit` and oracle SQL alike)."""
    import numpy as np

    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_size).collect()], dtype=float
    )
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(0)
    return [[float(x) for x in c] for c in cents]


def cell_assign_udf(centroids):
    """Arrow pandas UDF: nearest-centroid cell id for a vector column.
    One batched ‖v−c‖² matrix computation per Arrow batch instead of
    n_centroids interpreted 64-element folds per row (higher-order
    functions are not codegen'd; measured seconds per 2k rows at 16
    centroids).  np.argmin takes the FIRST minimum — same lowest-cell
    tie-break as the previous array_position(min) form and the
    oracle's list_position.  Near-tie argmin flips from summation-
    order ulp differences require two centroids equidistant to
    ~1e-13 — measure-zero for real-valued data."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    cnorm = (cents * cents).sum(axis=1)

    @F.pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 constant per
        # row, so argmin needs only the cross and centroid terms...
        # but the oracle compares FULL squared distances, whose argmin
        # is identical; compute full distances the direct way to keep
        # the float error of each entry independent of the others.
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return _cell


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid cell assignment, map-only: the centroid matrix
    ships inside the Arrow kernel (cell_assign_udf); no shuffle, no
    join, one Python eval per batch.  Emits (id, vec, _cell)."""
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.col(vec_col),
        cell_assign_udf(centroids)(F.col(vec_col)).alias("_cell"),
    )


def ivf_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF: coarse k-means centroids (driver-fit on a seeded sample,
    or caller-pinned via ``centroids`` so an external oracle can
    replay cell assignment), map-side cell assignment, query probes
    nprobe nearest cells."""
    import numpy as np

    cents = np.array(
        centroids
        if centroids is not None
        else fit_kmeans(df, vec_col, n_centroids, sample_size, iters, seed)
    )
    assigned = assign_cells(df, [list(c) for c in cents], vec_col, id_col)

    qd = ((cents - np.array(query_vec)) ** 2).sum(1)
    probe_cells = [int(c) for c in qd.argsort()[:nprobe]]
    q = _vec_lit(query_vec)
    return (
        assigned.filter(F.col("_cell").isin(probe_cells))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def label_centroids(
    df: DataFrame, *, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label centroid of an embedding column, one row per
    (label, dimension position): the IVF coarse-quantizer training
    step, and the building block for class prototypes / cluster
    summaries.

    posexplode → groupBy(label, pos) keeps everything JVM-side; the
    shuffle carries (label, pos, partial sum/count) — 8·dims bytes per
    label per partition regardless of corpus size, so the plan is
    identical at 500 rows and 100 TB.
    """
    ex = ensure_parallelism(df).select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    return ex.groupBy(label_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("centroid_v")
    )


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_centroids: int = 8,
    sample_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
    max_bucket: int | None = 1000,
    centroids: list[list[float]] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster
    the embedding space with coarse k-means, then compare vectors only
    WITHIN their cluster — pairs with cosine ≥ `threshold` are
    semantic duplicates, and the greedy keep-lowest-id policy drops
    every vector that matches a lower id in its cell.

    Scale shape: the O(n²) all-pairs comparison becomes per-cell
    self-joins — one hash exchange on `_cell` (reused by the bucket
    cap's window), pair volume bounded by the largest cell (and hard-
    capped at `max_bucket`²/2 per cell via cap_bucket). Centroids are
    a driver-side constant (bounded seeded sample), so assignment is
    map-only; at 100 TB raise n_centroids so cells stay executor-sized
    — cost is linear in n_centroids per row, all JVM expressions.

    Returns (id, cell, kept) for EVERY input row, `kept=false` iff a
    lower-id same-cell vector has cosine ≥ threshold. Pass explicit
    `centroids` to reuse a trained quantizer (and to let an oracle
    replay assignment from the same literals)."""
    from temp_data_pipeline_spark.llm.dedup import cap_bucket

    if centroids is None:
        centroids = fit_kmeans(df, vec_col, n_centroids, sample_size, iters, seed)
    assigned = assign_cells(df, centroids, vec_col, id_col).select(
        id_col, vec_col, "_cell"
    )
    # assigned feeds the self-join (both sides) AND the final labeling
    # join — without materialization the n_centroids-distance
    # assignment executes three times (see the LSH pair generators for
    # the same pattern)
    if materialize:
        assigned = assigned.localCheckpoint()
    # Pre-normalize ONCE per row: the per-PAIR verify is then a single
    # dot product instead of dot + two norms — pairs outnumber rows by
    # orders of magnitude inside dense cells.  Normalize and the
    # per-pair dot are Arrow numpy kernels (see dedup.l2_normalize_udf
    # / pair_dot_udf); only the ≥ threshold decision leaves the verify,
    # so summation-order ulp differences can't reach emitted values.
    base = assigned.select(
        F.col(id_col),
        F.col("_cell"),
        l2_normalize_udf()(F.col(vec_col)).alias("_nv"),
    )
    capped = cap_bucket(base, ["_cell"], id_col, max_bucket)
    if materialize:
        # normalized vectors compute once, not once per join side
        capped = capped.localCheckpoint()
    a, b = capped.alias("a"), capped.alias("b")
    dup_ids = (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(pair_dot_udf()(F.col("a._nv"), F.col("b._nv")) >= threshold)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("_cell").alias("cell"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )
