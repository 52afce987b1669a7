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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import cosine_sim
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


def _matrix_df(df: DataFrame, name: str, rows: list[list[float]]):
    """A float matrix as a broadcast ONE-ROW DataFrame column.

    Embedding a plane/centroid matrix as ~1000 expression-tree
    literals makes Catalyst analysis + codegen the dominant cost once
    the plan is duplicated across self-joins and join-backs (measured
    2-3x wall-clock on the LSH operators at sf0.1). As data, the
    matrix is one broadcast row and the per-row math is one compact
    nested-lambda expression."""
    spark = df.sparkSession
    mat = spark.createDataFrame(
        [([list(map(float, r)) for r in rows],)], f"{name}: array<array<double>>"
    )
    return df.join(F.broadcast(mat))


def _plane_signature(vec_col, planes_col, nbits: int, bands: int):
    """Band hashes of the hyperplane sign signature, from a plane
    matrix COLUMN (see _matrix_df). Same fold order as the literal
    form: dot = left-to-right aggregate over zip_with products."""
    per_band = nbits // bands
    dots = F.transform(
        planes_col,
        lambda p: F.aggregate(
            F.zip_with(vec_col, p, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )
    return F.expr(
        f"transform(sequence(0, {bands - 1}), b -> "
        f"aggregate(sequence(0, {per_band - 1}), 0L, (a, i) -> "
        f"a + IF(element_at(_dots, b * {per_band} + i + 1) >= 0.0, "
        "shiftleft(1L, i), 0L)))"
    ), dots


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

    sig, dots = _plane_signature(F.col(vec_col), F.col("_pl"), nbits, bands)
    # explode-of-1 barrier: the band-match filter references the
    # signature once per band — keep it a real attribute so the 16
    # hyperplane dot products run once per row, not once per band
    with_sig = (
        _matrix_df(ensure_parallelism(df), "_pl", planes)
        .withColumn("_dots", dots)
        .select(
            F.col(id_col), F.col(vec_col), F.explode(F.array(sig)).alias("_sig")
        )
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


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid cell assignment as a pure map-side expression:
    the centroid matrix rides in as a broadcast one-row DataFrame (see
    _matrix_df — literals made analysis/codegen dominate), per-centroid
    squared distances land behind an explode-of-1 barrier (so the
    n_centroids aggregates run once per row), argmin = array_position
    of the minimum (first match = lowest cell id, deterministic).
    Emits (id, vec, _d, _cell)."""
    d2 = F.transform(
        F.col("_cents"),
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col), c, lambda x, y: ((x - y) * (x - y)).cast("double")
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )
    return (
        _matrix_df(ensure_parallelism(df), "_cents", centroids)
        .select(F.col(id_col), F.col(vec_col), F.explode(F.array(d2)).alias("_d"))
        .withColumn(
            "_cell",
            (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1).cast("int"),
        )
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
    # Pre-normalize ONCE per row (norm materialized behind its own
    # explode-of-1 barrier so the division lambda captures a scalar
    # attribute, not a re-evaluated fold): the per-PAIR verify is then
    # a single dot product instead of dot + two norms — pairs
    # outnumber rows by orders of magnitude inside dense cells, so
    # this is the difference between O(pairs·d) and O(3·pairs·d) with
    # a much larger constant.
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    with_norm = assigned.select(
        F.col(id_col), F.col("_cell"), F.col(vec_col),
        F.explode(F.array(norm)).alias("_nrm"),
    )
    safe = F.when(F.col("_nrm") > 0, F.col("_nrm")).otherwise(F.lit(1.0))
    base = with_norm.select(
        F.col(id_col),
        F.col("_cell"),
        F.explode(
            F.array(F.transform(F.col(vec_col), lambda x: x.cast("double") / safe))
        ).alias("_nv"),
    )
    capped = cap_bucket(base, ["_cell"], id_col, max_bucket)
    if materialize:
        # normalized vectors compute once, not once per join side
        capped = capped.localCheckpoint()
    a, b = capped.alias("a"), capped.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._nv"), F.col("b._nv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dup_ids = (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(dot >= threshold)
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
