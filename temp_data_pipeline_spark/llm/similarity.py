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
    plane_bands_udf,
)
from temp_data_pipeline_spark.session import ensure_parallelism


def _vec_lit(vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vec])


def ranked_topk(df: DataFrame, order_cols, k: int, rank_col: str = "rank") -> DataFrame:
    """orderBy + limit(k) — which compiles to TakeOrderedAndProject
    (each partition keeps k rows, the driver merges; no global sort
    exchange) — then a row_number rank over the k survivors with the
    SAME ordering. The shared tail of every top-k query (BM25, text
    kNN, ...); `order_cols` must give a total order or the rank is
    nondeterministic."""
    from pyspark.sql import Window

    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return top.select(
        F.row_number().over(w).cast("int").alias(rank_col), "*"
    )


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


def filtered_topk(
    df: DataFrame,
    query_vec,
    predicate,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Metadata-filtered vector search: exact cosine top-k over the
    rows satisfying ``predicate`` (a Column, e.g. label/lang/date
    constraints) — the "filtered ANN" query every vector store serves.

    The predicate is applied BEFORE any vector arithmetic, so Catalyst
    pushes it into the parquet scan (PushedFilters / partition
    pruning): at 100 TB a selective filter prunes row groups and
    partitions and the dot products only run on survivors. This is the
    pre-filter strategy; for low-selectivity predicates compose with
    `ann_lsh_topk`/`ivf_topk` on the filtered frame instead (same
    call shape — they all take a DataFrame).
    """
    return cosine_topk(df.filter(predicate), query_vec, k, vec_col, id_col)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    scale = max|x| / 127, code_i = round(x_i / scale) ∈ [-127, 127] —
    the standard 4× storage/bandwidth compression for vector search
    (scales per-vector, so outlier dimensions in one vector don't
    crush another's resolution; reconstruction x̂ = code · scale).

    Map-only JVM array expressions — no shuffle, no UDF: at 100 TB
    this runs at scan speed and writes a quarter of the bytes. The
    arithmetic (cast-to-double, multiply-by-127, divide-by-amax,
    floor(x+0.5) rounding) is IEEE-deterministic, so codes are
    bit-identical across engines — unlike the float vectors they
    compress. All-zero vectors quantize to scale 0 and all-zero codes.

    Returns (id, scale, codes); pair with `pq_encode` (llm/similarity
    PQ tier) when 32× compression with ADC scoring is wanted instead.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    code = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x * F.lit(127.0) / amax + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    zeros = F.transform(v, lambda x: F.lit(0))
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.when(amax > 0.0, amax / F.lit(127.0)).otherwise(F.lit(0.0)).alias("scale"),
        F.when(amax > 0.0, code).otherwise(zeros).alias("codes"),
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

    # stable: ties between equidistant centroids break by ascending
    # cell index, matching the oracle's ORDER BY d, k
    qd = ((cents - np.array(query_vec)) ** 2).sum(1)
    probe_cells = [int(c) for c in np.argsort(qd, kind="stable")[:nprobe]]
    q = _vec_lit(query_vec)
    return (
        assigned.filter(F.col("_cell").isin(probe_cells))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def fit_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split each vector into
    ``m`` contiguous subvectors and k-means each subspace
    independently (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011).  Driver-fit on a bounded seeded
    sample, like fit_kmeans — PQ training needs a few thousand rows
    regardless of corpus size.  Returns codebooks[m][k][dim/m] as
    plain floats so callers and oracles can pin them as literals."""
    import numpy as np

    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_size).collect()], dtype=float
    )
    dsub = sample.shape[1] // m
    rng = np.random.RandomState(seed)
    books = []
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        cents = sub[rng.choice(len(sub), size=min(k, len(sub)), replace=False)]
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(cents)):
                msk = assign == c
                if msk.any():
                    cents[c] = sub[msk].mean(0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def pq_encode_udf(codebooks):
    """Arrow pandas UDF: PQ codes for a vector column — per subspace,
    the index of the nearest codebook centroid.  One batched distance
    computation per (subspace, batch); codes are m small ints per
    vector (the 100 TB win: 64-dim float vectors compress 32× to an
    8-byte code row, and the scan reads codes, not vectors).
    np.argmin takes the first minimum — identical tie-break to the
    oracle's list_position(list_min).  Per-subspace distances are
    float64 sums of dim/m squared terms; numpy's pairwise order can
    differ from a sequential fold by ~1 ulp, which flips an argmin
    only when two centroids are equidistant to ~1e-13 — measure-zero
    for real-valued data (same argument as cell_assign_udf)."""
    import numpy as np

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = books[0].shape[1]

    @F.pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        out = np.empty((len(mat), len(books)), dtype=np.int32)
        for s, cb in enumerate(books):
            sub = mat[:, s * dsub : (s + 1) * dsub]  # (n, dsub)
            d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return _codes


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — map-only, no shuffle.  At scale this
    is the materialized PQ index: write (id, codes) to parquet once,
    and every subsequent query scans the 8-bytes-per-row code table
    instead of the raw vectors."""
    return ensure_parallelism(df).select(
        F.col(id_col),
        pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )


def pq_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
    codebooks=None,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: the query's squared
    distance to every codebook centroid is a driver-side m×k lookup
    table; each database vector's approximate distance is the sum of
    m table entries selected by its codes.  The scan never touches the
    raw vectors — per row it reads m small ints and does m lookups +
    adds, the memory-bandwidth shape that makes PQ the standard
    billion-vector index layout.  TakeOrdered finishes (per-partition
    top-k + driver merge of k rows, no global sort).

    Pass ``codebooks`` to reuse a trained/pinned quantizer (and to let
    an external oracle replay codes and distances from literals)."""
    import numpy as np

    books = codebooks if codebooks is not None else fit_pq(
        df, vec_col, m, n_codes, sample_size, iters, seed
    )
    bk = [np.asarray(b, dtype=np.float64) for b in books]
    dsub = bk[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64)
    # lut[s][c] = ||q_sub(s) - codebook[s][c]||^2, driver-side
    lut = [
        [float(((q[s * dsub : (s + 1) * dsub] - cb[c]) ** 2).sum()) for c in range(len(cb))]
        for s, cb in enumerate(bk)
    ]

    codes = pq_encode(df, books, vec_col, id_col)
    lut_np = np.asarray(lut, dtype=np.float64)

    @F.pandas_udf("double")
    def _adc(c: pd.Series) -> pd.Series:
        mat = np.stack(c.to_numpy())  # (n, m) int codes
        return pd.Series(lut_np[np.arange(lut_np.shape[0]), mat].sum(axis=1))

    return (
        codes.select(F.col(id_col), _adc(F.col("codes")).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col))
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
    # Pre-normalize ONCE per row, then verify each capped cell as ONE
    # bucket-local numpy matmul (the same FAISS-style block compute as
    # dedup.embedding_neardup_pairs): the cell's rows ship once to one
    # applyInPandas group, all within-cell pair scores come from a
    # single M @ M.T, and only duplicate IDS leave the kernel —
    # candidate pairs never materialize as rows. Only the ≥ threshold
    # decision is emitted, so summation-order ulp differences can't
    # reach emitted values.
    base = assigned.select(
        F.col(id_col),
        F.col("_cell"),
        l2_normalize_udf()(F.col(vec_col)).alias("_nv"),
    )
    capped = cap_bucket(base, ["_cell"], id_col, max_bucket)

    import numpy as np
    import pandas as pd

    thr = float(threshold)
    _id = id_col

    def _cell_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[_id].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["_nv"].to_numpy())[order]
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        dup = np.unique(ids[iu[1][sims[iu] >= thr]])
        return pd.DataFrame({_id: dup})

    # cap_bucket's window and this groupBy share the _cell clustering;
    # cells partition the id space, so the per-cell np.unique already
    # makes dup ids globally distinct — no extra exchange needed
    id_type = dict(capped.dtypes)[id_col]
    dup_ids = capped.groupBy("_cell").applyInPandas(
        _cell_dups, f"{id_col} {id_type}"
    )
    return (
        assigned.join(dup_ids.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("_cell").alias("cell"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )


def ann_recall(
    truth: DataFrame,
    approx: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall of an approximate top-k against the exact top-k: ONE row
    (n_hit, n_truth) of exact integers — divide for recall@k. The
    routine quality gate for every ANN tier (LSH / IVF / PQ): run it
    on a sampled query set whenever index parameters change, because
    nprobe/bands/bucket caps trade recall for cost and the trade must
    be MEASURED, not assumed. Both inputs are k-row frames, so the
    join and counts are driver-trivial at any corpus size — the cost
    is producing the two top-k's."""
    t = truth.select(id_col)
    hit = t.join(approx.select(id_col), id_col, "inner").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    n = t.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    return hit.crossJoin(n)


def probe_cells_udf(centroids, nprobe: int):
    """Arrow pandas UDF: the ``nprobe`` nearest centroid cells of a
    vector column, as an int array — the per-QUERY side of a batch
    ANN join (single-query probes rank centroids driver-side instead;
    see ivf_index_topk). Stable argsort, so equidistant centroids tie
    toward the lower cell index — identical to the oracle's
    ORDER BY d, k."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return _cells


def ivf_knn_join(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    *,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ANN: top-k approximate neighbors for EVERY query row —
    the many-query sibling of ``ivf_topk`` (which serves one vector).
    The all-pairs problem that makes brute-force kNN quadratic is cut
    to cell-co-resident pairs:

      index  → nearest cell each (map-only Arrow kernel),
      query  → nprobe nearest cells each, exploded (×nprobe rows),
      equi-join on cell (hash exchange keyed by cell — never a
      cartesian), exact cosine per surviving pair, per-query top-k
      via a window partitioned by query id.

    Per-query cost is nprobe/nlist of the index, same as a single
    probe; the join fanout is |Q|·nprobe + |I| rows. Hot cells skew
    the exchange — raise nlist (cells shrink) or pre-salt the index
    side if one cell dominates; the conformance tier keeps the
    pinned-16-centroid layout. Ties rank by (cosine DESC, neighbor
    id) for a total order. Returns (query_id, rank, neighbor_id).
    """
    from pyspark.sql import Window

    idx = assign_cells(index, centroids, vec_col, id_col)
    q = ensure_parallelism(queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        probe_cells_udf(centroids, nprobe)(F.col(vec_col)).alias("_cells"),
    )
    qx = q.select(
        "query_id", "_qv", F.explode("_cells").alias("_cell")
    )
    pairs = qx.join(idx, "_cell")
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_sim(F.col(vec_col), F.col("_qv")).alias("_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
