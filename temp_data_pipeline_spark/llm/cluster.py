"""Duplicate-cluster labeling: connected components over near-dup
pairs.

The pair generators (llm/dedup.py) emit (id_a, id_b) edges; greedy
pairwise policies drop any doc that matches a lower id, which is
correct for cliques but leaves policy implicit for chains
(a~b, b~c, a≁c). Connected components make the cluster structure
explicit: every document gets a `cluster_id` (the minimum doc id
reachable through near-dup edges), and cluster-level dedup keeps
exactly one representative per component.

Algorithm: min-label propagation with pointer jumping (path
halving). Each round every node takes min(own label, neighbors'
labels) — one shuffle join + one keyed aggregation — then labels
compose with themselves (label ← label[label]), which doubles the
propagation distance per round: convergence in O(log diameter)
rounds rather than O(diameter), the same round-complexity class as
alternating large-star/small-star (Kiveris et al., 2014). Near-dup
components are dense (boilerplate cliques), so 2-4 rounds is
typical even for chained shingle overlaps.

Per-round driver involvement is one tiny aggregate (labels are
monotonically non-increasing, so an unchanged label sum ⇒
fixpoint); labels are localCheckpointed each round to truncate
lineage — without that the plan doubles per iteration and Catalyst
optimization time explodes by round ~15 regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_max_edges: int = 1 << 20,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in `pairs`, where
    cluster_id = min node id in the node's connected component.

    Near-dup graphs are dense (boilerplate cliques: at sf0.1 the
    documents table yields ~270k edges over ~2.8k nodes, average
    degree ~96), so before iterating we CONTRACT: seed every node
    with min(self, neighbors) — which already finishes any clique —
    then rewrite each edge through the seed labels and drop
    self-loops.  Cliques collapse entirely; only inter-seed-label
    edges survive (two orders of magnitude fewer rows here), and the
    O(log diameter) propagation loop runs on that contracted graph.
    The final answer is one hop of composition: node → seed label →
    contracted component label.  Contraction is plain join/agg
    dataflow — no driver-side materialization — so the 100 TB posture
    is unchanged; it is the first round of Borůvka-style CC
    (Kiveris et al. 2014 §3) expressed as DataFrame ops.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # no distinct here: min-aggregation and the contraction's own
    # distinct are duplicate-insensitive, so deduping the symmetrized
    # edge list first would only add a full-width shuffle
    all_edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # seed with min(self, neighbors) — labels any clique in one agg
    seed = (
        all_edges.groupBy("src")
        .agg(F.min("dst").alias("_nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("_nmin")).alias("label"),
        )
    ).localCheckpoint()
    # contract: edges between seed labels (self-loops vanish)
    sl = seed.select(F.col("node").alias("src"), F.col("label").alias("_sl"))
    dl = seed.select(F.col("node").alias("dst"), F.col("label").alias("_dl"))
    edges = (
        all_edges.join(sl, "src")
        .join(dl, "dst")
        .filter(F.col("_sl") != F.col("_dl"))
        .select(F.col("_sl").alias("src"), F.col("_dl").alias("dst"))
        .distinct()
    )
    # persist hash-partitioned on the per-round join key: a cached
    # plan keeps its outputPartitioning, so every round's edges⋈labels
    # join skips the edge-side exchange — the dominant shuffle, since
    # edges outnumber labels (nodes) by the average degree
    edges = edges.repartition("dst").persist()

    # After contraction the graph is usually a few inter-clique
    # bridges — orders of magnitude below the corpus. When it fits
    # the explicit bound (default 2^20 edges ≈ 16 MiB of longs — the
    # same bounded-driver-collect budget as the IVF sample and the
    # Bloom bitset), finish with a driver union-find: the distributed
    # loop costs ~4 jobs PER ROUND regardless of size, so on a tiny
    # remainder graph the fixed round overhead dominates everything.
    # Larger contracted graphs take the O(log diameter) loop below —
    # the count is the gate, never an assumption.
    n_edges = edges.count()
    if n_edges <= driver_max_edges:
        parent: dict = {}

        def _find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.collect():
            ra, rb = _find(r["src"]), _find(r["dst"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        spark = pairs.sparkSession
        # schema follows the caller's id type (string doc ids are as
        # valid as longs — the distributed path below is type-generic,
        # and a hard-coded `long` here would throw
        # FIELD_DATA_TYPE_UNACCEPTABLE on the common small-graph path)
        id_type = dict(seed.dtypes)["node"]
        from temp_data_pipeline_spark.session import local_df

        labels = local_df(
            spark,
            [(n, _find(n)) for n in parent],
            f"node {id_type}, label {id_type}",
        )
        edges.unpersist()
        contracted = labels.select(
            F.col("node").alias("label"), F.col("label").alias("_clabel")
        )
        return seed.join(F.broadcast(contracted), "label", "left").select(
            F.col("node"),
            F.coalesce(F.col("_clabel"), F.col("label")).alias("cluster_id"),
        )

    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("_nmin")).alias("label"),
        )
    ).localCheckpoint()
    prev_sum = None

    # Fixpoint detector: labels are monotonically non-increasing, so
    # for numeric ids an unchanged exact SUM(label) proves a fixpoint.
    # For non-numeric ids (string doc ids) sum two independent 64-bit
    # label hashes instead: a changed round would need its hash deltas
    # to cancel in BOTH sums (≈2^-128) — and max_iter still bounds the
    # loop. This keeps the check one tiny aggregate, no extra join.
    numeric = dict(labels.dtypes)["label"] in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    ) or dict(labels.dtypes)["label"].startswith("decimal")

    def _fixpoint_sig(lab):
        if numeric:
            return lab.agg(F.sum("label")).first()[0]
        # decimal(38,0) accumulator: |hash| ≤ 2^63 ≈ 9.2e18, so the sum
        # stays inside 38 digits up to ~1e19 rows — no ANSI long overflow
        row = lab.agg(
            F.sum(F.xxhash64("label").cast("decimal(38,0)")),
            F.sum(F.xxhash64("label", F.lit(1)).cast("decimal(38,0)")),
        ).first()
        return (row[0], row[1])

    for _ in range(max_iter):
        # neighbor minimum, merged with own label in ONE aggregation
        # (union instead of join-back: one shuffle fewer per round)
        contrib = edges.join(labels, edges["dst"] == labels["node"]).select(
            edges["src"].alias("node"), F.col("label")
        )
        merged = (
            contrib.union(labels).groupBy("node").agg(F.min("label").alias("label"))
        )
        # pointer jump: label ← label's label (path halving)
        parent = merged.select(
            F.col("node").alias("label"), F.col("label").alias("_plabel")
        )
        labels = (
            merged.join(parent, "label", "left")
            .select("node", F.coalesce(F.col("_plabel"), F.col("label")).alias("label"))
        ).localCheckpoint()  # truncate lineage; materializes the round
        cur_sum = _fixpoint_sig(labels)
        if cur_sum == prev_sum:  # labels only decrease ⇒ equal sig = fixpoint
            break
        prev_sum = cur_sum
    edges.unpersist()
    # compose back through the contraction: node → seed label →
    # contracted component label (seed labels absent from the
    # contracted graph were already component minima)
    contracted = labels.select(
        F.col("node").alias("label"), F.col("label").alias("_clabel")
    )
    return seed.join(contracted, "label", "left").select(
        F.col("node"),
        F.coalesce(F.col("_clabel"), F.col("label")).alias("cluster_id"),
    )


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster-level keep-one dedup: label every row with its
    component and keep only representatives (cluster minimum).
    Rows absent from `pairs` are their own singleton clusters."""
    comp = connected_components(pairs, id_a, id_b)
    labeled = df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    return labeled.filter(F.col(id_col) == F.col("cluster_id")).drop("cluster_id")


def cluster_labels(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every row labeled: (id, cluster_id, is_representative)."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        df.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("cluster_id"))
    )


def cluster_dedup_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster dedup: keep the HIGHEST-``score_col`` row
    of every near-dup component (ties broken by ascending id), not the
    minimum-id one — production corpora keep the best-quality copy of
    boilerplate families (longest extraction, highest classifier
    score), and min-id keep-first throws that information away.

    One window over cluster_id after the component join: the labeling
    cost is connected_components'; selection adds a single hash
    exchange on cluster_id. Rows absent from `pairs` are singleton
    clusters and always survive.
    """
    comp = connected_components(pairs, id_a, id_b)
    labeled = df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster_id")
    )
