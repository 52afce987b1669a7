"""Hashed text embeddings (feature hashing / "hashing trick") and
text-to-text similarity search over them.

When no learned embedding model is available (or permitted), the
public-knowledge baseline is the signed hashing trick (Weinberger et
al. 2009, "Feature Hashing for Large Scale Multitask Learning"):
token t contributes sign(h2(t)) to dimension h1(t) % dim. Documents
become sparse integer vectors whose dot products approximate token
overlap — enough to drive dedup candidates, clustering, and
similar-document search entirely in-engine.

Exactness contract: weights are INTEGERS (counts with a ±1 sign), so
vectors, dot products, and squared norms are exact BIGINTs in any
engine; the only floats in ranking are sqrt and divide, which are
IEEE correctly-rounded and therefore bit-identical between Spark and
DuckDB on the same integer inputs (the llm_mix_temperature
precedent).

Physical shape: everything is explode → hash → groupBy — map-side
combinable aggregations on 8-byte keys, no UDFs, no driver state.
The sparse layout (id, dim_idx, weight) IS the distributed-friendly
representation at 100 TB: exchanges carry only non-zero entries, and
the similarity join is an equi-join on dim_idx instead of a dense
O(dim) zip per pair.

The md5-int60 hash family (llm/text.py) keeps every value replayable
in DuckDB for conformance; swap ``xxhash64`` in off the oracle path
for cheaper hashing at scale (same shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.text import md5_int60


def hash_embed_sparse(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """(id, dim_idx, weight): signed-hash sparse embedding.

    dim_idx = md5_int60(token) % dim; sign = ±1 from an independent
    salted hash; weight = Σ sign over the document's token
    occurrences (an exact BIGINT). Zero-weight dimensions (balanced
    cancellation) are dropped — they carry no information and the
    sparse contract treats absent as zero.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    bucket = (md5_int60(F.col("tok")) % dim).cast("long")
    sign = (md5_int60(F.concat(F.lit("s:"), F.col("tok"))) % 2) * 2 - 1
    return (
        toks.select(F.col(id_col), bucket.alias("dim_idx"), sign.alias("_s"))
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("_s").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def hash_embed_dense(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """(id, embedding array<long>) — the dense view of
    `hash_embed_sparse`, for composing with the vector tier
    (llm/similarity.py ANN, llm/dedup.py embedding near-dup).
    One groupBy per document; the dense array materializes only at
    this boundary, never inside the hash aggregation.

    Every input document appears in the output: a document whose
    signed weights all cancel to zero (no sparse entries) maps to the
    ZERO VECTOR rather than disappearing — the sparse view's
    absent-means-zero convention must not silently drop rows from
    downstream ANN / semdedup joins (ADVICE r5).
    """
    sparse = hash_embed_sparse(df, text_col=text_col, id_col=id_col, dim=dim)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("dim_idx"), F.col("weight")))
    )
    dense = sparse.groupBy(id_col).agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.element_at(m, i.cast("long")), F.lit(0)),
        ).alias("embedding")
    )
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return (
        df.select(id_col)
        .distinct()
        .join(dense, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("embedding"), zero).alias("embedding"))
    )


def text_knn(
    df: DataFrame,
    query_id,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    k: int = 10,
) -> DataFrame:
    """Top-k most similar documents to document ``query_id`` by
    cosine over hashed embeddings — text-to-text search with no
    external embedding table.

    cosine = dot / (√‖q‖² · √‖d‖²) with integer dot and norms, so
    both engines compute bit-identical doubles. The query vector is
    broadcast (it is one document); candidates join on dim_idx, so
    only documents sharing a non-zero dimension are scored at all.
    Returns (rank, id, dot, cosine); the query document is excluded.
    """
    sparse = hash_embed_sparse(df, text_col=text_col, id_col=id_col, dim=dim)
    norms = sparse.groupBy(id_col).agg(
        F.sum(F.col("weight") * F.col("weight")).cast("long").alias("_n2")
    )
    q = sparse.filter(F.col(id_col) == query_id).select(
        F.col("dim_idx"), F.col("weight").alias("_qw")
    )
    qn = norms.filter(F.col(id_col) == query_id).select(
        F.col("_n2").alias("_qn2")
    )
    dots = (
        sparse.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), "dim_idx")
        .groupBy(id_col)
        .agg(F.sum(F.col("weight") * F.col("_qw")).cast("long").alias("dot"))
    )
    scored = dots.join(norms, id_col).crossJoin(F.broadcast(qn)).select(
        F.col(id_col),
        "dot",
        (
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("_qn2").cast("double"))
                * F.sqrt(F.col("_n2").cast("double"))
            )
        ).alias("cosine"),
    )
    from temp_data_pipeline_spark.llm.similarity import ranked_topk

    return ranked_topk(
        scored, [F.col("cosine").desc(), F.col(id_col).asc()], k
    )
