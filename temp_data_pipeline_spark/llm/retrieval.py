"""Lexical retrieval: corpus-wide BM25 scoring and top-k search.

Completes the retrieval triangle next to `llm/similarity.py` (vector
ANN) and `curate.top_keywords` (tf-idf keywords): given a free-text
query, rank documents by Okapi BM25 — the standard lexical baseline
every RAG / training-data search stack ships. (The reference has no
text retrieval; nearest analogue is its keyword report, SURVEY §2.)

Physical shape — NO per-term shuffle:
  - per-document term frequencies for the (few) query terms are
    map-side array expressions (`F.filter` over the token array), so
    the scan stays one map stage;
  - corpus statistics (N, Σdl, per-term document frequencies) reduce
    to ONE global aggregate row, broadcast back with a crossJoin —
    no driver collect, no shuffle wider than one row;
  - scoring is again map-only; only the final top-k pays a sort
    (TakeOrderedAndProject, k rows per partition).
  At 100 TB: ONE tokenization of the corpus — the per-document tf
  frame is persisted at the stats/scoring fork, so the stats pass
  materializes it and the scoring pass replays the cache instead of
  re-splitting every document (verdict r5: the fork used to run the
  dominant array work twice). One 1-row broadcast, one top-k.

Exactness contract (drives the DuckDB oracle): each term's BM25
contribution is quantized to integer nano-units *before* summing —
`floor(contrib · 1e9 + 0.5)` as BIGINT — so the per-document score is
an order-independent exact integer sum (the same integer-weight
pattern as llm_classifier / curation_funnel), immune to partial-
aggregation order and safe to ORDER BY across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.text import tokens


def _query_terms(query: str) -> list[str]:
    """Deduplicated query terms, first-occurrence order (duplicate
    terms in a query must not double-count their contribution)."""
    seen: dict[str, None] = {}
    for t in query.split(" "):
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def _contrib_nano(
    tf: Column, dfreq: Column, n: Column, dl: Column, avgdl: Column,
    k1: float, b: float,
) -> Column:
    """One term's BM25 contribution in integer nano-units.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson/Lucene form —
    the +1 keeps idf positive even for terms in >half the corpus)
    tf-sat = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Parenthesized to force the identical expression tree in DuckDB —
    all arithmetic except ln is IEEE-exact on both engines, and the
    nano quantization absorbs ln's last-ulp latitude.
    """
    idf = F.log(
        F.lit(1.0)
        + (n.cast("double") - dfreq.cast("double") + F.lit(0.5))
        / (dfreq.cast("double") + F.lit(0.5))
    )
    sat = (tf.cast("double") * F.lit(k1 + 1.0)) / (
        tf.cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (dl.cast("double") / avgdl))
    )
    return F.floor(idf * sat * F.lit(1e9) + F.lit(0.5)).cast("long")


def bm25_score(
    df: DataFrame,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    single_scan: bool = True,
) -> DataFrame:
    """(id, score_nano) for every document with score > 0.

    score_nano is the BM25 score in integer nano-units (see module
    docstring); divide by 1e9 for the conventional float.

    ``single_scan=True`` (default) persists the per-document tf frame
    at the stats/scoring fork so the corpus is tokenized once. The
    cache entry is held by Spark's CacheManager until released —
    one-shot callers and harnesses that sweep caches per query
    (bench.py's `spark.catalog.clearCache()`) get the fast path free;
    a long-lived service issuing many DIFFERENT queries against the
    same session should either clear the cache between queries or
    pass ``single_scan=False`` for the stateless two-scan plan.
    """
    terms = _query_terms(query)
    if not terms:
        return df.select(F.col(id_col), F.lit(0).cast("long").alias("score_nano")).limit(0)

    t = F.col("_tok")

    def _tf(term: str):
        # closure factory, NOT a default-arg lambda: a two-parameter
        # lambda makes F.filter pass (element, index) and the term
        # binding silently becomes the index column
        return F.size(F.filter(t, lambda x: x == F.lit(term)))

    # persist at the fork: stats and scoring both consume the tf
    # frame, and without the cache boundary the tokenize+filter array
    # work (the dominant cost) executes once per consumer. The cached
    # frame is (id, dl, k ints) — a sliver of the corpus bytes. NOTE:
    # CacheManager holds the entry until an explicit unpersist/
    # clearCache — see the docstring for the lifecycle contract.
    base = df.select(
        F.col(id_col),
        tokens(text_col).alias("_tok"),
    ).select(
        F.col(id_col),
        F.size(t).alias("dl"),
        *[_tf(tm).alias(f"tf{i}") for i, tm in enumerate(terms)],
    )
    if single_scan:
        base = base.persist()
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n").cast("double")
    contribs = [
        _contrib_nano(
            F.col(f"tf{i}"), F.col(f"df{i}"), F.col("n"), F.col("dl"),
            avgdl, k1, b,
        )
        for i in range(len(terms))
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        scored.select(F.col(id_col), total.alias("score_nano"))
        .filter(F.col("score_nano") > 0)
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for `query` by BM25: (rank, id, score_nano),
    rank 1 = best, ties broken by ascending id (deterministic)."""
    from temp_data_pipeline_spark.llm.similarity import ranked_topk

    scored = bm25_score(
        df, query, text_col=text_col, id_col=id_col, k1=k1, b=b
    )
    return ranked_topk(
        scored, [F.col("score_nano").desc(), F.col(id_col).asc()], k
    )


def bm25_oracle_sql(
    query: str,
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB replay of bm25_topk — identical expression tree, same
    nano quantization, same tie-break."""
    terms = _query_terms(query)
    if not terms:
        # mirror bm25_score's guard: the zero-term contribution list
        # would otherwise render as '()' — invalid SQL (ADVICE r5)
        raise ValueError("bm25_oracle_sql: query has no terms")
    # SQL-escape: real-text queries contain apostrophes, and an
    # unescaped quote terminates the literal (parser error at best)
    lits = [tm.replace("'", "''") for tm in terms]
    tf_cols = ",\n               ".join(
        f"len(list_filter(w, x -> x = '{tm}')) AS tf{i}"
        for i, tm in enumerate(lits)
    )
    df_cols = ",\n               ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        "CAST(floor(ln(1.0 + (CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        " / (CAST(df{i} AS DOUBLE) + 0.5))"
        " * ((CAST(tf{i} AS DOUBLE) * {k1p1!r}) / (CAST(tf{i} AS DOUBLE)"
        " + {k1!r} * ({omb!r} + {b!r} * (CAST(dl AS DOUBLE)"
        " / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))))"
        " * 1000000000.0 + 0.5) AS BIGINT)".format(
            i=i, k1=k1, k1p1=k1 + 1.0, b=b, omb=1.0 - b
        )
        for i in range(len(terms))
    )
    return f"""
    WITH toks AS (
        SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
    ), per_doc AS (
        SELECT {id_col}, len(w) AS dl,
               {tf_cols}
        FROM toks
    ), stats AS (
        SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
               {df_cols}
        FROM per_doc
    ), scored AS (
        SELECT {id_col}, ({contribs}) AS score_nano
        FROM per_doc, stats
    )
    SELECT CAST(row_number() OVER (ORDER BY score_nano DESC, {id_col} ASC) AS INT)
               AS rank,
           {id_col}, score_nano
    FROM scored WHERE score_nano > 0
    ORDER BY score_nano DESC, {id_col} ASC LIMIT {k}
    """
