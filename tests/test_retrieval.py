"""BM25 lexical retrieval (llm/retrieval.py): hand-checked golden
scores, invariants, and the one-aggregate/no-per-term-shuffle plan."""

from __future__ import annotations

import math

import pytest

from temp_data_pipeline_spark.llm.retrieval import (
    _query_terms,
    bm25_score,
    bm25_topk,
)

DOCS = [
    (1, "hash join hash join hash"),
    (2, "sort merge join"),
    (3, "table scan only here"),
    (4, "hash"),
]


def _py_bm25(docs, query, k1=1.2, b=0.75):
    """Sequential reference model with the same nano quantization."""
    terms = _query_terms(query)
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {
        tm: sum(1 for w in toks.values() if tm in w) for tm in terms
    }
    out = {}
    for i, w in toks.items():
        dl = len(w)
        s = 0
        for tm in terms:
            tf = w.count(tm)
            idf = math.log(1.0 + (n - dfreq[tm] + 0.5) / (dfreq[tm] + 0.5))
            sat = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            )
            s += math.floor(idf * sat * 1e9 + 0.5)
        if s > 0:
            out[i] = s
    return out


def test_bm25_matches_python_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score_nano"]
        for r in bm25_score(df, "hash join").collect()
    }
    assert got == _py_bm25(DOCS, "hash join")


def test_bm25_topk_rank_and_tiebreak(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(df, "hash join", k=3).collect()
    want = sorted(
        _py_bm25(DOCS, "hash join").items(), key=lambda kv: (-kv[1], kv[0])
    )[:3]
    assert [(r["rank"], r["doc_id"], r["score_nano"]) for r in rows] == [
        (i + 1, d, s) for i, (d, s) in enumerate(want)
    ]
    # doc 3 has no query term -> excluded entirely
    assert 3 not in {r["doc_id"] for r in rows}


def test_bm25_duplicate_query_terms_count_once(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    once = {r["doc_id"]: r["score_nano"]
            for r in bm25_score(df, "hash join").collect()}
    doubled = {r["doc_id"]: r["score_nano"]
               for r in bm25_score(df, "hash hash join join").collect()}
    assert once == doubled


def test_bm25_empty_query_is_empty(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert bm25_score(df, "").count() == 0


def test_bm25_plan_has_no_per_term_shuffle(spark):
    # contract: one global aggregate + one broadcast back; no explode,
    # no per-term exchange, no python UDF
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_topk(df, "hash join stream", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("query", ["hash", "hash join stream table"])
def test_bm25_oracle_matches_duckdb_inline(spark, query):
    # end-to-end against DuckDB on the same tiny corpus (the sf0.01
    # registration is exercised by test_llm_oracle; this pins the
    # oracle generator itself for arbitrary queries)
    import duckdb

    from temp_data_pipeline_spark.llm.retrieval import bm25_oracle_sql

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["rank"], r["doc_id"], r["score_nano"])
        for r in bm25_topk(df, query, k=4).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = con.execute(bm25_oracle_sql(query, k=4)).fetchall()
    assert got == [tuple(w) for w in want]


def test_bm25_oracle_escapes_quoted_terms(spark):
    # review r5: unescaped apostrophes terminated the SQL literal
    import duckdb

    from temp_data_pipeline_spark.llm.retrieval import bm25_oracle_sql

    docs = [(1, "don't panic now"), (2, "panic later"), (3, "calm")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["rank"], r["doc_id"], r["score_nano"])
           for r in bm25_topk(df, "don't panic", k=3).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = con.execute(bm25_oracle_sql("don't panic", k=3)).fetchall()
    assert got == [tuple(w) for w in want]


def test_bm25_empty_query_oracle_raises(spark):
    """bm25_oracle_sql must mirror bm25_score's empty-terms guard
    instead of emitting '()' — invalid SQL (ADVICE r5)."""
    from temp_data_pipeline_spark.llm.retrieval import bm25_oracle_sql

    with pytest.raises(ValueError, match="no terms"):
        bm25_oracle_sql("   ")


def test_bm25_tokenizes_corpus_once(spark):
    """The stats/scoring fork shares ONE persisted tf frame: the
    scoring side of the plan must replay the cache, not re-run the
    tokenize+filter scan (verdict r5 item 5)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    scored = bm25_score(df, "hash join")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
