"""Corpus-mix report: rollup arithmetic + single-shuffle plan gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.curate import corpus_report


def _docs(spark):
    rows = [
        (1, "a b c", "en", "web"),
        (2, "d e", "en", "web"),
        (3, "f g h i", "de", "web"),
        (4, "j", "de", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")


def test_rollup_levels_consistent(spark):
    rep = {(r["source"], r["lang"]): r.asDict() for r in corpus_report(_docs(spark)).collect()}
    assert rep[("<all>", "<all>")]["n_docs"] == 4
    assert rep[("<all>", "<all>")]["n_tokens"] == 10
    assert rep[("web", "<all>")]["n_docs"] == 3
    assert rep[("web", "en")]["n_tokens"] == 5
    assert rep[("books", "de")]["n_docs"] == 1
    # leaf rows sum to their rollups
    leaves = [v for (s, l), v in rep.items() if s != "<all>" and l != "<all>"]
    assert sum(v["n_tokens"] for v in leaves) == rep[("<all>", "<all>")]["n_tokens"]


def test_median_and_mean(spark):
    rep = {(r["source"], r["lang"]): r.asDict() for r in corpus_report(_docs(spark)).collect()}
    # en tokens per doc: 3, 2 → median 2.5 ; chars: 5, 3 → mean 4.0
    assert rep[("<all>", "en")]["p50_tokens"] == 2.5
    assert rep[("<all>", "en")]["avg_chars"] == 4.0


def test_one_shuffle_for_all_levels(spark):
    plan = corpus_report(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" in plan
