"""LLM queries: oracle-paired ones hash-match DuckDB; rows-only ones run
and return deterministic row counts."""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.plans.llm_queries import LLM_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import assert_driver_canonicalizable, compare_query

ORACLED = sorted(n for n, s in LLM_QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in LLM_QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_llm_query_matches_duckdb(spark, name):
    compare_query(spark, LLM_QUERIES[name], SF_SMOKE)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_llm_rows_only_query_runs(spark, name):
    df = LLM_QUERIES[name].builder(spark, SF_SMOKE)
    assert_driver_canonicalizable(name, df.schema)
    n1 = df.count()
    n2 = LLM_QUERIES[name].builder(spark, SF_SMOKE).count()
    assert n1 == n2  # deterministic across runs
    assert n1 >= 0
