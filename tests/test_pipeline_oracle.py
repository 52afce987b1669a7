"""Pipeline-operator queries hash-match DuckDB (driver t2 mirror)."""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.plans.pipeline_queries import PIPELINE_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_query_matches_duckdb(spark, name):
    compare_query(spark, PIPELINE_QUERIES[name], SF_SMOKE)
