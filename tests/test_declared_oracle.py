"""Every declared conformance query (SURVEY §2.12) hash-matches DuckDB.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_ORACLE_SF to
/root/testdata/sf0.01 to reproduce the driver's t2 gate exactly.
"""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(DECLARED_QUERIES))
def test_declared_query_matches_duckdb(spark, name):
    spec = DECLARED_QUERIES[name]
    assert spec.oracle is not None
    compare_query(spark, spec, SF_SMOKE)
