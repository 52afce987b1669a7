"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator family from SURVEY.md §2
(declared conformance queries + LLM-data-pipeline operators).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible operators, which the driver checks
rows-only).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _all_specs():
    from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES

    specs = dict(DECLARED_QUERIES)
    try:
        from temp_data_pipeline_spark.plans.llm_queries import LLM_QUERIES

        specs.update(LLM_QUERIES)
    except ImportError:
        pass
    try:
        from temp_data_pipeline_spark.plans.pipeline_queries import PIPELINE_QUERIES

        specs.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    try:
        from temp_data_pipeline_spark.plans.function_queries import FUNCTION_QUERIES

        specs.update(FUNCTION_QUERIES)
    except ImportError:
        pass
    try:
        from temp_data_pipeline_spark.plans.streaming_queries import STREAMING_QUERIES

        specs.update(STREAMING_QUERIES)
    except ImportError:
        pass
    try:
        from temp_data_pipeline_spark.plans.temporal_queries import TEMPORAL_QUERIES

        specs.update(TEMPORAL_QUERIES)
    except ImportError:
        pass
    try:
        from temp_data_pipeline_spark.plans.relational_queries import (
            RELATIONAL_QUERIES,
        )

        specs.update(RELATIONAL_QUERIES)
    except ImportError:
        pass
    return specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses q_agg (the TPC-H Q1 shape): scan → partial agg → shuffle →
    final agg → sort, i.e. every structural layer of the engine.
    """
    from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES

    return DECLARED_QUERIES["q_agg"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in _all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (same parquet views)."""
    return {
        name: spec.oracle for name, spec in _all_specs().items() if spec.oracle is not None
    }
