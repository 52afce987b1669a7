"""SQL surface: the engine's tables are queryable through plain
spark.sql after register_temp_views — a user can run the declared
conformance SQL directly, not only the DataFrame builders."""

from __future__ import annotations

from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES
from temp_data_pipeline_spark.sources.registry import register_temp_views

SF = "/root/testdata/sf0.001"

# Oracle SQL that is also valid Spark SQL with identical result types.
# Float-rounding queries are excluded: Spark SQL parses `100.0` as
# DECIMAL where DuckDB uses DOUBLE, so those stay DataFrame-only.
PORTABLE = ["q_scan", "q_filter", "q_dedup", "q_case", "q_multijoin", "q_union"]


def test_spark_sql_matches_dataframe_builders(spark):
    register_temp_views(spark, SF)
    for name in PORTABLE:
        spec = DECLARED_QUERIES[name]
        via_sql = [tuple(r) for r in spark.sql(spec.oracle).collect()]
        via_df = [tuple(r) for r in spec.builder(spark, SF).collect()]
        assert via_sql == via_df, name


def test_ad_hoc_sql(spark):
    register_temp_views(spark, SF)
    [row] = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS cnt
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY cnt DESC, n.n_name LIMIT 1
        """
    ).collect()
    assert row["cnt"] > 0
