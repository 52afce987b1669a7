from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES, QuerySpec

__all__ = ["DECLARED_QUERIES", "QuerySpec"]
