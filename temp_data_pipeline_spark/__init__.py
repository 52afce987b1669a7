"""temp_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference `temp-data-pipeline`
project (pandas-based station-temperature ETL + evaluation), extended
with large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md §1.4 / §4):
- DataFrame/SQL only — the logical plan is declared, Catalyst plans it.
- Lazy end-to-end chains per stage; no driver-side loops on the data path.
- Partitioned parquet lake (`partitionBy("station_id", "year")`) so
  partition pruning replaces the reference's filename conventions.
- UTC session timezone; per-station local time via `from_utc_timestamp`.
"""

from temp_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
