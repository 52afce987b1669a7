from temp_data_pipeline_spark.operators.clean_hourly import clean_hourly_obs
from temp_data_pipeline_spark.operators.daily_tmax import build_daily_tmax
from temp_data_pipeline_spark.operators.features import build_train_daily_tmax

__all__ = ["clean_hourly_obs", "build_daily_tmax", "build_train_daily_tmax"]
