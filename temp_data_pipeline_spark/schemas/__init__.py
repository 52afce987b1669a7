from temp_data_pipeline_spark.schemas import qc_flags
from temp_data_pipeline_spark.schemas.tables import (
    DAILY_TMAX_FIELDS,
    DAILY_TMAX_FORECAST_FIELDS,
    DAILY_TMAX_FORECAST_SCHEMA,
    DAILY_TMAX_SCHEMA,
    HOURLY_OBS_FIELDS,
    HOURLY_OBS_SCHEMA,
    TRAIN_DAILY_TMAX_FIELDS,
    TRAIN_DAILY_TMAX_SCHEMA,
)

__all__ = [
    "qc_flags",
    "HOURLY_OBS_FIELDS",
    "HOURLY_OBS_SCHEMA",
    "DAILY_TMAX_FIELDS",
    "DAILY_TMAX_SCHEMA",
    "DAILY_TMAX_FORECAST_FIELDS",
    "DAILY_TMAX_FORECAST_SCHEMA",
    "TRAIN_DAILY_TMAX_FIELDS",
    "TRAIN_DAILY_TMAX_SCHEMA",
]
