from temp_data_pipeline_spark.eval.config import EvalConfig, ModelConfig, SplitConfig
from temp_data_pipeline_spark.eval.runner import (
    run_evaluation,
    run_multi_model_evaluation,
)

__all__ = [
    "EvalConfig",
    "ModelConfig",
    "SplitConfig",
    "run_evaluation",
    "run_multi_model_evaluation",
]
