from temp_data_pipeline_spark.llm import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
