"""Streaming sessionization: the native session-window operator under
Structured Streaming.

Batch q_session_window proves the session assignment; this module
runs the SAME aggregation as a stream. Two modes:

- ``user_sessions``: the shared aggregation (works on batch or
  streaming frames — one definition, two engines).
- ``run_sessions_batchlike``: availableNow over the static events
  table into a memory sink in complete mode, so the streaming
  operator's final state is hash-comparable to the batch oracle.
  Complete mode (not append) because append only emits sessions
  already closed by the watermark — trailing sessions would be
  withheld and the result could never equal the batch answer.
- ``watermarked_sessions``: the production shape (watermark +
  append) for unbounded streams, where emitting only closed sessions
  is exactly what you want; its late-data semantics are pinned by
  tests/test_streaming_sessions.py.

At scale: session state is partitioned by user_id in the state store;
the 30-minute gap bounds how long a session can stay open, and the
watermark bounds state size in append mode.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.sources.registry import events_stream


def user_sessions(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user via the native session operator."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_last_us"),
        )
        .select("user_id", "session_start_us", "session_last_us", "n_events")
    )


def watermarked_sessions(
    stream: DataFrame, gap: str = "30 minutes", delay: str = "1 hour"
) -> DataFrame:
    """Append-mode production form: only watermark-closed sessions emit."""
    return user_sessions(stream.withWatermark("ts", delay), gap)


def run_sessions_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the streaming session operator over static events
    (availableNow → memory sink, complete mode) and return the final
    table — comparable to the batch q_session_window oracle."""
    # footer-probed unit handling lives in registry.events_stream
    stream = events_stream(spark, sf_dir).select("user_id", "ts")
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            user_sessions(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink).orderBy("user_id", "session_start_us")
