"""Stream-stream joins: watermarked interval equi-joins.

The batch `operators/temporal.py::range_join` finds, per left event,
the right-side events within a bounded time window. The streaming
form joins two UNBOUNDED streams under the same condition; Spark
keeps both sides' recent rows in state and needs two things to bound
that state:

1. watermarks on both streams (how late data may arrive), and
2. a time-interval predicate tying the two event times together —
   from which Spark derives per-side state retention (left rows can
   be dropped once no future right row could match, and vice versa).

Without #2 a stream-stream join's state grows forever; with it state
is O(watermark + interval) per key — the design that scales to an
unbounded 100 TB/day feed.

`run_interval_join_batchlike` replays the same operator over static
data with an availableNow trigger so tests (and the oracle tier) can
hash-compare the streaming result against the batch range join.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.sources.registry import events_stream


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys + a bounded time interval:
    right.ts ∈ [left.ts + lower, left.ts + upper]. Columns from both
    sides come out prefixed-free; right's ts is aliased `right_ts`
    if the names collide."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    l_ts, r_ts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    interval = (
        r_ts >= l_ts + F.expr(f"INTERVAL {lower_seconds} SECONDS")
    ) & (r_ts <= l_ts + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    cond = interval if cond is None else (cond & interval)
    return lw.join(rw, cond, how)


def run_interval_join_batchlike(
    spark: SparkSession,
    sf_dir: str,
    lower_seconds: float = 0.0,
    upper_seconds: float = 3600.0,
) -> DataFrame:
    """Streaming purchases⋈clicks-within-an-hour over the static
    events table (availableNow → memory sink), returned as a batch
    frame: (purchase event_id, user_id, matched click event_id,
    both timestamps as epoch micros)."""
    def stream():
        # footer-probed unit handling lives in registry.events_stream
        return events_stream(spark, sf_dir)

    purchases = stream().filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    clicks = stream().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id"), F.col("ts").alias("c_ts")
    )
    joined = stream_interval_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="p_ts",
        right_ts="c_ts",
        lower_seconds=lower_seconds,
        upper_seconds=upper_seconds,
    )
    out = joined.select(
        F.col("p_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("c_id"),
        F.unix_micros("p_ts").alias("p_us"),
        F.unix_micros("c_ts").alias("c_us"),
    )
    sink = f"sj_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink).orderBy("p_id", "c_id")
