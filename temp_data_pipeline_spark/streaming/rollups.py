"""Streaming rollups: tumbling windows over event time.

- :func:`stream_daily_tmax` — the streaming analog of the batch
  aggregate stage (aggregate/build_daily_tmax.py ≙ operators/
  daily_tmax.py): one local-calendar-day tumbling window per station,
  max valid temp + distinct-hour coverage + bit_or QC roll-up.
- :func:`events_hourly_rollup` — per-user events-per-hour counts, the
  logical twin of the batch q_events_window conformance query; the
  availableNow runner lets the driver's oracle check the streaming
  path against the same DuckDB SQL.

Design notes for scale: watermarks bound all state; aggregations are
partial (map-side) before the keyed shuffle exactly as in batch;
``size(collect_set(hour))`` replaces countDistinct (unsupported in
streaming aggs) — ≤24 ints per open window, so state stays tiny.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import c_to_f
from temp_data_pipeline_spark.schemas.qc_flags import QC_OUT_OF_RANGE
from temp_data_pipeline_spark.sources.registry import events_stream


def stream_daily_tmax(
    hourly_stream: DataFrame,
    tz: str = "UTC",
    watermark: str = "3 hours",
) -> DataFrame:
    """Streaming daily-Tmax: tumbling 1-day window on local time.

    Validity matches batch daily_tmax: temp not null and not
    OOR-flagged (spikes included by design). Emits one row per
    (station, local day) with tmax_c/f, coverage_hours, qc_flags.
    """
    local_ts = F.from_utc_timestamp(F.col("ts_utc"), tz)
    is_valid = F.col("temp_c").isNotNull() & (
        F.col("qc_flags").bitwiseAND(QC_OUT_OF_RANGE) == 0
    )
    prepared = (
        hourly_stream.withColumn("local_ts", local_ts)
        .withColumn("temp_valid", F.when(is_valid, F.col("temp_c")))
        .withColumn("hour_valid", F.when(is_valid, F.hour("local_ts")))
        .withWatermark("local_ts", watermark)
    )
    agg = (
        prepared.groupBy(F.window("local_ts", "1 day").alias("w"), F.col("station_id"))
        .agg(
            F.max("temp_valid").alias("tmax_c"),
            F.size(F.collect_set("hour_valid")).alias("coverage_hours"),
            F.expr("bit_or(qc_flags)").alias("qc_flags"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("date_local"),
            "station_id",
            "tmax_c",
            (F.floor(c_to_f("tmax_c") * 10.0 + F.lit(0.5)) / 10.0).alias("tmax_f"),
            "coverage_hours",
            "qc_flags",
        )
    )
    return agg


def events_hourly_rollup(spark: SparkSession, events_stream: DataFrame) -> DataFrame:
    """Per-user tumbling-hour event counts (streaming twin of
    q_events_window)."""
    return (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("h"),
            "n",
        )
    )


def run_events_rollup_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming rollup over the static events table with an
    availableNow trigger into a memory sink, then return the (batch)
    result ordered — hash-comparable to the q_events_window oracle.

    The physical-timestamp-unit handling lives in ONE place —
    sources/registry.events_stream — which probes the parquet footer
    and builds the right readStream schema for ns or µs files.
    """
    stream = events_stream(spark, sf_dir)
    sink = f"events_rollup_{uuid.uuid4().hex[:8]}"
    # a streaming stateful operator builds one state-store instance per
    # shuffle partition at query start; at conformance scale that setup
    # dominates wall-clock, so pin the stream's partitioning low and
    # restore the session value after (result is partitioning-invariant)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            events_hourly_rollup(spark, stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink).orderBy("user_id", "h")
