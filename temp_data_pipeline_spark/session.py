"""SparkSession factory with scale-oriented defaults.

Every entry point in the engine goes through :func:`get_spark` so that
the session settings that correctness depends on (UTC timezone, ANSI
off for permissive casts, Arrow for pandas interchange) and the
settings performance depends on (AQE, skew-join handling, broadcast
threshold) are applied uniformly.

The reference pins no session config at all (single-process pandas);
these settings are the Spark-native equivalent of its implicit
assumptions: timestamps are UTC (`schemas/validate.py` in the
reference requires tz-aware UTC), and stages are idempotent re-runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test parallelism. On a real cluster these come from
# spark-submit / cluster manager config instead.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "temp_data_pipeline_spark") -> SparkSession:
    """Return (or create) the engine's SparkSession.

    Scale posture: AQE on (runtime coalescing of shuffle partitions,
    skew-join splitting, dynamic join-strategy switch), auto-broadcast
    for dim tables, UTC session tz so local-date math is explicit via
    ``from_utc_timestamp(ts, tz)``.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{_DEFAULT_CPUS}]"))
        # -- correctness-bearing --
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet timestamps in the lake are written/read as UTC instants
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # -- scale-bearing --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-optimize (coalesce) the output partitioning of
        # cached plans: a persisted delta-sized CDC feed otherwise
        # materializes with the full shuffle-partition fan-out, and a
        # MOR append written from it emits one near-empty file per
        # partition — every later position scan then pays a task per
        # tiny file. Scale-neutral: AQE sizes partitions by bytes
        # (advisoryPartitionSizeInBytes), so a genuinely large cached
        # frame keeps its parallelism.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", _DEFAULT_CPUS),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def ensure_parallelism(df):
    """Repartition a DataFrame up to the cluster's core count when the
    source produced fewer partitions (e.g. one small parquet file →
    one partition → CPU-bound array/hash work runs on a single core).

    No-op when the scan is already parallel (the 100 TB case: thousands
    of file splits), so it never *adds* a shuffle on the big-data path
    — it only rescues the small-file-single-split case.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
