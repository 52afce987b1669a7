"""Streaming ingest of hourly observations.

Batch reference: clean/clean_hourly.py (dedup → flag). The stateless
flag expressions are literally the batch operators reused on a
streaming frame; dedup becomes watermark-scoped
``dropDuplicatesWithinWatermark`` (state store bounded by the
watermark instead of a global window), and the hour-to-hour spike
detector — a lag() in batch, which streaming can't express — becomes
an ``applyInPandasWithState`` operator keyed by station carrying the
last (ts, temp) pair.

Scale posture: state is per-station and O(1); watermark bounds the
dedup store; no operation collects to the driver. File-source ingest
means new year/issue parquet drops are picked up incrementally — the
streaming version of the reference's append-new-partition model.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from temp_data_pipeline_spark.operators.clean_hourly import (
    SPIKE_THRESHOLD_C,
    flag_missing_values,
    flag_out_of_range,
)
from temp_data_pipeline_spark.schemas.qc_flags import QC_SPIKE_DETECTED
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_SCHEMA

_SPIKE_STATE_SCHEMA = "last_ts timestamp, last_temp double"
_SPIKE_OUT_SCHEMA = (
    "ts_utc timestamp, station_id string, lat double, lon double, "
    "temp_c double, source string, qc_flags long"
)


def stream_hourly_obs(
    spark: SparkSession,
    input_path: str,
    fmt: str = "parquet",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source stream of hourly_obs → watermarked dedup + stateless
    QC flags. Returns a streaming DataFrame; attach a sink with
    ``writeStream``."""
    stream = (
        spark.readStream.format(fmt)
        .schema(HOURLY_OBS_SCHEMA)
        .load(input_path)
        .withWatermark("ts_utc", watermark)
        .dropDuplicatesWithinWatermark(["station_id", "ts_utc"])
    )
    return flag_out_of_range(flag_missing_values(stream))


def stream_dedup_documents(
    doc_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup of a document stream (the continuous
    counterpart of llm/dedup.exact_dedup, per the streaming-similarity
    family in PAPERS.md): key on a 64-bit content hash so the dedup
    state stores 8 bytes per doc, never the text, and expires with the
    watermark. Near-dup variants key on the simhash/minhash signature
    columns instead — same operator shape.
    """
    from pyspark.sql import functions as F

    hashed = doc_stream.withColumn("_content_hash", F.xxhash64(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["_content_hash"]
    )


def _spike_fn(threshold: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, last_temp = state.get
        else:
            last_ts, last_temp = None, None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_utc")
            flags = pdf["qc_flags"].to_numpy().copy()
            temps = pdf["temp_c"].to_numpy()
            for i in range(len(pdf)):
                t = temps[i]
                if (
                    t == t  # not NaN
                    and last_temp is not None
                    and last_temp == last_temp
                    and abs(t - last_temp) > threshold
                ):
                    flags[i] |= QC_SPIKE_DETECTED
                if t == t:
                    last_temp = float(t)
                    last_ts = pdf["ts_utc"].iloc[i].to_pydatetime()
            pdf = pdf.assign(qc_flags=flags)
            yield pdf
        if last_ts is not None:
            state.update((last_ts, last_temp))

    return fn


def flag_spikes_stateful(
    df: DataFrame, threshold: float = SPIKE_THRESHOLD_C
) -> DataFrame:
    """Streaming spike detector: per-station state carries the last
    observed (ts, temp) across micro-batches, so a spike spanning a
    batch boundary is still flagged.

    Caveat vs batch flag_spikes: correct only for in-order arrival
    within the watermark (the batch operator re-sorts globally; a
    stream cannot). Out-of-order rows inside one micro-batch are
    sorted before the scan, matching batch behavior for that batch.
    """
    return df.groupBy("station_id").applyInPandasWithState(
        _spike_fn(threshold),
        outputStructType=_SPIKE_OUT_SCHEMA,
        stateStructType=_SPIKE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_events_dedup_batchlike(spark: SparkSession, sf_dir: str):
    """Drive ``dropDuplicatesWithinWatermark`` end-to-end for the
    conformance harness: the event stream is deterministically DOUBLED
    first (every 10th event emitted twice via explode) so the dedup
    has real work, and the watermarked exact dedup on event_id must
    collapse the stream back to exactly the source rows — the oracle
    is a plain batch SELECT of events. State carries one 8-byte key
    per event inside the watermark and expires with it, the property
    that makes this operator viable on unbounded streams (plain
    dropDuplicates state grows forever).

    availableNow over one parquet source runs as a single micro-batch,
    so the initial watermark cannot drop any of the injected
    duplicates' originals — the collapse is exact, not approximate.
    """
    import uuid as _uuid

    from pyspark.sql import functions as F

    from temp_data_pipeline_spark.sources.registry import events_stream

    stream = events_stream(spark, sf_dir)
    doubled = stream.withColumn(
        "_copy",
        F.explode(
            F.when(
                F.col("event_id") % 10 == 0, F.array(F.lit(1), F.lit(2))
            ).otherwise(F.array(F.lit(1)))
        ),
    ).drop("_copy")
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", F.unix_micros("ts").alias("ts_us"), "user_id")
    )
    sink = f"events_dedup_{_uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # materialize, then drop the memory-sink view: each run's sink
    # otherwise holds a full event-table copy in driver memory for
    # the session's lifetime (the harness runs builders repeatedly)
    out = spark.table(sink).orderBy("event_id").localCheckpoint()
    spark.catalog.dropTempView(sink)
    return out
