"""Streaming session windows: batch parity + append-mode watermark
semantics (only closed sessions emit; late-but-in-window events merge)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from temp_data_pipeline_spark.streaming.sessions import (
    run_sessions_batchlike,
    user_sessions,
    watermarked_sessions,
)

SCHEMA = "user_id long, ts timestamp"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_equals_batch(spark):
    sf = "/root/testdata/sf0.001"
    got = run_sessions_batchlike(spark, sf)
    from temp_data_pipeline_spark.sources.registry import load_table

    want = (
        user_sessions(load_table(spark, sf, "events").select("user_id", "ts"))
        .orderBy("user_id", "session_start_us")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_session_merge_within_gap(spark):
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0)),
            (1, datetime(2024, 1, 1, 0, 20)),  # merges: gap 20m < 30m
            (1, datetime(2024, 1, 1, 1, 0)),  # new session: gap 40m
        ],
        SCHEMA,
    )
    got = sorted(
        (r["session_start_us"], r["n_events"]) for r in user_sessions(df).collect()
    )
    assert [n for _, n in got] == [2, 1]


def test_append_mode_emits_only_closed_sessions(spark, tmp_path):
    """With a watermark, a session emits once the watermark passes its
    close; the trailing session is withheld — the documented reason
    the conformance query uses complete mode."""
    path = str(tmp_path / "sess_src")
    # batch 1: an early session for user 1, then much-later events that
    # advance the watermark (max ts - delay) far past it
    _write(spark, path, [(1, datetime(2024, 1, 1, 0, 0)), (1, datetime(2024, 1, 1, 0, 10))])
    _write(spark, path, [(2, datetime(2024, 1, 2, 12, 0))])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    name = f"sess_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        watermarked_sessions(stream, gap="30 minutes", delay="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    # user 1's session closed (watermark = Jan 2 11:00 >> close); user
    # 2's trailing session is still open → withheld
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(1, 2)]
