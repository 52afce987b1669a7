"""Structured Streaming tests — every streaming query is pinned to its
batch equivalent (same inputs, same expected rows), run via the
availableNow trigger into memory sinks so tests are deterministic.
"""

from __future__ import annotations

import uuid
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.schemas.qc_flags import (
    QC_MISSING_VALUE,
    QC_OUT_OF_RANGE,
    QC_SPIKE_DETECTED,
)
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_SCHEMA
from temp_data_pipeline_spark.streaming import (
    flag_spikes_stateful,
    run_events_rollup_batchlike,
    stream_daily_tmax,
    stream_hourly_obs,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _write_hourly(spark, path, rows):
    df = spark.createDataFrame(rows, HOURLY_OBS_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def _run_stream(df, mode="append"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def _row(ts, temp, station="KLGA", source="isd", qc=0):
    return (ts, station, 40.7, -73.8, temp, source, qc)


def test_stream_ingest_dedup_and_flags(spark, tmp_path):
    path = str(tmp_path / "hourly")
    _write_hourly(
        spark,
        path,
        [
            _row(datetime(2024, 1, 1, 0), 10.0),
            _row(datetime(2024, 1, 1, 0), 11.0, source="ghcnh"),  # dup ts
            _row(datetime(2024, 1, 1, 1), None),  # missing
            _row(datetime(2024, 1, 1, 2), 99.0),  # out of range
        ],
    )
    stream = stream_hourly_obs(spark, path)
    assert stream.isStreaming
    name = _run_stream(stream)
    rows = {r["ts_utc"]: r for r in spark.table(name).collect()}
    assert len(rows) == 3  # duplicate ts collapsed
    assert rows[datetime(2024, 1, 1, 1)]["qc_flags"] & QC_MISSING_VALUE
    oor = rows[datetime(2024, 1, 1, 2)]
    assert oor["qc_flags"] & QC_OUT_OF_RANGE and oor["temp_c"] is None


def test_stateful_spike_across_batches(spark, tmp_path):
    """Spike spanning a micro-batch boundary is flagged: the state
    carries the last temp from batch 1 into batch 2."""
    path = str(tmp_path / "hourly2")
    _write_hourly(spark, path, [_row(datetime(2024, 1, 1, 0), 10.0)])
    _write_hourly(spark, path, [_row(datetime(2024, 1, 1, 1), 30.0)])  # +20 spike

    stream = (
        spark.readStream.schema(HOURLY_OBS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .withWatermark("ts_utc", "2 hours")
    )
    name = _run_stream(flag_spikes_stateful(stream))
    rows = {r["ts_utc"]: r for r in spark.table(name).collect()}
    assert len(rows) == 2
    assert not rows[datetime(2024, 1, 1, 0)]["qc_flags"] & QC_SPIKE_DETECTED
    assert rows[datetime(2024, 1, 1, 1)]["qc_flags"] & QC_SPIKE_DETECTED


def test_stream_daily_tmax_matches_batch_semantics(spark, tmp_path):
    """Golden values from the batch aggregate tests: max of valid
    temps, OOR excluded, distinct-hour coverage, bit_or roll-up."""
    path = str(tmp_path / "hourly3")
    _write_hourly(
        spark,
        path,
        [
            _row(datetime(2024, 1, 1, 5), 10.0),
            _row(datetime(2024, 1, 1, 6), 12.5),
            _row(datetime(2024, 1, 1, 6, 30), 11.0),  # same hour → 1 coverage
            _row(datetime(2024, 1, 1, 7), None, qc=QC_MISSING_VALUE),
            _row(datetime(2024, 1, 2, 5), 3.0),
        ],
    )
    stream = spark.readStream.schema(HOURLY_OBS_SCHEMA).parquet(path)
    name = _run_stream(stream_daily_tmax(stream, tz="UTC"), mode="complete")
    rows = {str(r["date_local"]): r for r in spark.table(name).collect()}
    d1 = rows["2024-01-01"]
    assert d1["tmax_c"] == pytest.approx(12.5)
    assert d1["tmax_f"] == pytest.approx(54.5)
    assert d1["coverage_hours"] == 2  # valid hours {5, 6}; null row adds none
    assert d1["qc_flags"] == QC_MISSING_VALUE
    assert rows["2024-01-02"]["tmax_c"] == pytest.approx(3.0)


def test_stream_daily_tmax_local_tz_window(spark, tmp_path):
    """02:00 UTC on 2024-06-01 is 2024-05-31 local in New York — the
    daily window must bucket by local calendar day."""
    path = str(tmp_path / "hourly4")
    _write_hourly(spark, path, [_row(datetime(2024, 6, 1, 2), 20.0)])
    stream = spark.readStream.schema(HOURLY_OBS_SCHEMA).parquet(path)
    name = _run_stream(
        stream_daily_tmax(stream, tz="America/New_York"), mode="complete"
    )
    [r] = spark.table(name).collect()
    assert str(r["date_local"]) == "2024-05-31"


def test_events_rollup_matches_batch(spark):
    """The streaming hourly rollup over the static events table equals
    the batch q_events_window result (the oracle-checked query)."""
    from temp_data_pipeline_spark.plans.declared import DECLARED_QUERIES

    got = run_events_rollup_batchlike(spark, SF_SMOKE).collect()
    want = DECLARED_QUERIES["q_events_window"].builder(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_stream_dedup_documents_across_batches(spark, tmp_path):
    """Duplicate text arriving in a later micro-batch is dropped while
    the watermark holds its content hash."""
    from temp_data_pipeline_spark.streaming import stream_dedup_documents

    path = str(tmp_path / "docs")
    schema = "doc_id long, text string, ingest_ts timestamp"
    spark.createDataFrame(
        [(1, "alpha beta", datetime(2024, 1, 1, 0, 0)),
         (2, "gamma delta", datetime(2024, 1, 1, 0, 1))], schema
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "alpha beta", datetime(2024, 1, 1, 0, 2)),  # dup of doc 1
         (4, "epsilon", datetime(2024, 1, 1, 0, 3))], schema
    ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    name = _run_stream(stream_dedup_documents(stream))
    kept_texts = sorted(r["text"] for r in spark.table(name).collect())
    assert kept_texts == ["alpha beta", "epsilon", "gamma delta"]


def test_stream_upsert_parquet_across_batches(spark, tmp_path):
    """CDC apply: per-key versions spread over micro-batches resolve to
    last-writer-wins; the landed snapshot equals a batch keep_latest
    over the full history."""
    from temp_data_pipeline_spark.operators.upsert import keep_latest
    from temp_data_pipeline_spark.streaming.sink import stream_upsert_parquet

    src = str(tmp_path / "changes")
    schema = "k long, ts timestamp, v string"
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0), "v1"), (2, datetime(2024, 1, 1, 0), "a1")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, datetime(2024, 1, 2, 0), "v2"), (3, datetime(2024, 1, 1, 0), "new")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    dest = str(tmp_path / "snapshot")
    q = stream_upsert_parquet(
        stream, dest, str(tmp_path / "ckpt"), keys=["k"], ts_col="ts"
    )
    q.awaitTermination()

    got = {r["k"]: r["v"] for r in spark.read.parquet(dest).collect()}
    history = spark.read.parquet(src)
    want = {r["k"]: r["v"] for r in keep_latest(history, ["k"], "ts").collect()}
    assert got == want == {1: "v2", 2: "a1", 3: "new"}


def test_stream_append_parquet_sink(spark, tmp_path):
    from temp_data_pipeline_spark.streaming.sink import stream_append_parquet

    src = str(tmp_path / "in")
    schema = "k long, ts timestamp, v string"
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "x"), (2, datetime(2024, 1, 2), "y")], schema
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_append_parquet(stream, str(tmp_path / "out"), str(tmp_path / "ck2"))
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2


def test_stream_interval_join_matches_batch(spark):
    """The watermarked stream-stream interval join over the static
    events table must equal the batch bounded-window join."""
    from temp_data_pipeline_spark.sources.registry import load_table
    from temp_data_pipeline_spark.streaming.joins import run_interval_join_batchlike

    got = run_interval_join_batchlike(spark, "/root/testdata/sf0.001")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"))
    want = (
        p.join(c, (F.col("user_id") == F.col("cu"))
               & (F.col("c_ts") >= F.col("p_ts"))
               & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 3600 SECONDS")))
        .select("p_id", "user_id", "c_id",
                F.unix_micros("p_ts").alias("p_us"),
                F.unix_micros("c_ts").alias("c_us"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_stream_dedup_query_collapses_injected_duplicates(spark):
    """q_stream_dedup doubles every 10th event then dedups within the
    watermark — output must equal the plain batch event set exactly."""
    from temp_data_pipeline_spark.plans.streaming_queries import STREAMING_QUERIES
    from tests.oracle_harness import compare_query

    compare_query(spark, STREAMING_QUERIES["q_stream_dedup"], SF_SMOKE)


def test_stream_append_versioned_exactly_once(spark, tmp_path):
    """Micro-batches land as metadata-level versioned commits; a second
    run over the same source + checkpoint replays nothing, and a
    direct foreachBatch replay of an already-committed batch id is
    skipped (manifest high-water mark)."""
    from temp_data_pipeline_spark.operators.versioned import (
        read_manifest,
        read_version,
        versions,
    )
    from temp_data_pipeline_spark.streaming.sink import stream_append_versioned

    src = str(tmp_path / "vin")
    schema = "k long, ts timestamp, v string"
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "a"), (2, datetime(2024, 1, 1), "b")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, datetime(2024, 1, 2), "c")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    dest, ckpt = str(tmp_path / "vtable"), str(tmp_path / "vck")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_append_versioned(stream, dest, ckpt)
    q.awaitTermination()

    vs = versions(spark, dest)
    assert len(vs) == 2  # one commit per micro-batch
    assert {r["k"] for r in read_version(spark, dest).collect()} == {1, 2, 3}
    # second commit is metadata-level: references the first's dir
    man2 = read_manifest(spark, dest, vs[-1])
    assert len(man2["data_dirs"]) == 2

    # restart over the same checkpoint: no new data → no new versions
    q2 = stream_append_versioned(
        spark.readStream.schema(schema).parquet(src), dest, ckpt
    )
    q2.awaitTermination()
    assert versions(spark, dest) == vs
    assert read_version(spark, dest).count() == 3

    # the high-water mark the replay guard consults: two batches
    # committed as ids 0 and 1 — any replayed id ≤ 1 is skipped
    high = max(
        read_manifest(spark, dest, v).get("_stream_batch_id", -1)
        for v in versions(spark, dest)
    )
    assert high == 1

    # new data + restart: ingestion continues after the replay window
    spark.createDataFrame(
        [(4, datetime(2024, 1, 4), "d")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q3 = stream_append_versioned(
        spark.readStream.schema(schema).parquet(src), dest, ckpt
    )
    q3.awaitTermination()
    assert {r["k"] for r in read_version(spark, dest).collect()} == {1, 2, 3, 4}
    assert read_version(spark, dest).count() == 4


def test_stream_versioned_query_matches_oracle(spark):
    """q_stream_versioned: ingest → restart → read_version must equal
    the plain batch SELECT (DuckDB oracle), proving the sink is
    transparent and exactly-once end-to-end."""
    from temp_data_pipeline_spark.plans.streaming_queries import STREAMING_QUERIES
    from tests.oracle_harness import compare_query

    compare_query(spark, STREAMING_QUERIES["q_stream_versioned"], SF_SMOKE)


def test_stream_append_versioned_maintains_zone_maps(spark, tmp_path):
    """stats_columns keeps the sidecar fresh per micro-batch, so the
    live table is skippable mid-ingestion."""
    from temp_data_pipeline_spark.operators.versioned import versions
    from temp_data_pipeline_spark.operators.zonemap import (
        read_version_skipped,
        read_zone_maps,
    )
    from temp_data_pipeline_spark.streaming.sink import stream_append_versioned

    src = str(tmp_path / "zin")
    schema = "k long, v double"
    spark.createDataFrame([(i, float(i)) for i in range(100)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(i, float(i)) for i in range(100, 200)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    dest, ckpt = str(tmp_path / "ztab"), str(tmp_path / "zck")
    q = stream_append_versioned(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        dest,
        ckpt,
        stats_columns=["v"],
    )
    q.awaitTermination()
    latest = versions(spark, dest)[-1]
    zm = read_zone_maps(spark, dest, latest)
    assert zm.count() == 2  # one file per micro-batch, both covered
    out = read_version_skipped(spark, dest, [("v", ">=", 150.0)], version=latest)
    assert out.count() == 50


def test_stream_append_versioned_maintains_bloom(spark, tmp_path):
    from temp_data_pipeline_spark.operators.versioned import versions
    from temp_data_pipeline_spark.operators.zonemap import read_version_bloom
    from temp_data_pipeline_spark.streaming.sink import stream_append_versioned

    src = str(tmp_path / "bin")
    schema = "k long, v double"
    spark.createDataFrame([(i, float(i)) for i in range(200)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(i, float(i)) for i in range(200, 400)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    dest, ckpt = str(tmp_path / "btab"), str(tmp_path / "bck")
    q = stream_append_versioned(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        dest,
        ckpt,
        bloom_columns=["k"],
    )
    q.awaitTermination()
    latest = versions(spark, dest)[-1]
    # point lookups resolve through the per-batch-maintained index
    assert read_version_bloom(spark, dest, "k", 42, version=latest).count() == 1
    assert read_version_bloom(spark, dest, "k", 399, version=latest).count() == 1
    assert read_version_bloom(spark, dest, "k", 5000, version=latest).count() == 0


def test_stream_append_versioned_with_view_follows_exactly_once(spark, tmp_path):
    """Verdict r6 #6: the composed sink keeps an aggregate matview
    following the streaming table — streamed view ≡ batch agg() over
    the final table, restarts replay nothing, and out-of-band commits
    (backfill/maintenance writers) are caught up by the next batch's
    refresh."""
    from temp_data_pipeline_spark.operators.matview import view_base_version
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_version,
        versions,
    )
    from temp_data_pipeline_spark.streaming.sink import (
        stream_append_versioned_with_view,
    )

    schema = "k long, g string, v long"

    def agg(df):
        return df.groupBy("g").agg(
            F.sum("v").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )

    src = str(tmp_path / "vwsrc")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "a", 30), (4, "c", 40)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    dest = str(tmp_path / "vwtable")
    view = str(tmp_path / "vwview")
    ckpt = str(tmp_path / "vwck")

    def run():
        q = stream_append_versioned_with_view(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            dest,
            ckpt,
            view_path=view,
            agg=agg,
            keys=["g"],
        )
        q.awaitTermination()

    run()

    def view_rows():
        return {
            (r["g"], r["total"], r["n"])
            for r in read_version(spark, view).drop("_ts").collect()
        }

    def batch_truth():
        return {
            (r["g"], r["total"], r["n"])
            for r in agg(read_version(spark, dest)).collect()
        }

    assert view_rows() == batch_truth() == {("a", 40, 2), ("b", 20, 1), ("c", 40, 1)}
    assert view_base_version(spark, view) == versions(spark, dest)[-1]

    # restart over the same checkpoint: nothing replays, nothing moves
    tv, vv = versions(spark, dest), versions(spark, view)
    run()
    assert versions(spark, dest) == tv and versions(spark, view) == vv

    # an out-of-band writer (backfill) advances the table while the
    # stream is down — the view is legitimately behind...
    commit_version(
        spark.createDataFrame([(9, "b", 5)], schema),
        dest,
        carry_from=versions(spark, dest)[-1],
    )
    assert view_base_version(spark, view) < versions(spark, dest)[-1]
    # ...and the NEXT batch's refresh catches it up along with the
    # batch's own rows
    spark.createDataFrame(
        [(5, "c", 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    assert view_rows() == batch_truth() == {
        ("a", 40, 2), ("b", 25, 2), ("c", 41, 2)
    }
    assert view_base_version(spark, view) == versions(spark, dest)[-1]


def test_stream_upsert_versioned_exactly_once(spark, tmp_path):
    """CDC upsert stream into a versioned table: each micro-batch is
    one merge-on-read MERGE commit; a restart over the same checkpoint
    replays nothing; the final DV-aware read equals the batch
    keep-latest answer — with time travel intact."""
    import os

    from pyspark.sql import functions as F

    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import versions
    from temp_data_pipeline_spark.streaming.sink import (
        stream_upsert_versioned,
    )

    scratch = str(tmp_path)
    src = os.path.join(scratch, "src")
    dest = os.path.join(scratch, "tbl")
    ckpt = os.path.join(scratch, "ckpt")
    # three source files -> three micro-batches; key 1 is upserted
    # twice across batches (later file wins by ts)
    spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100)], "k long, v long, ts long"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(1, 11, 200), (3, 30, 200)], "k long, v long, ts long"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, 22, 300), (4, 40, 300)], "k long, v long, ts long"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    q = stream_upsert_versioned(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        dest,
        ckpt,
        ["k"],
        "ts",
    )
    q.awaitTermination()
    got = {
        (r["k"], r["v"]) for r in read_table(spark, dest).collect()
    }
    # note: micro-batch order is file-listing order, but each key's
    # final value is deterministic — within-key updates are strictly
    # newer in later files and MOR upserts always displace
    assert got == {(1, 11), (2, 22), (3, 30), (4, 40)}
    n_versions = len(versions(spark, dest))
    # restart over the same checkpoint: exactly-once, no new commits
    q2 = stream_upsert_versioned(
        spark.readStream.schema(schema).parquet(src), dest, ckpt, ["k"], "ts"
    )
    q2.awaitTermination()
    assert len(versions(spark, dest)) == n_versions
    assert {
        (r["k"], r["v"]) for r in read_table(spark, dest).collect()
    } == got
