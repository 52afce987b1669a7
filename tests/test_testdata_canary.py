"""Canary for driver-side testdata regeneration.

Round 3 post-mortem: the driver silently regenerated events.parquet
with ts as TIMESTAMP(MICROS) (previously NANOS); readers that assumed
the physical unit broke in eleven different places.  This file is the
ONE obvious place that fails first if the physical layout shifts
again — it cross-checks the Spark loader against pyarrow's own read
of the same file, so it holds under any future regeneration (no
pinned values that a legitimate reseed would trip).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.sources.registry import (
    events_stream,
    load_table,
    parquet_ts_units,
)

SF = "/root/testdata/sf0.001"


def test_events_footer_unit_is_known():
    units = parquet_ts_units(f"{SF}/events.parquet")
    assert "ts" in units, "events.parquet lost its ts timestamp column"
    assert units["ts"] in ("ns", "us", "ms"), f"unhandled unit {units['ts']!r}"


def test_loader_yields_true_timestamp_matching_pyarrow(spark):
    """load_table must emit TIMESTAMP (not NTZ, not bigint) whose
    micro-instants equal pyarrow's ground-truth read of the footer."""
    df = load_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"

    got = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).collect()[0]

    tbl = pq.read_table(f"{SF}/events.parquet", columns=["ts"])
    ts = tbl.column("ts").cast("timestamp[us]").to_pylist()
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    micros = [int((t - epoch).total_seconds() * 1e6 + 0.5) for t in ts]
    assert got["n"] == len(micros)
    # a 1000x unit compression moves min/max by ~1e3; exact equality
    # against pyarrow's micro read catches any unit or tz drift
    assert got["mn"] == min(micros)
    assert got["mx"] == max(micros)


def test_stream_reader_matches_batch_loader(spark):
    """events_stream and load_table must agree on instants — the r3
    streaming bug (1000x-compressed time) would fail here."""
    import uuid

    sink = f"canary_{uuid.uuid4().hex[:8]}"
    q = (
        events_stream(spark, SF)
        .select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_rows = {
        r["event_id"]: r["ts"] for r in spark.table(sink).collect()
    }
    batch_rows = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, SF, "events").select("event_id", "ts").collect()
    }
    assert stream_rows == batch_rows


@pytest.mark.parametrize("name", ["orders", "lineitem", "documents"])
def test_no_table_leaks_ntz_or_raw_long_timestamps(spark, name):
    df = load_table(spark, SF, name)
    bad = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    assert not bad, f"{name} leaked TIMESTAMP_NTZ columns: {bad}"


def test_stream_reader_handles_directory_layout(spark, tmp_path):
    """If the driver ever regenerates events.parquet as a DIRECTORY of
    part files, the stream reader must still see every row."""
    src = load_table(spark, SF, "events")
    dir_sf = tmp_path / "sfdir"
    dir_sf.mkdir()
    src.limit(200).write.parquet(str(dir_sf / "events.parquet"))

    import uuid

    sink = f"canary_dir_{uuid.uuid4().hex[:8]}"
    q = (
        events_stream(spark, str(dir_sf))
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table(sink).count() == 200
    assert dict(spark.table(sink).dtypes)["ts"] == "timestamp"


def test_documents_and_embeddings_shape_assumptions(spark):
    """The LLM tier assumes: documents has (doc_id,text,lang,source)
    and embeddings carries fixed-width float vectors with a label.
    If the driver regenerates these with different columns, widths, or
    types, fail HERE first — not in thirty conformance queries."""
    d = dict(load_table(spark, SF, "documents").dtypes)
    for col, typ in (
        ("doc_id", "bigint"), ("text", "string"),
        ("lang", "string"), ("source", "string"),
    ):
        assert d.get(col) == typ, f"documents.{col}: {d.get(col)!r} != {typ!r}"

    e = load_table(spark, SF, "embeddings")
    et = dict(e.dtypes)
    assert et.get("vec_id") == "bigint", et
    assert et.get("embedding") == "array<float>", et
    assert "label" in et, et
    dims = e.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64], (
        "embedding width changed — the 64-dim constant is baked into "
        "the LSH/IVF/PQ oracle SQL (range(1,65), 8x8 PQ subspaces)"
    )
    ids = e.agg(F.min("vec_id").alias("mn")).first()
    assert ids["mn"] == 0, "vec_id=0 is the pinned ANN query vector"
