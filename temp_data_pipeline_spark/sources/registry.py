"""Table registry over parquet directories.

The synthetic oracle-tier tables (TESTDATA.md) are one parquet file
per table under an ``sf_dir``; the domain lake (hourly_obs /
daily_tmax / forecasts / train) is a partitioned directory tree
(SURVEY §2.1 S10). Both resolve through here so query code never
hard-codes paths.

At 100 TB the same call sites work unchanged: `spark.read.parquet` on
a partitioned directory gives Catalyst partition pruning + parquet
min/max filter pushdown; nothing below materializes on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Oracle-tier star schema + events/documents/embeddings (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def parquet_ts_meta(path: str) -> dict[str, tuple[str, str | None]]:
    """Footer probe: timestamp column name → (physical unit, tz) for
    one parquet file or the first file of a directory. tz is None for
    local/unzoned (isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ)
    and a zone string (usually 'UTC') for instant-semantics columns
    (→ Spark reads true TIMESTAMP).

    The driver regenerates the testdata between rounds and has already
    switched ``events.ts`` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
    once; every reader routes through this probe so the physical
    layout is an input, never an assumption.
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        hits = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        path = hits[0] if hits else path
    schema = pq.ParquetFile(path).schema_arrow
    return {
        f.name: (f.type.unit, f.type.tz)
        for f in schema
        if pa.types.is_timestamp(f.type)
    }


def parquet_ts_units(path: str) -> dict[str, str]:
    """Unit-only view of parquet_ts_meta (name → 'ns'/'us'/'ms'/'s')."""
    return {name: unit for name, (unit, _tz) in parquet_ts_meta(path).items()}


def _normalize_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rewrite every ns-as-long / TIMESTAMP_NTZ timestamp column to a
    true UTC TIMESTAMP (session tz is pinned UTC in session.py, so the
    wall-clock instant matches DuckDB's micro-precision read exactly)."""
    from pyspark.sql import functions as F

    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Spark-inferred schema per table FILE, keyed on the file's identity
# (realpath, inode, mtime_ns, size) plus the nanosAsLong conf that can
# change what inference yields. Schema inference launches a one-task
# footer-read job per spark.read.parquet call; the synthetic tables
# are re-opened by nearly every declared query (and the bench runs
# each query twice), so the repeat jobs are pure fixed overhead
# (guide §1 measured: ~0.1-0.7 s each as job 0 of every profile). The
# stat key makes regeneration between driver rounds a cache miss, so
# this caches METADATA of an unchanged file, never results. Single
# plain files only — directory-shaped tables change underfoot without
# touching the dir's own stat, so they keep plain inference.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    try:
        if not os.path.isfile(path):
            raise OSError
        st = os.stat(path)
    except OSError:
        return spark.read.parquet(path)
    key = (
        os.path.realpath(path),
        st.st_ino,
        st.st_mtime_ns,
        st.st_size,
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"),
    )
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Lazy — no job runs until an action.

    ``events.ts`` has been shipped both as TIMESTAMP(NANOS) (which
    Spark refuses to read natively → read nanos-as-long, truncate to
    µs) and as TIMESTAMP(MICROS) without tz (which Spark reads as
    TIMESTAMP_NTZ → cast to UTC TIMESTAMP). Both normalize to the same
    micro-precision instants DuckDB sees, so oracle comparisons line
    up regardless of how the driver regenerates the files.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        units = parquet_ts_units(path)
        if any(u == "ns" for u in units.values()):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = _read_parquet_cached_schema(spark, path)
            if dict(df.dtypes).get("ts") == "bigint":
                from pyspark.sql import functions as F

                # integer division: ns values (~1.7e18) exceed double's
                # 2^53 mantissa, so a float divide would be off by ±1 µs
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            return _normalize_ts(spark, df)
        return _normalize_ts(spark, _read_parquet_cached_schema(spark, path))
    return _normalize_ts(spark, _read_parquet_cached_schema(spark, path))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming reader for the events table with ``ts`` as a true UTC
    TIMESTAMP, whatever the physical parquet unit is.

    readStream requires an explicit schema, so the footer unit decides
    it: ns files read ``ts`` as long and truncate to µs (readStream
    honors the nanosAsLong conf); µs/ms files read TIMESTAMP_NTZ and
    cast. ONE function owns this so a driver-side regeneration changes
    behavior in exactly one place — five hand-rolled copies of the ns
    assumption is how the round-3 silent-1000×-compression happened.
    """
    from pyspark.sql import functions as F

    events_path = os.path.join(sf_dir, "events.parquet")
    unit, tz = parquet_ts_meta(events_path).get("ts", ("us", None))
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ts_field, fix = "ts long", F.expr("timestamp_micros(ts div 1000)")
    elif tz is not None:
        # isAdjustedToUTC=true (the Spark/pandas default layout):
        # Spark reads a true TIMESTAMP natively — declaring NTZ here
        # would either fail the conversion or drift from load_table
        ts_field, fix = "ts timestamp", F.col("ts")
    else:
        ts_field, fix = "ts timestamp_ntz", F.col("ts").cast("timestamp")
    schema = (
        f"event_id long, {ts_field}, user_id long, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if os.path.isdir(events_path):
        # directory-shaped table (part files): read it directly — a
        # pathGlobFilter of "events.parquet" would silently drop every
        # part-*.parquet inside and stream zero rows
        return reader.parquet(events_path).withColumn("ts", fix)
    return (
        reader.option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", fix)
    )


def read_parquet_any(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read tolerant of TIMESTAMP(NANOS) columns (files written
    by pandas/pyarrow default to ns precision, which Spark refuses).
    Detects ns-timestamp columns from the footer of one file, reads
    them as longs, truncates to micros — same micro-instant DuckDB and
    pandas see."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _first_file(p: str) -> str:
        if _os.path.isdir(p):
            hits = sorted(
                _glob.glob(_os.path.join(p, "**", "*.parquet"), recursive=True)
            )
            return hits[0] if hits else p
        return p

    matches = sorted(_glob.glob(path)) or [path]
    schema = pq.ParquetFile(_first_file(matches[0])).schema_arrow
    ts_cols = [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    if not ts_cols:
        return _normalize_ts(spark, spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    for c in ts_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # integer division: ns magnitudes exceed double's mantissa
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return _normalize_ts(spark, df)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all synthetic tables as SQL temp views (engine.sql path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
