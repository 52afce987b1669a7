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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Lazy — no job runs until an action.

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark
    refuses to read natively; we read nanos as long and truncate to
    microseconds — byte-identical to how DuckDB (micro-precision
    timestamps) reads the same file, so oracle comparisons line up.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # integer division: ns values (~1.7e18) exceed double's 2^53
            # mantissa, so a float divide would be off by ±1 µs
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


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
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    for c in ts_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # integer division: ns magnitudes exceed double's mantissa
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all synthetic tables as SQL temp views (engine.sql path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
