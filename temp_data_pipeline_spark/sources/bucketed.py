"""Bucketed table layout for shuffle-free co-located joins.

The reference joins forecast⋈truth per station on every eval run; at
100 TB the same join over years of multi-station data shuffles both
sides each time. Bucketing pre-partitions both tables by the join key
at WRITE time: every later equi-join on that key reads co-located
buckets and skips the exchange entirely (plan shows SortMergeJoin with
zero Exchange on the bucketed sides — pinned by tests/test_bucketed.py).

Bucket-count discipline: both sides must use the same count (or an
integer multiple under spark.sql.bucketing.coalesceBucketsInJoin);
pick it once per lake (e.g. 1024 at 100 TB → ~100 GB/bucket of raw
fact data, well under executor memory after column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as an external parquet table bucketed (and
    optionally sorted) by the join key."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back through the catalog — required: a plain
    spark.read.parquet(path) loses the bucketing metadata and with it
    the shuffle elimination."""
    return spark.table(table)
