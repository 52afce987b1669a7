"""Parquet compaction: the small-files maintenance operator.

A 100 TB lake accretes small files — streaming micro-batches,
per-partition appends, over-parallel writes. Thousands of KB-sized
files turn every downstream scan into a task-scheduling storm (one
Spark task per file) and crush the object store with request
overhead. Compaction rewrites a directory into files near a target
size.

Spark-first design:
- file inventory comes from the Hadoop FileSystem API (works for
  local paths, HDFS, and object stores alike) — a driver-side
  metadata listing, no data movement;
- the rewrite is ONE distributed job: scan → repartition to
  ceil(total_bytes / target) partitions → write. With `sort_by` the
  repartition is a range partitioning + within-partition sort, so the
  output files are range-disjoint on the sort key — min/max footer
  stats then let downstream scans skip whole files (poor-man's
  clustering, the same effect bucketing/Z-order layouts chase);
- the write lands in a fresh directory; swapping it in (rename /
  catalog pointer flip) stays with the caller, keeping the operator
  atomic-by-convention like the reference's tmp+rename sinks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CompactionPlan:
    n_files: int
    total_bytes: int
    n_small: int  # files under the small threshold
    target_files: int

    @property
    def needed(self) -> bool:
        return self.n_files > self.target_files and self.n_small > 0


def list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet file under `path`, via the
    Hadoop FS API (scheme-agnostic: file://, hdfs://, s3a://...)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet"):
            out.append((str(status.getPath()), int(status.getLen())))
    return out


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    small_file_mb: int | None = None,
) -> CompactionPlan:
    """Inventory `path` and size the rewrite. `small_file_mb` defaults
    to half the target."""
    small = (small_file_mb if small_file_mb is not None else target_file_mb / 2) * (
        1 << 20
    )
    files = list_parquet_files(spark, path)
    total = sum(sz for _, sz in files)
    return CompactionPlan(
        n_files=len(files),
        total_bytes=total,
        n_small=sum(1 for _, sz in files if sz < small),
        target_files=max(1, math.ceil(total / (target_file_mb * (1 << 20)))),
    )


def zorder_value(col_a, col_b, bits: int = 21) -> "F.Column":
    """Morton (Z-order) interleave of two non-negative integer
    columns: bit i of each input lands at output bits 2i / 2i+1, so
    sorting by the result clusters rows that are close in BOTH
    dimensions. Pure bit-shift expression — JVM-side, codegen-fused;
    2·bits terms (42 bits of payload by default fits a long with room
    to spare).

    Map continuous columns onto integer grids first (e.g.
    `F.floor(lat * 1e4)` shifted non-negative). This is the layout
    trick behind Delta/Iceberg Z-ordering: a single sort key that
    gives file-level min/max skipping for predicates on EITHER
    dimension, where a lexicographic (a, b) sort only prunes on `a`.
    """
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i)
        out = out + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1)
    return out


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 512,
    sort_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> CompactionPlan:
    """Rewrite `in_path` into ~target-sized files at `out_path` in one
    distributed pass. Returns the plan it executed. With `sort_by`,
    output files are range-disjoint on the key (file-skipping via
    footer min/max for downstream range predicates); with `zorder_by`,
    files are range-disjoint on the Morton value of the two columns,
    so min/max skipping works for predicates on either one."""
    plan = plan_compaction(spark, in_path, target_file_mb)
    df: DataFrame = spark.read.parquet(in_path)
    n = plan.target_files
    if zorder_by:
        za, zb = zorder_by
        df = df.withColumn("_z", zorder_value(za, zb))
        df = df.repartitionByRange(n, F.col("_z")).sortWithinPartitions("_z")
        df = df.drop("_z")
    elif sort_by:
        df = df.repartitionByRange(n, *[F.col(c) for c in sort_by])
        df = df.sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    return plan
