"""Incrementally maintained aggregate views over versioned tables.

A "materialized view" here is itself a versioned table whose rows are
``agg(base)`` grouped by ``keys``, plus a manifest record of WHICH
base version it reflects. ``refresh_agg_view`` advances the view to
the base's latest version at a cost proportional to what CHANGED,
not to the base:

  1. the TOUCHED groups are the distinct group keys of the
     file-level change feed over (reflected, latest] — O(delta):
     appended rows, the deletion-vector delta (scans pruned to the
     files the DVs name), and removed-file rows, so the view can sit
     on merge-on-read bases (upsert/delete targets, CDC replicas) as
     well as append-only chains; every group absent from the feed is
     provably unchanged,
  2. when the window crosses a full-table rewrite (the feed raises
     ``FeedResetRequired``), both DV-resolved base versions reduce to
     ONE fingerprint row per group (count + order-independent
     content-hash sum — a groupBy, not a join) and groups whose
     fingerprints differ are touched (up to 64-bit hash-sum
     collision),
  3. touched groups are recomputed from base@latest (group-pruned
     scan: a semi-join on the touched key set — and a partition-
     pruned one when the view partitions on a group key),
  4. the recomputed rows apply to the view as ONE copy-on-write CDC
     commit (`commit_cdc_cow`): upserts for groups that still exist,
     deletes for groups whose rows all vanished — only the view
     partitions holding touched groups are rewritten.

Group recompute (not delta arithmetic) is the maintenance strategy:
it supports EVERY aggregate — max/min/percentile/count-distinct, not
just the subtractable sum/count family — and its cost scales with
the touched groups' row count, which for time-keyed views (the
common case: daily rollups, late-arriving backfills) is a handful of
partitions. Subtractable-only delta maintenance is what
`operators/incremental.py`'s mergeable partials provide when that
trade is wanted.

The view carries one bookkeeping column, ``_ts`` (the base version
its row was computed from) — the merge ordering column for the CDC
apply. Time travel works on the view like any versioned table; each
refresh is one new view version whose manifest records
``base_version``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.versioned import (
    commit_cdc_cow,
    commit_version,
    read_manifest,
    read_version,
    versions,
)

__all__ = ["build_agg_view", "refresh_agg_view", "view_base_version"]


def _group_fingerprints(df: DataFrame, keys: list[str]) -> DataFrame:
    """One row per group: (keys..., _n, _fp) where _fp is the
    order-independent sum of per-row content hashes (decimal(38,0)
    accumulator — ANSI mode would overflow a BIGINT sum) over the
    non-key columns. Two versions of a group share (_n, _fp) iff
    their row multisets agree up to 64-bit hash collision."""
    val_cols = [c for c in df.columns if c not in keys]
    row_hash = F.xxhash64(*[F.col(c) for c in val_cols]) if val_cols else F.lit(0)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(row_hash.cast("decimal(38,0)")).alias("_fp"),
    )


def _touched_groups(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Distinct group keys whose row content differs between two base
    versions. Each side collapses to one fingerprint row per group
    FIRST (map-side-combinable groupBy), so the full-outer join is
    unique-per-key — never the m×n pairing a row-level diff on
    non-unique keys would produce."""
    o = _group_fingerprints(old, keys).alias("_o")
    n = _group_fingerprints(new, keys).alias("_n")
    cond = None
    for k in keys:
        c = F.col(f"_o.{k}").eqNullSafe(F.col(f"_n.{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    same = (
        F.col("_o._n").eqNullSafe(F.col("_n._n"))
        & F.col("_o._fp").eqNullSafe(F.col("_n._fp"))
    )
    return j.filter(~same).select(
        *[F.coalesce(F.col(f"_n.{k}"), F.col(f"_o.{k}")).alias(k) for k in keys]
    )


def _check_agg(out: DataFrame, keys: list[str]) -> None:
    missing = [k for k in keys if k not in out.columns]
    if missing:
        raise ValueError(
            f"agg() result is missing group key columns {missing}; it "
            f"must return one row per {keys} group"
        )
    if "_ts" in out.columns or "op" in out.columns:
        raise ValueError("agg() result may not use reserved columns _ts/op")


def _check_pcol(pcol: str, keys: list[str]) -> None:
    # the view's partition column must be a GROUP key: COW deletes
    # address rows by key, and a non-key partition column would also
    # let a group's aggregate move partitions between refreshes —
    # violating the COW never-moves contract
    if pcol not in keys:
        raise ValueError(
            f"partition_col {pcol!r} must be one of the view keys {keys}"
        )


def build_agg_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    agg: Callable[[DataFrame], DataFrame],
    keys: list[str],
    *,
    partition_col: str | None = None,
    base_version: int | None = None,
) -> int:
    """Full build: materialize ``agg(base@version)`` as view version 1
    (or the next version — rebuilding is always allowed). Returns the
    committed view version."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )

    vs = versions(spark, base_path)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {base_path}")
    bv = base_version if base_version is not None else vs[-1]
    # DV-resolved read: the view aggregates VISIBLE rows, so it can
    # sit on merge-on-read bases (upsert/delete targets, replicas)
    out = agg(read_table(spark, base_path, bv))
    _check_agg(out, keys)
    pcol = partition_col or keys[0]
    _check_pcol(pcol, keys)
    rows = out.withColumn("_ts", F.lit(bv).cast("long"))
    return commit_version(
        rows,
        view_path,
        partition_by=[pcol],
        meta={"base_path": base_path, "base_version": bv, "view_keys": keys},
    )


def view_base_version(spark: SparkSession, view_path: str) -> int:
    """The base version the view's LATEST snapshot reflects."""
    man = read_manifest(spark, view_path, versions(spark, view_path)[-1])
    return int(man["base_version"])


def refresh_agg_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    agg: Callable[[DataFrame], DataFrame],
    keys: list[str],
    *,
    partition_col: str | None = None,
) -> int:
    """Advance the view to the base's latest version; cost scales
    with the groups the diff touches. No-op (returns the current view
    version) when the view is already current."""
    pcol = partition_col or keys[0]
    _check_pcol(pcol, keys)
    base_latest = versions(spark, base_path)[-1]
    reflected = view_base_version(spark, view_path)
    view_latest = versions(spark, view_path)[-1]
    if base_latest == reflected:
        return view_latest

    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )

    base_now = read_table(spark, base_path, base_latest)
    touched = None
    # O(DELTA) fast path: the file-level change feed's distinct keys
    # are exactly the groups whose row multisets can have changed —
    # appended rows, MOR-deleted rows (the DV delta, scans pruned to
    # the files the DVs name), and removed-file rows all surface
    # there, so the view can sit on merge-on-read bases (upsert /
    # delete targets, CDC replicas), not just append-only chains.
    # For a streaming appender this reduces to one scan of the new
    # files (the probe diffs manifest DIR sets first, shared dirs
    # cancel by name), which is what keeps per-batch view maintenance
    # (stream_append_versioned_with_view) O(batch). A window crossing
    # a full-table rewrite (compaction/restore) can't be expressed as
    # a delta — fall back to the two-sided group fingerprint diff.
    from temp_data_pipeline_spark.operators.changes import (
        FeedResetRequired,
        changes_between,
    )

    try:
        feed = changes_between(spark, base_path, reflected, base_latest)
        missing = [k for k in keys if k not in feed.columns]
        if missing:  # evolution dropped a group key: recompute fully
            raise FeedResetRequired(f"group keys {missing} not in feed")
        touched = feed.select(*keys).distinct()
        if touched.isEmpty():
            return view_latest  # pure metadata commit: no new rows
    except FeedResetRequired:
        base_then = read_table(spark, base_path, reflected)
        touched = _touched_groups(base_then, base_now, keys)
    # group-pruned recompute: only touched groups' rows are scanned
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        anti_on_keys,
        semi_on_keys,
    )

    # NULL group keys are legal (groupBy keeps a NULL group): both the
    # group-pruned recompute and the vanished-group probe must match
    # keys null-safely, or the NULL group is never recomputed and is
    # perpetually re-emitted as vanished
    recomputed = agg(semi_on_keys(base_now, touched, keys))
    _check_agg(recomputed, keys)
    upserts = recomputed.withColumn("_ts", F.lit(base_latest).cast("long"))

    # groups whose rows all vanished: touched but absent from the
    # recompute — they must leave the view (CDC delete rows carry the
    # full view schema with null payload)
    vanished = anti_on_keys(touched, recomputed.select(*keys), keys)
    view_cols = read_version(spark, view_path, view_latest).drop("_ts").columns
    del_rows = vanished
    for c in view_cols:
        if c not in keys:
            del_rows = del_rows.withColumn(
                c, F.lit(None).cast(dict(upserts.dtypes)[c])
            )
    del_rows = del_rows.withColumn("_ts", F.lit(base_latest).cast("long"))

    changes = upserts.withColumn("op", F.lit("U")).unionByName(
        del_rows.withColumn("op", F.lit("D"))
    )
    return commit_cdc_cow(
        changes,
        view_path,
        keys,
        "_ts",
        pcol,
        meta={
            "base_path": base_path,
            "base_version": base_latest,
            "view_keys": keys,
        },
    )
