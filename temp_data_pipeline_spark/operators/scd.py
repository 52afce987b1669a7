"""Slowly-changing-dimension (SCD Type 2) maintenance from a change
feed.

A Type-2 dimension keeps every key's FULL HISTORY: one row per
(key, version-interval), with ``_valid_from`` / ``_valid_to`` bounding
the source versions during which the row was the key's current
content (``_valid_to IS NULL`` = current). This module maintains such
a dimension as a versioned table, fed by the key-level change feed —
the warehouse-classic MERGE-based SCD2 pipeline, expressed as ONE
merge-on-read commit per window:

  - keys with an 'update_postimage' / 'insert' row: their current
    dimension row (if any) is CLOSED (DV'd out and re-appended with
    ``_valid_to = ordinal``) and the new content appended as the new
    current row (``_valid_from = ordinal``),
  - keys with only 'delete' rows: their current row is closed, no
    replacement,
  - 'update_preimage' rows are dropped (the postimage carries the new
    content).

Cost per window: one position-finding scan of the dimension (keys and
positions shuffle — the standard MOR merge cost) plus a delta-sized
append (closed rows + new current rows); closed history is NEVER
rewritten. The ordinal is the SOURCE version, so
``scd2_snapshot_at(dim, v)`` reconstructs the source's exact snapshot
at any version the dimension has ingested — time travel that
survives the source's own vacuum horizon.

KEY CONTRACT: ``keys`` must uniquely identify rows in every source
snapshot (the keyed-feed contract). No reference counterpart; the
semantics follow Kimball SCD Type 2 / Delta's MERGE-based SCD
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import (
    _commit_with_dv,
    _visible_tagged_for_keys,
    read_table,
    semi_on_keys,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    read_manifest,
    versions,
)

__all__ = [
    "scd2_init",
    "scd2_apply",
    "scd2_catchup",
    "scd2_of_version",
    "scd2_snapshot_at",
]

_UPSERT_TYPES = ("insert", "update_postimage")
_RESERVED = ("_valid_from", "_valid_to")


def scd2_init(
    spark: SparkSession,
    src_path: str,
    dim_path: str,
    keys: list[str],
) -> int:
    """Seed the dimension from the source's latest snapshot: every
    row current as of that version. Returns the committed dim
    version."""
    src_v = versions(spark, src_path)[-1]
    snap = read_table(spark, src_path, src_v)
    clash = [c for c in snap.columns if c in _RESERVED]
    if clash:
        raise ValueError(f"source uses reserved SCD2 columns {clash}")
    rows = snap.withColumn(
        "_valid_from", F.lit(src_v).cast("long")
    ).withColumn("_valid_to", F.lit(None).cast("long"))
    return commit_version(
        rows,
        dim_path,
        meta={"scd2_of": src_path, "scd2_of_version": src_v,
              "scd2_keys": keys},
    )


def scd2_of_version(spark: SparkSession, dim_path: str) -> int:
    """The source version the dimension's LATEST snapshot reflects."""
    man = read_manifest(spark, dim_path, versions(spark, dim_path)[-1])
    return int(man["scd2_of_version"])


def scd2_apply(
    spark: SparkSession,
    feed: DataFrame,
    dim_path: str,
    keys: list[str],
    ordinal: int,
    *,
    meta: dict | None = None,
) -> int:
    """Fold one change-feed window into the dimension with
    ``ordinal`` as the interval boundary (the window's ``until``
    source version). Returns the committed dim version."""
    if "_change_type" not in feed.columns:
        raise ValueError("feed must carry a _change_type column")
    data_cols = [c for c in feed.columns if c != "_change_type"]
    feed = feed.persist()
    try:
        ups = feed.filter(
            F.col("_change_type").isin(*_UPSERT_TYPES)
        ).select(*data_cols)
        affected = (
            feed.filter(F.col("_change_type") != "update_preimage")
            .select(*keys)
            .distinct()
        )
        base = versions(spark, dim_path)[-1]
        if feed.isEmpty():
            # empty window (a metadata-only source commit): advance
            # the bookkeeping with one carry commit — no position scan
            fresh = ups.withColumn(
                "_valid_from", F.lit(ordinal).cast("long")
            ).withColumn("_valid_to", F.lit(None).cast("long"))
            return commit_version(
                fresh.limit(0), dim_path, carry_from=base, meta=meta,
                expected_base=base,
            )
        man = read_manifest(spark, dim_path, base)
        # the one position-finding scan — pruned by the delta's key
        # bounding box when the dimension keeps zone maps on the keys
        # — narrowed to CURRENT rows of affected keys
        cur = semi_on_keys(
            _visible_tagged_for_keys(
                spark, dim_path, base, man, keys, affected
            ).filter(F.col("_valid_to").isNull()),
            affected,
            keys,
        )
        dv_new = cur.select(
            F.col("_dv_file").alias("file"), F.col("_dv_pos").alias("pos")
        )
        dim_cols = [
            c for c in cur.columns if c not in ("_dv_file", "_dv_pos")
        ]
        # schema evolution: an ADDED source column widens the dim
        # (history rows read/close with NULL there — exactly the
        # add-column contract); a DROPPED source column would
        # silently null future history, so it fails loudly (re-init)
        dim_data = [c for c in dim_cols if c not in _RESERVED]
        dropped = [c for c in dim_data if c not in data_cols]
        if dropped:
            raise ValueError(
                f"source dropped column(s) {dropped} mid-history — "
                "scd2 cannot represent that without a re-init "
                "(scd2_init on a fresh dimension path)"
            )
        added = [c for c in data_cols if c not in dim_data]
        ups_types = dict(ups.dtypes)
        closed = cur.select(*dim_cols).withColumn(
            "_valid_to", F.lit(ordinal).cast("long")
        )
        for c in added:
            closed = closed.withColumn(c, F.lit(None).cast(ups_types[c]))
        fresh = ups.withColumn(
            "_valid_from", F.lit(ordinal).cast("long")
        ).withColumn("_valid_to", F.lit(None).cast("long"))
        out_cols = list(data_cols) + ["_valid_from", "_valid_to"]
        rows_new = closed.select(*out_cols).unionByName(
            fresh.select(*out_cols)
        )
        return _commit_with_dv(
            spark, dim_path, base, man, dv_new, rows_new, meta,
            allow_evolution=bool(added),
        )
    finally:
        feed.unpersist()


def scd2_catchup(
    spark: SparkSession,
    src_path: str,
    dim_path: str,
    keys: list[str],
) -> int:
    """Catch the dimension up to the source's latest version: one
    keyed-feed pull per committed source version SINCE the reflected
    one (per-version granularity keeps every interval boundary exact
    — folding a multi-version window into one apply would collapse
    intermediate history). No-op when already current; raises the
    feed's ``FeedResetRequired`` across a full-table rewrite."""
    from temp_data_pipeline_spark.operators.changes import (
        table_changes_keyed,
    )

    reflected = scd2_of_version(spark, dim_path)
    out = versions(spark, dim_path)[-1]
    for v in versions(spark, src_path):
        if v <= reflected:
            continue
        feed = table_changes_keyed(spark, src_path, keys, reflected, v)
        out = scd2_apply(
            spark,
            feed,
            dim_path,
            keys,
            v,
            meta={"scd2_of": src_path, "scd2_of_version": v,
                  "scd2_keys": keys},
        )
        reflected = v
    return out


def scd2_snapshot_at(
    spark: SparkSession, dim_path: str, at_version: int
) -> DataFrame:
    """Reconstruct the SOURCE's snapshot as of source version
    ``at_version`` from the dimension's intervals — time travel that
    outlives the source's own retained history."""
    dim = read_table(spark, dim_path)
    return dim.filter(
        (F.col("_valid_from") <= at_version)
        & (
            F.col("_valid_to").isNull()
            | (F.col("_valid_to") > at_version)
        )
    ).drop("_valid_from", "_valid_to")
