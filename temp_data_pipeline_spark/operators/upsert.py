"""CDC-style upsert: keep-latest merge of change streams into a
keyed table.

The lakehouse MERGE pattern without a table format: given a base
snapshot and a batch of updates carrying the same key + event-time
columns, the merged state is "latest row per key" — one union + one
window pass, shuffling each key to one reducer. Deterministic under
ties via an explicit tiebreak column; at scale the window partitions
by the merge key, so the shuffle is the same single hash exchange a
groupBy would cost (no join needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per key: the one with the greatest ts (ties broken by
    the greatest `tiebreak`, which you should supply whenever ts can
    collide — without it, ties are nondeterministic)."""
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Apply a change batch onto a base snapshot: rows with the same
    key are resolved to the latest version; new keys append. Columns
    are aligned by name (updates may be a column subset — missing
    columns null-fill, the CDC partial-update convention)."""
    for c in base.columns:
        if c not in updates.columns:
            updates = updates.withColumn(c, F.lit(None).cast(base.schema[c].dataType))
    updates = updates.select(*base.columns)
    return keep_latest(base.unionByName(updates), keys, ts_col, tiebreak)
