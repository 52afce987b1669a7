"""Conditional MERGE INTO for versioned tables — the full Delta MERGE
clause family, executed as ONE merge-on-read commit:

    commit_merge_into(source, path, keys,
        update_when="s.price > t.price",       # WHEN MATCHED AND ...
        update_set={"price": "s.price"},       #   THEN UPDATE SET ...
        delete_when="t.status = 'expired'",    # WHEN MATCHED AND ...
        insert_when="amount > 0")              # WHEN NOT MATCHED AND ...

Clause semantics (Delta's, with the standard clause order fixed as
update → delete → insert):

  - a matched (target row, source row) pair satisfying
    ``update_when`` is UPDATED: the target row's position joins the
    deletion vector and one replacement row appends, built from
    ``update_set`` (``col -> SQL expr`` over ``s.*``/``t.*``;
    defaults to SET * = take the source row);
  - a matched pair NOT updated but satisfying ``delete_when`` is
    DELETED (DV only, no replacement);
  - matched pairs satisfying neither clause are UNTOUCHED — their
    bytes are never rewritten (the MOR advantage over COW merge);
  - an unmatched source row satisfying ``insert_when`` (a predicate
    over the source's plain column names; default all) APPENDS;
  - a target row with NO matching source row ("NOT MATCHED BY
    SOURCE", Delta's sync-deletes clause family) satisfying
    ``update_by_source_when`` is UPDATED via ``update_by_source_set``
    (``col -> SQL expr`` over ``t.*`` only — there is no source row;
    REQUIRED with the clause, there is no SET * here);
  - a by-source row NOT updated but satisfying
    ``delete_by_source_when`` is DELETED (DV only).

``update_when`` / ``delete_when`` are SQL booleans over the aliased
pair — ``s.<col>`` is the source row, ``t.<col>`` the target row;
pass ``True`` for an unconditional clause. Omitted clauses don't run
(all three omitted = validation error).

Plan shape: the target's position-finding scan is pruned to the files
whose zone-map key ranges can contain the source's keys
(deletion_vectors._visible_tagged_for_keys — O(candidate files) on
key-clustered tables), then ONE right-outer join against the source
classifies every pair; the classified frame is delta-sized (matched
target rows of source keys + unmatched source rows) and persists for
the DV write + append actions. Cost: one pruned scan + one keyed
shuffle of the delta + one delta-sized append; zero partition
rewrites.

With a by-source clause the pruned scan is impossible BY SEMANTICS —
every target row whose key is absent from the source is a candidate,
so the position scan is the full visible table and the classifying
join becomes full-outer (exactly what Delta does: NOT MATCHED BY
SOURCE reads the whole target). The join still shuffles only once and
only changed positions join the DV; at 100 TB the full-scan cost is
the clause's inherent price, paid only when the clause is present.

CONTRACTS: ``keys`` must uniquely identify SOURCE rows (resolve
last-writer-wins upstream via operators/upsert.keep_latest); target
rows need not be unique per key — every matched target row is
updated/deleted per its pair. No reference counterpart; semantics
follow Delta's MERGE as published.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import (
    _commit_with_dv,
    _visible_tagged,
    _visible_tagged_for_keys,
)
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    read_manifest,
    versions,
)

__all__ = ["commit_merge_into"]


def _cond(c, default: bool) -> Column:
    """Normalize a clause condition: SQL string, Column, True, or
    None (clause absent -> never fires unless ``default``)."""
    if c is None:
        return F.lit(default)
    if c is True:
        return F.lit(True)
    if isinstance(c, str):
        c = F.expr(c)
    return F.coalesce(c.cast("boolean"), F.lit(False))


def commit_merge_into(
    source: DataFrame,
    path: str,
    keys: list[str],
    *,
    update_when=None,
    update_set: dict[str, object] | None = None,
    delete_when=None,
    insert_when=None,
    update_by_source_when=None,
    update_by_source_set: dict[str, object] | None = None,
    delete_by_source_when=None,
    meta: dict | None = None,
) -> int:
    """Run one conditional MERGE of ``source`` into the versioned
    table at ``path``; returns the committed version (the current one
    when no clause fires). See module docstring for clause
    semantics."""
    by_source = (
        update_by_source_when is not None
        or delete_by_source_when is not None
    )
    if (
        update_when is None
        and delete_when is None
        and insert_when is None
        and not by_source
    ):
        raise ValueError(
            "MERGE needs at least one clause (update_when / "
            "delete_when / insert_when / *_by_source_when)"
        )
    if update_set and update_when is None:
        raise ValueError("update_set without update_when does nothing")
    if update_by_source_when is not None and not update_by_source_set:
        raise ValueError(
            "update_by_source_when requires update_by_source_set "
            "(there is no source row to SET * from)"
        )
    if update_by_source_set and update_by_source_when is None:
        raise ValueError(
            "update_by_source_set without update_by_source_when "
            "does nothing"
        )
    spark = source.sparkSession
    data_cols = list(source.columns)
    missing = [k for k in keys if k not in data_cols]
    if missing:
        raise ValueError(f"key columns absent from the source: {missing}")

    ins_cond = _cond(insert_when, insert_when is None)
    vs = versions(spark, path)
    if not vs:
        # empty target: only the insert clause can fire
        return commit_version(
            source.filter(ins_cond), path, meta=meta, expected_base=0
        )
    base = vs[-1]
    man = read_manifest(spark, path, base)

    if by_source:
        # NOT MATCHED BY SOURCE must see EVERY visible target row —
        # zone-map pruning to the source's keys would hide exactly the
        # rows the clause targets, so the scan is the full table and
        # the classifying join keeps both unmatched sides.
        tagged = _visible_tagged(spark, path, base, man)
        join_type = "full_outer"
    else:
        tagged = _visible_tagged_for_keys(
            spark, path, base, man, keys, source.select(*keys).distinct()
        )
        join_type = "right_outer"
    # a literal presence marker: source keys may legally be NULL (the
    # join is eqNullSafe), so "source side present" cannot be read off
    # a key column after an outer join
    t = tagged.alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    on = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        on = c if on is None else (on & c)
    # ONE classifying join: matched pairs carry the target position,
    # unmatched source rows carry a NULL one (and, under full-outer,
    # by-source target rows carry a NULL source marker). The frame is
    # delta-sized on the right-outer path — persist it across the
    # DV-write and append actions.
    j = t.join(s, on, join_type).persist()
    try:
        t_present = F.col("t._dv_file").isNotNull()
        s_present = F.col("s._s_present").isNotNull()
        matched = t_present & s_present
        upd = matched & _cond(update_when, False)
        dele = matched & ~upd & _cond(delete_when, False)
        only_t = t_present & ~s_present
        upd_bs = only_t & _cond(update_by_source_when, False)
        del_bs = only_t & ~upd_bs & _cond(delete_by_source_when, False)

        dv_new = j.filter(upd | dele | upd_bs | del_bs).select(
            F.col("t._dv_file").alias("file"),
            F.col("t._dv_pos").alias("pos"),
        )
        update_set = update_set or {}
        upd_exprs = []
        for c in data_cols:
            e = update_set.get(c, F.col(f"s.{c}"))
            if isinstance(e, str):
                e = F.expr(e)
            upd_exprs.append(e.alias(c))
        upd_rows = j.filter(upd).select(*upd_exprs)
        # project to plain source columns FIRST so insert_when's
        # unprefixed names resolve unambiguously
        ins_rows = (
            j.filter(~matched & ~only_t)
            .select(*[F.col(f"s.{c}").alias(c) for c in data_cols])
            .filter(ins_cond)
        )
        appends = upd_rows.unionByName(ins_rows)
        if update_by_source_set:
            bs_exprs = []
            for c in data_cols:
                e = update_by_source_set.get(c, F.col(f"t.{c}"))
                if isinstance(e, str):
                    e = F.expr(e)
                bs_exprs.append(e.alias(c))
            appends = appends.unionByName(j.filter(upd_bs).select(*bs_exprs))
        return _commit_with_dv(
            spark,
            path,
            base,
            man,
            dv_new,
            appends,
            meta,
        )
    finally:
        j.unpersist()
