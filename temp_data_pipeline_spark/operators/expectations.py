"""Row-level expectations with quarantine on versioned-table commits
(the Delta Live Tables EXPECT ... ON VIOLATION pattern).

An expectation is ``name -> SQL predicate``. A row SATISFIES the
expectation when the predicate is TRUE; NULL counts as a violation
(the constraint is not demonstrably met — DLT semantics). The split
is ONE map-only projection (an array of per-expectation violation
tags, compacted), so gating costs zero shuffles at any scale.

``commit_with_expectations`` lands the passing rows as the next
version of the target table and routes violations per policy:

  - 'quarantine' (default): violating rows — plus a ``_violations``
    column naming every failed expectation, comma-joined in
    declaration order — append to the SIBLING versioned table
    ``<path>_quarantine``, so bad rows are queryable, replayable
    after a parser/gate fix, and vacuumable, never silently gone;
  - 'drop': violations are counted but discarded;
  - 'fail': any violation aborts BEFORE the table commit, with a
    sample of violating rows in the error.

Both commits record the expectation set and the violation count in
their manifests (``_expectations`` / ``_quarantined``), making every
version's quality gate auditable from metadata alone. The two
commits are not one cross-table transaction: a crash between them
leaves the data commit durable and the quarantine missing — safe for
the table, lossy only for forensics — and a full re-run re-appends
the quarantine batch (dedup on replay belongs to the caller's
batch-id protocol, as in streaming/sink.py).

No reference counterpart; semantics follow DLT expectations and the
repo's own JSONL corrupt-record quarantine (sources/crawl.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    versions,
)

__all__ = [
    "ExpectationError",
    "violations_column",
    "split_expectations",
    "commit_with_expectations",
]


class ExpectationError(ValueError):
    """Raised by on_violation='fail' when any row violates."""


def violations_column(expectations: dict[str, str]) -> Column:
    """The comma-joined names of every expectation the row violates
    ('' = clean), in declaration order. NULL predicates violate."""
    tags = [
        F.when(
            ~F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)),
            F.lit(name),
        )
        for name, pred in expectations.items()
    ]
    return F.array_join(F.array_compact(F.array(*tags)), ",")


def split_expectations(
    df: DataFrame, expectations: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """(passing rows, violating rows + ``_violations``) — one
    map-only projection each, no shuffle."""
    tagged = df.withColumn("_violations", violations_column(expectations))
    good = tagged.filter(F.col("_violations") == "").drop("_violations")
    bad = tagged.filter(F.col("_violations") != "")
    return good, bad


def commit_with_expectations(
    df: DataFrame,
    path: str,
    expectations: dict[str, str],
    *,
    on_violation: str = "quarantine",
    partition_by: list[str] | None = None,
    append: bool = True,
    meta: dict | None = None,
) -> tuple[int, int]:
    """Gate ``df`` through ``expectations`` and commit the passing
    rows as the next version of ``path`` (``append=True`` carries
    prior versions' data — the ingest shape; False starts a rewrite
    lineage). Returns ``(committed version, violation count)``."""
    if on_violation not in ("quarantine", "drop", "fail"):
        raise ValueError(f"unknown on_violation {on_violation!r}")
    if "_violations" in df.columns:
        raise ValueError("input may not use the reserved column _violations")
    spark = df.sparkSession
    good, bad = split_expectations(df, expectations)
    if on_violation == "fail":
        sample = bad.limit(5).collect()
        if sample:
            raise ExpectationError(
                f"expectations violated on {path}; sample rows "
                f"(first {len(sample)}): "
                + "; ".join(str(r.asDict()) for r in sample)
            )
        n_bad = 0
    else:
        df = df.persist()  # good+bad each scan df once — share it
    try:
        if on_violation != "fail":
            n_bad = bad.count()
        vs = versions(spark, path)
        v = commit_version(
            good,
            path,
            partition_by=partition_by,
            carry_from=(vs[-1] if vs and append else None),
            meta={
                **(meta or {}),
                "_expectations": dict(expectations),
                "_quarantined": n_bad,
            },
        )
        if n_bad and on_violation == "quarantine":
            qpath = f"{path}_quarantine"
            qvs = versions(spark, qpath)
            commit_version(
                bad,
                qpath,
                carry_from=(qvs[-1] if qvs else None),
                meta={
                    "_quarantine_of": path,
                    "_quarantine_for_version": v,
                    "_expectations": dict(expectations),
                },
            )
        return v, n_bad
    finally:
        if on_violation != "fail":
            df.unpersist()
