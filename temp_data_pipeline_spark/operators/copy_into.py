"""COPY INTO — idempotent, incremental file ingestion into a
versioned table (the Databricks/Delta ``COPY INTO`` statement):

    copy_into(spark, path, "/landing/orders", file_format="parquet")

Each invocation lists the source files (one driver-side glob), skips
every file a PREVIOUS copy already loaded, reads only the new ones,
and appends them as ONE metadata-level carry commit. Running the same
statement twice loads nothing the second time — exactly-once file
loading without an external workflow manager.

The loaded-file ledger IS the commit manifest: the batch's file list
rides the manifest meta (``_copied_files``), so ledger-update and
data-append are ONE atomic rename — a crash can never record a file
as loaded without its rows (or vice versa). The skip set is the union
of ``_copied_files`` over the table's LIVE manifests (driver-side
JSON walk, same cost class as ``history()``); expiring a copy commit
via vacuum therefore forgets its files — the Delta COPY INTO
retention caveat, documented here because it is inherent to
log-as-ledger designs.

Scale: the glob listing and ledger walk are metadata-plane
(O(source files) driver strings, same bound class as zonemap's
SKIP_LIST_MAX); the data path is one distributed read of ONLY the new
files and one append — no shuffle, no rewrite of existing bytes.
``max_files`` bounds a single batch (the rest load on the next call),
keeping commit size and manifest growth predictable under a huge
backlog.

Ref parity: the reference ingests files imperatively
(`src/fetch/noaa_hourly.py` re-download checks); this is the
lakehouse-tier equivalent per Delta's published COPY INTO semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.versioned import (
    _fs,
    commit_version,
    commit_with_retries,
    read_manifest,
    versions,
)

__all__ = ["copy_into", "copied_files"]

# one batch's manifest file list stays driver/JSON-sized; a backlog
# larger than this splits across invocations (loud, never silent)
_MAX_BATCH_FILES = 100_000


def copied_files(spark: SparkSession, path: str) -> set[str]:
    """The ledger: every source file a live manifest records as
    copied. Files loaded by commits that vacuum has since expired are
    forgotten (re-copyable) — delete landed files downstream of the
    retention window, or keep history longer."""
    out: set[str] = set()
    for v in versions(spark, path):
        out.update(read_manifest(spark, path, v).get("_copied_files") or [])
    return out


def _list_source(spark: SparkSession, source: str, pattern: str) -> list:
    fs, jvm = _fs(spark, source)
    Path = jvm.org.apache.hadoop.fs.Path
    glob = f"{source.rstrip('/')}/{pattern}"
    statuses = fs.globStatus(Path(glob))
    if statuses is None:
        return []
    return [
        str(st.getPath().toUri().getPath())
        for st in statuses
        if not st.isDirectory()
        and not st.getPath().getName().startswith(("_", "."))
    ]


def copy_into(
    spark: SparkSession,
    path: str,
    source: str,
    *,
    file_format: str = "parquet",
    pattern: str = "*",
    options: dict | None = None,
    max_files: int | None = None,
) -> tuple[int, int]:
    """Load the not-yet-copied files under ``source`` matching
    ``pattern`` into the versioned table at ``path``; returns
    ``(committed version, files loaded)`` — the current version and 0
    when everything was already loaded (the idempotent re-run).

    On an existing table the incoming columns align BY NAME to the
    table schema with store-assignment casts (missing nullable
    columns fill NULL, extra file columns are dropped — the COPY INTO
    relaxed-schema contract); the first copy into an EMPTY table
    creates version 1 under the files' own schema."""
    fmt = file_format.lower()
    if fmt not in ("parquet", "json", "csv"):
        raise ValueError(
            f"FILEFORMAT must be parquet|json|csv, got {file_format!r}"
        )
    candidates = sorted(_list_source(spark, source, pattern))
    cap = min(max_files or _MAX_BATCH_FILES, _MAX_BATCH_FILES)
    n_loaded = 0

    def _commit() -> int:
        # the ledger is re-read INSIDE the retry loop: a racing COPY
        # of the same landing dir loses the manifest rename, retries,
        # and re-filters — its files are now in the winner's ledger,
        # so the loser loads only what is still pending (or nothing)
        nonlocal n_loaded
        loaded = copied_files(spark, path)
        new = [f for f in candidates if f not in loaded]
        if len(new) > cap:
            print(
                f"copy_into: loading {cap} of {len(new)} pending "
                "files (batch bound) — re-run to continue"
            )
            new = new[:cap]
        cur = versions(spark, path)
        base = cur[-1] if cur else 0
        if not new:
            n_loaded = 0
            return base
        n_loaded = len(new)
        reader = spark.read.format(fmt)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        if fmt == "csv":
            reader = reader.option("header", "true").option(
                "inferSchema", "true"
            )
        rows = reader.load(new)
        batch = rows
        if cur:
            from pyspark.sql.types import StructType

            man = read_manifest(spark, path, base)
            if "_schema" in man:
                target = StructType.fromJson(man["_schema"])
                have = set(rows.columns)
                missing_required = [
                    f.name
                    for f in target.fields
                    if f.name not in have
                    and not f.nullable
                    # engine-assigned columns are FILLED, not required
                    and f.name not in (man.get("_identity_columns") or {})
                    and f.name not in (man.get("_generated_columns") or {})
                ]
                if missing_required:
                    raise ValueError(
                        f"COPY INTO: source files lack non-nullable "
                        f"column(s) {missing_required}"
                    )
                dflt = man.get("_column_defaults") or {}
                gcols = man.get("_generated_columns") or {}
                batch = rows.select(
                    *[
                        (
                            F.col(f.name)
                            if f.name in have
                            else F.expr(dflt[f.name])
                            if f.name in dflt and f.name not in gcols
                            else F.lit(None)
                        ).cast(f.dataType).alias(f.name)
                        for f in target.fields
                    ]
                )
                # GENERATED columns absent from the files compute from
                # the fully-bound row (second pass: expressions may
                # reference any base column)
                gen_fill = {
                    c: e for c, e in gcols.items() if c not in have
                }
                if gen_fill:
                    batch = batch.select(
                        *[
                            (
                                F.expr(gen_fill[f.name])
                                .cast(f.dataType)
                                .alias(f.name)
                                if f.name in gen_fill
                                else F.col(f.name)
                            )
                            for f in target.fields
                        ]
                    )
        meta_late = None
        if cur:
            idents = man.get("_identity_columns") or {}
            provided = [c for c in idents if c in set(rows.columns)]
            if provided:
                raise ValueError(
                    f"COPY INTO: source files carry column(s) "
                    f"{provided} which are GENERATED ALWAYS AS "
                    "IDENTITY — the engine assigns those values"
                )
            if idents:
                from temp_data_pipeline_spark.operators.versioned import (
                    assign_identity,
                )

                batch, meta_late = assign_identity(batch, idents)
        return commit_version(
            batch,
            path,
            carry_from=(base if cur else None),
            expected_base=base,
            meta={
                "_copied_files": new,
                "copy_source": source,
            },
            meta_late=meta_late,
        )

    return commit_with_retries(_commit), n_loaded
