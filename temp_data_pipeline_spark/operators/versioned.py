"""Versioned snapshot tables: atomic commits + time-travel reads.

The missing piece between "write parquet" and a table format: readers
must never see a half-written snapshot, yesterday's pipeline output
must stay queryable after today's run, and a crashed writer must leave
nothing visible. The standard lakehouse answer (Delta/Iceberg) is a
commit log of manifests; this is that protocol reduced to public
Hadoop-FS primitives:

  <path>/v=<N>/...parquet     immutable snapshot data, one dir/version
  <path>/_manifest/<N>.json   commit marker — a version EXISTS only
                              once its manifest file does

Write protocol: data lands in ``v=<N>`` first (invisible — readers
only trust manifested versions), then the manifest is created with a
write-temp-then-rename, which is atomic on HDFS and object-store
committers alike. A crash at any point leaves an orphan data dir that
no reader resolves; ``vacuum`` deletes it later. Rename-onto-existing
fails, so two racing writers of the same version cannot both commit —
the loser retries at the next number (single-writer pipelines never
hit this).

Scale posture: a commit costs ONE distributed write of the snapshot
plus two driver-side metadata ops (mkdir + rename); reads are plain
parquet scans of one directory, so partition pruning, pushdown, and
every other Catalyst behavior apply unchanged. Snapshots share
nothing, which trades storage for total isolation — at 100 TB, pair
with partitioned snapshots (write only changed partitions per
version) exactly as `streaming/sink.py::stream_upsert_parquet`
documents for its swap.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from temp_data_pipeline_spark.operators.upsert import merge_upsert


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def atomic_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small metadata file with the temp+rename commit point
    (overwriting any previous file): readers either see the complete
    old content or the complete new content, never a partial write.
    The shared primitive behind this module's manifests and the
    vector-index manifest (llm/vector_index.py)."""
    import uuid as _uuid

    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    tmp = Path(f"{path}.{_uuid.uuid4().hex[:8]}.tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()
    final = Path(path)
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"atomic rename failed for {path}")


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small metadata file through the Hadoop FS (py4j COPIES
    byte[] args, so a fill-this-buffer loop reads nothing — drain the
    stream JVM-side instead)."""
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()


def _manifest_dir(path: str) -> str:
    return f"{path}/_manifest"


def _data_dir(path: str, version: int) -> str:
    return f"{path}/v={version}"


def versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending. Orphan data dirs (crashed or
    in-flight writers) are excluded by construction — only the
    manifest names count."""
    fs, jvm = _fs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(_manifest_dir(path))
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                out.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def commit_version(
    df: DataFrame,
    path: str,
    *,
    meta: dict | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as the next snapshot version and make it visible
    atomically. Returns the committed version number.

    Data first (invisible until manifested), then the manifest via
    temp-file + rename. Races resolve at BOTH stages: a data dir that
    appears between the version scan and our errorifexists write, or
    a manifest rename that loses to a concurrent committer, each bump
    to the next number and retry — optimistic concurrency without a
    lock service. Orphan data dirs from crashed writers are skipped
    (never reused) so a crash can never wedge future commits; vacuum
    reclaims them. The manifest rename is the single commit point.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    spark = df.sparkSession
    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(Path(_manifest_dir(path)))
    # next slot must clear BOTH committed versions and orphan data
    # dirs (a crashed writer's v=N would otherwise make every future
    # errorifexists write fail until vacuum — the table would wedge)
    taken = set(versions(spark, path))
    root = Path(path)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v="):
                try:
                    taken.add(int(name[2:]))
                except ValueError:
                    pass
    version = (max(taken) + 1) if taken else 1
    while True:
        data = _data_dir(path, version)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        try:
            writer.parquet(data)
        except AnalysisException:
            # another writer (or an unseen orphan) took this data dir
            # between our scan and the write — retry at the next slot;
            # re-raise anything that is not a path collision
            if not fs.exists(Path(data)):
                raise
            version += 1
            continue
        doc = {
            "version": version,
            "data_dir": data,
            # writer schema: lets read_version reconstruct EMPTY
            # partitioned snapshots (no part files to infer from)
            "_schema": df.schema.jsonValue(),
            **(meta or {}),
        }
        tmp = Path(f"{_manifest_dir(path)}/.{version}.json.tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
        out.close()
        final = Path(f"{_manifest_dir(path)}/{version}.json")
        if fs.rename(tmp, final):
            return version
        # lost the manifest race for this number: discard our data
        # dir and manifest temp, take the next slot
        fs.delete(tmp, False)
        fs.delete(Path(data), True)
        version += 1


def _resolve_version(
    spark: SparkSession, path: str, version: int | None
) -> int:
    committed = versions(spark, path)
    if not committed:
        raise FileNotFoundError(f"no committed versions under {path}")
    if version is None:
        return committed[-1]
    if version not in committed:
        raise FileNotFoundError(
            f"version {version} not committed under {path} (have {committed})"
        )
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the snapshot at ``version``, or the latest
    committed one. Plain parquet scan — pruning/pushdown unchanged.

    An EMPTY partitioned snapshot has no part files to infer a schema
    from (the dir holds only _SUCCESS); the manifest records the
    writer's schema for exactly this case — the Delta/Iceberg answer
    — so empty versions read back as empty frames instead of
    UNABLE_TO_INFER_SCHEMA, and appends to an all-filtered first
    commit don't wedge the table."""
    version = _resolve_version(spark, path, version)
    data = _data_dir(path, version)
    try:
        return spark.read.parquet(data)
    except Exception:
        man = read_manifest(spark, path, version)
        if "_schema" not in man:
            raise
        from pyspark.sql.types import StructType

        return spark.read.schema(
            StructType.fromJson(man["_schema"])
        ).parquet(data)


def read_manifest(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """The commit manifest of ``version`` (default: latest) — the
    metadata a committer recorded (pipeline parameters, row/token
    stats), parsed from the commit marker itself."""
    version = _resolve_version(spark, path, version)
    return json.loads(read_text(spark, f"{_manifest_dir(path)}/{version}.json"))


def commit_merge(
    updates: DataFrame,
    path: str,
    keys: list[str],
    ts_col: str,
    *,
    tiebreak: str | None = None,
    meta: dict | None = None,
) -> int:
    """MERGE-with-history: resolve ``updates`` against the latest
    snapshot (last-writer-wins per key, operators/upsert.py) and
    commit the result as a NEW version — previous versions stay
    queryable. First commit = the updates themselves."""
    spark = updates.sparkSession
    if versions(spark, path):
        base = read_version(spark, path)
        merged = merge_upsert(base, updates, keys, ts_col, tiebreak)
    else:
        merged = updates
    return commit_version(merged, path, meta=meta)


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    keys: list[str],
) -> "DataFrame":
    """Row-level change feed between two committed versions: which
    keys were added, removed, or changed — the audit/debug query a
    versioned table exists to answer ("what did yesterday's run do").

    One full-outer join on the keys; non-key columns compare as a
    single struct with null-safe equality, so a value flipping to or
    from NULL counts as changed. Columns are aligned by name on the
    intersection of the two schemas (schema evolution: a column only
    one version has can't be compared, so it doesn't vote). Emits
    only changed rows — at 100 TB the join is one hash exchange per
    side and unchanged keys never leave the reducers.

    Returns (keys..., change_type ∈ {added, removed, changed}).
    """
    from pyspark.sql import functions as F

    old = read_version(spark, path, v_old)
    new = read_version(spark, path, v_new)
    shared = [c for c in new.columns if c in set(old.columns)]
    missing = [k for k in keys if k not in shared]
    if missing:
        raise ValueError(
            f"key columns absent from at least one version: {missing}"
        )
    val_cols = [c for c in shared if c not in keys]
    # all-key tables degrade to presence-only diff (added/removed)
    payload = (lambda: F.struct(*val_cols)) if val_cols else (lambda: F.lit(True))
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys], payload().alias("_vo")
    ).withColumn("_po", F.lit(True))
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys], payload().alias("_vn")
    ).withColumn("_pn", F.lit(True))
    # NULL-safe key equality: a plain equi-join never matches NULL
    # keys, which would report an unchanged NULL-key row as both
    # added and removed
    cond = None
    for k in keys:
        c = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("_po").isNull(), F.lit("added"))
        .when(F.col("_pn").isNull(), F.lit("removed"))
        .when(~F.col("_vo").eqNullSafe(F.col("_vn")), F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_kn_{k}"), F.col(f"_ko_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
        )
    )


def vacuum(
    spark: SparkSession,
    path: str,
    keep_last: int = 2,
    orphan_grace: float = 86400.0,
) -> list[int]:
    """Expire history: keep the newest ``keep_last`` versions, delete
    older snapshots AND orphan data dirs (crashed writers). Manifest
    removal first, then data — a reader holding an expired version
    number fails loudly at manifest resolution instead of scanning a
    half-deleted directory. Returns the dropped version numbers.

    An unmanifested ``v=N`` dir is only an *orphan* once it is older
    than ``orphan_grace`` seconds (modification time): a concurrent
    writer sits in exactly that state between its parquet write and
    its manifest rename, and deleting the in-flight dir would let the
    rename still succeed and commit a version pointing at deleted
    data (ADVICE r4). Pass ``orphan_grace=0`` only when no writer can
    be running. Expired *committed* versions carry no such race —
    their manifests exist and are removed first."""
    import time

    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    committed = versions(spark, path)
    drop = committed[:-keep_last] if keep_last > 0 else committed
    keep = set(committed) - set(drop)
    dropped = set(drop)
    now_ms = time.time() * 1000.0
    for v in drop:
        fs.delete(Path(f"{_manifest_dir(path)}/{v}.json"), False)
        fs.delete(Path(_data_dir(path, v)), True)
    root = Path(path)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v="):
                try:
                    v = int(name[2:])
                except ValueError:
                    continue
                if v in keep or v in dropped:
                    continue
                # never-manifested dir: possibly an in-flight writer
                if now_ms - st.getModificationTime() >= orphan_grace * 1000.0:
                    fs.delete(st.getPath(), True)
    return drop
