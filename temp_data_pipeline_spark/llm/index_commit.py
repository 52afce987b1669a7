"""Numbered-manifest commit log for the LLM index layouts.

The IVF vector index (llm/vector_index.py) and the MinHash dedup
index (llm/dedup_index.py) both publish immutable data dirs through a
single JSON manifest. A lone ``index.json`` overwritten atomically is
safe for readers but carries the lost-update anomaly for writers: two
concurrent appends both read manifest M, and the second swap silently
drops the first's dirs (the race the versioned tables closed in round
7). This module is the same fix at index scale — the manifest becomes
a COMMIT LOG:

  <path>/index-<n>.json    one immutable manifest per committed index
                           version; the file with the highest n is the
                           live index

A writer plans against the latest version B and commits by renaming a
temp file onto exactly ``index-<B+1>.json``. Rename-onto-existing
fails on Hadoop filesystems, so at most one of N racing writers wins
the slot; the loser raises the RETRYABLE
``versioned.CommitConflictError`` — re-read the latest manifest,
re-plan (for an append: nothing to re-plan, the batch dirs are already
written and the retry just re-bases the manifest), commit again. The
retried commit then contains BOTH writers' dirs: no batch is ever
silently dropped.

Same atomic-rename filesystem requirement as the versioned tables:
the arbiter is ``rename`` failing onto an existing destination FILE,
which holds on HDFS and local filesystems; object-store connectors
that emulate rename with copy+delete (S3A) plug a conditional-put /
lock primitive through ``versioned.set_commit_arbiter`` — this module
publishes through the same seam.

Legacy single-file ``index.json`` manifests read back as version 0,
so the first logged commit on a pre-existing index lands at
``index-1.json`` and two racers upgrading a legacy index still
serialize through the same arbiter.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from temp_data_pipeline_spark.operators.versioned import (
    CommitConflictError,
    _fs,
    read_text,
)

_PREFIX = "index-"
_LEGACY = "index.json"

__all__ = [
    "commit_index_manifest",
    "commit_or_reclaim",
    "expire_index_manifests",
    "index_versions",
    "live_index_refs",
    "read_index_state",
]


def index_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed index-manifest versions, ascending (legacy
    ``index.json`` is NOT listed — it is the implicit version 0)."""
    fs, jvm = _fs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(_PREFIX) and name.endswith(".json"):
            try:
                out.append(int(name[len(_PREFIX) : -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def _latest(spark: SparkSession, path: str) -> int:
    """The latest committed version: highest numbered manifest, 0 when
    only a legacy ``index.json`` exists, and 0 for a fresh path (the
    base a first build commits against)."""
    vs = index_versions(spark, path)
    return vs[-1] if vs else 0


def read_index_state(
    spark: SparkSession, path: str, *, kind: str = "LLM"
) -> tuple[int, dict]:
    """(version, manifest) of the live index. Raises FileNotFoundError
    when no manifest exists — a crashed build leaves data dirs but no
    manifest, and only manifested indexes are readable."""
    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    vs = index_versions(spark, path)
    if vs:
        return vs[-1], json.loads(
            read_text(spark, f"{path}/{_PREFIX}{vs[-1]}.json")
        )
    if fs.exists(Path(f"{path}/{_LEGACY}")):
        return 0, json.loads(read_text(spark, f"{path}/{_LEGACY}"))
    raise FileNotFoundError(
        f"no {kind} index at {path} (index manifest missing — build "
        "crashed or still in flight; only manifested indexes are "
        "readable)"
    )


def commit_index_manifest(
    spark: SparkSession, path: str, man: dict, *, expected_base: int
) -> int:
    """Publish ``man`` as index version ``expected_base + 1``. The
    rename onto ``index-<B+1>.json`` is the single atomic arbiter
    between racing writers; the loser raises the retryable
    ``CommitConflictError`` (re-read the latest state, re-base, commit
    again). Returns the committed version number."""
    from temp_data_pipeline_spark.operators.versioned import _arbiter

    fs, jvm = _fs(spark, path)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(path))
    latest = _latest(spark, path)
    if latest != expected_base:
        raise CommitConflictError(path, expected_base, latest)
    version = expected_base + 1
    if _arbiter()(
        spark,
        f"{path}/{_PREFIX}{version}.json",
        json.dumps(man).encode("utf-8"),
    ):
        return version
    raise CommitConflictError(path, expected_base, version)


def commit_or_reclaim(
    spark: SparkSession,
    path: str,
    manifest: dict,
    expected_base: int,
    new_dirs: list[str],
) -> int:
    """Commit ``manifest`` at ``expected_base + 1``; on a conflict the
    losing writer's freshly-written dirs are reclaimed eagerly (they
    would otherwise linger as orphans until vacuum) and the retryable
    error propagates — the same eager-cleanup move as the MOR
    sidecar's ``_commit_with_dv``."""
    try:
        return commit_index_manifest(
            spark, path, manifest, expected_base=expected_base
        )
    except CommitConflictError:
        fs, jvm = _fs(spark, path)
        for d in new_dirs:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{d}"), True)
        raise


def live_index_refs(spark: SparkSession, path: str, extract) -> set[str]:
    """The union of data-dir names every committed manifest (numbered
    AND legacy) references — what vacuum must keep: an in-flight probe
    may still hold any committed manifest, so only dirs NO manifest
    names are reclaimable (plus the orphan-grace window for writers
    mid-commit). ``extract(man) -> list[str]`` names one manifest's
    dirs (the index layouts differ in their dir keys)."""
    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    live: set[str] = set()
    manifests = [
        f"{path}/{_PREFIX}{v}.json" for v in index_versions(spark, path)
    ]
    if fs.exists(Path(f"{path}/{_LEGACY}")):
        manifests.append(f"{path}/{_LEGACY}")
    for m in manifests:
        live.update(extract(json.loads(read_text(spark, m))))
    return live


def expire_index_manifests(
    spark: SparkSession, path: str, keep_last: int = 2
) -> list[int]:
    """Expire old index manifests, keeping the newest ``keep_last``
    numbered ones (the legacy ``index.json`` is removed once any
    numbered manifest exists — it is version 0, always the oldest).
    Run before the dir-reclaiming vacuum so superseded dirs actually
    become unreferenced. Returns the expired version numbers."""
    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    vs = index_versions(spark, path)
    drop = vs[:-keep_last] if keep_last > 0 else vs
    for v in drop:
        fs.delete(Path(f"{path}/{_PREFIX}{v}.json"), False)
    if vs and fs.exists(Path(f"{path}/{_LEGACY}")):
        fs.delete(Path(f"{path}/{_LEGACY}"), False)
        drop = [0] + drop
    return drop
