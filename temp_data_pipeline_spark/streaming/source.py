"""Structured-Streaming SOURCE over versioned tables — the Delta
streaming-source equivalent, built on Spark 4's Python DataSource API.

``stream_append_versioned`` (streaming/sink.py) lands micro-batches
INTO a versioned table; this module closes the loop and streams OUT
of one: every committed version is an offset, and each micro-batch
reads exactly the rows the new versions ADDED (read_appended
semantics — added data files minus the endpoint version's deletion
vector), so a downstream pipeline follows a table at O(delta) cost
with Structured Streaming's own exactly-once offset tracking:

    from temp_data_pipeline_spark.streaming.source import (
        register_versioned_source,
    )
    register_versioned_source(spark)
    stream = (spark.readStream.format("versioned_table")
              .option("path", table_path).load())

Scale posture: offset planning is driver-side manifest JSON (KB —
the same dir-level diff as operators/changes.py: shared immutable dir
names cancel unlisted); the FILE READS are distributed — one input
partition per added data file, executed on executors through
pyarrow (the Python DataSource contract; no JVM on that path).
Partition-column values are recovered from the hive dir names, and a
merge-on-read endpoint's deletion vector is subtracted per file by
row position.

Windows crossing a full-table rewrite (compaction / restore /
materialization) raise the same reset contract as the batch feed
(operators/changes.py::FeedResetRequired rationale): the stream
stops loudly; resync from the snapshot with a fresh checkpoint (or
start at ``startingVersion`` = the rewrite version).

Reference: the reference pipeline has no streaming plane (SURVEY §2
streaming rows are engine extensions); semantics follow Delta's
streaming source (startingVersion, appends-only feed) as published.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SOURCE_NAME = "versioned_table"

_REWRITE_KEYS = ("compacted_from", "restored_from", "materialized_from")


def _pa_fs(path: str):
    """(pyarrow FileSystem, normalized path) for a table root — local
    paths and any URI pyarrow speaks (s3://, hdfs://, gs://)."""
    from pyarrow import fs as pafs

    if "://" in path:
        f, p = pafs.FileSystem.from_uri(path)
        return f, p
    return pafs.LocalFileSystem(), path


def _read_json(f, p: str) -> dict:
    with f.open_input_stream(p) as fh:
        return json.loads(fh.read().decode("utf-8"))


def _versions(f, root: str) -> list[int]:
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(f"{root}/_manifest", allow_not_found=True)
    out = []
    for info in f.get_file_info(sel):
        name = info.base_name
        if name.endswith(".json") and not name.startswith("."):
            try:
                out.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def _manifest(f, root: str, v: int) -> dict:
    return _read_json(f, f"{root}/_manifest/{v}.json")


def _manifest_dirs(man: dict) -> list[str]:
    dirs = man.get("data_dirs") or [man["data_dir"]]
    out = []
    for d in dirs:
        d = d.rstrip("/")
        if d.startswith("/") or "://" in d:
            d = d.rsplit("/", 1)[-1]
        out.append(d)
    return out


def _files_of_dirs(f, root: str, dirs: list[str]) -> set[str]:
    """TABLE-RELATIVE data files under the given manifest dirs —
    recursive listing, hidden/marker files skipped (the plain-python
    twin of operators/changes._files_in_dirs)."""
    from pyarrow import fs as pafs

    out: set[str] = set()
    for d in dirs:
        sel = pafs.FileSelector(f"{root}/{d}", recursive=True)
        for info in f.get_file_info(sel):
            if info.type != pafs.FileType.File:
                continue
            name = info.base_name
            if name.startswith(("_", ".")):
                continue
            rel = info.path[len(root.rstrip("/")) + 1 :]
            out.add(rel)
    return out


def _added_files(f, root: str, since: int, until: int) -> list[str]:
    """Files ``until`` resolves beyond ``since`` — dir-level diff
    first (shared names cancel unlisted), file-level inside the
    symmetric difference. ``since=0`` means everything of ``until``
    (the initial snapshot — a full rewrite inside that window is fine,
    the fresh files ARE the snapshot). A MID-STREAM window crossing a
    full-table rewrite raises: the consumer would see the whole table
    again as inserts with no matching deletes."""
    if since > 0:
        for v in _versions(f, root):
            if since < v <= until:
                man = _manifest(f, root, v)
                for k in _REWRITE_KEYS:
                    if man.get(k) is not None:
                        raise RuntimeError(
                            f"versioned_table stream on {root} crosses "
                            f"version {v} ({k}: a full-table rewrite) — "
                            "resync with a fresh checkpoint (the first "
                            "batch re-emits the snapshot), or restart "
                            f"at startingVersion={v}"
                        )
    dirs_new = set(_manifest_dirs(_manifest(f, root, until)))
    dirs_old = (
        set(_manifest_dirs(_manifest(f, root, since))) if since else set()
    )
    only_new = _files_of_dirs(f, root, sorted(dirs_new - dirs_old))
    only_old = _files_of_dirs(f, root, sorted(dirs_old - dirs_new))
    return sorted(only_new - only_old)


def _hive_value(raw: str, dtype):
    """Decode one hive dir value to the partition column's type."""
    from urllib.parse import unquote

    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    s = unquote(raw)
    if isinstance(dtype, (LongType, IntegerType, ShortType)):
        return int(s)
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(s)
    if isinstance(dtype, BooleanType):
        return s == "true"
    if isinstance(dtype, DateType):
        from datetime import date

        return date.fromisoformat(s)
    if isinstance(dtype, StringType):
        return s
    raise TypeError(
        f"unsupported partition column type {dtype} for streaming source"
    )


class _FilePartition(InputPartition):
    def __init__(
        self, root: str, rel_file: str, dv_file: str | None
    ) -> None:
        self.root = root
        self.rel_file = rel_file
        self.dv_file = dv_file


class VersionedTableStreamReader(DataSourceStreamReader):
    """Offsets are committed version numbers: offset {'version': N}
    means every row visible through version N has been emitted. Each
    planned range (start, end] becomes one InputPartition per added
    data file — distributed file reads, driver-side JSON planning."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "versioned_table source requires .option('path', <table>)"
            )
        self._schema = schema
        self._starting = int(options.get("startingversion", 0))
        f, root = _pa_fs(self._path)
        self._f, self._root = f, root

    def initialOffset(self) -> dict:
        return {"version": self._starting}

    def latestOffset(self) -> dict:
        vs = _versions(self._f, self._root)
        latest = vs[-1] if vs else 0
        return {"version": max(latest, self._starting)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        since, until = int(start["version"]), int(end["version"])
        if until <= since:
            return []
        files = _added_files(self._f, self._root, since, until)
        dv = _manifest(self._f, self._root, until).get("_dv")
        dv_file = f"_dv/{dv}" if dv else None
        return [
            _FilePartition(self._root, rel, dv_file) for rel in files
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        """Executor-side: one parquet file through pyarrow, hive
        partition values recovered from the path, the endpoint DV's
        positions for THIS file subtracted by row index."""
        import pyarrow.parquet as pq

        f, _ = _pa_fs(partition.root)
        rel = partition.rel_file
        tbl = pq.read_table(f"{partition.root}/{rel}", filesystem=f)
        # hive partition columns: every path segment between the
        # version dir and the file name
        hive = {}
        for seg in rel.split("/")[1:-1]:
            if "=" in seg:
                k, raw = seg.split("=", 1)
                hive[k] = raw
        dropped: set[int] = set()
        if partition.dv_file:
            import pyarrow.compute as pc

            dv = pq.read_table(
                f"{partition.root}/{partition.dv_file}", filesystem=f
            )
            mask = pc.equal(dv.column("file"), rel)
            dropped = set(dv.filter(mask).column("pos").to_pylist())
        cols = {}
        for field in self._schema.fields:
            if field.name in hive:
                cols[field.name] = None  # filled per-row below
            elif field.name in tbl.column_names:
                cols[field.name] = tbl.column(field.name).to_pylist()
            else:
                cols[field.name] = None
        n = tbl.num_rows
        hive_vals = {
            fld.name: _hive_value(hive[fld.name], fld.dataType)
            for fld in self._schema.fields
            if fld.name in hive
        }
        for i in range(n):
            if i in dropped:
                continue
            yield tuple(
                hive_vals[fld.name]
                if fld.name in hive_vals
                else (
                    cols[fld.name][i] if cols[fld.name] is not None else None
                )
                for fld in self._schema.fields
            )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint; nothing to ack


class VersionedTableDataSource(DataSource):
    """``spark.readStream.format('versioned_table')`` — streaming
    reads of operators/versioned.py tables. Options:

    - ``path`` (required): the table root
    - ``startingVersion`` (default 0): emit rows added AFTER this
      version (0 = the whole table, first batch = initial snapshot)
    """

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "versioned_table source requires .option('path', <table>)"
            )
        f, root = _pa_fs(path)
        vs = _versions(f, root)
        if not vs:
            raise FileNotFoundError(f"no committed versions under {path}")
        man = _manifest(f, root, vs[-1])
        if "_schema" not in man:
            raise ValueError(
                f"table {path} predates recorded schemas — compact once "
                "to record one"
            )
        return StructType.fromJson(man["_schema"])

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VersionedTableStreamReader(schema, dict(self.options))


def register_versioned_source(spark) -> None:
    """Register the source on a session (idempotent).

    The DataSource class ships to Spark's python workers by PICKLE:
    by-reference pickling would require this repo on every worker's
    import path (it is not, when the driver runs from another cwd), so
    the module registers for pickle-BY-VALUE — possible because
    source.py deliberately imports nothing from the rest of this
    package (stdlib + pyspark + pyarrow only)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(VersionedTableDataSource)
