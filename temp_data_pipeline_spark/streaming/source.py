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


def _files_of_dirs_sized(
    f, root: str, dirs: list[str]
) -> dict[str, int]:
    """TABLE-RELATIVE data files (with byte sizes) under the given
    manifest dirs — recursive listing, hidden/marker files skipped
    (the plain-python twin of operators/changes._files_in_dirs). The
    sizes come free with the listing and drive partition grouping."""
    from pyarrow import fs as pafs

    out: dict[str, int] = {}
    for d in dirs:
        sel = pafs.FileSelector(f"{root}/{d}", recursive=True)
        for info in f.get_file_info(sel):
            if info.type != pafs.FileType.File:
                continue
            name = info.base_name
            if name.startswith(("_", ".")):
                continue
            rel = info.path[len(root.rstrip("/")) + 1 :]
            out[rel] = int(info.size or 0)
    return out


def _files_of_dirs(f, root: str, dirs: list[str]) -> set[str]:
    return set(_files_of_dirs_sized(f, root, dirs))


def _check_window_py(f, root: str, since: int, until: int) -> None:
    """``since=0`` is the initial snapshot — a full rewrite inside
    that window is fine, the fresh files ARE the snapshot. A
    MID-STREAM window crossing a full-table rewrite raises: the
    consumer would see the whole table again as churn."""
    if since <= 0:
        return
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


def _dir_diff_py(
    f, root: str, since: int, until: int
) -> tuple[set[str], set[str], list[str], set[str], dict[str, int]]:
    """(added, removed, shared_dirs, shared_overlap, sizes) — the
    plain-python twin of operators/changes._dir_diff: shared dir NAMES
    are immutable and cancel without a listing; only the
    symmetric-difference dirs are walked. ``sizes`` covers every
    listed file (added and removed) for partition grouping."""
    man_new = _manifest(f, root, until)
    man_old = _manifest(f, root, since) if since else {}
    dirs_new = set(_manifest_dirs(man_new))
    dirs_old = set(_manifest_dirs(man_old)) if since else set()

    def _external(man: dict, walk: set) -> list[str]:
        roots = man.get("_dir_roots") or {}
        return sorted(
            d for d in walk
            if roots.get(d) or roots.get(d.split("/", 1)[0])
        )

    ext = _external(man_new, dirs_new - dirs_old) + _external(
        man_old, dirs_old - dirs_new
    )
    if ext:
        # shallow-clone references resolve under ANOTHER table's root;
        # the streaming file planner is root-per-table — localize the
        # bytes first rather than silently reading the wrong path
        raise ValueError(
            f"streaming window touches shallow-clone references {ext} "
            "— localize the clone first (compact_snapshot / OPTIMIZE)"
        )
    sized_new = _files_of_dirs_sized(f, root, sorted(dirs_new - dirs_old))
    sized_old = _files_of_dirs_sized(f, root, sorted(dirs_old - dirs_new))
    only_new, only_old = set(sized_new), set(sized_old)
    return (
        only_new - only_old,
        only_old - only_new,
        sorted(dirs_old & dirs_new),
        only_new & only_old,
        {**sized_old, **sized_new},
    )


def _added_files(f, root: str, since: int, until: int) -> list[str]:
    """Files ``until`` resolves beyond ``since``."""
    _check_window_py(f, root, since, until)
    added, _, _, _, _ = _dir_diff_py(f, root, since, until)
    return sorted(added)


def _dv_named_files(f, root: str, dv_rel: str | None) -> set[str]:
    """The distinct files a DV sidecar names (metadata-sized — one
    small parquet read driver-side)."""
    if not dv_rel:
        return set()
    import pyarrow.parquet as pq

    dv = pq.read_table(
        f"{root}/{dv_rel}", filesystem=f, columns=["file"]
    )
    return set(dv.column("file").to_pylist())


# positions embedded into the input partitions while the window's DV
# sidecars stay under this many rows (driver holds the dict once; each
# partition pickles ONLY its own file's list) — above it, executors
# fall back to a filtered sidecar read pruned by row-group stats
_DV_EMBED_MAX = 2_000_000


def _dv_num_rows(f, root: str, dv_rel: str | None) -> int:
    """Sidecar row count from parquet footers only (no data read)."""
    if not dv_rel:
        return 0
    import pyarrow.dataset as pads

    return pads.dataset(
        f"{root}/{dv_rel}", filesystem=f, format="parquet"
    ).count_rows()


def _dv_positions_by_file(
    f, root: str, dv_rel: str | None
) -> dict[str, list[int]]:
    """``rel_file -> positions`` — ONE driver-side read of the whole
    sidecar, shared by every partition of the micro-batch (verdict r8
    #2: each file partition used to re-read the full DV on its
    executor)."""
    if not dv_rel:
        return {}
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{root}/{dv_rel}", filesystem=f, columns=["file", "pos"]
    )
    out: dict[str, list[int]] = {}
    for fl, p in zip(
        t.column("file").to_pylist(), t.column("pos").to_pylist()
    ):
        out.setdefault(fl, []).append(p)
    return out


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


def _colmap(
    ids_man: dict, dirs_man: dict, rel_file: str
) -> dict | None:
    """``output name -> on-disk name`` for this file's dir, or None
    (identity) — the plain-python twin of versioned._dir_mapping +
    _disk_schema_and_rename's id inversion, so the streaming source
    reads dirs written BEFORE a metadata-only column rename/drop
    under their stable field ids like every batch reader. Output
    names come from ``ids_man`` (always the UNTIL manifest — the
    stream's schema), the dir's disk layout from ``dirs_man`` (the
    manifest that LISTS the dir: until for added/shared files, since
    for removed ones). A name with no disk counterpart (column added
    after the dir was written, including drop-then-re-add's fresh id)
    maps to None → null fill.

    A dir that is IDENTITY under ``dirs_man`` (written under its
    current schema) is still not identity under ``ids_man`` when the
    two manifests disagree — a window spanning a metadata-only
    rename: removed files resolve from SINCE, whose disk names are
    the OLD names (ADVICE r8 #4: aligning them by name null-filled
    the renamed column, mis-keying every keyed consumer). The disk
    mapping then derives from ``dirs_man``'s own field ids."""
    ids = ids_man.get("_field_ids") or {}
    if not ids:
        return None  # tracking never engaged on the output side
    d = rel_file.rsplit("/", 1)[0] if "/" in rel_file else ""

    def _lookup(man: dict) -> dict | None:
        dirf = man.get("_dir_fields") or {}
        m = dirf.get(d)
        if m is None:
            head = d.split("/", 1)[0]
            m = dirf.get(head)
            if m is None:
                for k2, v2 in dirf.items():
                    if k2.split("/", 1)[0] == head:
                        return v2
        return m

    mapping = _lookup(dirs_man)
    if mapping is None and dirs_man is not ids_man:
        # a since-listed dir the until manifest still knows (carried
        # siblings share the version root's mapping)
        mapping = _lookup(ids_man)
    if mapping is None:
        own = dirs_man.get("_field_ids")
        if own is None or own == ids:
            return None  # both endpoints agree: identity
        mapping = dict(own)  # disk names ARE dirs_man's current names
    inv = {fid: disk for disk, fid in mapping.items()}
    return {name: inv.get(fid) for name, fid in ids.items()}


# one input partition targets this many bytes of parquet: a table of
# many small files (trickle streaming appends before compaction) would
# otherwise cost one high-overhead Python task PER FILE — at 100k
# files that is 100k task launches per micro-batch. Grouping is by the
# listing's sizes (free) and never splits a file.
_GROUP_TARGET_BYTES = 128 * 1024 * 1024


class _FilePartition(InputPartition):
    """One input partition = one KIND of work over a GROUP of files
    (grouped to ~_GROUP_TARGET_BYTES so small files amortize the
    Python task overhead). ``kind``:

    - 'insert'  — rows of ADDED files, minus ``dv_new`` positions
    - 'delete'  — rows of REMOVED files visible at since (minus
                  ``dv_old``), emitted as deletes (cdc mode)
    - 'dvdelta' — SHARED files one of the DVs names: rows in
                  dv_new−dv_old are deletes, dv_old−dv_new are
                  resurrect-inserts (cdc mode)

    ``files`` is a list of ``(rel_file, colmap, pos_old, pos_new)``:
    ``colmap`` (current name -> on-disk name, or None = identity)
    aligns dirs written before a column rename/drop by stable field
    id, resolved driver-side from the manifest that LISTS the file's
    dir; ``pos_*`` are THIS file's DV positions, resolved driver-side
    from one read of each sidecar and embedded while the window's DVs
    are small (the overwhelmingly common case). None = not embedded:
    the executor falls back to a filtered sidecar read (row-group
    stats prune — sidecars are written sorted by file).
    """

    def __init__(
        self,
        root: str,
        kind: str,
        files: list,
        dv_old: str | None = None,
        dv_new: str | None = None,
    ) -> None:
        self.root = root
        self.kind = kind
        self.files = files
        self.dv_old = dv_old
        self.dv_new = dv_new


def _grouped(entries: list, sizes: dict) -> list[list]:
    """Bin-pack ``(rel, colmap, pos_old, pos_new)`` entries into
    ~_GROUP_TARGET_BYTES groups, preserving sorted order (adjacent
    files usually share a dir → one object-store prefix per task)."""
    groups: list[list] = []
    cur: list = []
    acc = 0
    for e in entries:
        sz = sizes.get(e[0], _GROUP_TARGET_BYTES)
        if cur and acc + sz > _GROUP_TARGET_BYTES:
            groups.append(cur)
            cur, acc = [], 0
        cur.append(e)
        acc += sz
    if cur:
        groups.append(cur)
    return groups


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
        self._mode = options.get("mode", "appends").lower()
        if self._mode not in ("appends", "cdc"):
            raise ValueError(
                f"unknown mode {self._mode!r} (use 'appends' or 'cdc')"
            )
        # data fields exclude the synthetic _change_type of cdc mode
        self._schema = schema
        self._data_fields = [
            fld for fld in schema.fields if fld.name != "_change_type"
        ]
        self._starting = int(options.get("startingversion", 0))
        # admission control: at most this many source VERSIONS per
        # micro-batch (the Delta maxFilesPerTrigger idea at this
        # source's natural granularity) — steady-state smoothing so a
        # bursty producer doesn't snowball into mega-batches.  The
        # python DataSource API has no ReadLimit/SupportsAdmission-
        # Control, so the cap anchors on the reader's own high-water
        # mark, and that anchor MUST never sit behind Spark's
        # checkpoint (a capped latestOffset behind the checkpoint
        # regresses offsets and re-emits files).  The engine calls
        # latestOffset BEFORE initialOffset, so the first call of ANY
        # run — fresh or restart — cannot know a safe floor: the
        # FIRST batch of a run is always uncapped, every later one is
        # bounded (anchor armed by initialOffset / partitions /
        # commit, whichever the engine reaches first).
        self._max_versions = (
            int(options.get("maxversionspertrigger", 0)) or None
        )
        # byte-based sibling (Delta's maxBytesPerTrigger): admit
        # whole versions until their cumulative ADDED-file bytes
        # (already in the manifests' dir listings — no data read)
        # reach the cap, always at least one version so a fat commit
        # can't stall the stream. Composes with the version cap
        # (version cap bounds the candidate range first); same
        # anchor discipline — the first batch of a run is uncapped.
        self._max_bytes = int(options.get("maxbytespertrigger", 0)) or None
        self._anchor: int | None = None
        f, root = _pa_fs(self._path)
        self._f, self._root = f, root

    def initialOffset(self) -> dict:
        self._anchor = self._starting
        return {"version": self._starting}

    def latestOffset(self) -> dict:
        vs = _versions(self._f, self._root)
        latest = max(vs[-1] if vs else 0, self._starting)
        if (
            self._max_versions or self._max_bytes
        ) and self._anchor is not None:
            if self._max_versions:
                latest = min(latest, self._anchor + self._max_versions)
            if self._max_bytes and latest > self._anchor:
                acc, admitted = 0, self._anchor
                for v in range(self._anchor + 1, latest + 1):
                    added, _, _, _, sizes = _dir_diff_py(
                        self._f, self._root, v - 1, v
                    )
                    acc += sum(sizes.get(rel, 0) for rel in added)
                    # the version is admitted BEFORE the cap check:
                    # minimum-progress — one fat commit lands alone in
                    # its own micro-batch rather than stalling forever
                    admitted = v
                    if acc >= self._max_bytes:
                        break
                latest = admitted
            latest = max(latest, self._anchor)
            self._anchor = latest
        return {"version": latest}

    def commit(self, end: dict) -> None:
        v = int(end.get("version", 0))
        if self._anchor is None or v > self._anchor:
            self._anchor = v

    def _dv_rel(self, version: int) -> str | None:
        if version <= 0:
            return None
        dv = _manifest(self._f, self._root, version).get("_dv")
        return f"_dv/{dv}" if dv else None

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        since, until = int(start["version"]), int(end["version"])
        # learn the checkpoint position (restart replays call this
        # before any latestOffset) — the admission-control anchor may
        # only move FORWARD
        hw = max(since, until)
        if self._anchor is None or hw > self._anchor:
            self._anchor = hw
        if until <= since:
            return []
        f, root = self._f, self._root
        _check_window_py(f, root, since, until)
        man_until = _manifest(f, root, until)
        dv_new = self._dv_rel(until)
        dv_old = self._dv_rel(since) if self._mode == "cdc" else None
        # ONE driver-side read per sidecar, positions embedded per
        # partition while small; None disables embedding (fallback:
        # filtered executor read)
        if (
            _dv_num_rows(f, root, dv_new) + _dv_num_rows(f, root, dv_old)
            <= _DV_EMBED_MAX
        ):
            emb_new = _dv_positions_by_file(f, root, dv_new)
            emb_old = _dv_positions_by_file(f, root, dv_old)
        else:
            emb_new = emb_old = None

        def _new(rel):
            return emb_new.get(rel, []) if emb_new is not None else None

        def _old(rel):
            return emb_old.get(rel, []) if emb_old is not None else None

        if self._mode == "appends":
            added, _, _, _, sizes = _dir_diff_py(f, root, since, until)
            ins = [
                (rel, _colmap(man_until, man_until, rel), None, _new(rel))
                for rel in sorted(added)
            ]
            return [
                _FilePartition(root, "insert", g, None, dv_new)
                for g in _grouped(ins, sizes)
            ]
        # cdc: adds removed-file deletes and the DV delta over shared
        # files — pruned to the files either endpoint's DV names, the
        # same O(delta) plan as operators/changes.changes_between
        added, removed, shared_dirs, shared_overlap, sizes = _dir_diff_py(
            f, root, since, until
        )
        man_since = _manifest(f, root, since) if removed else {}
        ins = [
            (rel, _colmap(man_until, man_until, rel), None, _new(rel))
            for rel in sorted(added)
        ]
        out = [
            _FilePartition(root, "insert", g, None, dv_new)
            for g in _grouped(ins, sizes)
        ]
        # removed files are listed by SINCE's manifest — resolve
        # their disk names there, project to until's field set
        dels = [
            (rel, _colmap(man_until, man_since, rel), _old(rel), None)
            for rel in sorted(removed)
        ]
        out += [
            _FilePartition(root, "delete", g, dv_old, None)
            for g in _grouped(dels, sizes)
        ]
        if emb_new is not None:
            named = set(emb_new) | set(emb_old)
        else:
            named = _dv_named_files(f, root, dv_new) | _dv_named_files(
                f, root, dv_old
            )
        prefixes = tuple(f"{d}/" for d in shared_dirs)
        cands = sorted(
            x
            for x in named
            if x in shared_overlap or (prefixes and x.startswith(prefixes))
        )
        # shared dirs are never listed (that is the point of the
        # dir-level diff), so dvdelta files have no known size: group
        # them one per partition — the DV delta names few files
        dvd = [
            (rel, _colmap(man_until, man_until, rel), _old(rel), _new(rel))
            for rel in cands
        ]
        out += [
            _FilePartition(root, "dvdelta", [e], dv_old, dv_new)
            for e in dvd
        ]
        return out

    def _positions(self, f, root: str, dv_rel: str | None, rel: str):
        """Fallback for over-cap sidecars: a FILTERED read — sidecars
        are written sorted by file, so row-group statistics prune the
        scan to this file's groups instead of materializing the whole
        DV per partition (verdict r8 #2)."""
        if not dv_rel:
            return set()
        import pyarrow.dataset as pads

        t = pads.dataset(
            f"{root}/{dv_rel}", filesystem=f, format="parquet"
        ).to_table(columns=["pos"], filter=pads.field("file") == rel)
        return set(t.column("pos").to_pylist())

    def read(self, partition: _FilePartition) -> Iterator:
        """Executor-side: the partition's file group through pyarrow,
        hive partition values recovered from each path, DV positions
        per file resolved by row index. Emits Arrow RecordBatches
        (the Python DataSource fast path — columnar end to end, no
        per-row tuple materialization); in cdc mode each batch
        carries its constant ``_change_type`` column, and 'dvdelta'
        files emit only the delta rows (newly deleted /
        resurrected)."""
        f, _ = _pa_fs(partition.root)
        for entry in partition.files:
            yield from self._read_one(f, partition, entry)

    def _read_one(
        self, f, partition: _FilePartition, entry
    ) -> Iterator:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        rel, colmap, e_pos_old, e_pos_new = entry
        tbl = pq.read_table(f"{partition.root}/{rel}", filesystem=f)
        n = tbl.num_rows
        # hive partition columns: every path segment between the
        # version dir and the file name
        hive = {}
        for seg in rel.split("/")[1:-1]:
            if "=" in seg:
                k, raw = seg.split("=", 1)
                hive[k] = raw
        pos_old = (
            set(e_pos_old)
            if e_pos_old is not None
            else self._positions(f, partition.root, partition.dv_old, rel)
        )
        pos_new = (
            set(e_pos_new)
            if e_pos_new is not None
            else self._positions(f, partition.root, partition.dv_new, rel)
        )

        def _without(pos: set[int]):
            keep = np.ones(n, dtype=bool)
            if pos:
                keep[np.fromiter(pos, dtype=np.int64)] = False
            return keep

        def _only(pos: set[int]):
            keep = np.zeros(n, dtype=bool)
            if pos:
                keep[np.fromiter(pos, dtype=np.int64)] = True
            return keep

        if partition.kind == "insert":
            emit = [(_without(pos_new), "insert")]
        elif partition.kind == "delete":
            emit = [(_without(pos_old), "delete")]
        else:  # dvdelta over a shared file
            emit = [
                (_only(pos_new - pos_old), "delete"),
                (_only(pos_old - pos_new), "insert"),
            ]
        cdc = self._mode == "cdc"
        for keep, change in emit:
            m = int(keep.sum())
            if m == 0:
                continue
            sub = tbl.filter(pa.array(keep))
            arrays, names = [], []
            for fld in self._data_fields:
                at = to_arrow_type(fld.dataType)
                # disk name: identity unless the dir predates a
                # rename/drop (colmap by stable field id; a mapped
                # None = column added after the dir was written)
                disk = fld.name
                if colmap is not None:
                    disk = colmap.get(fld.name, fld.name)
                if disk is not None and disk in hive:
                    # hive dir segments carry the DISK name — a
                    # renamed partition column resolves through the
                    # same field-id mapping as data columns
                    v = _hive_value(hive[disk], fld.dataType)
                    arr = (
                        pa.nulls(m, at)
                        if v is None
                        else pa.array([v] * m, type=at)
                    )
                elif disk is not None and disk in sub.column_names:
                    arr = sub.column(disk).combine_chunks().cast(at)
                else:
                    arr = pa.nulls(m, at)  # schema-evolution null fill
                arrays.append(arr)
                names.append(fld.name)
            if cdc:
                arrays.append(pa.array([change] * m, type=pa.string()))
                names.append("_change_type")
            yield from pa.table(arrays, names=names).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint; nothing to ack


class VersionedTableDataSource(DataSource):
    """``spark.readStream.format('versioned_table')`` — streaming
    reads of operators/versioned.py tables. Options:

    - ``path`` (required): the table root
    - ``startingVersion`` (default 0): emit rows added AFTER this
      version (0 = the whole table, first batch = initial snapshot)
    - ``mode`` (default 'appends'): 'appends' streams added rows only
      (the incremental-sync feed); 'cdc' streams the FULL change feed
      — the table's columns plus ``_change_type`` ('insert'|'delete'),
      including removed-file deletes and the deletion-vector delta
      over shared files (pruned to the files the DVs name) — Delta's
      readChangeFeed, with the same semantics as the batch
      operators/changes.changes_between
    """

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        from pyspark.sql.types import StringType, StructField

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
        schema = StructType.fromJson(man["_schema"])
        if self.options.get("mode", "appends").lower() == "cdc":
            schema = StructType(
                schema.fields + [StructField("_change_type", StringType())]
            )
        return schema

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
