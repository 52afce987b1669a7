"""Hidden partitioning: Iceberg-style partition TRANSFORMS for
versioned tables.

Raw Hive partitioning makes the USER partition-aware: they must write
`date = '2026-01-01'` filters against a physical layout column and
remember to derive it on every write. Transforms make the layout a
TABLE property instead — the writer declares ``days(ts)`` once, every
commit derives the partition value mechanically, and readers filter
on the SOURCE column (`ts BETWEEN ...`) while the engine adds the
implied partition predicate for planning-time pruning. This is the
Iceberg partition-spec model re-expressed over the parquet +
manifest layout of `operators/versioned.py`.

Supported transforms (spec strings, stored in the commit's manifest):

  identity(col)      raw value (plain Hive partitioning)
  years(col)         'yyyy'        from a timestamp/date
  months(col)        'yyyy-MM'
  days(col)          'yyyy-MM-dd'
  hours(col)         'yyyy-MM-dd-HH'
  bucket(n, col)     pmod(xxhash64(col), n) — spreads high-cardinality
                     keys over n dirs; equality filters prune to 1
  truncate(w, col)   strings: first w chars; integers: w·floor(x/w)

Derived columns are named ``_p_<transform>_<col>`` so they can never
collide with user columns, and they sort lexicographically in time
order (zero-padded calendar forms) — partition listings stay ordered
without knowing the transform.

Pruning correctness rule: every transform here is MONOTONIC over its
source (calendar forms) or exact under equality (bucket, truncate),
so ``source BETWEEN lo AND hi`` implies ``derived BETWEEN f(lo) AND
f(hi)`` (calendar/truncate) and ``source = v`` implies ``derived =
f(v)`` (all). `pruned_eq` / `pruned_between` construct exactly those
implications — they never widen and never drop rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "apply_transforms",
    "commit_version_transformed",
    "parse_transform",
    "partition_col_name",
    "pruned_between",
    "pruned_eq",
    "read_version_pruned",
]

_SPEC_RE = re.compile(
    r"^\s*(identity|years|months|days|hours|bucket|truncate)\s*\(\s*"
    r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)

_CAL_FMT = {
    "years": "yyyy",
    "months": "yyyy-MM",
    "days": "yyyy-MM-dd",
    "hours": "yyyy-MM-dd-HH",
}


def parse_transform(spec: str) -> tuple[str, int | None, str]:
    """``'days(ts)'`` → ('days', None, 'ts'); ``'bucket(16, id)'`` →
    ('bucket', 16, 'id'). Raises on malformed specs or a missing
    width for bucket/truncate."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(
            f"bad transform spec {spec!r} — expected name(col) or "
            "name(width, col) with name in identity/years/months/days/"
            "hours/bucket/truncate"
        )
    name, width, col = m.group(1), m.group(2), m.group(3)
    if name in ("bucket", "truncate"):
        if width is None:
            raise ValueError(f"{name} requires a width: {name}(n, col)")
        return name, int(width), col
    if width is not None:
        raise ValueError(f"{name} takes no width argument: {spec!r}")
    return name, None, col


def partition_col_name(spec: str) -> str:
    name, _w, col = parse_transform(spec)
    return f"_p_{name}_{col}"


def _derive(name: str, width: int | None, col: Column, dtype: str) -> Column:
    if name == "identity":
        return col
    if name in _CAL_FMT:
        return F.date_format(col, _CAL_FMT[name])
    if name == "bucket":
        return F.pmod(F.xxhash64(col), F.lit(width)).cast("int")
    # truncate
    if dtype.startswith("string"):
        return F.substring(col, 1, width)
    return (F.floor(col / F.lit(width)) * F.lit(width)).cast("long")


def apply_transforms(
    df: DataFrame, specs: list[str]
) -> tuple[DataFrame, list[str]]:
    """Attach the derived partition columns for ``specs``; returns
    (df_with_columns, derived_names) — feed the names to
    ``commit_version(partition_by=...)`` / ``partitionBy``."""
    names = []
    out = df
    types = dict(df.dtypes)
    for spec in specs:
        name, width, col = parse_transform(spec)
        if col not in types:
            raise ValueError(f"transform {spec!r}: no column {col!r}")
        pname = partition_col_name(spec)
        out = out.withColumn(
            pname, _derive(name, width, F.col(col), types[col])
        )
        names.append(pname)
    return out, names


def pruned_eq(spec: str, value, dtype: str | None = None) -> Column:
    """``source = value`` with the implied partition-equality
    predicate attached — exact for every transform.

    ``dtype``: the SOURCE column's Spark type (from ``df.dtypes``).
    Required for correctness with ``bucket`` — xxhash64 hashes an
    int32 literal differently from the same value as int64, so the
    literal must be cast to the column's exact type before hashing.
    (`read_version_pruned` passes it automatically.)"""
    name, width, col = parse_transform(spec)
    pname = partition_col_name(spec)
    lit = F.lit(value).cast(dtype) if dtype else F.lit(value)
    src = F.col(col) == lit
    if name == "identity":
        return src & (F.col(pname) == lit)
    if name in _CAL_FMT:
        return src & (F.col(pname) == F.date_format(lit, _CAL_FMT[name]))
    if name == "bucket":
        if dtype is None:
            raise ValueError(
                "bucket pruning needs the source column dtype (the "
                "literal must hash with the column's exact type)"
            )
        return src & (
            F.col(pname) == F.pmod(F.xxhash64(lit), F.lit(width)).cast("int")
        )
    # truncate
    if isinstance(value, str):
        return src & (F.col(pname) == F.lit(value[:width]))
    return src & (F.col(pname) == F.lit((value // width) * width))


def pruned_between(spec: str, lo, hi) -> Column:
    """``source BETWEEN lo AND hi`` plus the implied partition-range
    predicate. Valid for the monotonic transforms (identity /
    calendar / integer-truncate); bucket is equality-only and
    rejected here."""
    name, width, col = parse_transform(spec)
    pname = partition_col_name(spec)
    src = F.col(col).between(F.lit(lo), F.lit(hi))
    if name == "identity":
        return src & F.col(pname).between(F.lit(lo), F.lit(hi))
    if name in _CAL_FMT:
        fmt = _CAL_FMT[name]
        return src & F.col(pname).between(
            F.date_format(F.lit(lo), fmt), F.date_format(F.lit(hi), fmt)
        )
    if name == "truncate":
        if isinstance(lo, str) or isinstance(hi, str):
            return src & F.col(pname).between(
                F.lit(str(lo)[:width]), F.lit(str(hi)[:width])
            )
        return src & F.col(pname).between(
            F.lit((lo // width) * width), F.lit((hi // width) * width)
        )
    raise ValueError(
        f"bucket transforms support equality pruning only (pruned_eq); "
        f"got range filter on {spec!r}"
    )


def commit_version_transformed(
    df: DataFrame,
    path: str,
    transforms: list[str],
    *,
    meta: dict | None = None,
    carry_from: int | None = None,
) -> int:
    """Commit a snapshot partitioned by ``transforms`` — the derived
    columns are computed here (the writer never hand-derives them)
    and the spec list is recorded in the manifest, making the layout
    a table property every later commit and pruned read re-reads.
    Composes with metadata-level appends via ``carry_from``."""
    from temp_data_pipeline_spark.operators.versioned import commit_version

    df2, pcols = apply_transforms(df, transforms)
    return commit_version(
        df2,
        path,
        partition_by=pcols,
        carry_from=carry_from,
        meta={**(meta or {}), "transforms": list(transforms)},
    )


def read_version_pruned(
    spark,
    path: str,
    version: int | None = None,
    *,
    eq: dict | None = None,
    between: dict | None = None,
) -> DataFrame:
    """Time travel + HIDDEN pruning: filters are stated on SOURCE
    columns (``eq={'user': 7}``, ``between={'ts': (lo, hi)}``); the
    manifest's transform specs supply the implied partition
    predicates, so the scan prunes `_p_*=` directories at planning
    time. Source columns without a transform filter normally (no
    pruning, still correct). Derived ``_p_*`` columns are dropped
    from the result."""
    from temp_data_pipeline_spark.operators.versioned import (
        read_manifest,
        read_version,
        _resolve_version,
    )

    version = _resolve_version(spark, path, version)
    man = read_manifest(spark, path, version)
    specs = man.get("transforms") or []
    by_source = {parse_transform(s)[2]: s for s in specs}
    df = read_version(spark, path, version)
    types = dict(df.dtypes)
    for col, val in (eq or {}).items():
        if col in by_source:
            df = df.filter(pruned_eq(by_source[col], val, types.get(col)))
        else:
            df = df.filter(F.col(col) == F.lit(val))
    for col, (lo, hi) in (between or {}).items():
        if col in by_source:
            df = df.filter(pruned_between(by_source[col], lo, hi))
        else:
            df = df.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
    drop = [partition_col_name(s) for s in specs]
    return df.drop(*drop)
