"""Local mirror of the driver's DuckDB-oracle compare.

Runs a declared query through Spark and its oracle SQL through DuckDB
over the same parquet tables, then compares row count, column names,
and an order-insensitive canonical value set — strict (exact) equality,
the same bar the driver's value-hash applies.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from temp_data_pipeline_spark.sources.registry import TABLES


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr → catches last-ulp divergence, as a hash would
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return v


def _canon_rows(cols, rows):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    # repr-keyed sort: total order even with None/mixed cells; both sides
    # use the same key so set-equality comparison is unaffected.
    return sorted(canon, key=repr), [cols[i] for i in order]


def run_oracle(name: str, sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def assert_driver_canonicalizable(name: str, schema) -> None:
    """The driver's canonicalizer sorts a pandas frame of the result;
    array/map/struct top-level columns make that sort throw
    (`unhashable type: 'list'`) and the query ships never-green.
    Flatten vector outputs (CSV string / posexplode / mh0..mhN scalar
    columns) before registering — this gate makes the mistake fail in
    pytest instead of in the driver (VERDICT r4 item 1)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}: driver-facing column {f.name!r} has non-scalar type "
            f"{f.dataType.simpleString()}; flatten it (array_join / "
            "posexplode / per-element columns) before registering"
        )


def compare_query(spark, spec, sf_dir: str) -> None:
    sdf = spec.builder(spark, sf_dir)
    assert_driver_canonicalizable(spec.name, sdf.schema)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_oracle(spec.name, spec.oracle, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon, cols = _canon_rows(s_cols, s_rows)
    d_canon, _ = _canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
        ][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch (cols={cols}); first diffs: {diffs}"
        )
