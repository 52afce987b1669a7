"""JSON column functions (extension tier beyond SURVEY §2.9).

The synthetic ``events.props`` column carries JSON strings; real
event feeds (and the reference's Open-Meteo responses, see reference
``src/tempdata/fetch/openmeteo.py`` which parses JSON driver-side)
make JSON extraction a first-class engine need. Everything here is a
JVM-side Catalyst expression (``get_json_object`` / ``from_json`` /
``to_json``) — no Python UDFs, so extraction participates in
whole-stage codegen and column pruning, and a projection that only
touches one JSON path never deserializes the rest of the row.

Scale notes:
- ``get_json_object`` re-parses the document per call; for multi-path
  extraction prefer ``json_typed`` (one ``from_json`` parse, struct
  field access afterwards) — that is the 100 TB-friendly shape.
- All helpers return NULL on malformed input (Spark's PERMISSIVE
  semantics), matching DuckDB ``TRY``-style oracle behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def json_str(col: Column | str, path: str) -> Column:
    """Extract a string at a JSONPath (``$.a.b[0]``); NULL if absent."""
    return F.get_json_object(_c(col), path)


def json_long(col: Column | str, path: str) -> Column:
    """Extract an integer at a JSONPath as BIGINT; NULL if absent/non-numeric.

    ``try_cast``, not ``cast``: under Spark 4's ANSI default a plain
    cast of a non-numeric extract raises; NULL-on-bad-input matches
    DuckDB ``TRY_CAST`` and the PERMISSIVE posture of this module.
    """
    return F.get_json_object(_c(col), path).try_cast("bigint")


def json_double(col: Column | str, path: str) -> Column:
    """Extract a float at a JSONPath as DOUBLE (NULL on non-numeric)."""
    return F.get_json_object(_c(col), path).try_cast("double")


def json_typed(col: Column | str, ddl_schema: str) -> Column:
    """Parse once into a typed struct (``from_json``).

    Preferred over repeated ``json_str`` calls when several fields are
    needed: one parse, then cheap struct field access. Malformed rows
    yield a NULL struct (PERMISSIVE), never an error.
    """
    return F.from_json(_c(col), ddl_schema)


def json_array_longs(col: Column | str) -> Column:
    """Parse a JSON array of integers into ``array<bigint>``."""
    return F.from_json(_c(col), "array<bigint>")


def json_of(*cols: Column) -> Column:
    """Serialize named columns into a compact JSON object string.

    ``to_json(struct(...))`` — field order is the argument order and
    output has no whitespace, which both Spark and DuckDB
    ``json_object`` agree on for scalar fields.
    """
    return F.to_json(F.struct(*cols))
