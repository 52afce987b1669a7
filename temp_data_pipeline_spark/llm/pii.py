"""PII detection and redaction (LLM-pipeline tier).

Pretraining corpora are scrubbed of emails / IPs / phone numbers /
SSNs before training (C4 and The Pile both document regex-based PII
removal). This tier is pure JVM regex expressions — ``regexp_replace``
and ``regexp_extract_all`` participate in whole-stage codegen, so
scrubbing is a map-only pass with zero shuffles at any corpus size.

Pattern notes: the expressions stick to the syntax subset shared by
Java regex (Spark) and RE2 (DuckDB oracle) — character classes,
bounded repetition, ``\\b`` word boundaries; no lookarounds. Patterns
are applied in a fixed declaration order so redaction output is
deterministic (the classes are mutually non-overlapping by
construction: an SSN's 3-2-4 digit grouping can't match the phone
3-3-4, an email's alphabetic TLD can't parse as an IPv4 octet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Declaration order = application order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII class (BIGINT)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(PII_PATTERNS[kind]), 0)).cast("bigint")


def scrub_pii(col: Column | str, token_fmt: str = "<{}>") -> Column:
    """Replace every PII occurrence with a class token (``<EMAIL>`` …).

    All-occurrence replacement (Spark's default; the DuckDB oracle
    needs the explicit 'g' flag — see plans/llm_queries.py).
    """
    out = _c(col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, token_fmt.format(kind.upper()))
    return out


def with_pii_scrubbed(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Add per-class counts and the scrubbed text; map-only."""
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(text_col, kind))
    return out.withColumn(out_col, scrub_pii(text_col))
