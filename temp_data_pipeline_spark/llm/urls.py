"""URL canonicalization, URL-level dedup, and per-domain caps.

Web-scale corpora (C4, RefinedWeb, FineWeb) all run a URL tier before
any content-based dedup: canonicalize the crawl URL, drop exact
re-crawls of the same page, and cap how many documents any single
registered domain may contribute (one SEO farm must not become 2% of
the corpus). All three are cheap relational shapes — string
expressions, one groupBy, one per-domain window — and remove mass
before the expensive MinHash/embedding stages downstream.

Everything is a deterministic JVM expression chain (lower → strip
scheme/www → strip fragment → strip query → strip trailing slash),
replayable bit-for-bit in the DuckDB oracle with the same regexes.
The per-domain window partitions on the domain — millions of small
partitions at 100 TB, the load-balanced case for window exchanges;
the cap then bounds every partition's surviving rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_url(col) -> "F.Column":
    """Canonical page key: lowercase, scheme/www stripped, fragment
    and query dropped, trailing slash trimmed. Conservative on
    purpose — no path re-encoding, no param whitelists — so two URLs
    normalize equal only when they are trivially the same page."""
    c = F.lower(col if not isinstance(col, str) else F.col(col))
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"\?.*$", "")
    return F.regexp_replace(c, r"/$", "")


def url_domain(col) -> "F.Column":
    """Registered domain of a (normalized or raw) URL: the last two
    dot-labels of the host — the standard cap granularity (a public-
    suffix list refines this where available; the two-label heuristic
    is the deterministic, dependency-free baseline)."""
    host = F.regexp_extract(normalize_url(col), r"^([^/]+)", 1)
    reg = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(reg != "", reg).otherwise(host)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id document per normalized URL (re-crawl
    collapse). Same keep-first contract as dedup.exact_dedup, keyed
    on the canonical URL instead of content."""
    norm = normalize_url(url_col).alias("_u")
    keep = (
        df.select(F.col(id_col), norm)
        .groupBy("_u")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def cap_per_domain(
    df: DataFrame,
    cap: int,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    out: str = "domain",
) -> DataFrame:
    """At most ``cap`` documents per registered domain, keeping the
    lowest ids (deterministic, replayable). Adds the ``domain``
    column; all input columns pass through."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    w = Window.partitionBy(out).orderBy(F.col(id_col).asc())
    return (
        df.withColumn(out, url_domain(url_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
