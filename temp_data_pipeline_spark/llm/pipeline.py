"""End-to-end corpus curation: the canonical LLM-training-data
pipeline composed from this engine's operators.

    raw documents
      → Gopher quality gate          (map-only filter, no shuffle)
      → exact dedup                  (one hash shuffle; collapses mass
                                      duplicates BEFORE LSH so band
                                      buckets stay small — the
                                      cap_bucket defense in depth)
      → MinHash-LSH near-dup removal (banded candidates + Jaccard
                                      verify, capped buckets)
      → deterministic train/val/test (md5 split, engine-stable)

Stage order matters at scale: the cheap map-only gate first shrinks
everything downstream; exact dedup's linear shuffle removes the
duplicate mass that would otherwise concentrate in LSH buckets; the
expensive candidate-verify stage runs last on the smallest frame.

`curate_corpus` returns the labeled survivors; `curation_report`
runs the same lazily-composed plan with per-stage counts for
observability (each count is one job over the already-built frames).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from temp_data_pipeline_spark.llm.curate import hash_split
from temp_data_pipeline_spark.llm.dedup import exact_dedup, minhash_dedup
from temp_data_pipeline_spark.llm.text import gopher_filter


@dataclass
class CurationStats:
    n_input: int
    n_quality: int
    n_exact: int
    n_neardup: int
    splits: dict


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    split_weights: dict[str, int] | None = None,
    salt: str = "",
    quality_rules: dict | None = None,
) -> DataFrame:
    """Quality-gate, dedup (exact then near), and split a document
    frame. Returns the surviving rows with a `split` column.
    `quality_rules` overrides Gopher thresholds per corpus (e.g.
    `{"min_stopword_hits": 0}` for non-English text)."""
    gated = gopher_filter(df, text_col, **(quality_rules or {}))
    exact = exact_dedup(gated, text_col, id_col)
    near = minhash_dedup(
        exact, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    return hash_split(near, id_col, weights=split_weights, salt=salt)


def curation_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    salt: str = "",
    quality_rules: dict | None = None,
) -> CurationStats:
    """Stage-by-stage survivor counts for the same pipeline."""
    gated = gopher_filter(df, text_col, **(quality_rules or {}))
    exact = exact_dedup(gated, text_col, id_col)
    near = minhash_dedup(
        exact, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    labeled = hash_split(near, id_col, salt=salt)
    split_counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    return CurationStats(
        n_input=df.count(),
        n_quality=gated.count(),
        n_exact=exact.count(),
        n_neardup=near.count(),
        splits=split_counts,
    )
