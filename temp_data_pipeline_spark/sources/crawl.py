"""Crawl-dump ingestion: JSONL documents with corrupt-record quarantine.

Web-scale text corpora arrive as (gzipped) JSON-Lines dumps — one
document object per line, schemas drifting across crawls, and a
non-trivial fraction of lines malformed (truncated uploads, encoding
damage, concatenated objects). A 100 TB ingest cannot crash on line
3,000,000,007 and cannot silently drop it either; the standard
contract is: parse what conforms, QUARANTINE the rest with enough
context to re-process, and report both counts.

``read_jsonl_docs`` implements that contract as ``text`` source +
``from_json`` (NOT the raw JSON source: Spark's
QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction forbids materializing
the corrupt column from a raw JSON scan without caching the whole
parse — a non-starter at 100 TB):

- one line-oriented scan; ``from_json`` with an embedded
  ``columnNameOfCorruptRecord`` field parses per row JVM-side, so a
  malformed line yields its raw text in the corrupt field instead of
  failing the task;
- explicit schema, never inference (an inference pass reads the
  corpus twice and locks in one crawl's drift); fields a line lacks
  parse as NULL — drift is data, not corruption;
- the (good, quarantine) split is a null-ness filter on the corrupt
  field; quarantine keeps (raw line, source file) so a fixed parser
  can re-run over just the rejects;
- gzip/bzip2/zstd transparency comes from the Hadoop line reader
  (compressed JSONL just works, though gzip files are not splittable
  — at 100 TB feed many files, not one big one, for parallelism).

Reference has no counterpart (its sources are weather CSV/PSV/NetCDF
APIs); this is the LLM-pipeline ingest tier next to them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document dump with an explicit ``schema``.

    Returns ``(docs, quarantine)``:

    - ``docs`` — rows that parsed clean, exactly the declared columns;
    - ``quarantine`` — lines that could not parse against the schema:
      (raw ``line``, ``source_file``) for re-processing/audit.

    One distributed text scan shared by both frames (Catalyst prunes
    whichever side a job doesn't consume); blank lines are neither
    documents nor rejects and are dropped.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    # StructType.add MUTATES self — build a fresh struct so the
    # caller's schema (and our projection below) stay corrupt-free
    from pyspark.sql.types import StructField

    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    lines = spark.read.text(path).select(
        F.col("value").alias("line"),
        F.col("_metadata.file_path").alias("source_file"),
    )
    parsed = lines.filter(F.trim("line") != "").withColumn(
        "_j",
        F.from_json(
            "line",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    bad = F.col(f"_j.{CORRUPT_COL}").isNotNull() | F.col("_j").isNull()
    docs = parsed.filter(~bad).select(
        *[F.col(f"_j.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(bad).select("line", "source_file")
    return docs, quarantine


def ingest_report(docs: DataFrame, quarantine: DataFrame) -> dict:
    """The two counters every ingest run must publish. Two counts over
    one shared scan lineage; driver-side dict for the run manifest."""
    n_ok = docs.count()
    n_bad = quarantine.count()
    return {
        "n_docs": n_ok,
        "n_quarantined": n_bad,
        "reject_rate": (n_bad / (n_ok + n_bad)) if (n_ok + n_bad) else 0.0,
    }
