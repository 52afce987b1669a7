"""JSONL crawl ingestion with corrupt-record quarantine
(sources/crawl.py): conforming lines parse, malformed lines land in
quarantine with their raw text and source file, nothing crashes and
nothing is silently dropped."""

from __future__ import annotations

import gzip
import os

import pytest

from temp_data_pipeline_spark.sources.crawl import (
    ingest_report,
    read_jsonl_docs,
)

SCHEMA = "doc_id long, url string, text string"


def _write(path, lines, compress=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = ("\n".join(lines) + "\n").encode("utf-8")
    if compress:
        with gzip.open(path, "wb") as fh:
            fh.write(data)
    else:
        with open(path, "wb") as fh:
            fh.write(data)


def test_good_and_corrupt_split(spark, tmp_path):
    src = str(tmp_path / "dump")
    _write(
        f"{src}/part-0.jsonl",
        [
            '{"doc_id": 1, "url": "http://a", "text": "hello"}',
            'this is not json at all',
            '{"doc_id": 2, "url": "http://b", "text": "world"}',
            '{"doc_id": 3, "url": "http://c", "text": "trunc',  # cut off
        ],
    )
    docs, quarantine = read_jsonl_docs(spark, src, SCHEMA)
    assert {r["doc_id"] for r in docs.collect()} == {1, 2}
    assert docs.columns == ["doc_id", "url", "text"]
    q = quarantine.collect()
    assert len(q) == 2
    assert {r["line"] for r in q} == {
        "this is not json at all",
        '{"doc_id": 3, "url": "http://c", "text": "trunc',
    }
    assert all(r["source_file"].endswith("part-0.jsonl") for r in q)
    rep = ingest_report(docs, quarantine)
    assert rep == {"n_docs": 2, "n_quarantined": 2, "reject_rate": 0.5}


def test_gzip_transparent(spark, tmp_path):
    src = str(tmp_path / "gz")
    _write(
        f"{src}/part-0.jsonl.gz",
        ['{"doc_id": 7, "url": "u", "text": "zipped"}', "broken{"],
        compress=True,
    )
    docs, quarantine = read_jsonl_docs(spark, src, SCHEMA)
    assert [r["doc_id"] for r in docs.collect()] == [7]
    assert quarantine.count() == 1


def test_schema_drift_missing_fields_are_null_not_corrupt(spark, tmp_path):
    # an older crawl without `url` still parses; absent = NULL
    src = str(tmp_path / "drift")
    _write(f"{src}/p.jsonl", ['{"doc_id": 9, "text": "old crawl"}'])
    docs, quarantine = read_jsonl_docs(spark, src, SCHEMA)
    [r] = docs.collect()
    assert r["doc_id"] == 9 and r["url"] is None
    assert quarantine.count() == 0


def test_corrupt_col_in_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl_docs(
            spark, str(tmp_path), "doc_id long, _corrupt_record string"
        )
