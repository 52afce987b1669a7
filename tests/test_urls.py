"""URL tier (llm/urls.py): canonicalization goldens, re-crawl
dedup, and deterministic per-domain caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.urls import (
    cap_per_domain,
    normalize_url,
    url_dedup,
    url_domain,
)

GOLDEN = [
    ("HTTPS://WWW.Example.COM/A/B?q=1#frag", "example.com/a/b"),
    ("http://example.com/a/b/", "example.com/a/b"),
    ("example.com/a/b", "example.com/a/b"),
    ("https://sub.Example.com/", "sub.example.com"),
    ("https://www.example.com", "example.com"),
    ("https://example.com/#only-frag", "example.com"),
]


def test_normalize_url_goldens(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(GOLDEN)], "i long, url string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_url("url").alias("n")).collect()
    }
    for i, (_, want) in enumerate(GOLDEN):
        assert got[i] == want, GOLDEN[i]


def test_url_domain_registered_two_labels(spark):
    rows = [
        (0, "https://a.b.example.co/x", "example.co"),
        (1, "https://example.com/x", "example.com"),
        (2, "localhost/x", "localhost"),  # no dot: host passes through
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in rows], "i long, url string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", url_domain("url").alias("d")).collect()
    }
    for i, _, want in rows:
        assert got[i] == want


def test_url_dedup_collapses_recrawls_keep_first(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/a"),
            (2, "HTTP://WWW.EXAMPLE.COM/a?utm=x"),  # same page
            (3, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    assert sorted(
        r["doc_id"] for r in url_dedup(df).collect()
    ) == [1, 3]


def test_cap_per_domain_keeps_lowest_ids(spark):
    rows = [(i, f"https://site{i % 3}.com/p/{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = cap_per_domain(df, 4)
    by_dom = {}
    for r in out.collect():
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert set(by_dom) == {"site0.com", "site1.com", "site2.com"}
    for k, ids in by_dom.items():
        d = int(k[4])
        assert sorted(ids) == [d, d + 3, d + 6, d + 9]  # lowest 4 ids
    with pytest.raises(ValueError, match="positive"):
        cap_per_domain(df, 0)
