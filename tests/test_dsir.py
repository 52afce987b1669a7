"""DSIR importance weighting (llm/dsir.py): exact python-model
parity, selection semantics, single-token guard, and the broadcast
plan shape."""

from __future__ import annotations

import hashlib
import math

from temp_data_pipeline_spark.llm.dsir import (
    NANO,
    dsir_topk,
    dsir_weights,
    gram_buckets,
)

RAW = [
    (1, "spark shuffle exchange partition codegen"),
    (2, "the cat sat on the warm mat today"),
    (3, "spark join broadcast partition shuffle"),
    (4, "one"),
]
TARGET = [
    (10, "spark partition shuffle broadcast exchange"),
    (11, "spark codegen shuffle partition plans"),
]


def _int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    t = text.split(" ")
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _py_weights(raw, target, dim=64, salt="d:"):
    """Sequential reference with the same nano quantization."""
    def buckets(docs):
        out = {}
        for i, text in docs:
            for g in _grams(text):
                b = _int60(salt + g) % dim
                out.setdefault(i, {}).setdefault(b, 0)
                out[i][b] += 1
        return out

    rb, tb = buckets(raw), buckets(target)
    ct = {}
    for d in tb.values():
        for b, c in d.items():
            ct[b] = ct.get(b, 0) + c
    cr = {}
    for d in rb.values():
        for b, c in d.items():
            cr[b] = cr.get(b, 0) + c
    tt, tr = sum(ct.values()), sum(cr.values())
    w_nano = {
        b: math.floor(
            math.log(
                ((ct.get(b, 0) + 1) * float(tr + dim))
                / ((cr.get(b, 0) + 1) * float(tt + dim))
            )
            * NANO
            + 0.5
        )
        for b in range(dim)
    }
    return {
        i: sum(c * w_nano[b] for b, c in d.items()) for i, d in rb.items()
    }


def test_weights_match_python_model(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dsir_nano"]
        for r in dsir_weights(raw, tgt, dim=64).collect()
    }
    assert got == _py_weights(RAW, TARGET, dim=64)


def test_target_like_documents_rank_first(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    rows = dsir_topk(raw, tgt, dim=64, k=4).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    # the doc sharing the target's exact vocabulary AND bigrams wins;
    # the cat/mat doc (vocabulary disjoint from the target) is last.
    # (doc 3 sits mid-pack: its spark unigrams are also the raw
    # pool's bulk, so the importance ratio largely cancels — exactly
    # the "target-like relative to raw" semantics DSIR is for.)
    assert rows[0]["doc_id"] == 1 and rows[0]["dsir_nano"] > 0
    assert rows[-1]["doc_id"] == 2
    assert rows[0]["dsir_nano"] > rows[-1]["dsir_nano"]


def test_single_token_doc_has_no_bigram(spark):
    """Spark sequence() DESCENDS when start > stop — the guard must
    keep one-token documents at exactly one (unigram) feature."""
    df = spark.createDataFrame([(4, "one")], "doc_id long, text string")
    rows = gram_buckets(df, dim=64).collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 1


def test_plan_broadcasts_ratio_table_no_cartesian(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    plan = (
        dsir_weights(raw, tgt, dim=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan
