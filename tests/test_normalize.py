"""Crawl-text normalization (llm/text.py::normalize_text)."""

from __future__ import annotations

import unicodedata


def _out(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from temp_data_pipeline_spark.llm.text import normalize_text

    return {r["doc_id"]: r for r in normalize_text(df, **kw).collect()}


def test_control_and_whitespace_rules(spark):
    out = _out(
        spark,
        [
            (1, "a  b\t\tc"),                 # runs of spaces/tabs
            (2, "x\x00y\x1fz\x7f"),           # C0 + DEL stripped
            (3, "line \n next\n\n\n\npara"),  # line-edge trim, 3+ NL -> 2
            (4, "keep\ttab? no: one space"),
            (5, "crlf\r\nunix"),
            (6, "clean"),
        ],
    )
    assert out[1]["text_norm"] == "a b c"
    assert out[2]["text_norm"] == "xyz"
    assert out[3]["text_norm"] == "line\nnext\n\npara"
    assert out[4]["text_norm"] == "keep tab? no: one space"
    assert out[5]["text_norm"] == "crlf\nunix"
    assert out[6]["text_norm"] == "clean" and out[6]["changed"] is False
    assert all(out[i]["changed"] for i in (1, 2, 3, 4, 5))


def test_nfc_composes_decomposed_unicode(spark):
    decomposed = unicodedata.normalize("NFD", "café résumé")
    assert decomposed != "café résumé"  # really decomposed
    out = _out(spark, [(1, decomposed), (2, "ascii only")])
    assert out[1]["text_norm"] == "café résumé"
    assert out[1]["changed"] is True
    # ascii row must NOT go through the Python tier: same result with
    # the tier disabled proves the gate, value-wise
    off = _out(spark, [(2, "ascii only")], nfc=False)
    assert out[2]["text_norm"] == off[2]["text_norm"] == "ascii only"


def test_map_only_zero_shuffles(spark):
    from temp_data_pipeline_spark.llm.text import normalize_text

    df = spark.createDataFrame([(1, "a  b")], "doc_id long, text string")
    for kw in ({}, {"nfc": False}):
        plan = (
            normalize_text(df, **kw)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


def test_null_text_survives(spark):
    out = _out(spark, [(1, None), (2, "ok")])
    assert out[1]["text_norm"] is None
    assert out[2]["text_norm"] == "ok"


def test_c1_controls_stripped(spark):
    # C1 range (U+0080-U+009F) strips like C0 -- two docs differing
    # only by a NEL must normalize identically or they hash apart in
    # the dedup stages this op protects
    from temp_data_pipeline_spark.llm.text import normalize_text

    df = spark.createDataFrame(
        [(1, "same\u0085 text"), (2, "same text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_norm"]
           for r in normalize_text(df, nfc=False).collect()}
    assert got[1] == got[2] == "same text"
