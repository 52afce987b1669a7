"""PII scrub semantics: class coverage, boundaries, determinism."""

from __future__ import annotations

from temp_data_pipeline_spark.llm.pii import pii_count, scrub_pii, with_pii_scrubbed


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(col.alias("v")).first()["v"]


def test_all_classes_redacted(spark):
    raw = "write a@b.io from 192.168.0.1, ssn 123-45-6789, call 555-123-4567 now"
    clean = _one(spark, raw, scrub_pii("t"))
    assert clean == "write <EMAIL> from <IP>, ssn <SSN>, call <PHONE> now"


def test_multiple_occurrences_counted(spark):
    raw = "a@b.co c@d.org 1.2.3.4 5.6.7.8 9.10.11.12"
    assert _one(spark, raw, pii_count("t", "email")) == 2
    assert _one(spark, raw, pii_count("t", "ip")) == 3


def test_word_boundaries_guard_long_digit_runs(spark):
    # an SSN-shaped substring inside a longer digit run must NOT match
    raw = "code 12345-67-89012 ok"
    assert _one(spark, raw, pii_count("t", "ssn")) == 0
    assert "<SSN>" not in _one(spark, raw, scrub_pii("t"))


def test_phone_vs_ssn_disjoint(spark):
    raw = "p 555-123-4567 s 123-45-6789"
    assert _one(spark, raw, pii_count("t", "phone")) == 1
    assert _one(spark, raw, pii_count("t", "ssn")) == 1


def test_clean_text_and_counts_columns(spark):
    df = spark.createDataFrame([(1, "mail x@y.de end")], "doc_id bigint, text string")
    row = with_pii_scrubbed(df).first()
    assert row["n_email"] == 1 and row["n_ip"] == 0
    assert row["clean_text"] == "mail <EMAIL> end"


def test_scrub_plan_is_shuffle_and_udf_free(spark):
    df = spark.createDataFrame([(1, "t x@y.de")], "doc_id bigint, text string")
    plan = with_pii_scrubbed(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
