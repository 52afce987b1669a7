"""GENERATED ALWAYS AS columns: declared at typed CREATE TABLE,
computed by the surface writers when omitted, validated as
auto-checks on EVERY commit (versioned.commit_version `__generated_`
enforcement), inherited like defaults/constraints."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import read_table
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    generated_columns,
    versions,
)
from temp_data_pipeline_spark.sql import SqlEngine


@pytest.fixture()
def eng(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    commit_version(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, x double"
        ),
        src,
    )
    e = SqlEngine(spark, {"src": src}, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE t (k BIGINT, x DOUBLE, "
        "x2 DOUBLE GENERATED ALWAYS AS (x * 2), "
        "parity BIGINT GENERATED ALWAYS AS (k % 2))"
    )
    return e, str(tmp_path / "wh" / "t")


def test_create_records_spec_and_insert_computes(spark, eng):
    e, p = eng
    assert generated_columns(spark, p) == {
        "x2": "x * 2",
        "parity": "k % 2",
    }
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src")
    rows = {
        r["k"]: (r["x"], r["x2"], r["parity"])
        for r in read_table(spark, p).collect()
    }
    assert rows == {
        1: (10.0, 20.0, 1),
        2: (20.0, 40.0, 0),
        3: (30.0, 60.0, 1),
    }


def test_provided_values_validate(spark, eng):
    e, p = eng
    # correct provided values pass ...
    e.sql("INSERT INTO t (k, x, x2, parity) VALUES (7, 1.5, 3.0, 1)")
    assert read_table(spark, p).count() == 1
    # ... wrong ones abort the commit, leaving versions untouched
    before = versions(spark, p)
    with pytest.raises(ValueError, match="__generated_x2"):
        e.sql("INSERT INTO t (k, x, x2, parity) VALUES (8, 1.0, 99.0, 0)")
    assert versions(spark, p) == before
    assert read_table(spark, p).count() == 1


def test_plain_engine_append_is_validated_by_inheritance(spark, eng):
    e, p = eng
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src")
    base = versions(spark, p)[-1]
    bad = read_table(spark, p).sparkSession.createDataFrame(
        [(9, 5.0, 11.0, 1)], "k long, x double, x2 double, parity long"
    )
    with pytest.raises(ValueError, match="__generated_x2"):
        commit_version(bad, p, carry_from=base)
    ok = bad.sparkSession.createDataFrame(
        [(9, 5.0, 10.0, 1)], "k long, x double, x2 double, parity long"
    )
    commit_version(ok, p, carry_from=versions(spark, p)[-1])
    assert read_table(spark, p).count() == 4


def test_merge_insert_computes_generated(spark, eng):
    e, p = eng
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k <= 2")
    e.sql(
        "MERGE INTO t USING (SELECT k, x + 100 AS x FROM src) s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, x) VALUES (s.k, s.x)"
    )
    rows = {
        r["k"]: (r["x"], r["x2"], r["parity"])
        for r in read_table(spark, p).collect()
    }
    assert rows[3] == (130.0, 260.0, 1)  # inserted: generated computed
    assert rows[1] == (10.0, 20.0, 1)  # untouched


def test_copy_into_computes_generated(spark, eng, tmp_path):
    from temp_data_pipeline_spark.operators.copy_into import copy_into

    e, p = eng
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k = 1")
    inbox = str(tmp_path / "inbox")
    spark.createDataFrame(
        [(50, 7.0), (51, 8.0)], "k long, x double"
    ).repartition(1).write.parquet(inbox)
    v, n = copy_into(spark, p, inbox)
    assert n == 1  # files loaded, not rows
    rows = {
        r["k"]: (r["x2"], r["parity"])
        for r in read_table(spark, p).collect()
    }
    assert rows[50] == (14.0, 0) and rows[51] == (16.0, 1)


def test_generated_wins_over_default_and_shows_in_ddl(spark, eng):
    e, p = eng
    # a DEFAULT on a generated column is ignored by writers (the
    # generation expression computes the value)
    e.sql("ALTER TABLE t ALTER COLUMN x2 SET DEFAULT 999.0")
    e.sql("INSERT INTO t (k, x) VALUES (4, 2.0)")
    r = read_table(spark, p).collect()[0]
    assert r["x2"] == 4.0
    stmt = e.sql("SHOW CREATE TABLE t").collect()[0]["createtab_stmt"]
    assert "x2 DOUBLE GENERATED ALWAYS AS (x * 2)" in stmt


def test_self_or_cross_generated_reference_rejected(spark, tmp_path):
    e = SqlEngine(spark, {}, warehouse=str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="reference generated"):
        e.sql(
            "CREATE TABLE bad (a BIGINT, "
            "g1 BIGINT GENERATED ALWAYS AS (a + 1), "
            "g2 BIGINT GENERATED ALWAYS AS (g1 * 2))"
        )


def test_generated_partition_column_prunes(spark, tmp_path):
    """Delta's flagship generated-column use: partition by a derived
    column, write through INSERT (engine computes it), and get
    planning-time partition pruning on the derived value."""
    e = SqlEngine(spark, {}, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE ev (ts TIMESTAMP, v BIGINT, "
        "day STRING GENERATED ALWAYS AS (date_format(ts, 'yyyy-MM-dd'))) "
        "PARTITIONED BY (day)"
    )
    p = str(tmp_path / "wh" / "ev")
    spark.sql(
        "SELECT timestamp'2026-01-01 03:00:00' + make_interval(0,0,0,0,id,0,0) AS ts, "
        "id AS v FROM range(96)"
    ).createOrReplaceTempView("ev_src")
    e.sql("INSERT INTO ev (ts, v) SELECT ts, v FROM ev_src")
    df = e.sql("SELECT v FROM ev WHERE day = '2026-01-02'")
    assert df.count() == 24
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan  # planning-time pruning
    import os

    assert sorted(
        d for d in os.listdir(f"{p}/v=2") if d.startswith("day=")
    ) == [f"day=2026-01-0{i}" for i in (1, 2, 3, 4, 5)]


def test_update_recomputes_generated(spark, eng):
    """UPDATE changing a referenced base column must recompute the
    generated column (Delta semantics) — not fail the commit's
    __generated_ check with the stale derived value."""
    e, p = eng
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src")
    e.sql("UPDATE t SET x = x + 1 WHERE k = 2")
    rows = {
        r["k"]: (r["x"], r["x2"]) for r in read_table(spark, p).collect()
    }
    assert rows[2] == (21.0, 42.0)  # recomputed
    assert rows[1] == (10.0, 20.0)
    # MERGE UPDATE path too — partial SET recomputes unlisted gen cols
    e.sql(
        "MERGE INTO t USING (SELECT k, x + 100 AS x FROM src) s "
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET x = s.x"
    )
    rows = {
        r["k"]: (r["x"], r["x2"]) for r in read_table(spark, p).collect()
    }
    assert rows[1] == (110.0, 220.0)
    assert rows[3] == (130.0, 260.0)


def test_string_literal_not_a_cross_reference(spark, tmp_path):
    e = SqlEngine(spark, {}, warehouse=str(tmp_path / "wh"))
    # the literal word 'total' is not a reference to the generated
    # column named total
    e.sql(
        "CREATE TABLE ok (a BIGINT, "
        "total BIGINT GENERATED ALWAYS AS (a * 2), "
        "tag STRING GENERATED ALWAYS AS (concat('total', a)))"
    )
    e.sql("INSERT INTO ok (a) VALUES (3)")
    r = read_table(spark, str(tmp_path / "wh" / "ok")).collect()[0]
    assert r["total"] == 6 and r["tag"] == "total3"
