"""GENERATED ALWAYS AS IDENTITY: engine-assigned, unique,
monotonically increasing across commits (gaps allowed — the Delta
identity contract), watermark advanced via observe on the commit's
own write pass, explicit writes refused everywhere."""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.operators.deletion_vectors import read_table
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    identity_columns,
)
from temp_data_pipeline_spark.sql import SqlEngine


@pytest.fixture()
def eng(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    commit_version(
        spark.createDataFrame(
            [(i, float(i) * 10) for i in range(1, 8)], "k long, x double"
        ),
        src,
    )
    e = SqlEngine(spark, {"src": src}, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "k BIGINT, x DOUBLE)"
    )
    return e, str(tmp_path / "wh" / "t")


def _ids_by_k(spark, p):
    return {r["k"]: r["id"] for r in read_table(spark, p).collect()}


def test_insert_assigns_unique_monotonic(spark, eng):
    e, p = eng
    spec = identity_columns(spark, p)
    assert spec == {"id": {"start": 1, "step": 1, "high": None}}
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k <= 4")
    first = _ids_by_k(spark, p)
    assert len(set(first.values())) == 4  # unique
    assert min(first.values()) >= 1
    high1 = identity_columns(spark, p)["id"]["high"]
    assert high1 == max(first.values())  # watermark == max assigned
    # second batch: every id strictly above the first batch's
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k > 4")
    all_ids = _ids_by_k(spark, p)
    assert len(set(all_ids.values())) == 7
    assert min(v for k, v in all_ids.items() if k > 4) > high1


def test_explicit_values_refused(spark, eng):
    e, p = eng
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS IDENTITY"):
        e.sql("INSERT INTO t (id, k, x) VALUES (99, 1, 1.0)")
    with pytest.raises(ValueError, match="named column list"):
        e.sql("INSERT INTO t SELECT k, k, x FROM src")
    with pytest.raises(ValueError, match="REPLACE WHERE"):
        e.sql("INSERT INTO t (k, x) REPLACE WHERE k > 0 SELECT k, x FROM src")


def test_merge_assigns_and_guards(spark, eng):
    e, p = eng
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k <= 3")
    high1 = identity_columns(spark, p)["id"]["high"]
    e.sql(
        "MERGE INTO t USING (SELECT k, x FROM src) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET x = s.x + 1 "
        "WHEN NOT MATCHED THEN INSERT (k, x) VALUES (s.k, s.x)"
    )
    ids = _ids_by_k(spark, p)
    assert len(set(ids.values())) == 7
    # updated rows keep their ids; inserted rows allocate above
    assert all(ids[k] <= high1 for k in (1, 2, 3))
    assert all(ids[k] > high1 for k in (4, 5, 6, 7))
    with pytest.raises(ValueError, match="engine-assigned"):
        e.sql(
            "MERGE INTO t USING (SELECT k, x FROM src) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET id = 0"
        )
    with pytest.raises(ValueError, match="INSERT \\*"):
        e.sql(
            "MERGE INTO t USING (SELECT 99 AS id, 99 AS k, 0.0 AS x) s "
            "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *"
        )


def test_copy_into_assigns(spark, eng, tmp_path):
    from temp_data_pipeline_spark.operators.copy_into import copy_into

    e, p = eng
    e.sql("INSERT INTO t (k, x) VALUES (100, 1.0)")
    high1 = identity_columns(spark, p)["id"]["high"]
    inbox = str(tmp_path / "inbox")
    spark.createDataFrame(
        [(200, 2.0), (201, 3.0)], "k long, x double"
    ).repartition(1).write.parquet(inbox)
    copy_into(spark, p, inbox)
    ids = _ids_by_k(spark, p)
    assert len(set(ids.values())) == 3
    assert ids[200] > high1 and ids[201] > high1
    # files CARRYING the identity column are refused
    inbox2 = str(tmp_path / "inbox2")
    spark.createDataFrame(
        [(9, 300, 4.0)], "id long, k long, x double"
    ).repartition(1).write.parquet(inbox2)
    with pytest.raises(ValueError, match="engine assigns"):
        copy_into(spark, p, inbox2)


def test_start_step_and_ddl_roundtrip(spark, tmp_path):
    e = SqlEngine(spark, {}, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE s (id BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 1000 INCREMENT BY 10), v BIGINT)"
    )
    p = str(tmp_path / "wh" / "s")
    e.sql("INSERT INTO s (v) VALUES (1)")
    e.sql("INSERT INTO s (v) VALUES (2)")
    rows = sorted(
        (r["v"], r["id"]) for r in read_table(spark, p).collect()
    )
    assert rows[0][1] == 1000  # first allocation starts at START WITH
    assert rows[1][1] > rows[0][1]
    assert (rows[1][1] - 1000) % 10 == 0  # step divides every offset
    stmt = e.sql("SHOW CREATE TABLE s").collect()[0]["createtab_stmt"]
    assert (
        "id BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 1000 INCREMENT BY 10)" in stmt
    )
    d = identity_columns(spark, p)
    assert d["id"]["step"] == 10 and d["id"]["high"] == rows[1][1]


def test_empty_insert_keeps_watermark(spark, eng):
    e, p = eng
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k <= 2")
    high = identity_columns(spark, p)["id"]["high"]
    e.sql("INSERT INTO t (k, x) SELECT k, x FROM src WHERE k > 999")
    assert identity_columns(spark, p)["id"]["high"] == high
