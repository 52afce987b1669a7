"""End-to-end CLI test: raw ISD CSV → clean → daily-tmax → (join with
a synthetic forecast) features → eval, all through the module's
command-line surface — the reference's scripts/ flow on Spark."""

from __future__ import annotations

import json
import os

from temp_data_pipeline_spark.cli import main


def test_cli_full_pipeline(spark, tmp_path):
    raw = tmp_path / "isd_2024.csv"
    lines = ["DATE,TMP,LATITUDE,LONGITUDE"]
    for day in range(1, 8):
        for hour in range(24):
            tenths = 100 + day * 10 + hour  # 10.0 .. 19.3 °C
            lines.append(f'2024-01-{day:02d}T{hour:02d}:00:00,"+{tenths:04d},1",40.77,-73.87')
    raw.write_text("\n".join(lines) + "\n")

    stations = tmp_path / "stations.csv"
    stations.write_text(
        "station_id,usaf,wban,ghcn_id,name,lat,lon,tz\n"
        "KLGA,725030,14732,USW00014732,LaGuardia,40.7769,-73.8740,UTC\n"
    )

    clean_dir = str(tmp_path / "clean")
    assert main([
        "clean", "--input", str(raw), "--format", "isd", "--station", "KLGA",
        "--stations-csv", str(stations), "--output", clean_dir,
    ]) == 0

    daily_dir = str(tmp_path / "daily")
    assert main([
        "daily-tmax", "--input", clean_dir, "--tz", "UTC", "--output", daily_dir,
    ]) == 0

    daily = spark.read.parquet(daily_dir)
    assert daily.count() == 7
    assert {r["coverage_hours"] for r in daily.collect()} == {24}

    # synthetic forecast: predicted = actual + 1°F, two leads per day
    fc_dir = str(tmp_path / "fc")
    rows = []
    for r in daily.collect():
        for lead in (28, 29):
            rows.append((
                "KLGA", 40.7769, -73.874, r["date_local"], float(r["tmax_f"]) + 1.0,
                lead, "test", "test",
            ))
    spark.createDataFrame(
        rows,
        "station_id string, lat double, lon double, target_date_local date, "
        "tmax_pred_f double, lead_hours long, model string, source string",
    ).write.mode("overwrite").parquet(fc_dir)

    cfg = tmp_path / "eval.json"
    cfg.write_text(json.dumps({
        "station_ids": ["KLGA"],
        "start_date_local": "2024-01-01",
        "end_date_local": "2024-01-07",
        "min_coverage_hours": 18,
        "split": {"type": "static", "train_frac": 0.5, "val_frac": 0.2,
                  "test_frac": 0.3},
        "models": [{"type": "passthrough"}],
        "sigma_type": "global",
    }))
    runs_dir = str(tmp_path / "runs")
    assert main([
        "eval", "--config", str(cfg), "--forecast", fc_dir,
        "--truth", daily_dir, "--output-dir", runs_dir, "--run-id", "cli_test",
    ]) == 0

    metrics = json.loads(
        (tmp_path / "runs" / "cli_test" / "models" / "Passthrough" / "metrics.json").read_text()
    )
    # passthrough predicts actual+1 → MAE exactly 1, bias +1
    assert abs(metrics["forecast"]["mae"] - 1.0) < 1e-9
    assert abs(metrics["forecast"]["bias"] - 1.0) < 1e-9


def test_cli_table_ops(spark, tmp_path, capsys):
    """table history/verify/maintain/vacuum/rollback drive the
    versioned-table lifecycle end-to-end from the CLI."""
    from temp_data_pipeline_spark.cli import main
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        versions,
    )

    path = str(tmp_path / "tbl")
    commit_version(
        spark.createDataFrame([(1, 10)], "k long, x long"), path
    )
    commit_version(
        spark.createDataFrame([(2, 20)], "k long, x long"), path, carry_from=1
    )
    assert main(["table", "history", path]) in (0, None)
    out = capsys.readouterr().out
    assert "v1" in out and "v2" in out and "refs=True" in out
    assert main(["table", "verify", path]) == 0
    assert main(["table", "rollback", path, "--to-version", "1"]) in (0, None)
    assert main(
        ["table", "maintain", path, "--max-chain", "1",
         "--stats-columns", "x", "--keep-last", "2"]
    ) in (0, None)
    out = capsys.readouterr().out
    assert "compact_snapshot" in out
    assert main(["table", "vacuum", path, "--keep-last", "1"]) in (0, None)
    assert len(versions(spark, path)) == 1


def test_cli_table_changes(spark, tmp_path, capsys):
    """table changes prints the feed summary and exports parquet."""
    from temp_data_pipeline_spark.cli import main
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version

    path = str(tmp_path / "cdftbl")
    commit_version(
        spark.createDataFrame([(i, i) for i in range(6)], "k long, x long"),
        path,
    )
    commit_version(
        spark.createDataFrame([(6, 60), (7, 70)], "k long, x long"),
        path,
        carry_from=1,
    )
    commit_delete_mor(spark, path, "k = 1")
    assert main(["table", "changes", path, "--since", "1"]) in (0, None)
    out = capsys.readouterr().out
    assert "insert=2" in out and "delete=1" in out
    dest = str(tmp_path / "feed.parquet")
    assert main(
        ["table", "changes", path, "--since", "1", "--out", dest]
    ) in (0, None)
    feed = spark.read.parquet(dest)
    assert feed.count() == 3 and "_change_type" in feed.columns
    # keyed feed from the CLI: k=1's delete stays a delete, inserts
    # pass through; counts come from the key-level classification
    assert main(
        ["table", "changes", path, "--since", "1", "--keys", "k"]
    ) in (0, None)
    out = capsys.readouterr().out
    assert "insert=2" in out and "delete=1" in out


def test_cli_table_refs(spark, tmp_path, capsys):
    from temp_data_pipeline_spark.operators.versioned import commit_version

    path = str(tmp_path / "refstbl")
    commit_version(
        spark.createDataFrame([(1, 1)], "k long, x long"), path
    )
    commit_version(
        spark.createDataFrame([(2, 2)], "k long, x long"), path, carry_from=1
    )
    assert main(["table", "tag", path, "--name", "gold"]) in (0, None)
    assert main(
        ["table", "tag", path, "--name", "base", "--at-version", "1"]
    ) in (0, None)
    assert main(["table", "refs", path]) in (0, None)
    out = capsys.readouterr().out
    assert "gold -> v2" in out and "base -> v1" in out
    assert main(["table", "untag", path, "--name", "base"]) in (0, None)
    assert "removed" in capsys.readouterr().out


def test_cli_table_replicate_and_scd2(spark, tmp_path, capsys):
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_upsert_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version

    src = str(tmp_path / "src")
    commit_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), src
    )

    dst = str(tmp_path / "replica")
    assert main(["table", "replicate", src, "--dest", dst, "--keys", "k"]) == 0
    assert "seeded" in capsys.readouterr().out
    dim = str(tmp_path / "dim")
    assert main(["table", "scd2", src, "--dest", dim, "--keys", "k"]) == 0

    commit_upsert_mor(
        spark.createDataFrame([(2, 999), (3, 30)], "k long, v long"),
        src,
        ["k"],
    )
    assert main(["table", "replicate", src, "--dest", dst, "--keys", "k"]) == 0
    assert "caught up" in capsys.readouterr().out
    assert main(["table", "scd2", src, "--dest", dim, "--keys", "k"]) == 0

    def rows(df):
        return sorted((r["k"], r["v"]) for r in df.collect())

    assert rows(read_table(spark, dst)) == rows(read_table(spark, src))
    from pyspark.sql import functions as F

    cur = read_table(spark, dim).filter(F.col("_valid_to").isNull())
    assert rows(cur.select("k", "v")) == rows(read_table(spark, src))


def test_cli_table_constraints(spark, tmp_path, capsys):
    from temp_data_pipeline_spark.operators.versioned import commit_version

    p = str(tmp_path / "t")
    commit_version(
        spark.createDataFrame([(1, 10)], "k long, v long"), p
    )
    assert main(["table", "add-constraint", p, "--name", "v_pos",
                 "--sql", "v > 0"]) == 0
    assert main(["table", "constraints", p]) == 0
    assert "v_pos: v > 0" in capsys.readouterr().out
    assert main(["table", "drop-constraint", p, "--name", "v_pos"]) == 0


def test_cli_table_merge(spark, tmp_path, capsys):
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version

    p = str(tmp_path / "t")
    commit_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), p
    )
    src = str(tmp_path / "batch")
    spark.createDataFrame(
        [(1, 99), (2, 5), (3, 30)], "k long, v long"
    ).write.parquet(src)
    assert main([
        "table", "merge", p, "--source", src, "--keys", "k",
        "--update-when", "s.v > t.v",
        "--delete-when", "t.k = 2",
        "--insert-when", "true",
    ]) == 0
    assert "committed v2" in capsys.readouterr().out
    got = {r["k"]: r["v"] for r in read_table(spark, p).collect()}
    # k=1 updated (99>10), k=2 deleted (5<20, delete fires), k=3 inserted
    assert got == {1: 99, 3: 30}


def test_cli_expect_lifecycle(spark, tmp_path, capsys):
    """Verdict r8 #7: the expectations/quarantine operator console —
    gated ingest, show, quarantine summary, and replay after a gate
    fix."""
    from temp_data_pipeline_spark.operators.versioned import (
        read_version,
        versions,
    )

    p = str(tmp_path / "gated")
    src = str(tmp_path / "batch1")
    spark.createDataFrame(
        [(1, 5), (2, -1), (3, 7), (4, -9)], "k long, v long"
    ).write.parquet(src)
    assert main([
        "table", "expect-ingest", p, "--source", src,
        "--expect", "v_positive=v > 0",
    ]) == 0
    assert "quarantined 2" in capsys.readouterr().out
    assert sorted(r["k"] for r in read_version(spark, p).collect()) == [1, 3]

    assert main(["table", "expect-show", p]) == 0
    out = capsys.readouterr().out
    assert "v_positive: v > 0" in out and "quarantined 2" in out

    assert main(["table", "quarantine", p]) == 0
    assert "v_positive: 2 rows" in capsys.readouterr().out

    # gate fix: negatives are fine now as long as v != -9
    assert main([
        "table", "quarantine-replay", p, "--expect", "v_ok=v <> -9",
    ]) == 0
    out = capsys.readouterr().out
    assert "1 rows passed" in out and "1 still quarantined" in out
    assert sorted(r["k"] for r in read_version(spark, p).collect()) == [
        1, 2, 3,
    ]
    # replay is idempotent: the passed row left the quarantine
    q = read_version(spark, f"{p}_quarantine")
    assert [(r["k"], r["_violations"]) for r in q.collect()] == [(4, "v_ok")]
    n_before = len(versions(spark, p))
    assert main([
        "table", "quarantine-replay", p, "--expect", "v_ok=v <> -9",
    ]) == 0
    assert "0 rows passed" in capsys.readouterr().out
    assert len(versions(spark, p)) == n_before  # nothing re-appended


def test_cli_sql(spark, tmp_path, capsys):
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version

    p = str(tmp_path / "sqltab")
    commit_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), p
    )
    assert main([
        "sql", "DELETE FROM t WHERE k = 2", "--table", f"t={p}",
    ]) == 0
    assert "committed v2" in capsys.readouterr().out
    assert main([
        "sql", "SELECT k, v FROM t ORDER BY k", "--table", f"t={p}",
    ]) == 0
    assert "'k': 1" in capsys.readouterr().out
    assert [r["k"] for r in read_table(spark, p).collect()] == [1]


def test_cli_clone_copy_partitions_properties(spark, tmp_path, capsys):
    from temp_data_pipeline_spark.operators.versioned import commit_version

    src = os.path.join(str(tmp_path), "src")
    commit_version(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, part string, v long"
        ),
        src,
        partition_by=["part"],
    )
    dst = os.path.join(str(tmp_path), "clone")
    main(["table", "clone", src, "--dest", dst])
    assert "zero-copy" in capsys.readouterr().out
    main(["table", "partitions", dst])
    out = capsys.readouterr().out
    assert "'part': 'a'" in out and "'part': 'b'" in out
    main(["table", "add-column", dst, "--column", "note string"])
    assert "note" in capsys.readouterr().out
    main(["table", "properties", dst, "--set", "owner=etl;tier=gold"])
    out = capsys.readouterr().out
    assert "owner = etl" in out and "tier = gold" in out
    main(["table", "properties", dst, "--unset", "owner"])
    out = capsys.readouterr().out
    assert "owner" not in out.replace("unset ['owner']", "")
    # copy-into a fresh table from a landing dir
    land = os.path.join(str(tmp_path), "landing")
    spark.createDataFrame(
        [(5, 50)], "k long, v long"
    ).coalesce(1).write.parquet(os.path.join(land, "w1"))
    t2 = os.path.join(str(tmp_path), "t2")
    main([
        "table", "copy-into", t2, "--from-dir", land,
        "--pattern", "*/part-*.parquet",
    ])
    assert "loaded 1 file(s)" in capsys.readouterr().out
    main([
        "table", "copy-into", t2, "--from-dir", land,
        "--pattern", "*/part-*.parquet",
    ])
    assert "loaded 0 file(s)" in capsys.readouterr().out
