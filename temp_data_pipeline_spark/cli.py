"""Command-line entry points mirroring the reference's scripts/
(SURVEY §3): clean, daily-tmax, features, eval. A user of the
reference's pipeline scripts drives the same stages here, with the
same stage semantics, on Spark.

    python -m temp_data_pipeline_spark.cli clean \
        --input data/raw/isd_2024.csv --format isd --station KLGA \
        --stations-csv stations.csv --output data/clean/hourly

    python -m temp_data_pipeline_spark.cli daily-tmax \
        --input data/clean/hourly --tz America/New_York \
        --output data/clean/daily

    python -m temp_data_pipeline_spark.cli features \
        --forecast data/clean/forecasts --truth data/clean/daily \
        --output data/train

    python -m temp_data_pipeline_spark.cli eval \
        --config eval_config.json --forecast data/clean/forecasts \
        --truth data/clean/daily --output-dir runs

    python -m temp_data_pipeline_spark.cli fetch \
        --station KLGA --start 2024-01-01 --end 2025-01-01 \
        --stations-csv stations.csv --data-dir data

Fetch downloads driver-side (cached + atomic, sources/http_cache.py)
then parses ALL cached files in one distributed Spark scan
(sources/fetch.py; reference scripts/run_pipeline.py:16-26).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="temp_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("clean", help="raw feed → validated clean hourly obs")
    c.add_argument("--input", required=True, help="file/glob of raw data")
    c.add_argument("--format", default="parquet", choices=["parquet", "isd", "ghcnh"])
    c.add_argument("--station", required=True)
    c.add_argument("--stations-csv", default=None)
    c.add_argument("--output", required=True)

    d = sub.add_parser("daily-tmax", help="clean hourly → daily Tmax truth")
    d.add_argument("--input", required=True)
    d.add_argument("--tz", default="America/New_York")
    d.add_argument("--min-coverage-hours", type=int, default=18)
    d.add_argument("--output", required=True)

    f = sub.add_parser("features", help="forecast ⋈ truth → train features")
    f.add_argument("--forecast", required=True)
    f.add_argument("--truth", required=True)
    f.add_argument("--min-coverage-hours", type=int, default=18)
    f.add_argument("--drop-warmup-nulls", action="store_true")
    f.add_argument("--output", required=True)

    e = sub.add_parser("eval", help="multi-model evaluation → run artifacts")
    e.add_argument("--config", required=True, help="EvalConfig JSON file")
    e.add_argument("--forecast", required=True)
    e.add_argument("--truth", required=True)
    e.add_argument("--output-dir", default="runs")
    e.add_argument("--run-id", default=None)

    q = sub.add_parser(
        "sql",
        help="run one SQL statement (SELECT/DML/utility) against a "
             "catalog of versioned tables",
    )
    q.add_argument("statement", help="the SQL text")
    q.add_argument(
        "--table",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="catalog entry (repeatable): bare table name = versioned "
             "table root",
    )
    q.add_argument("--limit", type=int, default=20,
                   help="rows to print for SELECTs")

    ft = sub.add_parser(
        "fetch", help="download + parse raw feeds (reference run_pipeline.py)"
    )
    ft.add_argument("--station", required=True, help="station id, e.g. KLGA")
    ft.add_argument("--start", required=True, help="start date YYYY-MM-DD")
    ft.add_argument("--end", required=True, help="end date YYYY-MM-DD (exclusive)")
    ft.add_argument(
        "--source", default="auto", choices=["auto", "isd", "ghcnh", "openmeteo"]
    )
    ft.add_argument("--stations-csv", default=None)
    ft.add_argument("--data-dir", default="data")

    t = sub.add_parser(
        "table",
        help=(
            "versioned-table ops: history/verify/maintain/vacuum/"
            "rollback/changes/tag/refs/untag/compact-small/"
            "replicate/scd2/add-constraint/drop-constraint/constraints/"
            "merge/expect-ingest/expect-show/quarantine/"
            "quarantine-replay/clone/copy-into/partitions/add-column/"
            "properties"
        ),
    )
    t.add_argument(
        "action",
        choices=[
            "history", "verify", "maintain", "vacuum", "rollback", "changes",
            "tag", "refs", "untag", "compact-small", "replicate", "scd2",
            "add-constraint", "drop-constraint", "constraints", "merge",
            "expect-ingest", "expect-show", "quarantine",
            "quarantine-replay", "clone", "copy-into", "partitions",
            "add-column", "properties",
        ],
    )
    t.add_argument("path", help="table root (the dir holding v=N/_manifest)")
    t.add_argument("--keep-last", type=int, default=3)
    t.add_argument("--to-version", type=int, default=None,
                   help="rollback target version")
    t.add_argument("--since", type=int, default=None,
                   help="changes: feed window start version (exclusive)")
    t.add_argument("--until", type=int, default=None,
                   help="changes: feed window end version (default latest)")
    t.add_argument("--out", default=None,
                   help="changes: write the feed as parquet here instead "
                        "of printing a summary")
    t.add_argument("--keys", default="",
                   help="changes: comma-separated key columns — emit the "
                        "KEY-LEVEL feed (update pre/post images, rewrite "
                        "noise suppressed) instead of the file-level one")
    t.add_argument("--dest", default=None,
                   help="replicate/scd2/clone: the downstream table root")
    t.add_argument("--from-dir", default=None,
                   help="copy-into: the landing directory to load")
    t.add_argument("--file-format", default="parquet",
                   help="copy-into: parquet|json|csv")
    t.add_argument("--pattern", default="*",
                   help="copy-into: file glob under the landing dir")
    t.add_argument("--column", default=None,
                   help="add-column: 'name type' to append")
    t.add_argument("--set", default=None, dest="set_props",
                   help="properties: semicolon-separated k=v pairs to set")
    t.add_argument("--unset", default=None, dest="unset_props",
                   help="properties: comma-separated keys to unset")
    t.add_argument("--name", default=None,
                   help="tag/untag/add-constraint/drop-constraint: the name")
    t.add_argument("--sql", default=None,
                   help="add-constraint: the CHECK predicate")
    t.add_argument("--source", default=None,
                   help="merge: parquet path of the source batch")
    t.add_argument("--update-when", default=None,
                   help="merge: WHEN MATCHED AND <s./t. SQL> THEN UPDATE "
                        "(pass 'true' for unconditional)")
    t.add_argument("--update-set", default=None,
                   help="merge: semicolon-separated col=expr SET list "
                        "(default SET * = take the source row; a "
                        "partial list keeps unlisted columns from the "
                        "TARGET)")
    t.add_argument("--delete-when", default=None,
                   help="merge: WHEN MATCHED AND <s./t. SQL> THEN DELETE")
    t.add_argument("--insert-when", default=None,
                   help="merge: WHEN NOT MATCHED AND <SQL> THEN INSERT "
                        "(default: all unmatched source rows insert)")
    t.add_argument("--at-version", type=int, default=None,
                   help="tag: version to tag (default latest)")
    t.add_argument("--expect", default=None,
                   help="expect-ingest/quarantine-replay: the gate as "
                        "semicolon-separated name=SQL pairs (replay "
                        "defaults to the table's recorded set)")
    t.add_argument("--on-violation", default="quarantine",
                   choices=["quarantine", "drop", "fail"],
                   help="expect-ingest: violation policy")
    t.add_argument("--small-bytes", type=int, default=128 * 1024 * 1024,
                   help="compact-small: dirs below this size collapse")
    t.add_argument("--small-dir-bytes", type=int, default=None,
                   help="maintain: opt into incremental compaction — "
                        "collapse dirs below this size before deciding "
                        "on a full rewrite")
    t.add_argument("--max-chain", type=int, default=8)
    t.add_argument("--max-dv-frac", type=float, default=0.05)
    t.add_argument("--stats-columns", default="",
                   help="comma-separated zone-map columns for maintain")
    t.add_argument("--bloom-columns", default="",
                   help="comma-separated Bloom columns for maintain")
    t.add_argument("--zorder", default="",
                   help="comma-separated clustering columns for maintain")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from temp_data_pipeline_spark.session import get_spark
    from temp_data_pipeline_spark.sources.registry import read_parquet_any

    spark = get_spark(f"cli-{args.cmd}")

    if args.cmd == "clean":
        from temp_data_pipeline_spark.operators.clean_hourly import clean_hourly_obs
        from temp_data_pipeline_spark.sources.ghcnh import read_ghcnh_psv
        from temp_data_pipeline_spark.sources.isd import read_isd_csv
        from temp_data_pipeline_spark.sources.stations import StationMeta, resolve_station

        station = (
            resolve_station(args.station, args.stations_csv)
            if args.stations_csv
            else StationMeta(station_id=args.station)
        )
        if args.format == "isd":
            raw = read_isd_csv(spark, args.input, station)
        elif args.format == "ghcnh":
            raw = read_ghcnh_psv(spark, args.input, station)
        else:
            raw = read_parquet_any(spark, args.input)
        cleaned = clean_hourly_obs(raw)
        cleaned.withColumn("year", F.year("ts_utc")).write.mode("overwrite").partitionBy(
            "station_id", "year"
        ).parquet(args.output)
        print(f"[clean] wrote {args.output}")

    elif args.cmd == "daily-tmax":
        from temp_data_pipeline_spark.operators.daily_tmax import (
            build_daily_tmax,
            write_daily_tmax,
        )

        hourly = read_parquet_any(spark, args.input)
        daily = build_daily_tmax(
            hourly, station_tz=args.tz, min_coverage_hours=args.min_coverage_hours
        )
        write_daily_tmax(daily, args.output)
        print(f"[daily-tmax] wrote {args.output}")

    elif args.cmd == "features":
        from temp_data_pipeline_spark.operators.features import build_train_daily_tmax

        fc = read_parquet_any(spark, args.forecast)
        truth = read_parquet_any(spark, args.truth)
        train = build_train_daily_tmax(
            fc,
            truth,
            min_coverage_hours=args.min_coverage_hours,
            drop_warmup_nulls=args.drop_warmup_nulls,
        )
        train.write.mode("overwrite").parquet(args.output)
        print(f"[features] wrote {args.output}")

    elif args.cmd == "eval":
        from temp_data_pipeline_spark.eval.config import EvalConfig
        from temp_data_pipeline_spark.eval.report import write_all_artifacts
        from temp_data_pipeline_spark.eval.runner import run_multi_model_evaluation

        with open(args.config) as fh:
            cfg = EvalConfig.from_dict(json.load(fh))
        fc = read_parquet_any(spark, args.forecast)
        truth = read_parquet_any(spark, args.truth)
        result = run_multi_model_evaluation(cfg, fc, truth, run_id=args.run_id)
        run_dir = write_all_artifacts(result, base_path=args.output_dir)
        print(f"[eval] wrote {run_dir}")
        for name, mr in result.models.items():
            m = mr.metrics.forecast
            print(f"  {name}: n={m.n_samples} mae={m.mae:.4f} rmse={m.rmse:.4f}")

    elif args.cmd == "table":
        from temp_data_pipeline_spark.operators.maintenance import (
            MaintenancePolicy,
            maintain_table,
        )
        from temp_data_pipeline_spark.operators.versioned import (
            delete_ref,
            history,
            list_refs,
            rollback,
            tag_version,
            vacuum,
            verify_table,
            versions,
        )

        if args.action == "history":
            for r in history(spark, args.path).collect():
                print(
                    f"v{r['version']}  at={r['committed_at']:.0f}  "
                    f"dirs={r['n_data_dirs']}  refs={r['carries_refs']}  "
                    f"dv={r['has_dv']}  meta={r['meta_json']}"
                )
        elif args.action == "verify":
            issues = verify_table(spark, args.path)
            for i in issues:
                print(f"[verify] {i}")
            print(f"[verify] {len(issues)} issue(s)")
            return 1 if issues else 0
        elif args.action == "maintain":
            pol = MaintenancePolicy(
                max_chain=args.max_chain,
                max_dv_frac=args.max_dv_frac,
                keep_last=args.keep_last,
                stats_columns=[c for c in args.stats_columns.split(",") if c],
                bloom_columns=[c for c in args.bloom_columns.split(",") if c],
                zorder=[c for c in args.zorder.split(",") if c],
                small_dir_bytes=args.small_dir_bytes,
            )
            for a in maintain_table(spark, args.path, pol):
                print(f"[maintain] {a}")
        elif args.action == "vacuum":
            dropped = vacuum(spark, args.path, keep_last=args.keep_last)
            print(f"[vacuum] dropped {dropped}")
        elif args.action == "compact-small":
            from temp_data_pipeline_spark.operators.versioned import (
                commit_with_retries,
                compact_incremental,
            )

            v = commit_with_retries(
                lambda: compact_incremental(
                    spark, args.path, small_bytes=args.small_bytes
                )
            )
            print(f"[compact-small] latest is v{v}")
        elif args.action == "tag":
            if not args.name:
                raise SystemExit("tag needs --name <ref>")
            v = tag_version(spark, args.path, args.name, args.at_version)
            print(f"[tag] {args.name} -> v{v}")
        elif args.action == "refs":
            for rname, rv in sorted(list_refs(spark, args.path).items()):
                print(f"[refs] {rname} -> v{rv}")
        elif args.action == "untag":
            if not args.name:
                raise SystemExit("untag needs --name <ref>")
            existed = delete_ref(spark, args.path, args.name)
            print(f"[untag] {args.name} {'removed' if existed else 'absent'}")
        elif args.action == "changes":
            from temp_data_pipeline_spark.operators.changes import (
                changes_between,
                table_changes_keyed,
            )

            if args.since is None:
                raise SystemExit("changes needs --since <version>")
            keys = [c for c in args.keys.split(",") if c]
            if keys:
                feed = table_changes_keyed(
                    spark, args.path, keys, args.since, args.until
                )
            else:
                feed = changes_between(
                    spark, args.path, args.since, args.until
                )
            if args.out:
                feed.write.mode("errorifexists").parquet(args.out)
                print(f"[changes] wrote {args.out}")
            else:
                counts = {
                    r["_change_type"]: r["n"]
                    for r in feed.groupBy("_change_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                print(
                    f"[changes] since v{args.since}: "
                    + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
                )
        elif args.action == "merge":
            from temp_data_pipeline_spark.operators.merge import (
                commit_merge_into,
            )

            if not args.source or not args.keys:
                raise SystemExit("merge needs --source and --keys")

            def _clause(v):
                if v is None:
                    return None
                return True if v.strip().lower() == "true" else v

            upd_set = None
            if args.update_set:
                upd_set = dict(
                    pair.split("=", 1)
                    for pair in args.update_set.split(";")
                    if pair
                )
            v = commit_merge_into(
                spark.read.parquet(args.source),
                args.path,
                [c for c in args.keys.split(",") if c],
                update_when=_clause(args.update_when),
                update_set=upd_set,
                delete_when=_clause(args.delete_when),
                insert_when=(
                    True
                    if (args.update_when is None and args.delete_when is None
                        and args.insert_when is None)
                    else _clause(args.insert_when)
                ),
            )
            print(f"[merge] committed v{v}")
        elif args.action == "add-constraint":
            from temp_data_pipeline_spark.operators.versioned import (
                add_table_constraint,
            )

            if not args.name or not args.sql:
                raise SystemExit("add-constraint needs --name and --sql")
            v = add_table_constraint(spark, args.path, args.name, args.sql)
            print(f"[add-constraint] {args.name} enforced from v{v}")
        elif args.action == "drop-constraint":
            from temp_data_pipeline_spark.operators.versioned import (
                drop_table_constraint,
            )

            if not args.name:
                raise SystemExit("drop-constraint needs --name")
            v = drop_table_constraint(spark, args.path, args.name)
            print(f"[drop-constraint] {args.name} removed at v{v}")
        elif args.action == "constraints":
            from temp_data_pipeline_spark.operators.versioned import (
                table_constraints,
            )

            for cname, csql in sorted(table_constraints(spark, args.path).items()):
                print(f"[constraints] {cname}: {csql}")
        elif args.action == "expect-ingest":
            from temp_data_pipeline_spark.operators.expectations import (
                commit_with_expectations,
            )

            if not args.source or not args.expect:
                raise SystemExit("expect-ingest needs --source and --expect")
            exp = dict(
                pair.split("=", 1)
                for pair in args.expect.split(";")
                if pair
            )
            v, n_bad = commit_with_expectations(
                spark.read.parquet(args.source),
                args.path,
                exp,
                on_violation=args.on_violation,
            )
            print(f"[expect-ingest] committed v{v}, quarantined {n_bad}")
        elif args.action == "expect-show":
            from temp_data_pipeline_spark.operators.expectations import (
                table_expectations,
            )
            from temp_data_pipeline_spark.operators.versioned import (
                read_manifest,
            )

            exp = table_expectations(spark, args.path)
            if not exp:
                print("[expect-show] no expectations recorded")
            for name, sql in sorted(exp.items()):
                print(f"[expect-show] {name}: {sql}")
            for v in versions(spark, args.path):
                man = read_manifest(spark, args.path, v)
                if "_quarantined" in man:
                    print(
                        f"[expect-show] v{v}: quarantined "
                        f"{man['_quarantined']}"
                    )
        elif args.action == "quarantine":
            from temp_data_pipeline_spark.operators.expectations import (
                quarantine_summary,
            )

            for r in quarantine_summary(spark, args.path).collect():
                print(f"[quarantine] {r['expectation']}: {r['rows']} rows")
        elif args.action == "quarantine-replay":
            from temp_data_pipeline_spark.operators.expectations import (
                replay_quarantine,
            )

            exp = None
            if args.expect:
                exp = dict(
                    pair.split("=", 1)
                    for pair in args.expect.split(";")
                    if pair
                )
            v, n_pass, n_still = replay_quarantine(
                spark, args.path, exp
            )
            where = f"v{v}" if v is not None else "no commit"
            print(
                f"[quarantine-replay] {n_pass} rows passed ({where}), "
                f"{n_still} still quarantined"
            )
        elif args.action == "replicate":
            from temp_data_pipeline_spark.operators.replicate import (
                replicate_incremental,
                replicate_seed,
            )
            from temp_data_pipeline_spark.operators.versioned import versions

            if not args.dest or not args.keys:
                raise SystemExit("replicate needs --dest and --keys")
            keys = [c for c in args.keys.split(",") if c]
            if not versions(spark, args.dest):
                v = replicate_seed(spark, args.path, args.dest, keys)
                print(f"[replicate] seeded {args.dest} at v{v}")
            else:
                v = replicate_incremental(spark, args.path, args.dest, keys)
                print(f"[replicate] {args.dest} caught up (replica v{v})")
        elif args.action == "clone":
            from temp_data_pipeline_spark.operators.versioned import (
                shallow_clone,
            )

            if not args.dest:
                raise SystemExit("clone needs --dest <new table root>")
            v = shallow_clone(
                spark, args.path, args.dest, version=args.at_version
            )
            print(f"[clone] {args.dest} created at v{v} (zero-copy)")
        elif args.action == "copy-into":
            from temp_data_pipeline_spark.operators.copy_into import (
                copy_into,
            )

            if not args.from_dir:
                raise SystemExit("copy-into needs --from-dir <landing>")
            v, n = copy_into(
                spark,
                args.path,
                args.from_dir,
                file_format=args.file_format,
                pattern=args.pattern,
            )
            print(f"[copy-into] loaded {n} file(s); latest is v{v}")
        elif args.action == "partitions":
            from temp_data_pipeline_spark.operators.versioned import (
                snapshot_partitions,
            )

            for r in snapshot_partitions(
                spark, args.path, args.at_version
            ).collect():
                print(r.asDict())
        elif args.action == "add-column":
            from temp_data_pipeline_spark.operators.versioned import (
                add_column,
            )

            if not args.column or " " not in args.column.strip():
                raise SystemExit("add-column needs --column 'name type'")
            cname, ctype = args.column.strip().split(" ", 1)
            v = add_column(spark, args.path, cname, ctype.strip())
            print(f"[add-column] {cname} {ctype} at v{v}")
        elif args.action == "properties":
            from temp_data_pipeline_spark.operators.versioned import (
                set_table_properties,
                table_properties,
                unset_table_properties,
            )

            if args.set_props:
                props = dict(
                    pair.split("=", 1)
                    for pair in args.set_props.split(";")
                    if "=" in pair
                )
                v = set_table_properties(spark, args.path, props)
                print(f"[properties] set {sorted(props)} at v{v}")
            if args.unset_props:
                keys = [k for k in args.unset_props.split(",") if k]
                v = unset_table_properties(spark, args.path, keys)
                print(f"[properties] unset {keys} at v{v}")
            for k, val in sorted(table_properties(spark, args.path).items()):
                print(f"[properties] {k} = {val}")
        elif args.action == "scd2":
            from temp_data_pipeline_spark.operators.scd import (
                scd2_catchup,
                scd2_init,
            )
            from temp_data_pipeline_spark.operators.versioned import versions

            if not args.dest or not args.keys:
                raise SystemExit("scd2 needs --dest and --keys")
            keys = [c for c in args.keys.split(",") if c]
            if not versions(spark, args.dest):
                v = scd2_init(spark, args.path, args.dest, keys)
                print(f"[scd2] seeded dimension {args.dest} at v{v}")
            else:
                v = scd2_catchup(spark, args.path, args.dest, keys)
                print(f"[scd2] dimension caught up (v{v})")
        else:
            if args.to_version is None:
                raise SystemExit("rollback needs --to-version")
            v = rollback(spark, args.path, args.to_version)
            print(f"[rollback] restored v{args.to_version} as v{v}")

    elif args.cmd == "sql":
        from pyspark.sql import DataFrame as _DF

        from temp_data_pipeline_spark.sql import SqlEngine

        catalog = {}
        for entry in args.table:
            if "=" not in entry:
                raise SystemExit(f"--table needs NAME=PATH (got {entry!r})")
            name, path = entry.split("=", 1)
            catalog[name] = path
        out = SqlEngine(spark, catalog).sql(args.statement)
        if isinstance(out, _DF):
            for r in out.limit(args.limit).collect():
                print(r.asDict())
        elif out is not None:
            print(f"[sql] committed v{out}")

    elif args.cmd == "fetch":
        from pathlib import Path

        from temp_data_pipeline_spark.sources.fetch import (
            fetch_noaa_hourly,
            fetch_openmeteo_forecast,
            resolve_fetch_station,
        )

        station = resolve_fetch_station(args.station, args.stations_csv)
        data = Path(args.data_dir)
        if args.source == "openmeteo":
            out = fetch_openmeteo_forecast(
                spark, station, args.start, args.end,
                data / "raw" / "openmeteo" / station.station_id,
            )
        else:
            out = fetch_noaa_hourly(
                spark, station, args.start, args.end,
                out_dir=data / "raw" / "noaa_hourly" / station.station_id,
                cache_dir=data / "cache" / station.station_id,
                source=args.source,
            )
        print(f"[fetch] wrote {out}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
