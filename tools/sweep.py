"""Both-scale oracle sweep: run EVERY registered query against DuckDB
at a given scale factor and print one MATCH/MISMATCH line per query —
the driver's CORRECTNESS comparison, locally, over the whole surface.

Usage:
  python tools/sweep.py [--sf-dir /root/testdata/sf0.01] [--repo /root/repo]

Run from any cwd (imports the target repo's driver contract by path —
the streaming DataSource pickles by value, so a /tmp cwd is the
DRIVER-faithful configuration; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import os
import sys
import time
from datetime import date, datetime


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repo",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument("--only", default="", help="comma-separated query names")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(args.repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    def canon(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def c(v):
            if isinstance(v, float):
                return "NaN" if math.isnan(v) else repr(v)
            if isinstance(v, (datetime, date)):
                return v.isoformat()
            if hasattr(v, "item"):
                return c(v.item())
            return v

        return sorted(
            [tuple(c(r[i]) for i in order) for r in rows], key=repr
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    names = (
        [n.strip() for n in args.only.split(",") if n.strip()]
        if args.only
        else sorted(qs)
    )
    fails: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(
                    f"ROWS-ONLY {name} rows={len(s_rows)} "
                    f"{time.perf_counter() - t0:.1f}s",
                    flush=True,
                )
                continue
            cur = con.execute(osql[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
            ok = sorted(s_cols) == sorted(d_cols) and canon(
                s_cols, s_rows
            ) == canon(d_cols, d_rows)
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            print(f"ERROR {name}: {exc}", flush=True)
            fails.append(name)
            continue
        print(
            f"{'MATCH' if ok else 'MISMATCH'} {name} rows={len(s_rows)} "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        if not ok:
            fails.append(name)
    print(f"TOTAL {len(names)} FAILS {len(fails)}: {fails}", flush=True)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
