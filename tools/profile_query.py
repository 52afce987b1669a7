"""Per-query job-level profiler: runs one (or more) declared queries
under the bench's session config and dumps every Spark job's wall
span (from the app status store, which runs even with the UI off),
plus the driver-side gaps between jobs — the split the optimization
guide §1 asks for before touching anything.

Usage:
  python tools/profile_query.py q_replicate [q_scd2 ...] \
      [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--runs 2]

Prints, per run: wall, sum(job spans), biggest driver gaps, and a
job table (id, span, tasks, description head).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("profile-query")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.appStateStore.asyncTracking.enable", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    store = spark.sparkContext._jsc.sc().statusStore()

    def _stage_info(sid: int):
        # Spark 4.1: stageList grew to 5 params (py4j can't use Scala
        # default args) — the per-stage lastStageAttempt lookup is the
        # stable accessor. Stages that never ran raise; return None.
        try:
            s = store.lastStageAttempt(sid)
            return (
                s.numTasks(),
                str(s.name())[:80].replace("\n", " "),
            )
        except Exception:  # noqa: BLE001 - skipped stage or API drift
            return None

    def jobs_since(job_floor: int):
        out = []
        it = store.jobsList(None).iterator()
        while it.hasNext():
            j = it.next()
            if j.jobId() <= job_floor:
                continue
            sub = j.submissionTime()
            comp = j.completionTime()
            t0 = sub.get().getTime() / 1e3 if sub.isDefined() else None
            t1 = comp.get().getTime() / 1e3 if comp.isDefined() else None
            desc = (
                j.description().get()
                if j.description().isDefined()
                else j.name()
            )
            sit = j.stageIds().iterator()
            sids = []
            while sit.hasNext():
                sids.append(int(str(sit.next())))
            stages = []
            for sid in sids:
                info = _stage_info(sid)
                if info:
                    stages.append(f"s{sid}:{info[0]}t:{info[1][:46]}")
            out.append(
                {
                    "id": j.jobId(),
                    "t0": t0,
                    "t1": t1,
                    "tasks": j.numTasks(),
                    "desc": str(desc)[:110].replace("\n", " "),
                    "stages": stages,
                }
            )
        out.sort(key=lambda d: d["id"])
        return out

    def last_job_id():
        it = store.jobsList(None).iterator()
        mx = -1
        while it.hasNext():
            mx = max(mx, it.next().jobId())
        return mx

    for name in args.names:
        fn = queries[name]
        for run in range(args.runs):
            floor = last_job_id()
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t_build = time.perf_counter() - t0
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            jobs = jobs_since(floor)
            spans = [
                (j["t1"] - j["t0"]) for j in jobs if j["t0"] and j["t1"]
            ]
            job_sum = sum(spans)
            print(
                f"\n=== {name} run{run}: wall={wall:.3f}s build={t_build:.3f}s "
                f"jobs={len(jobs)} sum(job spans)={job_sum:.3f}s "
                f"driver-ish gap={wall - job_sum:.3f}s"
            )
            # gaps between consecutive jobs
            gaps = []
            prev_end = None
            for j in jobs:
                if j["t0"] is None or j["t1"] is None:
                    continue
                if prev_end is not None and j["t0"] - prev_end > 0.05:
                    gaps.append((j["t0"] - prev_end, j["id"]))
                prev_end = max(prev_end or 0, j["t1"])
            gaps.sort(reverse=True)
            if gaps:
                print(
                    "  biggest inter-job gaps: "
                    + ", ".join(
                        f"{g:.2f}s before job {i}" for g, i in gaps[:8]
                    )
                )
            for j in jobs:
                span = (
                    f"{j['t1'] - j['t0']:.3f}s"
                    if j["t0"] and j["t1"]
                    else "?"
                )
                print(
                    f"  job {j['id']:>4} {span:>8} tasks={j['tasks']:>3} "
                    f"{j['desc']}"
                )
                if j["tasks"] >= 16:
                    for st in j["stages"]:
                        print(f"        {st}")
            # cleanup like bench.py does
            try:
                for jrdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    jrdd.unpersist(True)
                spark.catalog.clearCache()
            except Exception:
                pass
    spark.stop()


if __name__ == "__main__":
    main()
