"""Benchmark harness: runs the engine's headline queries at sf0.1.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_agg": sec, ...}, "sf": 0.1}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[*] threads (default 32)

Each query is forced end-to-end with the `noop` sink (full plan
execution, zero driver collection) so the timing reflects scan +
shuffle + compute, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

import pandas as pd  # noqa: F401  (resolves pandas UDF type hints)

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    try:
        start_load = round(os.getloadavg()[0], 2)
    except OSError:
        start_load = -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("temp-data-pipeline-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # AQE may re-optimize cached plan partitioning (see
        # session.py): without it a persisted delta-sized feed keeps
        # the full shuffle fan-out and MOR appends write one tiny
        # file per shuffle partition. Scale-neutral (AQE sizes by
        # bytes); mirrors the engine session so the bench measures
        # the engine's real configuration.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # JVM/codegen warm-up so the first timed query isn't charged for
    # JIT of the scan, higher-order-function, hash, and cast machinery.
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.createDataFrame([("a b c d",)], "text string")
    warm.select(
        F.aggregate(
            F.split("text", " "),
            F.array_repeat(F.lit(0).cast("long"), 4),
            lambda acc, s: F.zip_with(
                acc,
                F.array(*[F.xxhash64(F.lit(i), s) for i in range(4)]),
                lambda a, h: F.least(a, h),
            ),
        ),
        F.md5("text"),
        F.lit("2024-01-01 00:00:00").try_cast("timestamp"),
        F.explode(F.array(F.split("text", " "))),
    ).collect()

    # join / window / dedup / Python-worker machinery: the first query
    # to hit each path otherwise pays its JIT + worker-pool startup
    from pyspark.sql import Window

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1000).join(spark.range(1000), "id").count()  # sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    spark.range(1000).select(
        F.row_number()
        .over(Window.partitionBy(F.col("id") % 10).orderBy("id"))
        .alias("r")
    ).filter("r <= 5").count()
    spark.range(1000).dropDuplicates(["id"]).count()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    # grouped-map (applyInPandas) runs a DIFFERENT Arrow eval path
    # (FlatMapGroupsInPandas) than mapInPandas — warm it too, or the
    # first bucket-matmul verify query pays its worker/JIT startup
    spark.range(100).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]], "id long"
    ).count()

    # Arrow scalar-UDF workers importing numpy: every executor thread's
    # Python worker pays the numpy import once — do it here, not inside
    # the first LSH/PQ query's timing
    @F.pandas_udf("double")
    def _warm_np(v: pd.Series) -> pd.Series:
        import numpy as np

        return v * float(np.float64(1.0))

    spark.range(2000).repartition(int(cpus)).select(
        _warm_np(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    # streaming state store (window agg, availableNow -> memory sink)
    import shutil
    import tempfile

    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        spark.sql(
            "SELECT id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts "
            "FROM range(100)"
        ).write.parquet(f"{warm_dir}/t")
        q = (
            spark.readStream.schema("id long, ts timestamp")
            .parquet(f"{warm_dir}/t")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .count()
            .writeStream.format("memory")
            .queryName("bench_warm_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    # Every query runs twice and reports the MIN: the shared host
    # shows intermittent multi-second stolen-CPU bursts (loadavg
    # spikes with zero local processes; a trivial projection measured
    # 8-11x its steady state, and an A/B of identical code across
    # commits pinned the inflation entirely on ambient bursts — round
    # 9). One burst landing inside a timed span is pure noise;
    # min-of-2 is the standard noisy-host variance reduction and the
    # second pass also reports warm-cache steady state, which is what
    # a capacity plan actually wants. Doubles the bench wall-clock to
    # ~10 min at sf0.1.
    _RERUN_UNDER_SEC = float("inf")

    def _release_blocks(name: str) -> None:
        # Outside the timed span: release blocks this query pinned
        # (see the comment below the loop for why this matters).
        try:
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist(True)
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001 - hygiene must not fail the run
            print(f"BENCH-CLEANUP {name}: {exc}", file=sys.stderr)

    def _timed_once(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        t = round(time.perf_counter() - t0, 3)
        _release_blocks(name)
        return t

    def _probe() -> float:
        # pure-CPU ambient-steal probe (~0.05 s on an idle host): a
        # reading several times its idle value labels the ADJACENT
        # query timing as host-noise, making the artifact
        # self-adjudicating (SURVEY §6 — this host steals CPU in
        # multi-minute windows that min-of-2 cannot always dodge)
        import numpy as np

        a = np.random.default_rng(0).standard_normal((512, 512))
        t0 = time.perf_counter()
        for _ in range(8):
            a = a @ a / 512
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    probes: dict[str, float] = {}
    for name in sorted(queries):
        probes[name] = _probe()
        try:
            t = _timed_once(name)
            if t < _RERUN_UNDER_SEC:
                t = min(t, _timed_once(name))
            timings[name] = t
        except Exception as exc:  # noqa: BLE001 - record, don't abort the suite
            timings[name] = -1.0
            print(f"BENCH-FAIL {name}: {exc}", file=sys.stderr)
            _release_blocks(name)
        # Block hygiene runs inside _timed_once, OUTSIDE the timed
        # span: localCheckpoint() RDDs (connected components, cluster
        # labels) cannot be unpersisted by their operators before
        # consumption (local checkpoints are not replayable), so
        # without it every subsequent query inherits the accumulated
        # block-manager pressure — measured as a uniform ~2-3x drift
        # on the alphabetically-late queries (q_stream_*) in the
        # 95-query r4 suite while the same queries run 2-4x faster in
        # isolation. blocking=True: removal must finish inside the
        # untimed gap, not overlap (and slow) the next timed query.

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "total wall-clock of all declared queries (noop sink)",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": sf,
        # provenance: distinguishes a settled-idle artifact from one
        # taken under concurrent load (pytest alongside inflates
        # individual queries up to 6x — SURVEY §6; totals drift ±10%
        # even idle). Compare artifacts only at similar start_load_1m.
        "conditions": {
            "start_load_1m": start_load,
            "cpus": int(cpus),
            "session": "cold (fresh JVM, warm-up pass before timing)",
        },
        # per-query ambient probe (pure numpy matmul, ~0.05 s idle):
        # compare a query's probe to the run's MINIMUM probe — a large
        # ratio marks that query's reading as stolen-CPU noise
        "probes": probes,
    }
    # The driver's stored copy of the stdout line has been observed
    # truncated (BENCH_r04 lost its ~8-entry tail), so also persist
    # the full per-query dict as an artifact for round-over-round
    # diffs. Failure to write must not fail the bench.
    try:
        with open(os.path.join(_REPO, "BENCH_FULL.json"), "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"BENCH-ARTIFACT-FAIL: {exc}", file=sys.stderr)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
