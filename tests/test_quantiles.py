"""Exact vs approximate percentile tiers (SURVEY §2.12 A10).

The approx tier's guarantee is in RANK space (Greenwald-Khanna:
true rank within n/accuracy of the target), so the bench-scale test
asserts exactly that — the fraction of rows at or below the returned
value — rather than a distribution-dependent value tolerance."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.eval.slicing import compute_metrics_by_slice
from temp_data_pipeline_spark.operators.quantiles import quantiles

SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def test_exact_matches_numpy(spark):
    vals = [float(v) for v in range(101)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = quantiles(df, "x", [0.25, 0.5, 0.933], exact=True).first()
    exp = np.percentile(np.array(vals), [25, 50, 93.3])
    assert row["q0_25"] == pytest.approx(exp[0])
    assert row["q0_5"] == pytest.approx(exp[1])
    assert row["q0_933"] == pytest.approx(exp[2])


def test_grouped_quantiles(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(11)] + [("b", float(10 * v)) for v in range(11)],
        "g string, x double",
    )
    rows = {r["g"]: r for r in quantiles(df, "x", [0.5], by=["g"], exact=True).collect()}
    assert rows["a"]["q0_5"] == 5.0
    assert rows["b"]["q0_5"] == 50.0


def test_approx_rank_error_bound_at_bench_scale(spark):
    """At sf0.1 (~600k lineitem rows) the sketch's returned values
    must sit within the documented n/accuracy rank window."""
    li = spark.read.parquet(f"{SF_BENCH}/lineitem.parquet")
    n = li.count()
    probs = [0.25, 0.5, 0.9, 0.99]
    accuracy = 10_000
    row = quantiles(li, "l_extendedprice", probs, accuracy=accuracy).first()
    for p in probs:
        v = row[f"q{str(p).replace('.', '_')}"]
        rank = li.filter(F.col("l_extendedprice") <= v).count() / n
        assert abs(rank - p) <= 1.0 / accuracy + 1e-6, (p, v, rank)


def test_approx_converges_to_exact_with_accuracy(spark):
    li = spark.read.parquet(f"{SF_BENCH}/lineitem.parquet")
    exact = quantiles(li, "l_extendedprice", [0.5], exact=True).first()["q0_5"]
    coarse = quantiles(li, "l_extendedprice", [0.5], accuracy=100).first()["q0_5"]
    fine = quantiles(li, "l_extendedprice", [0.5], accuracy=50_000).first()["q0_5"]
    assert abs(fine - exact) <= abs(coarse - exact) + 1e-9


def test_sliced_metrics_approx_regime_cuts(spark):
    """The approx regime path produces the same slice structure; cut
    points differ only within sketch error (tiny frame → identical)."""
    rows = [(float(i % 40), float(i % 40) + (1 if i % 3 else -1), i % 12 + 1, float(i % 96))
            for i in range(600)]
    df = spark.createDataFrame(rows, "y_true_f double, y_pred_f double, month int, lead_hours double")
    ex = compute_metrics_by_slice(df, exact_percentile=True)
    ap = compute_metrics_by_slice(df, exact_percentile=False)
    assert set(ex) == set(ap) == {"by_month", "by_season", "by_lead_bucket", "by_temp_regime"}
    assert set(ex["by_month"]) == set(ap["by_month"])
    for fam in ("by_month", "by_season", "by_lead_bucket"):
        for k, md in ex[fam].items():
            assert ap[fam][k]["n_samples"] == md["n_samples"]


def test_approx_distinct_within_rsd_envelope(spark):
    """HLL++ tier: relative error within ~3·rsd of exact at bench
    scale (rsd is a standard deviation, not a hard bound)."""
    from temp_data_pipeline_spark.operators.sketches import distinct_count

    li = spark.read.parquet(f"{SF_BENCH}/lineitem.parquet")
    exact = distinct_count(li, "l_orderkey", exact=True).first()["n_distinct"]
    approx = distinct_count(li, "l_orderkey", rsd=0.02).first()["n_distinct"]
    assert abs(approx - exact) / exact < 0.06


def test_approx_distinct_grouped(spark):
    from temp_data_pipeline_spark.operators.sketches import distinct_count

    df = spark.createDataFrame(
        [("a", i % 50) for i in range(500)] + [("b", i % 7) for i in range(100)],
        "g string, v long",
    )
    exact = {r["g"]: r["n_distinct"]
             for r in distinct_count(df, "v", by=["g"], exact=True).collect()}
    assert exact == {"a": 50, "b": 7}
    approx = {r["g"]: r["n_distinct"]
              for r in distinct_count(df, "v", by=["g"], rsd=0.01).collect()}
    assert approx["b"] == 7  # tiny cardinalities are exact in HLL++ (sparse mode)
    assert abs(approx["a"] - 50) <= 2


# ---------------------------------------------------------------------------
# Count-Min sketch (frequency tier)
# ---------------------------------------------------------------------------


class TestCountMin:
    DEPTH, WIDTH, SEED = 4, 1024, 42

    def _tokens(self, spark):
        from temp_data_pipeline_spark.llm.dedup import tokenized
        from temp_data_pipeline_spark.sources.registry import load_table
        from tests.conftest import SF_SMOKE
        from pyspark.sql import functions as F

        d = load_table(spark, SF_SMOKE, "documents")
        return tokenized(d, "text", keep=[]).select(
            F.explode(F.col("_tok")).alias("token")
        )

    def test_never_underestimates_and_error_bounded(self, spark):
        from temp_data_pipeline_spark.operators.sketches import (
            cms_build,
            cms_estimate,
            heavy_hitters,
        )

        toks = self._tokens(spark)
        n_total = toks.count()
        sketch = cms_build(toks, "token", self.DEPTH, self.WIDTH, self.SEED)
        assert sketch.count() <= self.DEPTH * self.WIDTH

        exact = heavy_hitters(toks, "token", k=50)
        est = cms_estimate(
            exact.select("token"), sketch, "token", self.DEPTH, self.WIDTH, self.SEED
        )
        joined = {r["token"]: r["est"] for r in est.collect()}
        import math

        bound = math.e * n_total / self.WIDTH  # CM guarantee at p≈1-e^-depth
        for r in exact.collect():
            e, t = joined[r["token"]], r["cnt"]
            assert e >= t, f"CMS underestimated {r['token']}: {e} < {t}"
            assert e <= t + bound, f"CMS error above e·N/w bound for {r['token']}"

    def test_mergeable_partition_invariant(self, spark):
        """Sketch counters are sums → identical under repartitioning
        (the property that makes map-side merge and incremental
        maintenance correct)."""
        from temp_data_pipeline_spark.operators.sketches import cms_build

        toks = self._tokens(spark)
        a = sorted(map(tuple, cms_build(toks, "token").collect()))
        b = sorted(map(tuple, cms_build(toks.repartition(7), "token").collect()))
        assert a == b

    def test_absent_item_estimate_small(self, spark):
        from temp_data_pipeline_spark.operators.sketches import cms_build, cms_estimate

        toks = self._tokens(spark)
        n_total = toks.count()
        sketch = cms_build(toks, "token")
        ghost = spark.createDataFrame([("__never_seen_token__",)], ["token"])
        est = cms_estimate(ghost, sketch, "token").first()["est"]
        import math

        assert est <= math.e * n_total / 1024
