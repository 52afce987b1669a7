"""Relational-completeness queries: oracle parity + physical-plan gates.

Semi/anti joins must not materialize payload columns; pivot with an
explicit value list must not add a discovery pass over the data.
"""

from __future__ import annotations

import pytest

from temp_data_pipeline_spark.plans.relational_queries import RELATIONAL_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_query_oracle(spark, name):
    compare_query(spark, RELATIONAL_QUERIES[name], SF_SMOKE)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_semi_join_is_broadcast(spark):
    df = RELATIONAL_QUERIES["q_semi_join"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftSemi" in plan
    # orders is tiny at smoke SF → AQE/static planning should broadcast
    assert "Broadcast" in plan


def test_anti_join_is_anti(spark):
    plan = _plan(RELATIONAL_QUERIES["q_anti_join"].builder(spark, SF_SMOKE))
    assert "LeftAnti" in plan


def test_pivot_scans_events_once(spark):
    # Explicit pivot values: exactly one scan of events.parquet. A
    # missing value list would add a distinct-discovery job (invisible
    # in this plan but it would also double the scan count here).
    plan = _plan(RELATIONAL_QUERIES["q_pivot"].builder(spark, SF_SMOKE))
    assert plan.count("events.parquet") == 1


def test_rollup_single_exchange(spark):
    # Expand-before-exchange: every rollup level in one shuffle. The
    # trailing orderBy adds its own range exchange; no more than the
    # hash exchange + sort exchange may appear.
    plan = _plan(RELATIONAL_QUERIES["q_rollup"].builder(spark, SF_SMOKE))
    assert "Expand" in plan
    assert plan.count("Exchange") <= 2


def test_star_revenue_broadcasts_dims(spark):
    """Q5 shape: every dimension (region-filtered nation, supplier)
    joins as a broadcast hash join; the fact chain must not degrade to
    a nested-loop or cartesian plan."""
    plan = _plan(RELATIONAL_QUERIES["q_star_revenue"].builder(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_star_revenue_semi_join_precedes_fact_shuffle(spark):
    """Verdict r6 #2: the ASIA restriction must reach the customer
    branch BEFORE its first exchange — walking up from the customer
    scan, the first join/exchange node must be the broadcast LeftSemi
    against the asia nation keys, so every fact shuffle carries only
    the surviving ~1/5 of customers."""
    plan = _plan(RELATIONAL_QUERIES["q_star_revenue"].builder(spark, SF_SMOKE))
    lines = plan.splitlines()
    scan_idx = next(
        i for i, ln in enumerate(lines) if "customer" in ln and "Scan" in ln
    )
    for ln in reversed(lines[:scan_idx]):
        if "Join" in ln or "Exchange" in ln:
            assert "LeftSemi" in ln, (
                "first operator above the customer scan must be the "
                f"ASIA semi-join, found: {ln.strip()}"
            )
            break
    else:
        raise AssertionError("no join/exchange found above the customer scan")


def test_part_agg_pushes_dim_predicate_before_broadcast(spark):
    plan = _plan(RELATIONAL_QUERIES["q_part_agg"].builder(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # the LIKE/size predicate evaluates on the dim scan side, not on
    # the joined fact rows
    i_join = plan.index("BroadcastHashJoin")
    assert "BRASS" in plan[i_join:], "dim filter must exist"
