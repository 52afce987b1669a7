"""Token-budget selection (llm/budget.py): sequential-model parity,
edge cases, and the bucketed (never single-partition) window shape."""

from __future__ import annotations

import random

import pytest

from temp_data_pipeline_spark.llm.budget import select_within_budget


def _py_select(rows, budget):
    """Sequential greedy prefix in (weight desc, id asc) order."""
    out, cum = {}, 0
    for i, tok, w in sorted(rows, key=lambda r: (-r[2], r[0])):
        cum += tok
        if cum > budget:
            break
        out[i] = cum
    return out


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long, w double")


def test_matches_sequential_greedy_prefix(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.randint(1, 40), float(rng.randint(-50, 50)))
        for i in range(200)
    ]
    # weight ties across many docs: the id tie-break must hold
    rows += [(1000 + i, 7, 13.0) for i in range(20)]
    for budget in (0, 37, 500, 2000, 10**9):
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in select_within_budget(
                _frame(spark, rows), budget,
                weight_col="w", token_col="n_tokens", n_buckets=8,
            ).collect()
        }
        assert got == _py_select(rows, budget), budget


def test_prefix_semantics_stop_at_first_overflow(spark):
    """No hole-filling: a later smaller document that would still fit
    is NOT taken once the running total has overflowed."""
    rows = [(1, 10, 3.0), (2, 100, 2.0), (3, 1, 1.0)]
    got = sorted(
        r["doc_id"]
        for r in select_within_budget(
            _frame(spark, rows), 15, weight_col="w", token_col="n_tokens"
        ).collect()
    )
    assert got == [1]  # doc 2 overflows; doc 3 (would fit) is after it


def test_single_weight_value_degenerate(spark):
    rows = [(i, 5, 1.0) for i in range(10)]
    got = sorted(
        r["doc_id"]
        for r in select_within_budget(
            _frame(spark, rows), 25, weight_col="w", token_col="n_tokens"
        ).collect()
    )
    assert got == [0, 1, 2, 3, 4]  # id ascending within the tie


def test_empty_and_negative(spark):
    empty = _frame(spark, [])
    assert (
        select_within_budget(
            empty, 100, weight_col="w", token_col="n_tokens"
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="negative budget"):
        select_within_budget(
            _frame(spark, [(1, 1, 1.0)]), -1,
            weight_col="w", token_col="n_tokens",
        )


def test_windows_are_bucket_partitioned(spark):
    """The data-sized window must hash-partition on the weight bucket
    — the whole point vs a single-partition global orderBy."""
    rows = [(i, 5, float(i % 17)) for i in range(100)]
    plan = (
        select_within_budget(
            _frame(spark, rows), 100, weight_col="w", token_col="n_tokens"
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(_b" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
