"""Golden-value tests for operators/temporal.py (as-of join,
sessionization, range join) plus oracle + plan checks for their
declared queries.

The reference has no temporal joins (SURVEY.md §2.4); these pin the
extension semantics exactly: strict-vs-inclusive equality boundaries,
gap-exactly-at-threshold, and window [lo, hi) edge inclusivity.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
    sessionize,
)
from temp_data_pipeline_spark.plans.temporal_queries import TEMPORAL_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: per-key quote stream
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 1.0, 1),
            ("a", _ts("2024-01-01T10:05:00"), 2.0, 2),
            ("a", _ts("2024-01-01T10:10:00"), 3.0, 3),
            ("b", _ts("2024-01-01T09:00:00"), 9.0, 4),
        ],
        "key string, qts timestamp, px double, qid int",
    )


@pytest.fixture(scope="module")
def trades(spark):
    # left side; includes an exact-equal timestamp (10:05) for the
    # strict/inclusive boundary and a row before any quote.
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:59:00"), 100),
            ("a", _ts("2024-01-01T10:05:00"), 101),
            ("a", _ts("2024-01-01T10:07:00"), 102),
            ("b", _ts("2024-01-01T12:00:00"), 103),
        ],
        "key string, tts timestamp, tid int",
    )


def _asof_map(df):
    return {r["tid"]: r["last_px"] for r in df.collect()}


class TestAsofJoin:
    def test_backward_strict(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"}, strict=True,
        )
        # 10:05 trade must NOT see the 10:05 quote under strict <
        assert _asof_map(out) == {100: None, 101: 1.0, 102: 2.0, 103: 9.0}

    def test_backward_inclusive(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"}, strict=False,
        )
        assert _asof_map(out) == {100: None, 101: 2.0, 102: 2.0, 103: 9.0}

    def test_forward_strict(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"}, direction="forward", strict=True,
        )
        # earliest strictly-later quote; b has none after 12:00
        assert _asof_map(out) == {100: 1.0, 101: 3.0, 102: 3.0, 103: None}

    def test_forward_inclusive(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"}, direction="forward", strict=False,
        )
        assert _asof_map(out) == {100: 1.0, 101: 2.0, 102: 3.0, 103: None}

    def test_inner_drops_unmatched(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"}, how="inner",
        )
        assert sorted(r["tid"] for r in out.collect()) == [101, 102, 103]

    def test_matched_ts_emitted(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"},
        )
        row = {r["tid"]: r["tts_asof"] for r in out.collect()}
        assert row[102] == _ts("2024-01-01T10:05:00")

    def test_collision_rejected(self, trades, quotes):
        with pytest.raises(ValueError, match="collides"):
            asof_join(
                trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
                right_cols={"px": "tid"},
            )

    def test_no_nested_loop_join(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
            right_cols={"px": "last_px"},
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestSessionize:
    def test_gap_boundary(self, spark):
        # gaps: 29m59s (same session), exactly 30m (same — threshold is
        # strict >), 30m + 1 microsecond (new session)
        df = spark.createDataFrame(
            [
                (1, _ts("2024-01-01T00:00:00")),
                (1, _ts("2024-01-01T00:29:59")),
                (1, _ts("2024-01-01T00:59:59")),
                (1, _ts("2024-01-01T01:29:59.000001")),
                (2, _ts("2024-01-01T00:00:00")),
            ],
            "user_id int, ts timestamp",
        )
        out = sessionize(df, key="user_id", ts="ts", gap_minutes=30.0)
        got = {
            (r["user_id"], r["ts"].isoformat()): r["session_idx"]
            for r in out.collect()
        }
        assert got == {
            (1, "2024-01-01T00:00:00"): 1,
            (1, "2024-01-01T00:29:59"): 1,
            (1, "2024-01-01T00:59:59"): 1,
            (1, "2024-01-01T01:29:59.000001"): 2,
            (2, "2024-01-01T00:00:00"): 1,
        }


class TestRangeJoin:
    def test_window_edges(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T00:00:00"), 10)],
            "k int, lts timestamp, lid int",
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2023-12-31T23:59:59.999999"), 0),  # just before
                (1, _ts("2024-01-01T00:00:00"), 1),          # == lower: in
                (1, _ts("2024-01-01T00:59:59.999999"), 2),   # just inside
                (1, _ts("2024-01-01T01:00:00"), 3),          # == upper: out
                (2, _ts("2024-01-01T00:30:00"), 4),          # wrong key
            ],
            "k int, rts timestamp, rid int",
        )
        out = range_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            lower_seconds=0.0, upper_seconds=3600.0, right_cols={"rid": "rid"},
        )
        assert sorted(r["rid"] for r in out.collect()) == [1, 2]

    def test_bucket_crossing(self, spark):
        # left at 00:50 with window [0, 1h): matches land in two
        # different hour buckets — proves the explode-to-2-buckets path
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T00:50:00"), 10)],
            "k int, lts timestamp, lid int",
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-01T00:55:00"), 1),  # bucket 0
                (1, _ts("2024-01-01T01:30:00"), 2),  # bucket 1
                (1, _ts("2024-01-01T01:50:00"), 3),  # == upper: out
            ],
            "k int, rts timestamp, rid int",
        )
        out = range_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            lower_seconds=0.0, upper_seconds=3600.0, right_cols={"rid": "rid"},
        )
        assert sorted(r["rid"] for r in out.collect()) == [1, 2]

    def test_no_nested_loop_join(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T00:00:00"), 10)], "k int, lts timestamp, lid int"
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01T00:30:00"), 1)], "k int, rts timestamp, rid int"
        )
        out = range_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            lower_seconds=0.0, upper_seconds=3600.0, right_cols={"rid": "rid"},
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("name", sorted(TEMPORAL_QUERIES))
def test_temporal_query_oracle(spark, name):
    compare_query(spark, TEMPORAL_QUERIES[name], SF_SMOKE)


def test_session_window_agrees_with_sessionize(spark):
    """Spark's native F.session_window and the hand-rolled sessionize()
    assign identical sessions on data without exact-gap boundaries
    (they differ only when a gap equals the threshold exactly)."""
    from temp_data_pipeline_spark.operators.temporal import sessionize
    from temp_data_pipeline_spark.sources.registry import load_table

    events = load_table(spark, SF_SMOKE, "events").select("user_id", "ts")
    native = (
        spark.createDataFrame(
            TEMPORAL_QUERIES["q_session_window"]
            .builder(spark, SF_SMOKE)
            .collect()
        )
        .select("user_id", "session_start_us", "n_events")
    )
    rolled = (
        sessionize(events, key="user_id", ts="ts", gap_minutes=30.0)
        .groupBy("user_id", "session_idx")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "n_events")
    )
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, rolled.collect()))
    assert a == b


# ---------------------------------------------------------------------------
# resample_fill (regular grid + forward fill)
# ---------------------------------------------------------------------------


class TestResampleFill:
    def _df(self, spark):
        from datetime import datetime

        rows = [
            # key "a": hours 0, 3 observed → grid 0..3, hours 1-2 filled
            ("a", datetime(2024, 1, 1, 0, 15), 1.0),
            ("a", datetime(2024, 1, 1, 0, 45), 2.0),   # later in same bucket
            ("a", datetime(2024, 1, 1, 3, 10), 9.0),
            # key "b": single observation → single-row grid
            ("b", datetime(2024, 1, 1, 5, 0), 7.0),
        ]
        return spark.createDataFrame(rows, ["k", "ts", "v"])

    def test_grid_and_fill(self, spark):
        from temp_data_pipeline_spark.operators.temporal import resample_fill

        out = resample_fill(
            self._df(spark), key_col="k", ts_col="ts", value_col="v",
            step_seconds=3600,
        ).orderBy("k", "bucket_start").collect()
        a = [(r["n_rows"], r["value"]) for r in out if r["k"] == "a"]
        # hour 0: two rows, last (by ts) = 2.0; hours 1-2: empty, ffill 2.0
        assert a == [(2, 2.0), (0, 2.0), (0, 2.0), (1, 9.0)]
        b = [(r["n_rows"], r["value"]) for r in out if r["k"] == "b"]
        assert b == [(1, 7.0)]
        # buckets are a contiguous hourly grid per key
        starts = [r["bucket_start"] for r in out if r["k"] == "a"]
        assert starts == [starts[0] + i * 3600 for i in range(4)]

    def test_no_cross_key_leak(self, spark):
        """Forward fill never crosses key boundaries."""
        from temp_data_pipeline_spark.operators.temporal import resample_fill

        out = resample_fill(
            self._df(spark), key_col="k", ts_col="ts", value_col="v",
            step_seconds=3600,
        ).collect()
        assert all(r["value"] == 7.0 for r in out if r["k"] == "b")


class TestFunnel:
    def _ev(self, spark, rows):
        from datetime import datetime

        return spark.createDataFrame(
            [(u, datetime(2026, 1, 1, h, m), t) for u, h, m, t in rows],
            "user_id long, ts timestamp, event_type string",
        )

    def test_ordered_conversion_with_window(self, spark):
        from temp_data_pipeline_spark.operators.temporal import funnel_counts

        rows = [
            # u1 converts fully in order
            (1, 1, 0, "view"), (1, 2, 0, "click"), (1, 3, 0, "purchase"),
            # u2 clicks BEFORE viewing -> click doesn't count
            (2, 2, 0, "click"), (2, 3, 0, "view"),
            # u3 views then clicks too late (window 1h)
            (3, 1, 0, "view"), (3, 5, 0, "click"),
            # u4 never views
            (4, 1, 0, "purchase"),
        ]
        out = {
            r["step"]: r
            for r in funnel_counts(
                self._ev(spark, rows), ["view", "click", "purchase"],
                within_hours=1.0,
            ).collect()
        }
        assert (out[1]["n_users"], out[2]["n_users"], out[3]["n_users"]) == (3, 1, 1)
        assert out[3]["event_type"] == "purchase"

    def test_step_after_earliest_completion_only(self, spark):
        from temp_data_pipeline_spark.operators.temporal import funnel_counts

        # u1 has TWO views; click is after the 2nd view but within the
        # window of neither the FIRST view + 1h -> must not convert
        rows = [
            (1, 1, 0, "view"), (1, 3, 0, "view"), (1, 3, 30, "click"),
        ]
        out = {
            r["step"]: r["n_users"]
            for r in funnel_counts(
                self._ev(spark, rows), ["view", "click"], within_hours=1.0
            ).collect()
        }
        assert out == {1: 1, 2: 0}

    def test_unbounded_window(self, spark):
        from temp_data_pipeline_spark.operators.temporal import funnel_counts

        rows = [(1, 1, 0, "view"), (1, 23, 0, "click")]
        out = {
            r["step"]: r["n_users"]
            for r in funnel_counts(
                self._ev(spark, rows), ["view", "click"]
            ).collect()
        }
        assert out == {1: 1, 2: 1}


class TestRetention:
    def test_triangle(self, spark):
        from datetime import datetime

        from temp_data_pipeline_spark.operators.temporal import (
            cohort_retention,
        )

        rows = [
            (1, datetime(2026, 1, 1, 9)), (1, datetime(2026, 1, 2, 9)),
            (1, datetime(2026, 1, 2, 15)),   # same day twice -> once
            (2, datetime(2026, 1, 1, 10)),
            (3, datetime(2026, 1, 2, 8)), (3, datetime(2026, 1, 9, 8)),
            (3, datetime(2026, 1, 20, 8)),   # offset 18 > 7 -> dropped
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in cohort_retention(df, max_offset_days=7).collect()
        }
        assert got == {
            ("2026-01-01", 0): 2,
            ("2026-01-01", 1): 1,
            ("2026-01-02", 0): 1,
            ("2026-01-02", 7): 1,
        }
