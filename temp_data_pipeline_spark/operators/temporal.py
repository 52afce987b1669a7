"""Temporal relational operators: as-of join, sessionization, range join.

The reference has no temporal joins (SURVEY.md §2.4 — all joins are
inner equi-joins), but a time-series engine at scale needs them: the
forecast⋈truth pattern (`features/build_train_daily_tmax.py:79-84` in
the reference) generalizes to "match each left row to the most recent
right row", and event analytics needs gap-based sessions and bounded
time-window joins.

All three operators here are built so the physical plan is ONE hash
shuffle on the equality keys plus an in-partition sort — never a
cross product and never a driver-side loop:

- ``asof_join``: union the two sides, single window pass, carry the
  last-seen right values forward.  O(n log n) per partition, versus
  the naive inequality join's O(n_left × n_right) per key.
- ``sessionize``: lag + running sum over one window — the standard
  distributed session-ID assignment.
- ``range_join``: time-bucket both sides so each left row joins at
  most two buckets, then post-filter exactly.  Turns an unbounded
  inequality join into an equi-join Catalyst can hash-partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "cohort_retention",
    "funnel_counts",
    "range_join",
    "resample_fill",
    "sessionize",
]


def _micros(c: Column) -> Column:
    # cast first: tolerates TIMESTAMP_NTZ inputs (unix_micros only
    # accepts TIMESTAMP; session tz is pinned UTC so the instant is
    # unchanged) as defense-in-depth behind registry._normalize_ts
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    *,
    direction: str = "backward",
    strict: bool = True,
    how: str = "left",
    tie_break: str | None = None,
) -> DataFrame:
    """Match each left row with the nearest right row in time.

    backward: the latest right row with ``right_ts < left_ts``
    (``<=`` when ``strict=False``); forward: the earliest right row
    with ``right_ts > left_ts``.  Equality on ``on`` is always
    required.  ``right_cols`` maps right-side column → output name
    (output names must not collide with left columns).  The matched
    right timestamp is emitted as ``<left_ts>_asof``.

    Physical plan: project both sides to (keys, ts, payload), union,
    ONE window over (keys) ordered by (ts, side, tie_break) carrying
    ``last(payload, ignorenulls=True)`` forward, then keep left rows.
    Right rows at an equal timestamp sort after left rows when
    ``strict`` (so they are invisible to that left row) and before
    them otherwise.  ``how='inner'`` drops unmatched left rows.

    At 100 TB: cost is one shuffle on ``on`` — identical partitioning
    to the sort-merge join Spark would pick for an equi-join on the
    same keys.  Per-key data volume bounds the sort; for unbounded
    keys add a coarse time-bucket to ``on`` upstream and run once per
    bucket boundary overlap.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")

    out_names = list(right_cols.values())
    for name in out_names:
        if name in left.columns:
            raise ValueError(f"right output column {name!r} collides with left")

    asof_ts = f"{left_ts}_asof"
    # Right rows must be ordered against left rows at the SAME
    # timestamp: after them when the inequality is strict (invisible),
    # before them otherwise (visible). last() over rowsBetween(
    # unboundedPreceding, 0) then yields exactly the asof semantics.
    right_prec = 1 if strict else -1

    tie = (
        [F.col(tie_break).alias("_tie")]
        if tie_break is not None and tie_break in right.columns
        else []
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(right_prec).alias("_side"),
        F.col(right_ts).alias(asof_ts),
        *tie,
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(r.schema[asof_ts].dataType).alias(asof_ts),
        *[F.lit(None).cast(r.schema[dst].dataType).alias(dst) for dst in out_names],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # _side is signed (right = +1 strict / −1 non-strict, left = 0) so
    # ascending order places right rows at an equal timestamp exactly
    # where the inequality demands — after left when strict, before
    # otherwise.  Only the timestamp flips for forward joins.
    ts_order = F.col("_ts").desc() if direction == "forward" else F.col("_ts").asc()
    order = [ts_order, F.col("_side").asc()]
    if tie:
        order.append(
            F.col("_tie").desc_nulls_last()
            if direction == "forward"
            else F.col("_tie").asc_nulls_last()
        )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = unioned.select(
        *[c for c in unioned.columns if c not in out_names and c != asof_ts],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in [asof_ts, *out_names]],
    )
    result = carried.filter(F.col("_side") == 0).drop("_ts", "_side", "_tie")
    if how == "inner":
        result = result.filter(F.col(asof_ts).isNotNull())
    return result


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    *,
    gap_minutes: float = 30.0,
    tie_break: str | None = None,
) -> DataFrame:
    """Assign a per-key session index: a new session starts whenever
    the gap to the previous event exceeds ``gap_minutes``.

    Output adds ``session_idx`` (1-based within each key).  One window
    (lag + running sum) over (key, ts) — a single shuffle; the same
    construction Structured Streaming's session windows use, here in
    batch form so the result is oracle-checkable.

    Gap arithmetic is done in integer microseconds (``unix_micros``)
    so sub-second gaps compare exactly — a ``cast('long')`` would
    truncate to seconds and mis-split sessions at the boundary.
    """
    order = [F.col(ts)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev = F.lag(ts).over(w)
    new_session = (
        prev.isNull() | ((_micros(F.col(ts)) - _micros(prev)) > gap_us)
    ).cast("long")
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_session).over(running))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    lower_seconds: float,
    upper_seconds: float,
    right_cols: dict[str, str],
) -> DataFrame:
    """All (left, right) pairs with equal ``on`` keys and
    ``left_ts + lower <= right_ts < left_ts + upper``.

    Naive inequality joins degenerate to a per-key nested loop
    (BroadcastNestedLoopJoin in Spark): O(n·m) comparisons.  Here
    both sides are bucketed by ``floor(ts / width)`` with
    ``width = upper − lower`` so every left row's admissible window
    spans at most two buckets; the join becomes an equi-join on
    (keys, bucket) — hash-partitioned, AQE-planned — followed by an
    exact range filter.  Work drops to O(n + m + matches).

    The left side is exploded to its (at most two) candidate buckets
    with ``sequence`` — JVM-side, no Python.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    width_us = max(int((upper_seconds - lower_seconds) * 1_000_000), 1)
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)

    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_rts"),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    ).withColumn("_bucket", F.floor(_micros(F.col("_rts")) / width_us))

    win_lo = _micros(F.col(left_ts)) + lo_us
    win_hi = _micros(F.col(left_ts)) + hi_us
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor(win_lo / width_us), F.floor((win_hi - 1) / width_us))
        ),
    )

    joined = l.join(r, [*on, "_bucket"], "inner")
    rts_us = _micros(F.col("_rts"))
    exact = joined.filter((rts_us >= win_lo) & (rts_us < win_hi))
    return exact.drop("_bucket", "_rts")


def resample_fill(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Regular-grid resampling with forward fill: one output row per
    (key, step bucket) over each key's [min ts, max ts] span — buckets
    with no input rows appear with ``n_rows = 0`` and the last
    observed value carried forward.  The gap-filling primitive every
    downstream window/feature operator assumes (causal rolling stats
    over a grid with holes silently shrink their windows).

    Physical shape, three keyed stages sharing the (key) partitioning:
    1. per-(key, bucket) aggregation — count + last-in-bucket value
       picked by a row_number window on (ts DESC, then arbitrary-but-
       deterministic input order via the value struct) — ONE shuffle;
    2. per-key bounds (min/max bucket) reduced from the bucket rows
       (distinct-buckets-sized input, not raw rows), grid generated
       map-side with ``sequence`` + explode — no driver loop;
    3. grid ⋈ buckets equi-join on (key, bucket) + forward-fill
       window per key.
    Grid size is span/step per key — bound the span (or raise the
    step) for keys idle over long ranges; integer epoch-seconds bucket
    math keeps the grid arithmetic exact and timezone-free.

    Emits (key, bucket_start epoch-seconds, n_rows, value) — `value`
    is a raw passthrough of the last observation (no float
    arithmetic), null until a key's first observation.
    """
    # bucket from epoch MICROS (micros/1e6/step is exact double math
    # below 2^53): Spark unix_micros ≡ DuckDB epoch_us, so oracle SQL
    # reproduces the grid bit-for-bit; unix_timestamp's sub-second
    # truncation semantics never enter the picture
    bucket = (
        F.floor(F.unix_micros(F.col(ts_col)) / (step_seconds * 1_000_000)) * step_seconds
    ).cast("long")
    w_pick = Window.partitionBy(key_col, "_bucket").orderBy(
        F.col(ts_col).desc(), F.col(value_col).desc()
    )
    per_bucket = (
        df.select(F.col(key_col), bucket.alias("_bucket"), F.col(ts_col), F.col(value_col))
        .withColumn("_rn", F.row_number().over(w_pick))
        .groupBy(key_col, "_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max(F.when(F.col("_rn") == 1, F.col(value_col))).alias("_last_v"),
        )
    )
    bounds = per_bucket.groupBy(key_col).agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step_seconds)).cast("long"))
        ).alias("_bucket"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "_bucket"], "left")
        .select(
            F.col(key_col),
            F.col("_bucket").alias("bucket_start"),
            F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
            F.last(F.col("_last_v"), ignorenulls=True).over(w_fill).alias("value"),
        )
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: float | None = None,
) -> DataFrame:
    """Ordered conversion funnel: how many users reach each step,
    where step k+1 must occur strictly AFTER the user's earliest
    step-k completion (and within ``within_hours`` of it, when set) —
    the product-analytics staple (view → click → purchase).

    Physical shape per step: one filtered groupBy(user) MIN plus one
    user-keyed equi-join against the previous step's table — the
    step tables shrink monotonically, every join is keyed on the
    user (hash-partitioned, broadcast when small under AQE), and the
    event scan is pruned by the step's type filter. len(steps)
    passes, never a cross product, no per-user state larger than one
    timestamp. Returns (step, event_type, n_users), 1-indexed.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    bound_us = (
        int(within_hours * 3_600_000_000) if within_hours is not None else None
    )
    u, t = F.col(user_col), F.col(ts_col)
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_ts"))
    )
    counts = [cur.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit(1).alias("step"), F.lit(steps[0]).alias(type_col), "n"
    )]
    for i, step in enumerate(steps[1:], start=2):
        ev = df.filter(F.col(type_col) == step).select(
            u.alias("_u"), t.alias("_evts")
        )
        cond = (F.col("_u") == F.col(user_col)) & (
            F.col("_evts") > F.col("_ts")
        )
        if bound_us is not None:
            cond = cond & (
                F.unix_micros("_evts") <= F.unix_micros("_ts") + bound_us
            )
        cur = (
            ev.join(cur, cond)
            .groupBy(user_col)
            .agg(F.min("_evts").alias("_ts"))
        )
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
                F.lit(i).alias("step"), F.lit(step).alias(type_col), "n"
            )
        )
    from functools import reduce

    out = reduce(lambda a, b: a.unionByName(b), counts)
    return out.select(
        F.col("step").cast("int"), type_col, F.col("n").alias("n_users")
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: users grouped by FIRST-activity day,
    counted on each subsequent day they return (distinct user-days),
    offsets 0..max_offset_days.

    Two user-keyed exchanges total: cohort assignment (groupBy MIN)
    and the activity join share the same key, then one small
    (cohort, offset) aggregation. Returns
    (cohort_day, day_offset, n_users) ordered for the triangle.
    """
    cohort = df.groupBy(user_col).agg(
        F.min(F.col(ts_col).cast("date")).alias("_c0")
    )
    act = (
        df.select(F.col(user_col), F.col(ts_col).cast("date").alias("_d"))
        .join(cohort, user_col)
        .select(
            user_col,
            "_c0",
            F.datediff(F.col("_d"), F.col("_c0")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= max_offset_days)
        .distinct()
    )
    return (
        act.groupBy("_c0", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("_c0").cast("string").alias("cohort_day"),
            F.col("day_offset").cast("long"),
            "n_users",
        )
    )
