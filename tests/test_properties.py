"""Property-based tests (hypothesis) — beyond the reference's test
strategy: fuzz the feed parsers against exact Python models of the
reference semantics, and pin engine invariants (dedup, salted agg,
clean idempotence) on randomized inputs.

Each example batches many generated values into ONE Spark job so the
suite stays fast (examples are capped; a Spark round-trip per value
would be prohibitive).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from temp_data_pipeline_spark.functions import ghcnh_parse_temp, isd_parse_temp
from temp_data_pipeline_spark.operators.clean_hourly import clean_hourly_obs, dedupe_hourly
from temp_data_pipeline_spark.operators.skew import salted_agg
from temp_data_pipeline_spark.schemas.tables import HOURLY_OBS_SCHEMA

# -- Python models of the reference parse semantics ------------------------
# (fetch/noaa_hourly.py:135-190; str-input branch)


def _model_isd(value: str):
    part = value.split(",", 1)[0].strip()
    if part == "":
        return None
    try:
        raw = float(part)
    except ValueError:
        return None
    if abs(raw) >= 9990:
        return None
    return raw / 10.0


def _model_ghcnh(value: str):
    stripped = value.strip()
    if stripped == "" or stripped == "-9999":
        return None
    try:
        raw = float(stripped)
    except ValueError:
        return None
    if raw <= -9990 or raw >= 9990:
        return None
    return raw / 10.0


_noisy = st.text(
    alphabet="0123456789+-., abceE", min_size=0, max_size=12
)
_structured = st.builds(
    lambda sign, n, q: f"{sign}{n:04d},{q}",
    st.sampled_from(["+", "-", ""]),
    st.integers(0, 9999),
    st.integers(0, 9),
)
_raw_strings = st.lists(st.one_of(_noisy, _structured), min_size=1, max_size=60)


def _spark_parse(spark, values, parse_fn):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r["p"] for r in df.select(parse_fn(F.col("raw")).alias("p")).collect()]


@settings(max_examples=12, deadline=None)
@given(_raw_strings)
def test_isd_parse_fuzz_vs_reference_model(spark, values):
    got = _spark_parse(spark, values, isd_parse_temp)
    want = [_model_isd(v) for v in values]
    for v, g, w in zip(values, got, want):
        if w is None:
            # Spark try_cast accepts a few formats Python float() also
            # accepts; both None or both values — no third state
            assert g is None, (v, g, w)
        else:
            assert g is not None and abs(g - w) < 1e-9, (v, g, w)


@settings(max_examples=12, deadline=None)
@given(_raw_strings)
def test_ghcnh_parse_fuzz_vs_reference_model(spark, values):
    got = _spark_parse(spark, values, ghcnh_parse_temp)
    want = [_model_ghcnh(v) for v in values]
    for v, g, w in zip(values, got, want):
        if w is None:
            assert g is None, (v, g, w)
        else:
            assert g is not None and abs(g - w) < 1e-9, (v, g, w)


# -- engine invariants ------------------------------------------------------

_hourly_rows = st.lists(
    st.tuples(
        st.integers(0, 30),  # hour offset
        st.integers(0, 2),  # station
        st.one_of(st.none(), st.floats(-120, 120, allow_nan=False)),
        st.integers(0, 5),  # tie value → source string
    ),
    min_size=1,
    max_size=40,
)


def _hourly_df(spark, rows):
    base = datetime(2024, 1, 1)
    data = [
        (base + timedelta(hours=h), f"S{s}", 0.0, 0.0, t, f"src{tie}", 0)
        for h, s, t, tie in rows
    ]
    return spark.createDataFrame(data, HOURLY_OBS_SCHEMA)


@settings(max_examples=10, deadline=None)
@given(_hourly_rows)
def test_dedup_unique_keys_and_min_tiebreaker(spark, rows):
    df = _hourly_df(spark, rows)
    out = dedupe_hourly(df, tie_breaker="source").collect()
    # unique (station, ts)
    keys = [(r["station_id"], r["ts_utc"]) for r in out]
    assert len(keys) == len(set(keys))
    # kept row carries the minimum tie-breaker of its group
    want_min = {}
    for r in df.collect():
        k = (r["station_id"], r["ts_utc"])
        want_min[k] = min(want_min.get(k, "zzz"), r["source"])
    for r in out:
        assert r["source"] == want_min[(r["station_id"], r["ts_utc"])]


@settings(max_examples=10, deadline=None)
@given(_hourly_rows)
def test_clean_stage_rerun_semantics(spark, rows):
    """The reference's idempotence rule (clean_hourly.py:11-15) is
    about re-running the stage on the same RAW input — clean(x) must
    be deterministic. clean(clean(x)) is deliberately NOT a fixpoint
    in one corner (the reference behaves the same way): an
    out-of-range temp is nullified on pass 1, so pass 2 additionally
    flags it QC_MISSING_VALUE. Pin determinism plus the second-pass
    invariants: same rows, same temps, flags only ever grow by
    QC_MISSING_VALUE on nullified rows."""
    from temp_data_pipeline_spark.schemas.qc_flags import QC_MISSING_VALUE

    df = _hourly_df(spark, rows)
    args = dict(tie_breaker="source", validate_input=False, validate_output=False)
    once_a = sorted(tuple(r) for r in clean_hourly_obs(df, **args).collect())
    once_b = sorted(tuple(r) for r in clean_hourly_obs(df, **args).collect())
    assert once_a == once_b  # deterministic re-run

    once_df = clean_hourly_obs(df, **args)
    twice = sorted(tuple(r) for r in clean_hourly_obs(once_df, **args).collect())
    assert len(twice) == len(once_a)
    for r1, r2 in zip(once_a, twice):
        assert r1[:5] == r2[:5]  # keys + temp unchanged
        extra = r2[6] & ~r1[6]
        assert extra in (0, QC_MISSING_VALUE)
        if extra:
            assert r1[4] is None  # only nullified rows gain the flag


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=50,
    ),
    st.integers(2, 9),
)
def test_salted_agg_equals_plain_groupby(spark, rows, buckets):
    df = spark.createDataFrame([(f"k{k}", v) for k, v in rows], "k string, v long")
    got = {
        r["k"]: (r["n"], r["s"], r["m"])
        for r in salted_agg(
            df, ["k"], [("n", "*", "count"), ("s", "v", "sum"), ("m", "v", "max")],
            salt_buckets=buckets,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["m"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("m"))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------- round-2 ops


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),      # key
            st.integers(0, 3),      # ts bucket
            st.integers(0, 1000),   # version id (tiebreak)
        ),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=15, deadline=None)
def test_keep_latest_idempotent_and_batch_invariant(spark, rows):
    """keep_latest is idempotent, and applying a change stream in two
    batches equals applying it in one (the CDC replay invariant)."""
    from temp_data_pipeline_spark.operators.upsert import keep_latest, merge_upsert

    base_dt = datetime(2024, 1, 1)
    data = [(k, base_dt + timedelta(hours=t), i) for (k, t, i) in rows]
    df = spark.createDataFrame(data, "k long, ts timestamp, vid long")

    once = keep_latest(df, ["k"], "ts", "vid")
    twice = keep_latest(once, ["k"], "ts", "vid")
    canon = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert canon(once) == canon(twice)

    half = len(data) // 2
    a = spark.createDataFrame(data[:half] or data, "k long, ts timestamp, vid long")
    b = spark.createDataFrame(data[half:] or data, "k long, ts timestamp, vid long")
    stepwise = merge_upsert(
        keep_latest(a, ["k"], "ts", "vid"), b, ["k"], "ts", "vid"
    )
    allatonce = keep_latest(a.unionByName(b), ["k"], "ts", "vid")
    assert canon(stepwise) == canon(allatonce)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=50, unique=True,
    )
)
@settings(max_examples=15, deadline=None)
def test_zorder_value_injective(spark, pts):
    """Distinct (a, b) points map to distinct Morton values (the code
    is a bijection on the bit-bounded grid)."""
    from temp_data_pipeline_spark.operators.compaction import zorder_value

    df = spark.createDataFrame(pts, "a long, b long")
    zs = [r["z"] for r in df.select(zorder_value("a", "b", bits=8).alias("z")).collect()]
    assert len(set(zs)) == len(pts)
    assert all(0 <= z < (1 << 16) for z in zs)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=0, max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_vs_union_find(spark, edges):
    """Distributed label propagation must agree with a driver-side
    union-find on arbitrary small graphs."""
    from temp_data_pipeline_spark.llm.cluster import connected_components

    norm = [(min(a, b), max(a, b)) for a, b in edges]
    if not norm:
        return
    df = spark.createDataFrame(norm, "id_a long, id_b long")
    got = {r["node"]: r["cluster_id"] for r in connected_components(df).collect()}
    # the distributed-loop path must agree (driver_max_edges=0 forces it)
    got_loop = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert got == got_loop

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in norm:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=30,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=30,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    strict=st.booleans(),
)
@settings(max_examples=10, deadline=None)
def test_asof_join_vs_brute_force(spark, left, right, direction, strict):
    """asof_join must agree with a per-row brute-force scan for every
    direction/strictness on arbitrary small inputs (the operator broke
    once via a timestamp-unit regression — keep a semantic pin too)."""
    from temp_data_pipeline_spark.operators.temporal import asof_join

    # unique right (key, ts) so the match is unambiguous without
    # tie-break rules, which are pinned separately in test_temporal
    right = sorted({(k, t) for k, t in right})
    lrows = [
        (i, k, datetime(2024, 1, 1) + timedelta(seconds=t))
        for i, (k, t) in enumerate(left)
    ]
    rrows = [
        (k, datetime(2024, 1, 1) + timedelta(seconds=t), float(k * 1000 + t))
        for k, t in right
    ]
    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "k long, rts timestamp, val double")
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
        right_cols={"val": "matched"},
        direction=direction, strict=strict, how="left",
    )
    got = {r["lid"]: r["matched"] for r in out.collect()}

    def brute(k, lt):
        if direction == "backward":
            cands = [
                (t, v) for (rk, t, v) in rrows
                if rk == k and (t < lt if strict else t <= lt)
            ]
            return max(cands)[1] if cands else None
        cands = [
            (t, v) for (rk, t, v) in rrows
            if rk == k and (t > lt if strict else t >= lt)
        ]
        return min(cands)[1] if cands else None

    want = {lid: brute(k, lt) for lid, k, lt in lrows}
    assert got == want


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300)),
        min_size=1, max_size=20,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300)),
        min_size=1, max_size=20,
    ),
    lo=st.integers(-60, 0),
    hi=st.integers(1, 60),
)
@settings(max_examples=10, deadline=None)
def test_range_join_vs_brute_force(spark, left, right, lo, hi):
    """Bucketed range_join ≡ the naive inequality join on arbitrary
    small inputs and window bounds."""
    from temp_data_pipeline_spark.operators.temporal import range_join

    lrows = [
        (i, k, datetime(2024, 1, 1) + timedelta(seconds=t))
        for i, (k, t) in enumerate(left)
    ]
    rrows = [
        (j, k, datetime(2024, 1, 1) + timedelta(seconds=t))
        for j, (k, t) in enumerate(right)
    ]
    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, k long, rts timestamp")
    out = range_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
        lower_seconds=float(lo), upper_seconds=float(hi),
        right_cols={"rid": "rid_m"},
    )
    got = {(r["lid"], r["rid_m"]) for r in out.collect()}
    # operator window is half-open: lower <= rt - lt < upper
    want = {
        (lid, rid)
        for lid, lk, lt in lrows
        for rid, rk, rt in rrows
        if lk == rk
        and lt + timedelta(seconds=lo) <= rt < lt + timedelta(seconds=hi)
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200)),
        min_size=1, max_size=30, unique=True,
    ),
    gap_minutes=st.sampled_from([1.0, 5.0, 30.0]),
)
@settings(max_examples=10, deadline=None)
def test_sessionize_vs_brute_force(spark, rows, gap_minutes):
    """Window-based session assignment ≡ a per-key sequential scan:
    new session when the gap STRICTLY exceeds gap_minutes."""
    from temp_data_pipeline_spark.operators.temporal import sessionize

    data = [
        (i, k, datetime(2024, 1, 1) + timedelta(seconds=t))
        for i, (k, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "eid long, user_id long, ts timestamp")
    out = sessionize(df, key="user_id", ts="ts", gap_minutes=gap_minutes)
    got = {r["eid"]: r["session_idx"] for r in out.collect()}

    want = {}
    for k in {k for _, k, _ in data}:
        evs = sorted((t, i) for i, kk, t in data if kk == k)
        idx = 0
        prev = None
        for t, i in evs:
            if prev is None or (t - prev).total_seconds() > gap_minutes * 60:
                idx += 1
            want[i] = idx
            prev = t
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 40), st.integers(-50, 50)),
        min_size=1, max_size=25,
    ),
)
@settings(max_examples=10, deadline=None)
def test_resample_fill_vs_brute_force(spark, rows):
    """Grid resample + forward fill ≡ a sequential model: one bucket
    per step over [min, max] per key, last value carried forward."""
    from temp_data_pipeline_spark.operators.temporal import resample_fill

    step = 600  # 10-minute buckets over minute-resolution inputs
    data = [
        (k, datetime(2024, 1, 1) + timedelta(minutes=m), float(v))
        for k, m, v in rows
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    out = resample_fill(
        df, key_col="user_id", ts_col="ts", value_col="value", step_seconds=step
    )
    got = {
        (r["user_id"], r["bucket_start"]): (r["n_rows"], r["value"])
        for r in out.collect()
    }

    import math as _math

    base = int(datetime(2024, 1, 1).timestamp())
    want = {}
    for k in {k for k, _, _ in data}:
        evs = sorted(
            (int(t.timestamp()), v)
            for kk, t, v in data
            if kk == k
        )
        # last value per bucket = value of the latest ts in the bucket
        # (ties on ts: the operator picks deterministically; our
        # generator never creates (key, ts) duplicates with distinct
        # values in the same bucket unless ts collides — allow either)
        lo = _math.floor(evs[0][0] / step) * step
        hi = _math.floor(evs[-1][0] / step) * step
        last = None
        for b in range(lo, hi + step, step):
            in_b = [(t, v) for t, v in evs if b <= t < b + step]
            if in_b:
                last = max(in_b)[1]
            want[(k, b)] = (len(in_b), last)
    # ts collisions with different values make "last" ambiguous — skip those
    by_kt = {}
    ambiguous = False
    for k, t, v in data:
        key = (k, int(t.timestamp()))
        if key in by_kt and by_kt[key] != v:
            ambiguous = True
        by_kt[key] = v
    if not ambiguous:
        assert got == want
    else:
        assert set(got) == set(want)
        assert {kb: got[kb][0] for kb in got} == {kb: want[kb][0] for kb in want}


def _int60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12)
        .map(" ".join),
        min_size=1,
        max_size=12,
    ),
    n=st.integers(2, 4),
)
@settings(max_examples=10, deadline=None)
def test_span_dedup_vs_sequential_model(spark, texts, n):
    """Distributed span dedup must agree with a sequential one-pass
    model that scans documents in (doc_id, pos) order."""
    from temp_data_pipeline_spark.llm.curate import span_dedup

    docs = [(i, t) for i, t in enumerate(texts)]
    seen: set[str] = set()
    want = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        nc = len(toks) // n
        kept = []
        n_kept = 0
        for p in range(nc):
            s = " ".join(toks[p * n : (p + 1) * n])
            if s not in seen:
                seen.add(s)
                kept.append(s)
                n_kept += 1
        n_spans = nc
        if len(toks) % n:
            kept.append(" ".join(toks[nc * n :]))
            n_spans += 1
            n_kept += 1
        want[doc_id] = (" ".join(kept), n_spans, n_kept)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_spans"], r["n_kept"])
        for r in span_dedup(df, n=n).collect()
    }
    assert got == want


@given(
    sizes=st.lists(st.integers(1, 60), min_size=1, max_size=5),
    alpha=st.sampled_from([0.3, 0.5, 0.7, 1.0]),
)
@settings(max_examples=10, deadline=None)
def test_mix_temperature_invariants(spark, sizes, alpha):
    """Smallest stratum always survives whole; output is a
    deterministic subset; alpha=1 is the identity."""
    from temp_data_pipeline_spark.llm.curate import mix_temperature

    rows, i = [], 0
    for s, sz in enumerate(sizes):
        for _ in range(sz):
            rows.append((i, f"lang{s}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mix_temperature(df, strata_col="lang", alpha=alpha)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert set(kept) <= {r[0] for r in rows}
    assert kept == sorted(
        r["doc_id"] for r in mix_temperature(df, strata_col="lang", alpha=alpha).collect()
    )
    by_lang = {r[0]: r[1] for r in rows}
    counts: dict[str, int] = {}
    for d in kept:
        counts[by_lang[d]] = counts.get(by_lang[d], 0) + 1
    smallest = f"lang{min(range(len(sizes)), key=lambda s: (sizes[s], s))}"
    assert counts.get(smallest, 0) == min(sizes)
    if alpha == 1.0:
        assert len(kept) == len(rows)


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=0, max_size=5),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_classifier_score_vs_python_model(spark, texts):
    """The md5 weight bridge: Spark's hashed classifier score must
    equal a pure-Python replay of bucket → weight → mean."""
    from temp_data_pipeline_spark.llm.classifier import classifier_score, hashed_weights

    dim = 64
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["w_sum"], r["score"])
        for r in classifier_score(df, hashed_weights(spark, dim), dim=dim).collect()
    }
    for doc_id, text in docs:
        toks = text.split(" ")
        ws = sum((_int60(f"w:{_int60(t) % dim}") % 2001) - 1000 for t in toks)
        assert got[doc_id] == (len(toks), float(ws), ws / len(toks))


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["hash", "join", "scan", "sort", "x", "y"]),
            min_size=1, max_size=10,
        ).map(" ".join),
        min_size=1, max_size=8,
    ),
    query=st.lists(
        st.sampled_from(["hash", "join", "scan", "zzz"]),
        min_size=1, max_size=3,
    ).map(" ".join),
)
@settings(max_examples=10, deadline=None)
def test_bm25_vs_python_model(spark, texts, query):
    """Distributed BM25 nano-unit scores equal a sequential python
    model on random corpora (same formula, same quantization)."""
    import math

    from temp_data_pipeline_spark.llm.retrieval import _query_terms, bm25_score

    docs = [(i, t) for i, t in enumerate(texts)]
    terms = _query_terms(query)
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {tm: sum(1 for w in toks.values() if tm in w) for tm in terms}
    want = {}
    for i, w in toks.items():
        s = 0
        for tm in terms:
            tf = w.count(tm)
            idf = math.log(1.0 + (n - dfreq[tm] + 0.5) / (dfreq[tm] + 0.5))
            sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(w) / avgdl)))
            s += math.floor(idf * sat * 1e9 + 0.5)
        if s > 0:
            want[i] = s

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score_nano"] for r in bm25_score(df, query).collect()}
    assert got == want


@given(seed=st.integers(0, 10**9))
@settings(max_examples=20, deadline=None)
def test_shard_backfill_equals_one_shot(spark, tmp_path_factory, seed):
    """Backfill invariant (verdict r6 item 6): prepare(batch1) +
    append(batch2..K) must equal prepare(concat) when ids arrive in
    order — identical survivor sets, pack layout, and manifest
    geometry — and every earlier version must stay byte-stable across
    appends (the metadata-level commits reference, never rewrite)."""
    import random

    from temp_data_pipeline_spark.llm.pipeline import (
        append_training_shards,
        prepare_training_shards,
    )
    from temp_data_pipeline_spark.operators.versioned import read_manifest, read_version

    rng = random.Random(seed)
    stop = ["the", "and", "of", "to", "a", "in", "is", "that"]
    content = ["alpha", "bravo", "delta", "ember", "frost", "grove", "haven", "inlet"]

    def make_doc():
        length = rng.choice([5, 30, 52, 58, 64, 75])  # some gated, some kept
        return " ".join(
            rng.choice(stop if rng.random() < 0.4 else content)
            for _ in range(length)
        )

    texts: list[str] = []
    for _ in range(rng.randint(4, 9)):
        if texts and rng.random() < 0.3:
            texts.append(rng.choice(texts))  # cross/within-batch duplicate
        else:
            texts.append(make_doc())
    docs = [(i, t) for i, t in enumerate(texts)]
    k = rng.randint(2, 3)
    cuts = sorted(rng.sample(range(1, len(docs)), k - 1)) if len(docs) > k else [1]
    batches, prev = [], 0
    for c in cuts + [len(docs)]:
        batches.append(docs[prev:c])
        prev = c
    seq_len = rng.choice([8, 16])
    pps = rng.choice([2, 4])
    gk = {"min_score": -1e9}

    base = tmp_path_factory.mktemp("fuzz")
    p_inc, p_one = str(base / "inc"), str(base / "one")

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    mans = [prepare_training_shards(
        frame(batches[0]), p_inc, seq_len=seq_len, packs_per_shard=pps,
        gate_kwargs=gk,
    )]
    history = {1: sorted(map(tuple, read_version(spark, p_inc, 1).collect()))}
    for b in batches[1:]:
        mans.append(append_training_shards(frame(b), p_inc, gate_kwargs=gk))
        v = mans[-1]["version"]
        history[v] = sorted(map(tuple, read_version(spark, p_inc, v).collect()))

    one = prepare_training_shards(
        frame(docs), p_one, seq_len=seq_len, packs_per_shard=pps,
        gate_kwargs=gk,
    )

    cols = ["doc_id", "n_tokens", "begin", "pack_id", "pack_off", "shard"]
    inc_rows = sorted(
        tuple(r[c] for c in cols) for r in read_version(spark, p_inc).collect()
    )
    one_rows = sorted(
        tuple(r[c] for c in cols) for r in read_version(spark, p_one).collect()
    )
    assert inc_rows == one_rows
    final = mans[-1]
    for key in ("n_docs_raw", "n_docs_kept", "n_tokens_kept",
                "max_doc_tokens", "n_packs", "n_shards"):
        assert final[key] == one[key], key
    # manifest meta round-trips through the commit marker
    assert read_manifest(spark, p_inc)["n_tokens_kept"] == final["n_tokens_kept"]
    # earlier versions byte-stable after all appends
    for v, want in history.items():
        assert sorted(map(tuple, read_version(spark, p_inc, v).collect())) == want


@given(seed=st.integers(0, 10**9))
@settings(max_examples=12, deadline=None)
def test_cow_chain_equals_full_rewrite_chain(spark, tmp_path_factory, seed):
    """Copy-on-write invariant: any interleaving of partition-level
    COW merges and deletes must produce, at every version, exactly the
    rows the full-rewrite chain (commit_merge + filtered commit)
    produces — and earlier COW versions must stay stable after later
    commits (carried partitions are referenced, never rewritten)."""
    import random

    from pyspark.sql import functions as F
    from temp_data_pipeline_spark.operators.versioned import (
        commit_delete_cow,
        commit_merge,
        commit_merge_cow,
        commit_version,
        read_version,
        versions,
    )

    rng = random.Random(seed)
    parts = ["a", "b", "c", None]

    def batch(lo_k, n, ts):
        rows = []
        for _ in range(n):
            k = rng.randint(lo_k, lo_k + 9)
            # partition is a FUNCTION of the key: the COW contract
            # forbids a key moving between partitions
            rows.append((k, parts[k % 4], f"v{rng.randint(0, 99)}", ts))
        # one row per key per batch (merge_upsert ties are separate)
        return list({r[0]: r for r in rows}.values())

    def frame(rows):
        return spark.createDataFrame(rows, "k long, part string, val string, ts long")

    base = tmp_path_factory.mktemp("cowfuzz")
    p_cow, p_full = str(base / "cow"), str(base / "full")
    seed_rows = batch(0, rng.randint(3, 8), ts=1)
    commit_merge_cow(frame(seed_rows), p_cow, ["k"], "ts", "part")
    commit_version(frame(seed_rows), p_full, partition_by=["part"])

    history = {1: sorted(map(tuple, read_version(spark, p_cow, 1).collect()))}
    for step in range(rng.randint(2, 4)):
        ts = step + 2
        if rng.random() < 0.35:
            kdel = rng.randint(0, 9)
            pred = f"k = {kdel}"
            before = versions(spark, p_cow)[-1]
            v = commit_delete_cow(spark, p_cow, pred, "part")
            if v != before:  # matched rows -> mirror in the full chain
                full_cur = read_version(spark, p_full).filter(
                    ~F.coalesce(F.expr(pred), F.lit(False))
                )
                commit_version(full_cur, p_full, partition_by=["part"])
        else:
            up = batch(rng.randint(0, 4), rng.randint(1, 6), ts)
            v = commit_merge_cow(frame(up), p_cow, ["k"], "ts", "part")
            commit_merge(frame(up), p_full, ["k"], "ts")
        v = versions(spark, p_cow)[-1]
        history[v] = sorted(map(tuple, read_version(spark, p_cow, v).collect()))

    # every version of the COW chain equals the full chain's version
    assert versions(spark, p_cow) == versions(spark, p_full)
    for v in versions(spark, p_cow):
        cow_rows = sorted(map(tuple, read_version(spark, p_cow, v).collect()))
        full_rows = sorted(map(tuple, read_version(spark, p_full, v).collect()))
        assert cow_rows == full_rows, f"version {v} diverged"
    # earlier COW versions unchanged by later commits
    for v, want in history.items():
        assert sorted(map(tuple, read_version(spark, p_cow, v).collect())) == want


@given(seed=st.integers(0, 10**9))
@settings(max_examples=10, deadline=None)
def test_mor_chain_equals_model(spark, tmp_path_factory, seed):
    """Merge-on-read invariant: any interleaving of appends, DV
    deletes, DV updates, DV upserts, rollbacks, and materializations
    must keep read_table equal to a driver-side dict model at every
    step — and earlier versions must stay byte-stable (positions are
    defined over immutable files)."""
    import random

    from pyspark.sql import functions as F
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        commit_update_mor,
        commit_upsert_mor,
        materialize_deletes,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        rollback,
        versions,
    )

    rng = random.Random(seed)
    p = str(tmp_path_factory.mktemp("mor") / "t")

    def frame(rows):
        return spark.createDataFrame(rows, "k long, grp long, val long")

    # model: k -> (grp, val)
    model: dict[int, tuple[int, int]] = {
        k: (k % 5, k * 10) for k in range(40)
    }
    commit_version(frame([(k, g, v) for k, (g, v) in model.items()]), p)
    snapshots = {versions(spark, p)[-1]: dict(model)}

    def check():
        got = {
            r["k"]: (r["grp"], r["val"])
            for r in read_table(spark, p).collect()
        }
        assert got == model

    next_k = 40
    for _ in range(8):
        op = rng.choice(["append", "delete", "update", "upsert", "rollback",
                         "materialize"])
        if op == "append":
            rows = [(next_k + i, (next_k + i) % 5, rng.randint(0, 999))
                    for i in range(rng.randint(1, 5))]
            next_k += len(rows)
            commit_version(frame(rows), p, carry_from=versions(spark, p)[-1])
            model.update({k: (g, v) for k, g, v in rows})
        elif op == "delete":
            g = rng.randint(0, 4)
            commit_delete_mor(spark, p, f"grp = {g}")
            model = {k: gv for k, gv in model.items() if gv[0] != g}
        elif op == "update":
            g = rng.randint(0, 4)
            commit_update_mor(
                spark, p, f"grp = {g}", {"val": F.col("val") + 1}
            )
            model = {
                k: (gv[0], gv[1] + 1 if gv[0] == g else gv[1])
                for k, gv in model.items()
            }
        elif op == "upsert":
            ks = rng.sample(sorted(model) + [next_k], k=min(3, len(model)))
            rows = [(k, k % 5, rng.randint(0, 999)) for k in set(ks)]
            next_k = max(next_k, max(k for k in set(ks)) + 1)
            commit_upsert_mor(frame(rows), p, ["k"])
            model.update({k: (g, v) for k, g, v in rows})
        elif op == "rollback":
            target = rng.choice(sorted(snapshots))
            rollback(spark, p, target)
            model = dict(snapshots[target])
        else:
            materialize_deletes(spark, p)
        v_now = versions(spark, p)[-1]
        snapshots[v_now] = dict(model)
        check()
    # every earlier snapshot still reads back exactly (immutability)
    for v, m in snapshots.items():
        got = {
            r["k"]: (r["grp"], r["val"])
            for r in read_table(spark, p, v).collect()
        }
        assert got == m, f"version {v} drifted"


@given(seed=st.integers(0, 10**9))
@settings(max_examples=8, deadline=None)
def test_skipping_stack_always_transparent(spark, tmp_path_factory, seed):
    """Data-skipping invariant: for random data layouts, random sidecar
    combinations (zone maps / truncated bounds / Bloom), random
    predicate conjunctions, and an optional MOR delete, scan_version
    must equal read_table + the same filter — skipping and DV
    subtraction may only change which files open, never the rows."""
    import random

    from pyspark.sql import functions as F
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import commit_version
    from temp_data_pipeline_spark.operators.zonemap import (
        scan_version,
        write_bloom_index,
        write_zone_maps,
    )

    rng = random.Random(seed)
    p = str(tmp_path_factory.mktemp("skip") / "t")
    n = rng.choice([200, 1000])
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") * rng.randint(3, 97) % 100).alias("x"),
        F.concat(F.lit("w"), (F.col("id") % 26).cast("string")).alias("s"),
    )
    layout = rng.choice(["random", "range"])
    df = (
        df.repartition(rng.randint(2, 6))
        if layout == "random"
        else df.repartitionByRange(rng.randint(2, 6), "x")
    )
    commit_version(df, p)
    if rng.random() < 0.5:
        commit_delete_mor(spark, p, f"id % {rng.randint(3, 9)} = 0")
    if rng.random() < 0.8:
        truncate = {"s": 2} if rng.random() < 0.5 else None
        write_zone_maps(
            spark, p, ["x", "s"], truncate=truncate
        )
    if rng.random() < 0.6:
        write_bloom_index(spark, p, "id")
    preds = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["xr", "xe", "se", "ide"])
        if kind == "xr":
            lo = rng.randint(0, 80)
            preds.append(("x", rng.choice([">=", ">"]), lo))
            preds.append(("x", rng.choice(["<=", "<"]), lo + rng.randint(1, 30)))
        elif kind == "xe":
            preds.append(("x", "=", rng.randint(0, 99)))
        elif kind == "se":
            preds.append(("s", "=", f"w{rng.randint(0, 30)}"))
        else:
            preds.append(("id", "=", rng.randint(0, n + 50)))
    got = sorted(tuple(r) for r in scan_version(spark, p, preds).collect())
    cond = F.lit(True)
    for col, op, *rest in preds:
        c0 = F.col(col)
        cond = cond & {
            "=": c0 == rest[0] if rest else None,
            "<": c0 < rest[0] if rest else None,
            "<=": c0 <= rest[0] if rest else None,
            ">": c0 > rest[0] if rest else None,
            ">=": c0 >= rest[0] if rest else None,
        }[op]
    want = sorted(tuple(r) for r in read_table(spark, p).filter(cond).collect())
    assert got == want


@given(seed=st.integers(0, 10**9))
@settings(max_examples=6, deadline=None)
def test_keyed_cdf_transition_invariant(spark, tmp_path_factory, seed):
    """table_changes_keyed is a sound STATE TRANSITION: for any window
    (i, j] over any interleaving of appends / MOR deletes / updates /
    upserts, replaying the keyed feed onto snapshot(i) as a dict
    yields exactly snapshot(j) — deletes remove the exact old row,
    updates carry a correct preimage and land the postimage, inserts
    are genuinely new keys, and NO unchanged key ever appears."""
    import random

    from pyspark.sql import functions as F
    from temp_data_pipeline_spark.operators.changes import (
        table_changes_keyed,
    )
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        commit_update_mor,
        commit_upsert_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        versions,
    )

    rng = random.Random(seed)
    p = str(tmp_path_factory.mktemp("cdf") / "t")

    def frame(rows):
        return spark.createDataFrame(rows, "k long, grp long, val long")

    model: dict[int, tuple[int, int]] = {
        k: (k % 4, k * 10) for k in range(25)
    }
    commit_version(frame([(k, g, v) for k, (g, v) in model.items()]), p)
    snapshots = {versions(spark, p)[-1]: dict(model)}
    next_k = 25
    for _ in range(5):
        op = rng.choice(["append", "delete", "update", "upsert", "noop_upsert"])
        if op == "append":
            rows = [(next_k + i, (next_k + i) % 4, rng.randint(0, 999))
                    for i in range(rng.randint(1, 4))]
            next_k += len(rows)
            commit_version(frame(rows), p, carry_from=versions(spark, p)[-1])
            model.update({k: (g, v) for k, g, v in rows})
        elif op == "delete":
            g = rng.randint(0, 3)
            commit_delete_mor(spark, p, f"grp = {g}")
            model = {k: gv for k, gv in model.items() if gv[0] != g}
        elif op == "update":
            g = rng.randint(0, 3)
            commit_update_mor(
                spark, p, f"grp = {g}", {"val": F.col("val") + 7}
            )
            model = {
                k: (gv[0], gv[1] + 7 if gv[0] == g else gv[1])
                for k, gv in model.items()
            }
        elif op == "upsert" and model:
            ks = rng.sample(sorted(model), k=min(3, len(model)))
            rows = [(k, model[k][0], rng.randint(0, 999)) for k in ks]
            commit_upsert_mor(frame(rows), p, ["k"])
            model.update({k: (g, v) for k, g, v in rows})
        elif model:
            # idempotent re-land: identical payloads — MUST be fully
            # suppressed by the keyed feed
            ks = rng.sample(sorted(model), k=min(2, len(model)))
            rows = [(k, model[k][0], model[k][1]) for k in ks]
            commit_upsert_mor(frame(rows), p, ["k"])
        v_now = versions(spark, p)[-1]
        snapshots[v_now] = dict(model)

    vs = sorted(snapshots)
    pairs = {(vs[0], vs[-1])}
    while len(pairs) < 3 and len(vs) > 1:
        i, j = sorted(rng.sample(vs, k=2))
        if i != j:
            pairs.add((i, j))
    for i, j in sorted(pairs):
        state = dict(snapshots[i])
        feed = table_changes_keyed(spark, p, ["k"], i, j).collect()
        posts = {}
        for r in feed:
            k, row = r["k"], (r["grp"], r["val"])
            t = r["_change_type"]
            if t == "delete":
                assert state.pop(k) == row, (i, j, k)
            elif t == "insert":
                assert k not in state, (i, j, k)
                state[k] = row
            elif t == "update_preimage":
                assert state[k] == row, (i, j, k)
            else:
                posts[k] = row
        state.update(posts)
        assert state == snapshots[j], (i, j)
        # sanity against the live table too
        got = {
            r["k"]: (r["grp"], r["val"])
            for r in read_table(spark, p, j).collect()
        }
        assert got == snapshots[j]


@given(seed=st.integers(0, 10**9))
@settings(max_examples=3, deadline=None)
def test_replication_and_scd2_track_any_history(
    spark, tmp_path_factory, seed
):
    """For ANY interleaving of appends / MOR deletes / updates /
    upserts: after each incremental catch-up the replica equals the
    source snapshot, and at the end the SCD2 dimension reconstructs
    EVERY source version — the two downstream-sync consumers are
    sound over arbitrary histories, not just the scripted ones."""
    import random

    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_delete_mor,
        commit_update_mor,
        commit_upsert_mor,
        read_table,
    )
    from temp_data_pipeline_spark.operators.replicate import (
        replicate_incremental,
        replicate_seed,
    )
    from temp_data_pipeline_spark.operators.scd import (
        scd2_catchup,
        scd2_init,
        scd2_snapshot_at,
    )
    from temp_data_pipeline_spark.operators.versioned import (
        commit_version,
        versions,
    )

    rng = random.Random(seed)
    root = tmp_path_factory.mktemp("sync")
    src, rep, dim = str(root / "src"), str(root / "rep"), str(root / "dim")

    def frame(rows):
        return spark.createDataFrame(rows, "k long, grp long, val long")

    def rows(df):
        return sorted(
            (r["k"], r["grp"], r["val"])
            for r in df.select("k", "grp", "val").collect()
        )

    commit_version(frame([(k, k % 3, k * 10) for k in range(20)]), src)
    replicate_seed(spark, src, rep, ["k"])
    scd2_init(spark, src, dim, ["k"])
    next_k = 20
    for _ in range(4):
        op = rng.choice(["append", "delete", "update", "upsert"])
        if op == "append":
            new = [(next_k + i, (next_k + i) % 3, rng.randint(0, 99))
                   for i in range(rng.randint(1, 3))]
            next_k += len(new)
            commit_version(
                frame(new), src, carry_from=versions(spark, src)[-1]
            )
        elif op == "delete":
            commit_delete_mor(spark, src, f"grp = {rng.randint(0, 2)}")
        elif op == "update":
            commit_update_mor(
                spark, src, f"grp = {rng.randint(0, 2)}",
                {"val": "val + 1000"},
            )
        else:
            ks = rng.sample(range(next_k), k=min(3, next_k))
            commit_upsert_mor(
                frame([(k, k % 3, rng.randint(0, 99)) for k in ks]),
                src, ["k"],
            )
        replicate_incremental(spark, src, rep, ["k"])
        assert rows(read_table(spark, rep)) == rows(read_table(spark, src))
    scd2_catchup(spark, src, dim, ["k"])
    for v in versions(spark, src):
        assert rows(scd2_snapshot_at(spark, dim, v)) == rows(
            read_table(spark, src, v)
        ), f"seed={seed}: scd2 snapshot_at({v}) diverged"
