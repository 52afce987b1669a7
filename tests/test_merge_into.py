"""Conditional MERGE INTO (operators/merge.py): clause precedence,
untouched-pair immutability, SET expressions, and guards.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.operators.deletion_vectors import read_table
from temp_data_pipeline_spark.operators.merge import commit_merge_into
from temp_data_pipeline_spark.operators.versioned import (
    commit_version,
    versions,
)

SCHEMA = "k long, v long, status string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(spark, path):
    return {
        r["k"]: (r["v"], r["status"])
        for r in read_table(spark, path).collect()
    }


def test_clause_precedence_and_untouched(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(
        _df(
            spark,
            [
                (1, 10, "live"),     # updated (s.v > t.v)
                (2, 20, "expired"),  # s.v <= t.v -> delete clause fires
                (3, 30, "live"),     # matched, neither clause: untouched
                (4, 40, "expired"),  # updated — update wins over delete
            ],
        ),
        path,
    )
    src = _df(
        spark,
        [
            (1, 99, "live"),
            (2, 5, "x"),
            (3, 1, "x"),
            (4, 999, "fresh"),
            (50, 500, "new"),     # unmatched, inserted
            (51, -1, "new"),      # unmatched, insert_when filters out
        ],
    )
    commit_merge_into(
        src,
        path,
        ["k"],
        update_when="s.v > t.v",
        delete_when="t.status = 'expired'",
        insert_when="v >= 0",
    )
    got = _rows(spark, path)
    assert got == {
        1: (99, "live"),
        3: (30, "live"),      # untouched pair keeps ORIGINAL content
        4: (999, "fresh"),    # update clause beat the delete clause
        50: (500, "new"),
    }


def test_update_set_expressions(spark, tmp_path):
    """SET may mix s./t. expressions; UNLISTED columns keep the
    TARGET's value — the published MERGE contract (UPDATE SET x = 1
    must not silently copy the source's other columns)."""
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), path)
    commit_merge_into(
        _df(spark, [(1, 5, "z"), (2, 7, "z")]),
        path,
        ["k"],
        update_when=True,
        update_set={"v": "t.v + s.v"},
    )
    # v computed, status UNLISTED -> stays the target's ('a'/'b'),
    # never the source's 'z'
    assert _rows(spark, path) == {1: (15, "a"), 2: (27, "b")}


def test_insert_only_and_empty_target(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    # empty target: only the insert clause can fire
    commit_merge_into(
        _df(spark, [(1, 1, "a"), (2, -1, "b")]),
        path,
        ["k"],
        insert_when="v > 0",
    )
    assert _rows(spark, path) == {1: (1, "a")}
    # insert-only merge on a live table never touches matched rows
    commit_merge_into(
        _df(spark, [(1, 999, "x"), (3, 3, "c")]),
        path,
        ["k"],
        insert_when=True,
    )
    assert _rows(spark, path) == {1: (1, "a"), 3: (3, "c")}


def test_guards(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    with pytest.raises(ValueError, match="at least one clause"):
        commit_merge_into(_df(spark, [(1, 1, "a")]), path, ["k"])
    with pytest.raises(ValueError, match="update_set without"):
        commit_merge_into(
            _df(spark, [(1, 1, "a")]),
            path,
            ["k"],
            insert_when=True,
            update_set={"v": "s.v"},
        )
    with pytest.raises(ValueError, match="absent from the source"):
        commit_merge_into(
            _df(spark, [(1, 1, "a")]), path, ["missing"], update_when=True
        )


def test_not_matched_by_source_clauses(spark, tmp_path):
    """Delta's sync-deletes family: target rows with no source pair
    are updated/deleted by the by-source clauses (update wins, like
    the matched family); matched and insert branches are unaffected."""
    path = os.path.join(str(tmp_path), "t")
    commit_version(
        _df(
            spark,
            [
                (1, 10, "live"),   # matched -> updated from source
                (2, 20, "stale"),  # by-source + cond -> updated
                (3, 30, "stale"),  # by-source, update cond false -> deleted
                (4, 40, "keep"),   # by-source, neither cond -> untouched
            ],
        ),
        path,
    )
    src = _df(spark, [(1, 99, "live"), (5, 50, "new")])
    commit_merge_into(
        src,
        path,
        ["k"],
        update_when=True,
        insert_when=True,
        update_by_source_when="t.status = 'stale' AND t.k = 2",
        update_by_source_set={"v": "t.v + 1", "status": "'aged'"},
        delete_by_source_when="t.status = 'stale'",
    )
    assert _rows(spark, path) == {
        1: (99, "live"),
        2: (21, "aged"),
        4: (40, "keep"),
        5: (50, "new"),
    }
    # one commit, time travel intact
    old = {r["k"]: r["v"] for r in read_table(spark, path, 1).collect()}
    assert old == {1: 10, 2: 20, 3: 30, 4: 40}


def test_by_source_delete_only_syncs(spark, tmp_path):
    """Pure mirror-sync: UPDATE */INSERT */DELETE BY SOURCE leaves the
    target exactly equal to the source."""
    path = os.path.join(str(tmp_path), "t")
    commit_version(
        _df(spark, [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]), path
    )
    src = _df(spark, [(2, 200, "b2"), (9, 90, "i")])
    commit_merge_into(
        src,
        path,
        ["k"],
        update_when=True,
        insert_when=True,
        delete_by_source_when=True,
    )
    assert _rows(spark, path) == {2: (200, "b2"), 9: (90, "i")}


def test_by_source_guards(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    with pytest.raises(ValueError, match="requires update_by_source_set"):
        commit_merge_into(
            _df(spark, [(1, 1, "a")]),
            path,
            ["k"],
            update_by_source_when=True,
        )
    with pytest.raises(ValueError, match="without update_by_source_when"):
        commit_merge_into(
            _df(spark, [(1, 1, "a")]),
            path,
            ["k"],
            delete_when=True,
            update_by_source_set={"v": "t.v"},
        )


def test_merge_is_one_version_and_time_travelable(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    commit_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), path)
    commit_merge_into(
        _df(spark, [(1, 11, "a")]),
        path,
        ["k"],
        update_when=True,
        delete_when=True,
    )
    assert versions(spark, path) == [1, 2]
    # v1 unchanged under time travel
    old = {r["k"]: r["v"] for r in read_table(spark, path, 1).collect()}
    assert old == {1: 10, 2: 20}


def test_null_key_rows_are_never_duplicated_by_pruning(spark, tmp_path):
    """ADVICE r8 #2: MERGE matches keys with eqNullSafe, but the
    zone-map bounding box excludes NULL source keys (min/max ignore
    NULL) and a file whose key stats are all-NULL is dropped by the
    keep-condition — so a NULL-key target row's file could be skipped,
    its pair mis-classified as unmatched, and the source row appended
    as a duplicate on top of the never-DV'd old row. With any NULL
    source key the position scan must fall back to the unpruned
    form."""
    from temp_data_pipeline_spark.operators.zonemap import write_zone_maps

    path = os.path.join(str(tmp_path), "nullkey")
    # two files: one holds ONLY the NULL-key row (all-NULL key stats),
    # committed separately so it is its own parquet file
    commit_version(_df(spark, [(1, 10, "live"), (2, 20, "live")]), path)
    commit_version(
        spark.createDataFrame([(None, 30, "live")], SCHEMA),
        path,
        carry_from=1,
    )
    v = versions(spark, path)[-1]
    write_zone_maps(spark, path, ["k"], version=v)
    src = spark.createDataFrame(
        [(None, 99, "fresh"), (1, 11, "fresh")], SCHEMA
    )
    commit_merge_into(src, path, ["k"], update_when=True)
    got = read_table(spark, path).collect()
    # exactly one row per key — the NULL-key row was UPDATED in place,
    # not duplicated
    by_k = {}
    for r in got:
        by_k.setdefault(r["k"], []).append((r["v"], r["status"]))
    assert by_k[None] == [(99, "fresh")]
    assert by_k[1] == [(11, "fresh")]
    assert by_k[2] == [(20, "live")]


def test_null_key_upsert_mor_not_duplicated(spark, tmp_path):
    """Same hole through commit_upsert_mor (shares the pruned
    position scan)."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        commit_upsert_mor,
    )
    from temp_data_pipeline_spark.operators.zonemap import write_zone_maps

    path = os.path.join(str(tmp_path), "nullup")
    commit_version(_df(spark, [(1, 10, "live")]), path)
    commit_version(
        spark.createDataFrame([(None, 30, "live")], SCHEMA),
        path,
        carry_from=1,
    )
    write_zone_maps(spark, path, ["k"], version=versions(spark, path)[-1])
    commit_upsert_mor(
        spark.createDataFrame([(None, 77, "upd")], SCHEMA), path, ["k"]
    )
    got = [
        (r["v"], r["status"])
        for r in read_table(spark, path).collect()
        if r["k"] is None
    ]
    assert got == [(77, "upd")]


def test_null_safe_semi_join_stays_hash_joinable(spark):
    """eqNullSafe must plan as a hash join (Broadcast at this size),
    never a nested loop — the null-safe fix cannot cost the join
    strategy."""
    from temp_data_pipeline_spark.operators.deletion_vectors import (
        semi_on_keys,
    )

    left = spark.range(10000).selectExpr(
        "CASE WHEN id % 100 = 0 THEN NULL ELSE id END AS k", "id AS v"
    )
    right = spark.range(50).selectExpr(
        "CASE WHEN id = 0 THEN NULL ELSE id END AS k"
    )
    plan = semi_on_keys(left, right, ["k"])._jdf.queryExecution()\
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join LeftSemi" in plan or "HashJoin" in plan


def test_multi_clause_cdc_pattern(spark, tmp_path):
    """The canonical CDC apply: ordered matched clauses — delete on
    op='D', else update SET *; inserts gated per-clause. First
    satisfied condition wins within the family."""
    path = os.path.join(str(tmp_path), "cdc")
    commit_version(
        _df(spark, [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]), path
    )
    src = spark.createDataFrame(
        [
            (1, 0, "D"),      # matched -> delete clause (first) fires
            (2, 99, "U"),     # matched -> falls to the update clause
            (4, 40, "I"),     # unmatched -> first insert clause
            (5, 50, "D"),     # unmatched delete: no insert cond holds
        ],
        "k long, v long, status string",
    )
    commit_merge_into(
        src,
        path,
        ["k"],
        matched_clauses=[
            ("delete", "s.status = 'D'", None),
            ("update", True, None),  # catch-all SET *
        ],
        insert_whens=["status = 'I'", "status = 'U'"],
    )
    assert _rows(spark, path) == {
        2: (99, "U"),
        3: (30, "c"),        # untouched pair keeps original bytes
        4: (40, "I"),
    }


def test_multi_clause_ordering_first_wins(spark, tmp_path):
    """A pair satisfying clauses 1 AND 2 fires only clause 1 — the
    later SET never applies."""
    path = os.path.join(str(tmp_path), "ord")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    src = _df(spark, [(1, 99, "a")])
    commit_merge_into(
        src,
        path,
        ["k"],
        matched_clauses=[
            ("update", "s.v > t.v", {"v": "s.v", "status": "'first'"}),
            ("update", True, {"v": "t.v", "status": "'second'"}),
        ],
    )
    assert _rows(spark, path) == {1: (99, "first")}


def test_multi_clause_by_source_ordered(spark, tmp_path):
    """by_source_clauses walk in order over t.* only."""
    path = os.path.join(str(tmp_path), "bs")
    commit_version(
        _df(spark, [(1, 10, "live"), (2, 20, "stale"), (3, 30, "live")]),
        path,
    )
    src = _df(spark, [(1, 11, "live")])
    commit_merge_into(
        src,
        path,
        ["k"],
        matched_clauses=[("update", True, None)],
        by_source_clauses=[
            ("delete", "t.status = 'stale'", None),
            ("update", True, {"v": "t.v + 1", "status": "'aged'"}),
        ],
    )
    assert _rows(spark, path) == {1: (11, "live"), 3: (31, "aged")}


def test_multi_clause_guards(spark, tmp_path):
    path = os.path.join(str(tmp_path), "g")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    src = _df(spark, [(1, 99, "a")])
    # dead-clause rule: unconditional clause must be LAST in its family
    with pytest.raises(ValueError, match="only the last matched"):
        commit_merge_into(
            src, path, ["k"],
            matched_clauses=[
                ("update", True, None),
                ("delete", "t.v > 0", None),
            ],
        )
    # the two parameter forms are mutually exclusive per family
    with pytest.raises(ValueError, match="not both"):
        commit_merge_into(
            src, path, ["k"],
            update_when=True,
            matched_clauses=[("update", True, None)],
        )
    with pytest.raises(ValueError, match="not both"):
        commit_merge_into(
            src, path, ["k"],
            insert_when=True, insert_whens=[True],
        )
    # by-source update clauses still require an explicit set dict
    with pytest.raises(ValueError, match="requires a set dict"):
        commit_merge_into(
            src, path, ["k"],
            by_source_clauses=[("update", True, None)],
        )
    # unknown clause kind
    with pytest.raises(ValueError, match="update\\|delete"):
        commit_merge_into(
            src, path, ["k"],
            matched_clauses=[("upsert", True, None)],
        )


def test_no_insert_clause_ignores_unmatched_source(spark, tmp_path):
    """SQL MERGE contract: with no NOT MATCHED clause, unmatched
    source rows are silently ignored (NOT inserted)."""
    path = os.path.join(str(tmp_path), "noins")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    src = _df(spark, [(1, 99, "a"), (7, 70, "new")])
    commit_merge_into(
        src, path, ["k"],
        matched_clauses=[("update", True, None)],
    )
    assert _rows(spark, path) == {1: (99, "a")}


def test_source_only_columns_never_land(spark, tmp_path):
    """The source may carry extra columns (CDC op codes) referenced
    only in conditions — appends project onto the TARGET's columns."""
    path = os.path.join(str(tmp_path), "extras")
    commit_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), path)
    src = spark.createDataFrame(
        [(1, 99, "a", "U"), (2, 0, "b", "D"), (3, 30, "c", "I")],
        "k long, v long, status string, op string",
    )
    commit_merge_into(
        src,
        path,
        ["k"],
        matched_clauses=[
            ("delete", "s.op = 'D'", None),
            ("update", True, None),
        ],
        insert_whens=["op = 'I'"],
    )
    got = read_table(spark, path)
    assert set(got.columns) == {"k", "v", "status"}
    assert _rows(spark, path) == {1: (99, "a"), 3: (30, "c")}
    # a MISSING target column is a loud error
    bad = spark.createDataFrame([(7, 70)], "k long, v long")
    with pytest.raises(ValueError, match="lacks target column"):
        commit_merge_into(
            bad, path, ["k"], matched_clauses=[("update", True, None)]
        )


def test_insert_values_clauses(spark, tmp_path):
    """Explicit INSERT (cols) VALUES (exprs): ordered first-wins,
    expressions over plain source names, unlisted target columns fill
    typed NULL."""
    path = os.path.join(str(tmp_path), "insval")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    src = spark.createDataFrame(
        [(2, 20, "hot", 5), (3, 30, "cold", 7), (1, 99, "hot", 9)],
        "k long, v long, temp string, w long",
    )
    commit_merge_into(
        src,
        path,
        ["k"],
        matched_clauses=[("update", True, {"v": "s.v"})],
        insert_clauses=[
            ("temp = 'hot'", {"k": "k", "v": "v + w", "status": "'H'"}),
            (True, {"k": "k", "v": "v"}),  # status unlisted -> NULL
        ],
    )
    assert _rows(spark, path) == {
        1: (99, "a"),        # partial SET keeps target status
        2: (25, "H"),        # first clause: v + w, literal status
        3: (30, None),       # catch-all: unlisted status -> NULL
    }


def test_insert_values_guards(spark, tmp_path):
    path = os.path.join(str(tmp_path), "g2")
    commit_version(_df(spark, [(1, 10, "a")]), path)
    src = _df(spark, [(2, 20, "b")])
    with pytest.raises(ValueError, match="unknown target column"):
        commit_merge_into(
            src, path, ["k"],
            insert_clauses=[(True, {"k": "k", "nope": "v"})],
        )
    with pytest.raises(ValueError, match="only the last insert"):
        commit_merge_into(
            src, path, ["k"],
            insert_clauses=[(True, None), ("v > 0", None)],
        )
    with pytest.raises(ValueError, match="not both"):
        commit_merge_into(
            src, path, ["k"],
            insert_when=True, insert_clauses=[(True, None)],
        )
    # empty target cannot type an explicit VALUES projection
    empty = os.path.join(str(tmp_path), "empty2")
    with pytest.raises(ValueError, match="existing typed target"):
        commit_merge_into(
            src, empty, ["k"],
            insert_clauses=[(True, {"k": "k"})],
        )


def test_merge_schema_evolution(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION: assigned new source columns widen
    the target; merely-referenced extras (op codes) still never land;
    existing rows read the new column as NULL."""
    import os

    from temp_data_pipeline_spark.operators.versioned import read_manifest
    from temp_data_pipeline_spark.sql import SqlEngine

    p = os.path.join(str(tmp_path), "t")
    commit_version(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, price double"
        ),
        p,
    )
    src = spark.createDataFrame(
        [(2, 21.0, "gold", "U"), (3, 30.0, "silver", "I")],
        "k long, price double, tier string, op string",
    )
    # without the flag: INSERT * drops extras, naming tier errors
    with pytest.raises(ValueError, match="SCHEMA EVOLUTION"):
        commit_merge_into(
            src, p, ["k"],
            insert_clauses=[(True, {"k": "k", "tier": "tier"})],
        )
    src.createOrReplaceTempView("mse_src")
    e = SqlEngine(spark, {"t": p})
    e.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO t USING "
        "(SELECT k, price, tier FROM mse_src WHERE op <> 'X') s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {
        r["k"]: (r["price"], r["tier"])
        for r in read_table(spark, p).collect()
    }
    assert rows == {
        1: (10.0, None),   # untouched old row: new column reads NULL
        2: (21.0, "gold"),  # updated: source values incl. new column
        3: (30.0, "silver"),  # inserted
    }
    man = read_manifest(spark, p, versions(spark, p)[-1])
    names = [f["name"] for f in man["_schema"]["fields"]]
    assert names == ["k", "price", "tier"]  # widened, new col LAST
    assert "op" not in names  # referenced-only extras never land


def test_merge_evolution_explicit_values_names_new_column(spark, tmp_path):
    import os

    p = os.path.join(str(tmp_path), "t")
    commit_version(
        spark.createDataFrame([(1, 1.0)], "k long, price double"), p
    )
    src = spark.createDataFrame(
        [(5, 5.0, 99)], "k long, price double, rank long"
    )
    commit_merge_into(
        src, p, ["k"],
        insert_clauses=[(True, {"k": "k", "price": "price", "rank": "rank"})],
        allow_evolution=True,
    )
    rows = {r["k"]: (r["price"], r["rank"]) for r in read_table(spark, p).collect()}
    assert rows == {1: (1.0, None), 5: (5.0, 99)}


def test_merge_evolution_insert_star_with_set_only_column(spark, tmp_path):
    """INSERT * must not crash on an evolution column only a SET
    clause assigns — unmatched rows take typed NULL for it."""
    import os

    p = os.path.join(str(tmp_path), "t")
    commit_version(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, price double"),
        p,
    )
    src = spark.createDataFrame(
        [(1, 10.0), (5, 50.0)], "k long, price double"
    )
    commit_merge_into(
        src, p, ["k"],
        matched_clauses=[("update", True, {"price": "s.price", "flag": "1"})],
        insert_clauses=[(True, None)],  # INSERT *
        allow_evolution=True,
    )
    rows = {r["k"]: (r["price"], r["flag"]) for r in read_table(spark, p).collect()}
    assert rows == {1: (10.0, 1), 2: (2.0, None), 5: (50.0, None)}
