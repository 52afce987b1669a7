"""Hashed text embeddings + text kNN (llm/embed.py)."""

from __future__ import annotations

from temp_data_pipeline_spark.llm.embed import (
    hash_embed_dense,
    hash_embed_sparse,
    text_knn,
)

DOCS = [
    (0, "spark join scan merge window"),
    (1, "spark join scan merge window"),          # identical to query
    (2, "spark join scan merge sort"),            # near
    (3, "alpha beta gamma delta epsilon zeta"),   # far
]


def test_sparse_weights_are_exact_and_nonzero(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = hash_embed_sparse(df, dim=64).collect()
    assert all(r["weight"] != 0 for r in rows)
    assert all(0 <= r["dim_idx"] < 64 for r in rows)
    # identical texts embed identically
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["dim_idx"]] = r["weight"]
    assert by_doc[0] == by_doc[1]


def test_dense_view_matches_sparse(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sparse = {
        (r["doc_id"], r["dim_idx"]): r["weight"]
        for r in hash_embed_sparse(df, dim=64).collect()
    }
    for r in hash_embed_dense(df, dim=64).collect():
        for i, v in enumerate(r["embedding"]):
            assert v == sparse.get((r["doc_id"], i), 0)


def test_text_knn_identical_doc_ranks_first(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = text_knn(df, 0, dim=64, k=3).collect()
    assert rows[0]["doc_id"] == 1
    # sqrt(n)*sqrt(n) != n in the last ulp — identical on both engines,
    # but not exactly 1.0
    assert abs(rows[0]["cosine"] - 1.0) < 1e-12
    assert 0 not in {r["doc_id"] for r in rows}  # query excluded
    got = {r["doc_id"]: r["cosine"] for r in rows}
    if 2 in got and 3 in got:
        assert got[2] > got[3]  # near beats far


def test_text_knn_plan_is_jvm_only_with_broadcast(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = text_knn(df, 0, dim=64, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_dense_view_keeps_all_cancelled_docs(spark):
    """A document whose signed weights all cancel must appear as the
    zero vector, not vanish from the dense view (ADVICE r5). Find a
    cancelling pair by brute force: two tokens hashing to the same
    dim_idx with opposite signs."""
    from itertools import combinations

    from temp_data_pipeline_spark.llm.embed import hash_embed_sparse

    cands = [f"w{i}" for i in range(40)]
    probe = spark.createDataFrame(
        [(i, w) for i, w in enumerate(cands)], "doc_id long, text string"
    )
    entries = {
        r["doc_id"]: (r["dim_idx"], r["weight"])
        for r in hash_embed_sparse(probe, dim=4).collect()
    }
    pair = next(
        (a, b)
        for a, b in combinations(range(len(cands)), 2)
        if entries[a][0] == entries[b][0]
        and entries[a][1] == -entries[b][1]
    )
    text = f"{cands[pair[0]]} {cands[pair[1]]}"
    df = spark.createDataFrame(
        [(0, text), (1, "spark join scan")], "doc_id long, text string"
    )
    dense = {r["doc_id"]: r["embedding"] for r in hash_embed_dense(df, dim=4).collect()}
    assert set(dense) == {0, 1}
    assert dense[0] == [0, 0, 0, 0]
    assert any(v != 0 for v in dense[1])
