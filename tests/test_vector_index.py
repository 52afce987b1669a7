"""Persisted IVF index (llm/vector_index.py): build/probe lifecycle,
partition pruning, atomic manifest."""

from __future__ import annotations

import os

import pytest

from temp_data_pipeline_spark.llm.vector_index import (
    build_ivf_index,
    ivf_index_topk,
    read_ivf_manifest,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _pinned_centroids(spark, n=8):
    from pyspark.sql import functions as F

    e = _embeddings(spark)
    return [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    ]


def test_build_probe_matches_adhoc_ivf(spark, tmp_path):
    from pyspark.sql import functions as F

    from temp_data_pipeline_spark.llm.similarity import ivf_topk

    e = _embeddings(spark)
    qvec = e.filter(F.col("vec_id") == 0).first()["embedding"]
    cents = _pinned_centroids(spark)
    base = e.filter(F.col("vec_id") != 0)

    path = str(tmp_path / "ivf")
    man = build_ivf_index(base, path, centroids=cents)
    assert man["nlist"] == 8 and man["n_vectors"] == base.count()

    got = [
        r["vec_id"]
        for r in ivf_index_topk(spark, path, qvec, k=5, nprobe=3).collect()
    ]
    want = [
        r["vec_id"]
        for r in ivf_topk(base, qvec, k=5, centroids=cents, nprobe=3).collect()
    ]
    assert got == want


def test_probe_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    e = _embeddings(spark)
    qvec = e.filter(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, centroids=_pinned_centroids(spark))

    df = ivf_index_topk(spark, path, qvec, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the _cell IN (...) filter must reach the scan as a PARTITION
    # filter (planning-time pruning), not a post-scan Filter
    assert "PartitionFilters" in plan and "_cell" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    # the layout really has many cell dirs to prune (inputFiles() can't
    # be used here — it lists the UNpruned relation by design)
    cells_dir = read_ivf_manifest(spark, path)["cells_dirs"][0]
    cell_dirs = [
        d for d in os.listdir(f"{path}/{cells_dir}") if d.startswith("_cell=")
    ]
    assert len(cell_dirs) >= 6
    # pruned probe returns the same rows as an unpruned filter
    from temp_data_pipeline_spark.llm.similarity import ivf_topk

    want = [
        r["vec_id"]
        for r in ivf_topk(
            e, qvec, k=5, centroids=_pinned_centroids(spark), nprobe=2
        ).collect()
    ]
    assert [r["vec_id"] for r in df.collect()] == want


def test_unmanifested_index_is_invisible(spark, tmp_path):
    e = _embeddings(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, centroids=_pinned_centroids(spark))
    os.remove(f"{path}/index-1.json")  # simulate crash before rename
    with pytest.raises(FileNotFoundError, match="index manifest missing"):
        read_ivf_manifest(spark, path)


def test_rebuild_overwrites_atomically(spark, tmp_path):
    e = _embeddings(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, centroids=_pinned_centroids(spark, 4))
    assert read_ivf_manifest(spark, path)["nlist"] == 4
    build_ivf_index(e, path, centroids=_pinned_centroids(spark, 8))
    assert read_ivf_manifest(spark, path)["nlist"] == 8


def test_rebuild_never_disturbs_live_data(spark, tmp_path):
    """ADVICE r5: the old in-place overwrite destroyed cell files the
    live manifest still referenced mid-build. Rebuilds now land in a
    fresh uniquely-named dir; the superseded dir stays on disk (for
    in-flight probes) until vacuum."""
    e = _embeddings(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, centroids=_pinned_centroids(spark, 4))
    old_dir = read_ivf_manifest(spark, path)["cells_dirs"][0]
    old_files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(f"{path}/{old_dir}") for f in fs
        if f.endswith(".parquet")
    )
    build_ivf_index(e, path, centroids=_pinned_centroids(spark, 8))
    new_dir = read_ivf_manifest(spark, path)["cells_dirs"][0]
    assert new_dir != old_dir
    # every old file byte is still there for a concurrent reader
    assert sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(f"{path}/{old_dir}") for f in fs
        if f.endswith(".parquet")
    ) == old_files
    # vacuum reclaims the superseded dir once the grace window passes
    from temp_data_pipeline_spark.llm.vector_index import vacuum_ivf_index

    assert vacuum_ivf_index(spark, path) == []  # default grace: too fresh
    assert vacuum_ivf_index(spark, path, orphan_grace=0) == [old_dir]
    assert not os.path.exists(f"{path}/{old_dir}")
    assert os.path.exists(f"{path}/{new_dir}")


def test_add_vectors_equals_full_rebuild(spark, tmp_path):
    """Append lifecycle: probing (build(half1) + add_vectors(half2))
    must return exactly the top-k of build(half1 ∪ half2) — cell
    assignment depends only on the pinned centroids."""
    from pyspark.sql import functions as F

    from temp_data_pipeline_spark.llm.vector_index import add_vectors

    e = _embeddings(spark)
    qvec = e.filter(F.col("vec_id") == 0).first()["embedding"]
    cents = _pinned_centroids(spark)
    base = e.filter(F.col("vec_id") != 0)
    half1 = base.filter(F.col("vec_id") % 2 == 1)
    half2 = base.filter((F.col("vec_id") % 2 == 0))

    p_inc = str(tmp_path / "inc")
    build_ivf_index(half1, p_inc, centroids=cents)
    man = add_vectors(half2, p_inc)
    assert man["n_vectors"] == base.count()
    assert len(man["cells_dirs"]) == 2

    p_full = str(tmp_path / "full")
    build_ivf_index(base, p_full, centroids=cents)

    for nprobe in (2, 4):
        got = [
            r["vec_id"]
            for r in ivf_index_topk(spark, p_inc, qvec, k=7, nprobe=nprobe).collect()
        ]
        want = [
            r["vec_id"]
            for r in ivf_index_topk(spark, p_full, qvec, k=7, nprobe=nprobe).collect()
        ]
        assert got == want
    # pruning still reaches every branch of the unioned append dirs
    plan = (
        ivf_index_topk(spark, p_inc, qvec, k=7, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("PartitionFilters") >= 2
