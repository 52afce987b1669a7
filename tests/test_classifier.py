"""Hashed linear classifier: scoring semantics, NB log-odds trainer,
and determinism of the md5-derived conformance weights."""

from __future__ import annotations

from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.classifier import (
    classifier_score,
    hashed_bucket,
    hashed_weights,
    train_log_odds,
)


class TestHashedWeights:
    def test_deterministic_and_bounded(self, spark):
        a = {r["bucket"]: r["w"] for r in hashed_weights(spark, 64).collect()}
        b = {r["bucket"]: r["w"] for r in hashed_weights(spark, 64).collect()}
        assert a == b
        assert set(a) == set(range(64))
        assert all(-1000.0 <= w <= 1000.0 for w in a.values())
        assert all(w == int(w) for w in a.values())  # integer-valued


class TestClassifierScore:
    def test_uniform_weights_give_score_one(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "d d")], "doc_id long, text string"
        )
        w = spark.range(512).select(
            F.col("id").alias("bucket"), F.lit(1.0).alias("w")
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["w_sum"], r["score"])
            for r in classifier_score(docs, w, dim=512).collect()
        }
        assert got == {1: (3, 3.0, 1.0), 2: (2, 2.0, 1.0)}

    def test_missing_buckets_contribute_zero(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        empty = spark.createDataFrame([], "bucket long, w double")
        row = classifier_score(docs, empty, dim=512).first()
        assert (row["n_tokens"], row["w_sum"], row["score"]) == (2, 0.0, 0.0)

    def test_single_token_weight_lookup(self, spark):
        docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
        b = spark.createDataFrame([("hello",)], "t string").select(
            hashed_bucket(F.col("t"), 512).alias("bucket")
        ).first()["bucket"]
        w = spark.createDataFrame([(int(b), 7.0)], "bucket long, w double")
        assert classifier_score(docs, w, dim=512).first()["score"] == 7.0

    def test_prob_is_sigmoid_and_monotone(self, spark):
        docs = spark.createDataFrame(
            [(1, "a"), (2, "a a b")], "doc_id long, text string"
        )
        w = spark.range(512).select(
            F.col("id").alias("bucket"), F.lit(2.0).alias("w")
        )
        rows = classifier_score(docs, w, dim=512, with_prob=True).collect()
        for r in rows:
            assert 0.0 < r["prob"] < 1.0
            assert (r["prob"] > 0.5) == (r["score"] > 0.0)


class TestTrainLogOdds:
    def test_separates_classes(self, spark):
        pos = [(i, 1, "good great fine solid prose text") for i in range(20)]
        neg = [(100 + i, 0, "spam spam buy now click here") for i in range(20)]
        labeled = spark.createDataFrame(
            pos + neg, "doc_id long, label int, text string"
        )
        w = train_log_odds(labeled, dim=1024)
        score = {
            r["doc_id"]: r["score"]
            for r in classifier_score(
                spark.createDataFrame(
                    [(1, "good great prose"), (2, "spam buy click")],
                    "doc_id long, text string",
                ),
                w,
                dim=1024,
            ).collect()
        }
        assert score[1] > 0 > score[2]

    def test_weights_are_integer_valued(self, spark):
        labeled = spark.createDataFrame(
            [(1, 1, "a b c"), (2, 0, "d e f")], "doc_id long, label int, text string"
        )
        for r in train_log_odds(labeled, dim=256).collect():
            assert r["w"] == int(r["w"])

    def test_unseen_bucket_scores_zero(self, spark):
        labeled = spark.createDataFrame(
            [(1, 1, "a"), (2, 0, "b")], "doc_id long, label int, text string"
        )
        w = train_log_odds(labeled, dim=256)
        row = classifier_score(
            spark.createDataFrame(
                [(9, "zzzz-not-in-train")], "doc_id long, text string"
            ),
            w,
            dim=256,
        ).first()
        # one token, bucket almost surely untrained -> exact zero unless
        # it hash-collides with 'a'/'b' (2/256 chance, fixed hash: it
        # doesn't — pinned by this test passing deterministically)
        assert row["w_sum"] == 0.0
