"""Golden-value tests for llm/curate.py + label_centroids, and oracle
parity for the curation conformance queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.curate import (
    top_keywords,
    hash_split,
    intra_dup_ngram_stats,
    mix_temperature,
    ngram_overlap,
    repetition_stats,
    span_dedup,
    stratified_sample,
    topk_per_group,
)
from temp_data_pipeline_spark.llm.similarity import label_centroids
from temp_data_pipeline_spark.plans.llm_queries import LLM_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query

CURATION_QUERIES = [
    "llm_hash_split",
    "llm_decontam",
    "llm_repetition",
    "llm_intra_dup",
    "llm_topk_lang",
    "llm_centroid",
    "llm_stratified",
    "llm_span_dedup",
    "llm_mix_temperature",
]


class TestHashSplit:
    def test_deterministic_and_partitioned(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
        assert a == b  # pure function of the id
        counts = {s: sum(1 for v in a.values() if v == s) for s in set(a.values())}
        assert set(counts) == {"train", "val", "test"}
        # md5 buckets ≈ uniform: 80/10/10 within a loose tolerance
        assert 700 < counts["train"] < 900
        assert 50 < counts["val"] < 160
        assert 50 < counts["test"] < 160

    def test_salt_changes_assignment(self, spark):
        df = spark.range(200).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(df, salt="v2").collect()}
        assert a != b

    def test_bad_weights(self, spark):
        df = spark.range(1).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="sum to 100"):
            hash_split(df, weights={"train": 50, "test": 40})


class TestStratifiedSample:
    def _df(self, spark, n=600):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "en")
            .when(F.col("id") % 3 == 1, "fr")
            .otherwise("xx")
            .alias("lang"),
        )

    def test_fraction_one_keeps_all_and_zero_drops_all(self, spark):
        df = self._df(spark)
        out = stratified_sample(df, {"en": 1.0, "fr": 0.0}, default_frac=0.0)
        langs = {r["lang"] for r in out.collect()}
        assert langs == {"en"}
        assert out.count() == 200

    def test_fraction_is_approximate_and_deterministic(self, spark):
        df = self._df(spark, 3000)
        out = stratified_sample(df, {"en": 0.5}, default_frac=0.0)
        n1 = out.count()
        assert 380 < n1 < 620  # ~50% of the 1000 'en' rows
        ids1 = sorted(r["doc_id"] for r in out.collect())
        ids2 = sorted(r["doc_id"] for r in
                      stratified_sample(df, {"en": 0.5}, default_frac=0.0).collect())
        assert ids1 == ids2  # no RNG state: pure function of id

    def test_salt_decorrelates(self, spark):
        df = self._df(spark, 3000)
        a = {r["doc_id"] for r in
             stratified_sample(df, {"en": 0.5}, salt="a").collect()}
        b = {r["doc_id"] for r in
             stratified_sample(df, {"en": 0.5}, salt="b").collect()}
        assert a != b


class TestNgramOverlap:
    def test_golden(self, spark):
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        # test doc contains the 3-gram "c d e"; train doc 1 shares it
        # twice (only counted once — distinct grams), train doc 2 not.
        test = mk([(100, "b c d e f")])
        train = mk([(1, "a c d e c d e x"), (2, "x y z w")])
        out = ngram_overlap(train, test, n=3)
        got = {r["doc_id"]: r["n_shared"] for r in out.collect()}
        # doc 1 grams ∩ test grams = {"c d e", "d e c"?..} — check exact:
        # train grams of doc1 (distinct): a c d, c d e, d e c, e c d,
        # c d e(dup), d e x ; test grams: b c d, c d e, d e f
        assert got == {1: 1}

    def test_short_doc_truncated_gram(self, spark):
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        # 2-token doc with n=3 yields its truncated gram "p q", which
        # matches nothing in a test corpus lacking that text
        train = mk([(1, "p q")])
        test = mk([(100, "p q")])  # same truncated gram -> collision
        out = ngram_overlap(train, test, n=3)
        assert {r["doc_id"]: r["n_shared"] for r in out.collect()} == {1: 1}


class TestRepetitionStats:
    def test_golden(self, spark):
        df = spark.createDataFrame(
            [(1, "a a a b"), (2, "x y z w")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (
                round(r["top_token_frac"], 6),
                round(r["distinct_ratio"], 6),
                r["n_tokens"],
            )
            for r in repetition_stats(df).collect()
        }
        assert got == {1: (0.75, 0.5, 4), 2: (0.25, 1.0, 4)}


class TestIntraDupNgrams:
    def test_golden(self, spark):
        # doc 1: "a b c" occurs twice (positions 1 and 4) -> 1 dup of 4
        # trigram occurrences; doc 2: all distinct; doc 3: shorter than
        # n -> single truncated gram, no dups, frac 0.0
        df = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "p q r s"), (3, "x y")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_intra_dup"], r["dup_frac"])
            for r in intra_dup_ngram_stats(df, n=3).collect()
        }
        assert got == {1: (4, 1, 0.25), 2: (2, 0, 0.0), 3: (1, 0, 0.0)}

    def test_blind_to_cross_document_repeats(self, spark):
        """The INTRA metric must ignore inter-document duplication —
        that's dup_ngram_stats' job."""
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
        )
        out = intra_dup_ngram_stats(df, n=3).collect()
        assert all(r["n_intra_dup"] == 0 for r in out)


class TestTopkPerGroup:
    def test_golden_with_ties(self, spark):
        df = spark.createDataFrame(
            [
                ("en", 1, 10), ("en", 2, 30), ("en", 3, 30), ("en", 4, 20),
                ("fr", 5, 1),
            ],
            "lang string, doc_id long, n_chars long",
        )
        out = topk_per_group(df, "lang", "n_chars", k=2)
        got = sorted((r["lang"], r["doc_id"]) for r in out.collect())
        # tie at 30 broken by doc_id asc → 2 wins, then 3
        assert got == [("en", 2), ("en", 3), ("fr", 5)]


class TestLabelCentroids:
    def test_golden(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
            "label int, embedding array<float>",
        )
        got = {
            (r["label"], r["pos"]): r["centroid_v"]
            for r in label_centroids(df).collect()
        }
        assert got == {(0, 0): 2.0, (0, 1): 3.0, (1, 0): 10.0, (1, 1): 20.0}


@pytest.mark.parametrize("name", CURATION_QUERIES)
def test_curation_query_oracle(spark, name):
    compare_query(spark, LLM_QUERIES[name], SF_SMOKE)


class TestTopKeywords:
    def test_golden_ranking(self, spark):
        # corpus of 3 docs; "rare" appears only in doc 0 and twice there
        docs = spark.createDataFrame(
            [
                (0, "rare rare common shared"),
                (1, "common shared shared"),
                (2, "common other words"),
            ],
            "doc_id long, text string",
        )
        out = [(r["rank"], r["term"]) for r in
               top_keywords(docs, k=2).filter(F.col("doc_id") == 0).collect()]
        # tf: rare=2 > others; tiebreak among tf=1 by df asc → "shared" (df 2) < "common" (df 3)
        assert out == [(1, "rare"), (2, "shared")]

    def test_with_score_monotone(self, spark):
        docs = spark.createDataFrame(
            [(0, "x x y"), (1, "y z"), (2, "y w")], "doc_id long, text string"
        )
        rows = top_keywords(docs, k=3, with_score=True).filter(
            F.col("doc_id") == 0).orderBy("rank").collect()
        scores = [r["tfidf"] for r in rows]
        # x: tf=2 df=1 → 2·ln(3); y: tf=1 df=3 → ln(1)=0
        assert scores[0] > scores[-1]
        assert abs(scores[-1]) < 1e-12


# ---------------------------------------------------------------------------
# dup_ngram_stats (inter-document duplicated n-gram fraction)
# ---------------------------------------------------------------------------


def test_dup_ngram_stats_golden(spark):
    from temp_data_pipeline_spark.llm.curate import dup_ngram_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),      # grams: "a b c","b c d","c d e"
            (2, "x b c d y"),      # grams: "x b c","b c d","c d y"
            (3, "p q r s t"),      # all unique
            (4, "a b"),            # short doc: single truncated gram "a b"
            (5, "a b"),            # exact duplicate of 4 → shared gram
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dup_ngram_stats(docs, n=3).collect()
    }
    # only "b c d" is cross-doc duplicated between 1 and 2; "a b" between 4/5
    assert out[1] == (3, 1)
    assert out[2] == (3, 1)
    assert out[3] == (3, 0)
    assert out[4] == (1, 1)
    assert out[5] == (1, 1)


def test_dup_ngram_stats_within_doc_repeat_not_dup(spark):
    """A gram repeated INSIDE one document only is not cross-doc dup."""
    from temp_data_pipeline_spark.llm.curate import dup_ngram_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "z z z z")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dup_ngram_stats(docs, n=4).collect()
    }
    assert out[1] == (3, 0)
    assert out[2] == (1, 0)


class TestSpanDedup:
    def _run(self, spark, rows, n=2):
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r["doc_id"]: (r["text_clean"], r["n_spans"], r["n_kept"])
            for r in span_dedup(docs, n=n).collect()
        }

    def test_cross_doc_and_within_doc_repeats_removed(self, spark):
        out = self._run(
            spark,
            [(1, "a b c d e f g h"), (2, "c d x y c d")],
        )
        # doc 1 is entirely first occurrences
        assert out[1] == ("a b c d e f g h", 4, 4)
        # doc 2: both "c d" chunks lose to (1, pos 1); "x y" survives
        assert out[2] == ("x y", 3, 1)

    def test_remainder_always_kept(self, spark):
        out = self._run(spark, [(1, "p q r"), (2, "p q p")])
        # doc 1: chunk "p q" + remainder "r"
        assert out[1] == ("p q r", 2, 2)
        # doc 2: chunk "p q" duplicates doc 1; remainder "p" is kept
        # even though the TOKEN appears elsewhere (spans, not tokens)
        assert out[2] == ("p", 2, 1)

    def test_fully_deduplicated_doc_still_emits_row(self, spark):
        out = self._run(spark, [(1, "a b"), (2, "a b")])
        assert out[1] == ("a b", 1, 1)
        assert out[2] == ("", 1, 0)

    def test_first_occurrence_is_doc_then_pos_order(self, spark):
        # same span at (1, 1) and (2, 0): doc order wins, not position
        out = self._run(spark, [(1, "x x a b"), (2, "a b z z")])
        assert out[1] == ("x x a b", 2, 2)
        assert out[2] == ("z z", 2, 1)

    def test_deterministic(self, spark):
        rows = [(i, f"w{i % 3} w{i % 5} common span here w{i}") for i in range(40)]
        a = self._run(spark, rows, n=3)
        b = self._run(spark, rows, n=3)
        assert a == b


class TestMixTemperature:
    def _df(self, spark, sizes):
        rows = []
        i = 0
        for lang, n in sizes.items():
            for _ in range(n):
                rows.append((i, lang))
                i += 1
        return spark.createDataFrame(rows, ["doc_id", "lang"])

    def test_uniform_strata_keep_everything(self, spark):
        df = self._df(spark, {"en": 50, "fr": 50})
        assert mix_temperature(df, alpha=0.5).count() == 100

    def test_alpha_one_is_identity(self, spark):
        df = self._df(spark, {"en": 300, "fr": 20})
        assert mix_temperature(df, alpha=1.0).count() == 320

    def test_sqrt_flattening(self, spark):
        df = self._df(spark, {"en": 400, "fr": 100})
        out = mix_temperature(df, alpha=0.5).groupBy("lang").count().collect()
        counts = {r["lang"]: r["count"] for r in out}
        # smallest stratum keeps all; en keeps ~sqrt(100/400)=50%
        assert counts["fr"] == 100
        assert 140 < counts["en"] < 260

    def test_general_alpha_path(self, spark):
        df = self._df(spark, {"en": 400, "fr": 100})
        out = mix_temperature(df, alpha=0.3).groupBy("lang").count().collect()
        counts = {r["lang"]: r["count"] for r in out}
        assert counts["fr"] == 100
        # (400/100)^(0.3-1) = 4^-0.7 ≈ 0.379
        assert 90 < counts["en"] < 220

    def test_deterministic_rerun(self, spark):
        df = self._df(spark, {"en": 123, "fr": 45, "de": 67})
        a = sorted(r["doc_id"] for r in mix_temperature(df).collect())
        b = sorted(r["doc_id"] for r in mix_temperature(df).collect())
        assert a == b and len(a) > 0


class TestCurationFunnel:
    def _counts(self, spark, rows, **kw):
        from temp_data_pipeline_spark.llm.curate import curation_funnel

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = curation_funnel(docs, **kw).collect()
        assert [r["stage_idx"] for r in sorted(out, key=lambda r: r["stage_idx"])] \
            == [0, 1, 2, 3, 4]
        return {r["stage"]: r["n_docs"] for r in out}

    def test_each_stage_kills_its_target(self, spark):
        good = "the " + " ".join(f"tok{i}word" for i in range(40))  # passes all
        short = "the tok one"                                        # gopher: too few words
        repeat = "the " + "same " * 40                               # repetition: top-token frac
        rows = [
            (1, good),
            (2, short),
            (3, repeat),
            (4, good),  # exact duplicate of 1 -> dies at dedup
        ]
        got = self._counts(
            spark, rows,
            gopher_kwargs={"min_words": 5, "min_stopword_hits": 1},
            min_score=-10_000.0,  # classifier gate open: isolate other stages
        )
        assert got["raw"] == 4
        assert got["gopher"] == 3       # short died
        assert got["repetition"] == 2   # repeat died
        assert got["classifier"] == 2
        assert got["dedup"] == 1        # doc 4 is doc 1's twin

    def test_funnel_is_cumulative(self, spark):
        rows = [(i, "the " + " ".join(f"w{i}x{j}" for j in range(30)))
                for i in range(10)]
        got = self._counts(
            spark, rows, gopher_kwargs={"min_words": 5, "min_stopword_hits": 1}
        )
        assert (got["raw"] >= got["gopher"] >= got["repetition"]
                >= got["classifier"] >= got["dedup"])

    def test_classifier_threshold_gates(self, spark):
        rows = [(i, "the " + " ".join(f"w{i}x{j}" for j in range(30)))
                for i in range(20)]
        open_ = self._counts(
            spark, rows,
            gopher_kwargs={"min_words": 5, "min_stopword_hits": 1},
            min_score=-10_000.0,
        )
        shut = self._counts(
            spark, rows,
            gopher_kwargs={"min_words": 5, "min_stopword_hits": 1},
            min_score=10_000.0,
        )
        assert open_["classifier"] == open_["repetition"]
        assert shut["classifier"] == 0 and shut["dedup"] == 0


def test_mix_temperature_null_stratum_kept(spark):
    """NULL strata are a real group: they set/respect thresholds like
    any other instead of being silently dropped."""
    rows = [(i, None if i < 10 else "en") for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mix_temperature(df, alpha=0.5)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # null group is the smallest stratum -> keeps everything
    assert counts.get(None) == 10
    # en keeps ~sqrt(10/100) ~= 32%
    assert 10 < counts.get("en", 0) < 60


def test_line_dedup_keeps_first_occurrence_in_order(spark):
    from temp_data_pipeline_spark.llm.curate import line_dedup

    df = spark.createDataFrame(
        [(1, "nav\nbody one\nnav\nbody two\nnav"),
         (2, "only line"),
         (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["text_clean"] == "nav\nbody one\nbody two"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (5, 3)
    assert out[2]["text_clean"] == "only line"
    # empty text splits to one empty line, kept
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 1)


def test_line_dedup_is_map_only(spark):
    from temp_data_pipeline_spark.llm.curate import line_dedup

    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_coverage_prefix_and_exact_cut(spark):
    from temp_data_pipeline_spark.llm.curate import vocab_coverage

    # counts: a=5, b=3, c=1, d=1 (total 10). coverage=0.8:
    #   a: cum_before 0  < 8  -> keep
    #   b: cum_before 5  < 8  -> keep
    #   c: cum_before 8  !< 8 -> cut (exact boundary)
    df = spark.createDataFrame(
        [(1, "a a a b b"), (2, "a a b c d")], "doc_id long, text string"
    )
    rows = vocab_coverage(df, coverage=0.8).orderBy("rank").collect()
    assert [(r["rank"], r["token"], r["n_occ"], r["cum_occ"]) for r in rows] == [
        (1, "a", 5, 5), (2, "b", 3, 8)
    ]
    # coverage=1.0 keeps the whole vocabulary
    assert vocab_coverage(df, coverage=1.0).count() == 4


def test_cluster_dedup_best_keeps_highest_score(spark):
    from temp_data_pipeline_spark.llm.cluster import cluster_dedup_best

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (7, 5.0), (9, 5.0), (4, 1.0)],
        "doc_id long, score double",
    )
    # chain {1,2,3}, pair {7,9} (tie -> min id), 4 singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    kept = {r["doc_id"] for r in
            cluster_dedup_best(docs, pairs, "score").collect()}
    assert kept == {2, 7, 4}


def test_ngram_overlap_single_cond_on_non_id_column(spark):
    # review r5: test_cond used to be evaluated after tokenized()
    # pruned every column but the id — a condition on another column
    # (the documented general case) raised UNRESOLVED_COLUMN
    from temp_data_pipeline_spark.llm.curate import ngram_overlap_single

    df = spark.createDataFrame(
        [(1, "a b c d", "train"), (2, "a b c x", "test"), (3, "z z z z", "train")],
        "doc_id long, text string, split string",
    )
    out = {r["doc_id"]: r["n_shared"]
           for r in ngram_overlap_single(
               df, F.col("split") == "test", n=3).collect()}
    assert out == {1: 1}  # doc 1 shares the "a b c" trigram; doc 3 none


def test_line_dedup_regex_metachar_separator(spark):
    # review r5: F.split takes a regex while array_join is literal —
    # sep="|" used to split between every character
    from temp_data_pipeline_spark.llm.curate import line_dedup

    df = spark.createDataFrame(
        [(1, "nav|body|nav|tail")], "doc_id long, text string"
    )
    row = line_dedup(df, sep="|").collect()[0]
    assert row["text_clean"] == "nav|body|tail"
    assert (row["n_lines"], row["n_kept"]) == (4, 3)


def test_corpus_line_dedup_removes_cross_doc_boilerplate(spark):
    from temp_data_pipeline_spark.llm.curate import corpus_line_dedup

    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha\nFOOTER"),
            (2, "COOKIE BANNER\nunique beta\nFOOTER"),
            (3, "COOKIE BANNER\nFOOTER"),  # pure boilerplate
            (4, "solo page"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(df, min_docs=2).collect()}
    assert out[1]["text_clean"] == "unique alpha"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    assert out[2]["text_clean"] == "unique beta"
    # doc whose every line is boilerplate survives as empty text
    assert out[3]["text_clean"] == ""
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (2, 0)
    assert out[4]["text_clean"] == "solo page"


def test_corpus_line_dedup_intra_doc_repeat_is_not_frequent(spark):
    # the SAME line 3x in ONE doc is not corpus boilerplate: the doc
    # count is distinct-doc, so it must survive (that's line_dedup's
    # job, not this operator's)
    from temp_data_pipeline_spark.llm.curate import corpus_line_dedup

    df = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "other")], "doc_id long, text string"
    )
    row = {r["doc_id"]: r for r in corpus_line_dedup(df, min_docs=2).collect()}
    assert row[1]["text_clean"] == "x\nx\nx"
    assert row[1]["n_kept"] == 3


def test_corpus_line_dedup_broadcast_removal_join(spark):
    from temp_data_pipeline_spark.llm.curate import corpus_line_dedup

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
    )
    plan = (
        corpus_line_dedup(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the anti-join against the (tiny) frequent set must broadcast,
    # never shuffle the full line table a second time
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_deterministic_shuffle_reproducible_and_seed_sensitive(spark):
    from temp_data_pipeline_spark.llm.curate import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in deterministic_shuffle(df, seed="e1").collect()}
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in deterministic_shuffle(df.repartition(7), seed="e1").collect()}
    c = {r["doc_id"]: r["shuffle_rank"]
         for r in deterministic_shuffle(df, seed="e2").collect()}
    assert a == b                        # partitioning-independent
    assert a != c                        # new seed -> new permutation
    assert sorted(a.values()) == list(range(1, 51))  # true permutation
    # an actual shuffle, not identity order
    assert [a[i] for i in range(50)] != list(range(1, 51))


class TestExactSample:
    def test_exactly_k_and_partition_invariant(self, spark):
        from temp_data_pipeline_spark.llm.curate import exact_sample

        df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"] for r in exact_sample(df, 100).collect()}
        b = {
            r["doc_id"]
            for r in exact_sample(df.repartition(13), 100).collect()
        }
        assert a == b and len(a) == 100

    def test_seed_changes_sample(self, spark):
        from temp_data_pipeline_spark.llm.curate import exact_sample

        df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"] for r in exact_sample(df, 100, seed="s1").collect()}
        b = {r["doc_id"] for r in exact_sample(df, 100, seed="s2").collect()}
        assert a != b

    def test_take_ordered_plan_no_global_sort_exchange(self, spark):
        from temp_data_pipeline_spark.llm.curate import exact_sample

        df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
        plan = exact_sample(df, 100)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan
