"""BPE fit/apply: classic-semantics goldens, a sequential reference
model fuzz, and fit determinism."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from temp_data_pipeline_spark.llm.bpe import apply_bpe, fit_bpe


def _ref_encode(text: str, merges, sep="|") -> tuple[str, int]:
    """Classic BPE apply: per word, each merge in rank order, one
    leftmost non-overlapping pass (Sennrich et al. reference)."""
    out_words, n = [], 0
    for w in text.split(" "):
        sym = list(w)
        for a, b in merges:
            i, new = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        n += len(sym)
        out_words.append(sep.join(sym))
    return " ".join(out_words), n


def _run(spark, texts, merges):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return {
        r["doc_id"]: (r["bpe"], r["n_subwords"])
        for r in apply_bpe(df, merges).collect()
    }


class TestApplyBpe:
    def test_golden_chained_merges(self, spark):
        got = _run(spark, ["abc ab xabc"], [("a", "b"), ("ab", "c")])
        assert got[0] == ("abc ab x|abc", 4)

    def test_run_of_repeats_matches_classic_grouping(self, spark):
        # "aaaaa" with merge (a,a): leftmost non-overlap -> aa aa a
        got = _run(spark, ["aaaaa"], [("a", "a")])
        assert got[0] == ("aa|aa|a", 3)

    def test_no_cross_word_merges(self, spark):
        got = _run(spark, ["a b"], [("a", "b")])
        assert got[0] == ("a b", 2)

    def test_unmergeable_text_is_char_split(self, spark):
        got = _run(spark, ["xyz"], [("a", "b")])
        assert got[0] == ("x|y|z", 3)

    @given(
        texts=st.lists(
            st.text(alphabet="abc ", min_size=0, max_size=20), min_size=1, max_size=6
        ),
        merges=st.lists(
            st.sampled_from(
                [("a", "b"), ("a", "a"), ("b", "c"), ("ab", "c"), ("c", "ab"),
                 ("aa", "aa"), ("b", "b")]
            ),
            min_size=0,
            max_size=5,
        ),
    )
    @settings(max_examples=15, deadline=None)
    def test_fuzz_vs_reference_model(self, spark, texts, merges):
        got = _run(spark, texts, merges)
        for i, t in enumerate(texts):
            assert got[i] == _ref_encode(t, merges)


class TestFitBpe:
    def test_learns_frequent_pairs_first(self, spark):
        df = spark.createDataFrame(
            [(0, "low low low lowest lowest")], "doc_id long, text string"
        )
        merges = fit_bpe(df, n_merges=3)
        # 'l'+'o' and 'lo'+'w' dominate every word
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")

    def test_fit_is_deterministic_and_applies(self, spark):
        rows = [(i, "spark table scan table spark row") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        m1 = fit_bpe(df, n_merges=8)
        m2 = fit_bpe(df, n_merges=8)
        assert m1 == m2 and len(m1) == 8
        enc = {r["doc_id"]: r["n_subwords"] for r in apply_bpe(df, m1).collect()}
        raw_chars = len("spark table scan table spark row".replace(" ", ""))
        n_words = 6
        assert all(n_words <= n <= raw_chars for n in enc.values())
        # more merges never increase the token count
        enc0 = {r["doc_id"]: r["n_subwords"] for r in apply_bpe(df, m1[:2]).collect()}
        assert all(enc[k] <= enc0[k] for k in enc)

    def test_sample_bound_respected(self, spark):
        rows = [(i, "aa bb" if i < 5 else "zz yy") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = fit_bpe(df, n_merges=2, sample_docs=5)
        # only the first 5 docs (by id) feed the fit
        assert set(merges) <= {("a", "a"), ("b", "b")}


def test_sentinel_bytes_in_text_are_stripped_not_corrupting(spark):
    """Raw \\x01/\\x02 bytes in crawled text must not be read as
    symbol sentinels (they would delete neighbors and inflate counts)."""
    got = _run(spark, ["a\x01b c\x02"], [])
    assert got[0] == ("a|b c", 3)


def test_null_text_does_not_crash_fit(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "aa bb aa")], "doc_id long, text string"
    )
    merges = fit_bpe(df, n_merges=1)
    assert merges == [("a", "a")]


def test_fit_bpe_distributed_matches_unbounded_sample(spark):
    """Full-corpus distributed fit == the sampled fit when the sample
    covers everything (same statistics -> same deterministic merges);
    the cap path trains on the most frequent words, loudly."""
    from temp_data_pipeline_spark.llm.bpe import (
        fit_bpe,
        fit_bpe_distributed,
    )

    df = spark.createDataFrame(
        [
            (i, t)
            for i, t in enumerate(
                ["low lower lowest", "new newer newest", "low low new"]
                * 5
            )
        ],
        "doc_id long, text string",
    )
    sampled = fit_bpe(df, n_merges=6, sample_docs=10_000)
    dist = fit_bpe_distributed(df, n_merges=6)
    assert dist == sampled
    assert len(dist) == 6
    # cap path: only the top-2 words by freq survive; still returns
    # deterministic merges (over the capped stats)
    capped = fit_bpe_distributed(df, n_merges=3, max_vocab_words=2)
    assert len(capped) == 3
