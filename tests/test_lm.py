"""Bigram LM scoring: hand-computed goldens + OOV / edge semantics.

Cross-engine value parity is pinned by the llm_lm_score oracle query;
these tests pin the model math itself on a corpus small enough to
verify by hand.

Corpus: d1 = "a b a", d2 = "a b"
  bigrams: (a,b)x2, (b,a)x1 → c1(a)=2, c1(b)=1, V={a,b}=2
  term(a,b) = ln((2+2)/(2+1)) = ln(4/3) → 287682 micro-nats
  term(b,a) = ln((1+2)/(1+1)) = ln(3/2) → 405465 micro-nats
"""

from __future__ import annotations

import math

from temp_data_pipeline_spark.llm.lm import score_bigram_nll, train_bigram_lm

T_AB = math.floor(math.log(4 / 3) * 1e6)  # 287682
T_BA = math.floor(math.log(3 / 2) * 1e6)  # 405465


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "a b")], "doc_id bigint, text string"
    )


def test_train_counts_and_vocab(spark):
    lm = train_bigram_lm(_corpus(spark))
    assert lm.vocab_size == 2
    rows = {(r["w1"], r["w2"]): (r["c12"], r["c1"], r["nll_micro"]) for r in lm.counts.collect()}
    assert rows[("a", "b")] == (2, 2, T_AB)
    assert rows[("b", "a")] == (1, 1, T_BA)


def test_score_golden(spark):
    d = _corpus(spark)
    lm = train_bigram_lm(d)
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro"]) for r in score_bigram_nll(d, lm).collect()}
    assert got[1] == (2, T_AB + T_BA)
    assert got[2] == (1, T_AB)


def test_oov_uniform_prior(spark):
    lm = train_bigram_lm(_corpus(spark))
    unseen = lm.counts.sparkSession.createDataFrame(
        [(9, "z z z")], "doc_id bigint, text string"
    )
    got = score_bigram_nll(unseen, lm).collect()[0]
    # every OOV bigram costs ln(V) = ln(2)
    assert (got["n_bigrams"], got["nll_micro"]) == (2, 2 * math.floor(math.log(2) * 1e6))


def test_single_token_doc_absent(spark):
    d = _corpus(spark)
    lm = train_bigram_lm(d)
    one = d.sparkSession.createDataFrame([(5, "solo")], "doc_id bigint, text string")
    assert score_bigram_nll(one, lm).count() == 0


def test_familiar_beats_noise(spark):
    """A document made of corpus phrases must score a lower mean NLL
    than one made of rare transitions — the filtering property."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(99, "zeta xylem qoph vex")],
        "doc_id bigint, text string",
    )
    lm = train_bigram_lm(docs)
    scored = {
        r["doc_id"]: r["nll_micro"] / r["n_bigrams"] for r in score_bigram_nll(docs, lm).collect()
    }
    assert scored[0] < scored[99]
