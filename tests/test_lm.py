"""Bigram LM scoring (operators/lm.py): hand-computed probabilities,
smoothing, short-doc handling, partitioning invariance. Cross-engine
value equality is q_bigram_lm vs its DuckDB oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.operators.lm import (
    _P_SCALE,
    bigram_lm_score,
    bigram_lm_train,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # corpus: "a b a b", "a c" → bigrams: (a,b)x2, (b,a), (a,c)
    # c1(a)=3, c1(b)=1; vocab = {a, b, c} → V=3
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )


def _score(docs, model, vocab):
    return {
        r["doc_id"]: (r["n_bigrams"], r["sum_p9"], r["mean_p9"])
        for r in bigram_lm_score(docs, model, vocab).collect()
    }


def test_hand_computed_counts_and_scores(spark, tiny):
    model, vocab = bigram_lm_train(tiny)
    counts = {(r["w1"], r["w2"]): (r["c12"], r["c1"]) for r in model.collect()}
    assert counts == {("a", "b"): (2, 3), ("b", "a"): (1, 1), ("a", "c"): (1, 3)}
    assert vocab.collect()[0]["v"] == 3

    # p9(a,b) = (2+1)*1e9 div (3+3) = 5e8;  p9(b,a) = (1+1)*1e9 div (1+3)
    # = 5e8;  p9(a,c) = (1+1)*1e9 div (3+3) = 333333333
    p_ab, p_ba, p_ac = (
        3 * _P_SCALE // 6,
        2 * _P_SCALE // 4,
        2 * _P_SCALE // 6,
    )
    got = _score(tiny, model, vocab)
    assert got[1] == (3, 2 * p_ab + p_ba, (2 * p_ab + p_ba) / 3)
    assert got[2] == (1, p_ac, float(p_ac))


def test_unseen_bigram_and_context_smoothing(spark, tiny):
    model, vocab = bigram_lm_train(tiny)
    new = spark.createDataFrame(
        [(10, "b c"), (11, "z a")], "doc_id long, text string"
    )
    got = _score(new, model, vocab)
    # (b, c): context b seen (c1=1), bigram unseen → (0+1)*1e9 div (1+3)
    assert got[10] == (1, _P_SCALE // 4, float(_P_SCALE // 4))
    # (z, a): context unseen → uniform prior 1e9 div V
    assert got[11] == (1, _P_SCALE // 3, float(_P_SCALE // 3))


def test_short_docs_kept_with_zero_bigrams(spark, tiny):
    model, vocab = bigram_lm_train(tiny)
    new = spark.createDataFrame(
        [(20, "solo"), (21, "")], "doc_id long, text string"
    )
    got = _score(new, model, vocab)
    assert got[20] == (0, 0, None)
    assert got[21] == (0, 0, None)


def test_repeated_bigrams_score_every_occurrence(spark, tiny):
    model, vocab = bigram_lm_train(tiny)
    new = spark.createDataFrame([(30, "a b a b a b")], "doc_id long, text string")
    (n, s, _) = _score(new, model, vocab)[30]
    assert n == 5  # (a,b)x3 + (b,a)x2 — multiplicity preserved


def test_partitioning_invariant(spark, tiny):
    corpus = spark.range(0, 200).selectExpr(
        "id AS doc_id",
        "concat('w', id % 7, ' w', id % 5, ' w', id % 3, ' w', id % 7) AS text",
    )
    m1, v1 = bigram_lm_train(corpus)
    m2, v2 = bigram_lm_train(corpus.repartition(13))
    a = _score(corpus, m1, v1)
    b = _score(corpus.repartition(11), m2, v2)
    assert a == b
