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


# ---- Kneser–Ney (kneser_ney_train / kneser_ney_score) ----------------


def _kn_score(docs, model, stats):
    from loan_etl_data_pipeline_spark.operators.lm import kneser_ney_score

    return {
        r["doc_id"]: (r["n_bigrams"], r["sum_p9"], r["mean_p9"])
        for r in kneser_ney_score(docs, model, stats).collect()
    }


@pytest.fixture(scope="module")
def kn(spark, tiny):
    from loan_etl_data_pipeline_spark.operators.lm import kneser_ney_train

    return kneser_ney_train(tiny)


def test_kn_hand_computed(spark, tiny, kn):
    model, stats = kn
    st = stats.collect()[0]
    # bigram types: (a,b), (b,a), (a,c) → nct=3; vocab {a,b,c} → v=3
    assert (st["nct"], st["v"]) == (3, 3)
    # ctx(a): c1=3, n1p=2; ctx(b): c1=1, n1p=1
    # cont: ncont(b)=1, ncont(a)=1, ncont(c)=1; nct+v = 6
    # p9(a,b) = (max(8-3,0)*6 + 3*2*(1+1))*1e9 // (4*3*6)
    p_ab = (5 * 6 + 6 * 2) * _P_SCALE // (12 * 6)
    # p9(b,a) = (max(4-3,0)*6 + 3*1*2)*1e9 // (4*1*6)
    p_ba = (1 * 6 + 3 * 2) * _P_SCALE // (4 * 6)
    # p9(a,c) = (max(4-3,0)*6 + 3*2*2)*1e9 // (4*3*6)
    p_ac = (1 * 6 + 6 * 2) * _P_SCALE // (12 * 6)
    got = _kn_score(tiny, model, stats)
    assert got[1] == (3, 2 * p_ab + p_ba, (2 * p_ab + p_ba) / 3)
    assert got[2] == (1, p_ac, float(p_ac))


def test_kn_backoff_branches(spark, tiny, kn):
    model, stats = kn
    new = spark.createDataFrame(
        [(10, "b c"), (11, "z a"), (12, "z q")], "doc_id long, text string"
    )
    got = _kn_score(new, model, stats)
    # (b,c): seen context b (c1=1, n1p=1), unseen bigram → discounted
    # continuation mass only: (0*6 + 3*1*(ncont(c)+1)=6)*1e9 // (4*1*6)
    assert got[10] == (1, 6 * _P_SCALE // 24, float(6 * _P_SCALE // 24))
    # (z,a): unseen context → smoothed continuation (ncont(a)+1) // (nct+v)
    assert got[11] == (1, 2 * _P_SCALE // 6, float(2 * _P_SCALE // 6))
    # (z,q): unseen context AND never-seen continuation → 1 // 6
    assert got[12] == (1, _P_SCALE // 6, float(_P_SCALE // 6))


def test_kn_context_mass_at_most_one(spark, kn):
    # Σ_w2 P_KN(w2|w1) over SEEN w2 plus the reserved mass is ≤ 1:
    # per context, sum of seen-bigram p9 must stay below 1e9
    model, stats = kn
    from pyspark.sql import functions as F

    bg = model.select("w1", "w2")
    docs = bg.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.concat_ws(" ", "w1", "w2").alias("text"),
    )
    from loan_etl_data_pipeline_spark.operators.lm import kneser_ney_score

    scored = kneser_ney_score(docs, model, stats)
    per_ctx = (
        scored.join(docs, "doc_id")
        .select(F.split("text", " ")[0].alias("w1"), "sum_p9")
        .groupBy("w1")
        .agg(F.sum("sum_p9").alias("mass"))
    )
    assert all(r["mass"] <= _P_SCALE for r in per_ctx.collect())


def test_kn_partitioning_invariant(spark):
    from loan_etl_data_pipeline_spark.operators.lm import (
        kneser_ney_score,
        kneser_ney_train,
    )

    corpus = spark.range(0, 200).selectExpr(
        "id AS doc_id",
        "concat('w', id % 7, ' w', id % 5, ' w', id % 3, ' w', id % 7) AS text",
    )
    m1, s1 = kneser_ney_train(corpus)
    m2, s2 = kneser_ney_train(corpus.repartition(13))
    a = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p9"])
        for r in kneser_ney_score(corpus, m1, s1).collect()
    }
    b = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p9"])
        for r in kneser_ney_score(corpus.repartition(11), m2, s2).collect()
    }
    assert a == b
