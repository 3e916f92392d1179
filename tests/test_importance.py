"""dsir_select (operators/importance.py): exact hashed-bigram
importance selection — ranking sanity, featureless exclusion,
determinism. Value-parity vs DuckDB rides test_oracle_parity
(q_dsir_select has a full oracle)."""

from __future__ import annotations

from loan_etl_data_pipeline_spark.operators.importance import dsir_select


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_outrank_unlike(spark):
    target = _docs(
        spark,
        [(100, "alpha beta gamma alpha beta"), (101, "alpha beta delta")],
    )
    raw = _docs(
        spark,
        [
            (1, "alpha beta gamma"),  # shares target bigrams
            (2, "zz yy xx"),  # disjoint vocabulary (2 smoothed-weight grams)
            (3, "alpha beta alpha beta"),  # most target-like
        ],
    )
    rows = dsir_select(raw, target, top_n=3).collect()
    order = [r["doc_id"] for r in rows]
    assert order[0] == 3 and order[-1] == 2
    assert [r["rank"] for r in rows] == [1, 2, 3]
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[3] > scores[1] > scores[2]


def test_featureless_docs_excluded(spark):
    target = _docs(spark, [(100, "a b c")])
    raw = _docs(spark, [(1, "a b"), (2, "single")])
    got = {r["doc_id"] for r in dsir_select(raw, target, top_n=10).collect()}
    assert got == {1}  # doc 2 has <2 tokens: no features, not eligible


def test_deterministic_across_runs(spark):
    target = _docs(spark, [(100, "p q r s")])
    raw = _docs(
        spark, [(i, f"p q tok{i} r s tok{i*7%5}") for i in range(30)]
    )
    a = dsir_select(raw, target, top_n=10).collect()
    b = dsir_select(raw, target, top_n=10).collect()
    assert a == b


def test_validates_args(spark):
    import pytest

    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        dsir_select(d, d, top_n=0)
    with pytest.raises(ValueError):
        dsir_select(d, d, top_n=1, bucket_hex=0)
