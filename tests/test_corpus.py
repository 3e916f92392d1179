"""prepare_corpus (plans/corpus.py): stage semantics on a hand-built corpus.

The sf-scale cross-engine check is q_corpus_prep (tests/test_oracle_parity.py);
here we pin which documents survive and why.
"""

from __future__ import annotations

from loan_etl_data_pipeline_spark.plans.corpus import prepare_corpus


def test_prepare_corpus_stages(spark):
    df = spark.createDataFrame(
        [
            # survives: english, unique, good quality
            (1, "the quick brown fox jumps over the lazy dog and the cat"),
            # exact dup of 1 after normalization -> deduped (higher id loses)
            (2, "  THE quick   brown fox jumps over the lazy dog and the cat "),
            # german -> dropped by lang filter
            (3, "der hund und die katze sind das beste team in der stadt"),
            # too short -> dropped by quality filter
            (4, "tiny text"),
            # digit soup -> fails alpha ratio
            (5, "12345 67890 11111 22222 33333 44444 55555"),
            # survives: second unique english doc
            (6, "a river runs through the green valley and into the sea"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in prepare_corpus(df).collect()}
    assert sorted(out) == [1, 6]
    assert out[1]["lang_pred"] == "en"
    assert out[1]["n_words"] == 12
    assert out[6]["n_bpe_tokens"] >= out[6]["n_words"]  # BPE segments >= words


def test_prepare_corpus_no_lang_filter(spark):
    df = spark.createDataFrame(
        [(3, "der hund und die katze sind das beste team in der stadt")],
        "doc_id long, text string",
    )
    assert prepare_corpus(df, langs=()).count() == 1
