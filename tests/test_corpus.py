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


def test_remove_near_duplicates(spark):
    """One survivor (min id) per near-dup cluster, uniques untouched —
    including the transitive A~B~C case pairwise dropping gets wrong."""
    from loan_etl_data_pipeline_spark.plans.corpus import remove_near_duplicates

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy stone bridge near the river"
    )
    v2 = base.replace("mossy stone", "mossy wooden")
    v3 = v2.replace("lazy dog", "lazy cat")  # near v2; A~B~C chain
    unique = (
        "quantum flux capacitors destabilize rapidly under intense gamma "
        "radiation unless shielded by layered boron carbide plating arrays"
    )
    df = spark.createDataFrame(
        [(1, base), (2, v2), (3, v3), (9, unique)], "doc_id long, text string"
    )
    for method in ("jaccard", "minhash"):
        out = sorted(
            r["doc_id"]
            for r in remove_near_duplicates(
                df, threshold=0.5, method=method
            ).collect()
        )
        assert out == [1, 9], f"{method}: got {out}"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        remove_near_duplicates(df, method="simhash")


def test_prepare_corpus_no_lang_filter(spark):
    df = spark.createDataFrame(
        [(3, "der hund und die katze sind das beste team in der stadt")],
        "doc_id long, text string",
    )
    assert prepare_corpus(df, langs=()).count() == 1


def test_prepare_corpus_v2_stage_semantics(spark):
    from loan_etl_data_pipeline_spark.plans.corpus import prepare_corpus_v2

    corpus = spark.createDataFrame(
        [
            # survives everything -> tiled + split
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            # contaminated: contains the eval doc's 5-gram verbatim
            (2, "the secret eval phrase is here inside of the training text"),
            # fails quality (too short)
            (3, "tiny doc"),
            # duplicate of 1 (exact) -> deduped away
            (4, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        ["doc_id", "text"],
    )
    evalset = spark.createDataFrame(
        [(100, "the secret eval phrase is here today")], ["doc_id", "text"]
    )
    out = prepare_corpus_v2(corpus, evalset, n_tiles=2, salt="t")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1}  # 2 contaminated, 3 junk, 4 duped
    r = rows[1]
    assert r["lang_pred"] == "en" and 1 <= r["tile"] <= 2
    assert r["split"] in ("train", "test")
    assert set(out.columns) == {
        "doc_id", "lang_pred", "n_words", "n_bpe_tokens",
        "bpe_per_word", "tile", "split",
    }

def test_prepare_corpus_v3_stage_semantics(spark):
    from loan_etl_data_pipeline_spark.plans.corpus import prepare_corpus_v3

    boiler = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa"
    )  # 16 distinct tokens -> 9 shared 8-grams -> one island of mass 16
    uniq20 = " ".join(f"word{i:02d}" for i in range(20))
    rows = [
        # mostly boilerplate: 16 dup + 2 unique = 18 toks, ratio .89 -> gated
        (1, boiler + " zebra yak", "s1"),
        # same boilerplate diluted: 36 toks, ratio 16/36 = .44 -> kept
        (2, boiler + " " + uniq20, "s1"),
        # fails the rule battery (too short) -> never reaches the span stage
        (3, "tiny doc", "s1"),
    ] + [
        # quota source: 3 clean unique docs, quota=2 -> exactly one dropped
        (10 + i, " ".join(f"stok{i}{j:02d}" for j in range(12)), "s2")
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["doc_id"]: r for r in prepare_corpus_v3(df, quota=2).collect()}
    assert 1 not in got  # span gate: 16/18 duplicated mass
    assert 3 not in got  # rule battery: min_tokens
    assert abs(got[2]["dup_ratio"] - 16 / 36) < 1e-12
    assert got[2]["n_toks"] == 36
    s2 = [d for d in got if d >= 10]
    assert len(s2) == 2  # per-source quota cap
    assert sorted(got[d]["pick_rank"] for d in s2) == [1, 2]


def test_vocab_richness_hand_spectrum(spark, tmp_path):
    """Chao1 and Good-Turing on a hand-built spectrum: tokens
    'a a a b b c d' per doc source S: freqs a=3, b=2, c=1, d=1 ->
    V=4, N=7, n1=2, n2=1, chao1 = 4 + 4//2 = 6, unseen = 2e9//7."""
    import pyspark.sql.functions as F  # noqa: F401

    from loan_etl_data_pipeline_spark.queries import all_queries

    docs = spark.createDataFrame(
        [(1, "S", "a a a b b c d")],
        "doc_id long, source string, text string",
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    # the query loads documents.parquet from sf_dir; point it at tmp
    out = all_queries()["q_vocab_richness"](spark, str(tmp_path)).collect()
    row = {r["source"]: r for r in out}["S"]
    assert (row["n_types"], row["n_tokens"]) == (4, 7)
    assert (row["n_singletons"], row["n_doubletons"]) == (2, 1)
    assert row["chao1_vocab_est"] == 6
    assert row["unseen_mass9"] == (2 * 10**9) // 7
    # no-doubleton branch: 'a a a b c' -> V=3, N=5, n1=2, n2=0,
    # bias-corrected chao1 = 3 + (2*1)//2 = 4
    docs2 = spark.createDataFrame(
        [(1, "T", "a a a b c")],
        "doc_id long, source string, text string",
    )
    p2 = tmp_path / "bc"
    p2.mkdir()
    docs2.write.parquet(str(p2 / "documents.parquet"))
    row2 = all_queries()["q_vocab_richness"](spark, str(p2)).collect()[0]
    assert row2["chao1_vocab_est"] == 4
