"""Unit tests for the round-2 text extensions: repetition stats,
token-window chunking, PII redaction, and n-gram decontamination —
edge semantics the sf0.001 oracle parity run can't reach (multi-line
documents, short docs, overlap reconstruction, min_hits)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.dedup import ngram_decontaminate
from loan_etl_data_pipeline_spark.operators.text import (
    chunk_documents,
    redact_pii,
    repetition_stats,
)


def test_repetition_multiline_dup_lines(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\ngamma"),  # 2 of 3 lines are dups
            (2, "one two three four"),  # single line, no dups
            (3, "spam spam spam spam"),  # one token repeated
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    assert got[1]["n_lines"] == 3
    assert got[1]["dup_line_frac"] == pytest.approx(2 / 3)
    assert got[2]["n_lines"] == 1
    assert got[2]["dup_line_frac"] == 0.0
    # doc 3: 4 tokens, all "spam" → top token frac 1.0, distinct 1/4,
    # top 2-gram "spam spam" occurs 3 times → covers 6/4 (can exceed 1
    # because occurrences overlap — documented, monotone signal)
    assert got[3]["top_token_frac"] == 1.0
    assert got[3]["distinct_token_frac"] == pytest.approx(1 / 4)
    assert got[3]["top_2gram_frac"] == pytest.approx(6 / 4)
    # whitespace-splitting ignores the newline boundary inside tokens:
    # doc 1 has 5 tokens, "alpha" twice
    assert got[1]["n_tokens"] == 5
    assert got[1]["top_token_frac"] == pytest.approx(2 / 5)


def test_repetition_blank_document_is_degenerate_zero(spark):
    """Whitespace-only text has zero non-empty lines; dup_line_frac is
    the documented 0.0, not NULL or an ANSI divide-by-zero error."""
    df = spark.createDataFrame(
        [(1, "\n  \n"), (2, "actual content here")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_lines"] == 0
    assert got[1]["dup_line_frac"] == 0.0
    assert got[2]["dup_line_frac"] == 0.0


def test_chunk_documents_reconstruction_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 2 over 10 tokens, last useful start = n - overlap - 1 = 7
    # → starts 0,2,4,6 → 4 chunks. Starts 8+ would be pure suffixes of
    # the start-6 chunk (fully redundant) and must NOT be emitted.
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"
    assert rows[-1]["chunk_text"] == "w6 w7 w8 w9"
    assert rows[-1]["chunk_tokens"] == 4
    # no chunk is contained in its predecessor
    for a, b in zip(rows, rows[1:]):
        assert not set(b["chunk_text"].split()) <= set(a["chunk_text"].split())
    # consecutive chunks agree on the overlap region
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"].split()[2:] == b["chunk_text"].split()[: len(
            a["chunk_text"].split()[2:]
        )]
    # every token is covered at least once, in order
    seen = []
    for r in rows:
        for w in r["chunk_text"].split():
            if not seen or w != seen[-1] and w not in seen:
                seen.append(w)
    assert seen == words


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id int, text string")
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, chunk_tokens=8).collect()
    }
    assert rows[(1, 0)]["chunk_text"] == "a b"
    assert rows[(1, 0)]["chunk_tokens"] == 2
    # empty text still yields exactly one (empty-ish) chunk row
    assert (2, 0) in rows and len(rows) == 2


def test_chunk_documents_validates_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_redact_pii_counts_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co and 10.0.0.1 and 555-123-4567 twice 555.123.4567"),
            (2, "clean text with version 1.2 and year 2024"),
            # the email's host must not be half-eaten by the IP pass
            (3, "u@191.168.1.10.example.com"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_ip"] == 1 and got[1]["n_phone"] == 2
    assert got[1]["text_redacted"] == "mail <EMAIL> and <IP> and <PHONE> twice <PHONE>"
    assert got[2]["n_email"] == 0 and got[2]["n_ip"] == 0 and got[2]["n_phone"] == 0
    assert got[2]["text_redacted"] == got[2]["text_redacted"]  # untouched shape
    assert got[3]["text_redacted"] == "<EMAIL>"


def test_decontaminate_min_hits_and_isolation(spark):
    train = spark.createDataFrame(
        [
            (10, "a b c d e f g h"),  # shares 5-grams with eval doc 1
            (11, "z y x w v u t s"),  # shares nothing
            (12, "a b c d e only"),  # exactly one shared 5-gram
        ],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id int, text string")

    hits = {r["doc_id"]: r["n_hits"] for r in ngram_decontaminate(train, ev, n=5).collect()}
    # doc 10: grams abcde,bcdef,cdefg,defgh all appear in eval → 4 hits
    assert hits == {10: 4, 12: 1}

    strict = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_decontaminate(train, ev, n=5, min_hits=2).collect()
    }
    assert strict == {10: 4}


def test_repeated_spans_planted_duplicate(spark):
    """Two docs share a 10-token run → each reports one span covering
    exactly that run (k=4 ⇒ positions p..p+6 covered, span ends +3)."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    df = spark.createDataFrame(
        [
            (1, "a1 a2 a3 " + shared + " a4 a5"),
            (2, "b1 b2 " + shared + " b3 b4 b5 b6"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"),
        ],
        "doc_id long, text string",
    )
    from loan_etl_data_pipeline_spark.operators.text import repeated_spans

    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
        for r in repeated_spans(df, k=4).collect()
    }
    # doc 1: shared run at tokens 4..13 → 4-gram starts 4..10 (7 grams)
    assert rows[1] == (4, 13, 7)
    # doc 2: shared run at tokens 3..12
    assert rows[2] == (3, 12, 7)
    assert 3 not in rows  # unique doc has no repeated span


def test_repeated_spans_merges_and_splits_islands(spark):
    """Two disjoint shared runs in one doc yield two spans, not one."""
    from loan_etl_data_pipeline_spark.operators.text import repeated_spans

    run_a, run_b = "p1 p2 p3 p4", "q1 q2 q3 q4"
    df = spark.createDataFrame(
        [
            (1, run_a + " z1 z2 z3 " + run_b),
            (2, run_a + " y1 y2 " + run_b),
        ],
        "doc_id long, text string",
    )
    out = repeated_spans(df, k=4).collect()
    doc1 = sorted(
        (r["span_start"], r["span_end"]) for r in out if r["doc_id"] == 1
    )
    assert doc1 == [(1, 4), (8, 11)]


def test_repeated_spans_within_doc_repeat_not_counted(spark):
    """doc_freq counts DISTINCT docs: a k-gram repeated only inside one
    document is not a cross-corpus duplicate."""
    from loan_etl_data_pipeline_spark.operators.text import repeated_spans

    df = spark.createDataFrame(
        [(1, "r1 r2 r3 r4 x1 x2 r1 r2 r3 r4"), (2, "u1 u2 u3 u4 u5")],
        "doc_id long, text string",
    )
    assert repeated_spans(df, k=4).count() == 0


def test_normalize_confusables_folds_homoglyphs(spark):
    from loan_etl_data_pipeline_spark.operators.text import (
        normalize_confusables,
    )

    df = spark.createDataFrame(
        [
            (1, "pаypаl аccount"),   # Cyrillic а
            (2, "paypal account"),   # pure ASCII twin
            (3, "сХу САse"),         # Cyrillic с Х у С sorted out, case kept
        ],
        ["id", "t"],
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", normalize_confusables("t").alias("n")
        ).collect()
    }
    assert got[1] == got[2] == "paypal account"
    assert got[3] == "cXy CAse"


# -------------------------------------------------- sentence segmentation


def test_split_sentences_planted(spark):
    from loan_etl_data_pipeline_spark.operators.text import split_sentences

    docs = spark.createDataFrame(
        [
            (1, "Hello there. How are you?  Fine!"),
            (2, "One sentence only"),
            (3, "Trailing terminator."),
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r["doc_id"], r["sent_no"], r["sentence"])
        for r in split_sentences(docs).collect()
    )
    assert got == [
        (1, 0, "Hello there."),
        (1, 1, "How are you?"),
        (1, 2, "Fine!"),
        (2, 0, "One sentence only"),
        (3, 0, "Trailing terminator."),
    ]


def test_duplicated_sentences_audit_and_removal(spark):
    from loan_etl_data_pipeline_spark.operators.text import (
        duplicated_sentences,
        split_sentences,
    )

    boiler = "Subscribe to our newsletter."
    docs = spark.createDataFrame(
        [
            (1, f"Real content one. {boiler}"),
            (2, f"{boiler} Real content two."),
            (3, f"Real content three. {boiler} {boiler}"),
            (4, "Nothing repeated here."),
        ],
        "doc_id bigint, text string",
    )
    dup = {
        r["sentence"]: (r["n_docs"], r["n_occurrences"])
        for r in duplicated_sentences(docs).collect()
    }
    assert dup == {boiler: (3, 4)}
    # the removal shape: anti-join sentences against the audit set
    kept = (
        split_sentences(docs)
        .join(
            duplicated_sentences(docs).select("sentence"),
            "sentence",
            "left_anti",
        )
        .collect()
    )
    assert sorted(r["sentence"] for r in kept) == [
        "Nothing repeated here.",
        "Real content one.",
        "Real content three.",
        "Real content two.",
    ]
