"""Text-analysis operators (EXT E4 — SURVEY.md §2 Part B).

Everything here is built-in-expression composition (JVM-side, codegen) —
no Python UDFs — so these run at scan speed on 100 TB of documents:
token statistics, quality heuristics, n-gram-free language ID via
stopword hits, and md5 document fingerprinting.

Cross-engine notes (the DuckDB oracles mirror these expressions):
- tokenization is ``split(trim(text), '\\s+')``;
- all ratio math is double division of exact ints — deterministic;
- fingerprints are md5 hex (identical output in Spark and DuckDB).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def _in_set(x: Column, words: tuple[str, ...]) -> Column:
    """``x IN (words...)`` as an OR-chain — usable inside HOF lambdas,
    where ``Column.isin`` raises NOT_ITERABLE on PySpark 4."""
    return functools.reduce(lambda a, b: a | b, [x == F.lit(w) for w in words])

#: stopword sets used by both quality scoring and language ID; kept tiny
#: and hardcoded so the SQL oracle can inline the identical lists.
STOPWORDS_EN = ("the", "and", "of", "to", "in", "a", "is")
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "que", "y"),
}


def tokens(text_col) -> Column:
    """Whitespace tokenization, the shared contract for all text ops."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(col), r"\s+")


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document size/token statistics (narrow projection, no shuffle)."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    return df.select(
        id_col,
        n_chars.cast("bigint").alias("n_chars_calc"),
        n_tokens.cast("bigint").alias("n_tokens"),
        (nonspace.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
    )


def text_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quality-heuristic ratios used for corpus filtering.

    All are cheap char-class counts over the scan; at 100 TB this is the
    classic "score then filter" first stage of a training-data pipeline.
    ``keep_cols`` pass through untouched so callers can filter on
    ``quality_flag`` without a join back to the source rows.
    """
    lower = F.lower(F.col(text_col))
    n_chars = F.length(lower)
    t = tokens(lower)
    n_tokens = F.size(t)
    n_alpha = F.length(F.regexp_replace(lower, r"[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(lower, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(lower, r"[a-z0-9\s]", ""))
    n_stop = F.size(F.filter(t, lambda x: _in_set(x, STOPWORDS_EN)))
    return df.select(
        id_col,
        *keep_cols,
        (n_alpha.cast("double") / n_chars.cast("double")).alias("alpha_ratio"),
        (n_digit.cast("double") / n_chars.cast("double")).alias("digit_ratio"),
        (n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        F.when(
            (n_tokens >= 5) & (n_alpha.cast("double") / n_chars.cast("double") > 0.5),
            F.lit("keep"),
        ).otherwise(F.lit("drop")).alias("quality_flag"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic stopword-hit language ID (n-gram-heuristic family).

    Scores each language by stopword hits in the token stream and picks
    the max with a fixed priority order (en > de > fr > es) so ties are
    deterministic; zero hits anywhere → 'unknown'. Pure expressions —
    the oracle inlines the same CASE.
    """
    # explode + conditional counts: stays in whole-stage codegen end to
    # end (array filter() HOFs are CodegenFallback — interpreted — and
    # CollapseProject re-evaluates the split per reference, ~12 regex
    # splits/row; measured 5×+ slower). Partial aggregation means the
    # shuffle carries (id, 4 ints) per doc per partition, not tokens.
    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    hit_aggs = [
        F.sum(F.when(F.col("tok").isin(*words), 1).otherwise(0))
        .cast("bigint")
        .alias(f"hits_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]
    hits = toks.groupBy(id_col).agg(*hit_aggs)
    h = {lang: F.col(f"hits_{lang}") for lang in LANG_STOPWORDS}
    pred = (
        F.when(
            (h["en"] >= F.greatest(h["de"], h["fr"], h["es"])) & (h["en"] > 0),
            F.lit("en"),
        )
        .when((h["de"] >= F.greatest(h["fr"], h["es"])) & (h["de"] > 0), F.lit("de"))
        .when((h["fr"] >= h["es"]) & (h["fr"] > 0), F.lit("fr"))
        .when(h["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return hits.select(
        id_col,
        pred.alias("lang_pred"),
        "hits_en",
        "hits_de",
        "hits_fr",
        "hits_es",
    )


#: BPE-ish pre-tokenization pattern (the GPT-2-family shape: apostrophe
#: contractions, space-prefixed letter runs, digit runs, punctuation
#: runs, whitespace runs). Alternation + char classes only, so Java
#: (Spark) and RE2 (DuckDB) segment identically — verified by test.
BPE_PATTERN = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9'\s]+|\s+"


def token_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Token counting two ways: whitespace words and BPE-ish segments.

    The segment count approximates LLM token cost far better than word
    count (digit runs, punctuation, and contractions segment apart);
    ``bpe_per_word`` is the classic corpus-quality signal (≫1.3 for
    English suggests noisy/code/numeric text). Both are single
    ``regexp_count`` expressions — codegen, no shuffle, scan speed.
    """
    lower = F.lower(F.col(text_col))
    n_words = F.size(tokens(lower))
    n_bpe = F.regexp_count(lower, F.lit(BPE_PATTERN))
    return df.select(
        id_col,
        *keep_cols,
        n_words.cast("bigint").alias("n_words"),
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        (n_bpe.cast("double") / n_words.cast("double")).alias("bpe_per_word"),
    )


def normalize_text(text_col) -> Column:
    """Canonical form for fingerprinting/dedup: lower, trim, collapse ws."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """md5 fingerprint of the normalized text + a 16-bit shard bucket.

    The bucket prefix is how you'd partition a 100 TB dedup: exact-dup
    candidates always share a bucket, so the heavy groupBy shuffles on a
    well-distributed short key.
    """
    fp = F.md5(normalize_text(text_col))
    return df.select(
        id_col,
        fp.alias("fp"),
        F.substring(fp, 1, 4).alias("fp_bucket"),
    )


def token_df_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-statistics quality signal: per-document token document-frequency.

    The two-stage stats-then-score shape every learned quality filter
    uses, kept in exact integer arithmetic so it stays oracle-checkable
    (a log-prob/perplexity variant is the same plan with a log() in the
    final projection — libm ulps differ across engines, so the oracled
    form sticks to ratios of exact ints):

    1. **stats pass** — document frequency of every distinct token
       (explode distinct tokens → groupBy token): one shuffle keyed on
       token; partial aggs absorb the "the"-style heavy hitters before
       the wire.
    2. **score pass** — postings re-join the DF table on token and
       aggregate per document. The DF table is vocabulary-sized —
       broadcast it when the vocab fits (typical), else AQE's skew
       split handles the hot tokens.

    Low ``mean_df`` / high ``rare_ratio`` flags gibberish and
    boilerplate-free noise; high ``mean_df`` flags templated text.
    Output: (id, n_distinct_tokens, sum_df, mean_df, rare_ratio).
    """
    p = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    dfreq = p.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    return (
        p.join(F.broadcast(dfreq), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_tokens"),
            F.sum("dfc").cast("bigint").alias("sum_df"),
            (F.sum("dfc").cast("double") / F.count(F.lit(1))).alias("mean_df"),
            (
                F.sum(F.when(F.col("dfc") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("rare_ratio"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher-style repetition signals for corpus filtering.

    Per document: fraction of tokens that are the single most common
    token (``top_token_frac``), fraction covered by the most frequent
    word 2-gram (``top_2gram_frac``), distinct-token fraction, and the
    duplicate-line fraction over ``line_sep``-separated lines
    (degenerate 0.0 for single-line documents). High values flag
    boilerplate, keyword stuffing, and template spam — the classic
    repetition cut of the Gopher/MassiveText quality rules.

    Plan shape (the at-scale answer): explode tokens / 2-grams /
    lines, count per (doc, unit), then a per-doc max+sum rollup —
    three explode→partial-agg chains, every shuffle keyed by (doc,
    unit) then doc, so heavy hitters collapse map-side before the
    wire. No Python, no HOF lambdas (array filter()/aggregate() HOFs
    are CodegenFallback — interpreted — and O(n²) per doc for mode
    counting; measured slower at every scale that matters). Only
    counts and fractions are output — never the argmax unit itself,
    which would be tie-unstable across engines.
    """
    from pyspark.ml.feature import NGram

    lower = F.lower(F.col(text_col))
    base = df.select(F.col(id_col), tokens(lower).alias("toks"), lower.alias("__txt"))

    tok_rows = base.select(id_col, F.explode("toks").alias("u"))
    tok_counts = tok_rows.groupBy(id_col, "u").agg(F.count(F.lit(1)).alias("c"))
    per_doc_tok = tok_counts.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_tokens"),
        F.max("c").cast("bigint").alias("top_token_cnt"),
    )

    grams = NGram(n=2, inputCol="toks", outputCol="grams").transform(base)
    gram_rows = grams.select(id_col, F.explode_outer("grams").alias("u"))
    gram_counts = gram_rows.groupBy(id_col, "u").agg(
        F.count(F.when(F.col("u").isNotNull(), 1)).alias("c")
    )
    per_doc_gram = gram_counts.groupBy(id_col).agg(
        F.max("c").cast("bigint").alias("top_2gram_cnt")
    )

    lines = base.select(
        id_col,
        F.explode(F.split("__txt", line_sep, -1)).alias("u"),
    ).filter(F.length(F.trim("u")) > 0)
    line_counts = lines.groupBy(id_col, "u").agg(F.count(F.lit(1)).alias("c"))
    per_doc_line = line_counts.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("dup_line_cnt"),
    )

    nt = F.col("n_tokens").cast("double")
    return (
        per_doc_tok.join(per_doc_gram, id_col, "left")
        .join(per_doc_line, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_distinct_tokens",
            (F.col("n_distinct_tokens").cast("double") / nt).alias("distinct_token_frac"),
            (F.col("top_token_cnt").cast("double") / nt).alias("top_token_frac"),
            (
                F.coalesce(F.col("top_2gram_cnt"), F.lit(0)).cast("double") * 2.0 / nt
            ).alias("top_2gram_frac"),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
            # guard the 0-line case (empty / whitespace-only text): the
            # raw 0/0 would be a DIVIDE_BY_ZERO error under ANSI mode,
            # and the documented degenerate value is 0.0.
            F.when(
                F.coalesce(F.col("n_lines"), F.lit(0)) > 0,
                F.coalesce(F.col("dup_line_cnt"), F.lit(0)).cast("double")
                / F.col("n_lines").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_line_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 128,
    overlap: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into overlapping token-window chunks.

    The pre-training / RAG chunker: token window of ``chunk_tokens``
    sliding by ``chunk_tokens - overlap``. Emits one row per chunk with
    a 0-based ``chunk_idx``, the chunk text (tokens re-joined with a
    single space), and its token count; the final chunk may be short.

    Plan shape: tokenize once, ``explode(sequence(...))`` over chunk
    START offsets, then ``slice`` + ``array_join`` on the exploded
    row. sequence/explode/slice are all codegen expressions — no HOF
    lambda (a transform() over starts would fall back to interpreted
    eval), no shuffle at all: chunking is a pure per-row flatMap, so
    at 100 TB it runs entirely inside the scan stage.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col), *keep_cols, tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    # last useful start is n - overlap - 1: a chunk starting at
    # s >= n - overlap covers only tokens already covered by the
    # previous chunk (pure suffix → redundant). greatest(..., 0) keeps
    # the mandatory first chunk for docs shorter than the overlap.
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice("__toks", F.col("__start") + 1, chunk_tokens)
    return (
        base.select(id_col, *keep_cols, "__toks", F.explode(starts).alias("__start"))
        .select(
            id_col,
            *keep_cols,
            (F.col("__start") / stride).cast("bigint").alias("chunk_idx"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("bigint").alias("chunk_tokens"),
        )
    )


#: Redaction patterns, applied in order. Alternation + char classes
#: only — no backreferences or lookaround — so Java (Spark) and RE2
#: (DuckDB) match identically; the email pattern must run before the
#: bare-IP pattern so the host part of an address is never half-eaten.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Redact email / IPv4 / phone-shaped spans, with per-kind counts.

    The standard pre-training scrub pass: each pattern is counted
    (``regexp_count``) then replaced with its placeholder, all as
    chained codegen expressions over the scan — no shuffle, no Python.
    Counts are computed on the ORIGINAL text so an earlier replacement
    can't hide a later pattern's span; replacement chains in the
    declared order on the text itself.
    """
    src = F.col(text_col)
    counts = [
        F.regexp_count(src, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = src
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(id_col, *keep_cols, red.alias("text_redacted"), *counts)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    w: int = 4,
    parallelism: int | None = None,
) -> DataFrame:
    """(id, fp): the winnowing fingerprint set of each document
    (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting" — the MOSS algorithm).

    ``parallelism``: optional round-robin fan-out BEFORE the hashing
    projection. Input-split sizing is byte-oriented, but this operator
    is compute-dense per byte (~L md5s per doc) — a corpus small
    enough to arrive as one split runs single-threaded without this
    (measured 6.7 s → 1.4 s at 32× on 5 k docs). At real scale the
    scan has natural split parallelism; leave it None.

    Per document: hash every ``k``-char gram, slide a window of ``w``
    consecutive gram hashes, keep the minimum of each window, emit the
    DISTINCT selected hashes. Guarantee: any shared substring of length
    ≥ k+w-1 between two documents shares at least one fingerprint, so
    a postings join on ``fp`` finds every such overlap — the
    plagiarism/near-dup primitive that n-gram Jaccard approximates.

    The gram hash is the first 48 bits of md5 (same formula as
    functions/splits.py md5_coord48, so any ANSI engine reproduces it:
    ``('0x' || substr(md5(gram),1,12))::BIGINT``). Selecting the
    window-min VALUE set (not positions) makes the min's tie-break
    irrelevant — exact integer MIN is engine- and order-independent.

    Scale: the whole computation is ONE narrow projection — gram
    hashes, window minima, and per-doc dedup all happen inside array
    expressions on the document's own row (no explode-then-window, no
    shuffle at all until a downstream agg/join). 100 TB of documents
    fingerprint at scan speed.

    Documents shorter than k+w-1 chars have no full window and emit
    nothing (documented contract, mirrored in oracles).
    """
    t = F.col(text_col)
    n_grams = (F.length(t) - F.lit(k - 1)).cast("int")
    # Both sequence() calls are guarded with when(): Spark does NOT
    # promise a Filter protects a Project's expressions from evaluating
    # on excluded rows (the optimizer reorders deterministic projections
    # freely), and sequence(a, b) with a > b counts DOWN — a short doc
    # reaching the expression unguarded is a slice(start=0) crash, not
    # an empty result.
    gram_hashes = F.transform(
        F.when(F.length(t) >= k, F.sequence(F.lit(1), n_grams)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(t, i, F.lit(k))), 1, 12), 16, 10
        ).cast("long"),
    )

    def _window_mins(gh):
        # gh is a HOF lambda VARIABLE (not a named column): CollapseProject
        # would inline a `withColumn("_gh", ...)` into every slice() below
        # and re-evaluate the full md5 array PER WINDOW — O(L²) hashing,
        # measured 93 s for sf0.01 documents vs <1 s with this let-binding
        # (the outer transform over a 1-element array evaluates the hash
        # array exactly once per row).
        return F.array_distinct(
            F.transform(
                # 1-based END position of each full window of w hashes
                F.when(F.size(gh) >= w, F.sequence(F.lit(w), F.size(gh))).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda e: F.array_min(F.slice(gh, e - F.lit(w - 1), w)),
            )
        )

    fps = F.flatten(F.transform(F.array(gram_hashes), _window_mins))
    narrowed = df.filter(F.length(t) >= k + w - 1).select(id_col, text_col)
    if parallelism:
        narrowed = narrowed.repartition(parallelism)
    return narrowed.select(F.col(id_col), F.explode(fps).alias("fp"))


def winnow_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    w: int = 4,
    max_df: int = 20,
    min_shared: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — the MOSS overlap-detection join.
    ``parallelism`` fans out the fingerprinting stage (see
    :func:`winnow_fingerprints`).

    Postings self-join on ``fp`` after dropping *stop fingerprints*
    (fps present in more than ``max_df`` documents — boilerplate
    grams): the standard winnowing practice, and the skew guard that
    bounds the join. Candidate volume is Σ_fp df(fp)² with df ≤
    ``max_df``, i.e. ≤ max_df · |postings| — linear in corpus size, so
    the pair generation can never go quadratic no matter how common a
    gram is. The winnowing theorem makes recall exact for overlaps of
    length ≥ k+w-1 whose fingerprints survive the df cap.

    Postings shuffle on ``fp`` (the df-count Exchange is reused by the
    semi-join and the post-join collect runs partition-local on the
    same partitioning) + the pair-count groupBy on (id_a, id_b); both
    aggregations partial map-side.
    """
    fps = winnow_fingerprints(
        df, id_col, text_col, k=k, w=w, parallelism=parallelism
    )
    # Two-pass stop-fingerprint drop: the df COUNT first (constant-size
    # aggregation buffers), the posting-list collect only AFTER the
    # semi-join against surviving fps. Collecting ids before the df
    # filter would materialize one array per fingerprint with NO bound —
    # a boilerplate gram in 10M docs is an ~80 MB single aggregation
    # row, the exact skew this operator promises to be immune to. After
    # the semi-join every list is ≤ max_df elements by construction.
    keep_fp = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    rare = (
        fps.join(keep_fp, "fp")
        .groupBy("fp")
        .agg(F.collect_list(id_col).alias("ids"))
    )
    pairs = rare.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda a: F.transform(
                            "ids", lambda b: F.struct(a.alias("a"), b.alias("b"))
                        ),
                    )
                ),
                lambda p: p["a"] < p["b"],
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Maximal cross-document repeated token spans (suffix-array-style
    substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" re-expressed relationally).

    A position ``i`` in a document is *covered* when the ``k``-gram
    starting there occurs in at least ``min_doc_freq`` distinct
    documents. Runs of consecutive covered positions merge into maximal
    spans (gaps-and-islands: ``pos - row_number()`` is constant within
    a run), so the output is one row per repeated region —
    ``(doc_id, span_start, span_end, n_grams)`` in 1-based token
    coordinates, ``span_end = max(pos) + k - 1`` — exactly the byte
    ranges a substring-level deduper would cut.

    Scale shape: gram doc-frequency is a postings aggregate with
    map-side partial aggregation; the covered-position join is keyed on
    the gram string (never all-pairs); island merging is a per-document
    window whose partitions are bounded by document length. Nothing
    here is quadratic in corpus size — the same plan at 100 TB shuffles
    once on grams and once on doc ids.
    """
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= k
    )
    gram = F.concat_ws(
        " ", *[F.element_at("__t", F.col("__i") + F.lit(j)) for j in range(k)]
    )
    grams = (
        base.select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.size("__t") - (k - 1))).alias(
                "__i"
            ),
            "__t",
        )
        .select(id_col, F.col("__i").alias("pos"), gram.alias("g"))
    )
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_doc_freq)
        .select("g")
    )
    hits = grams.join(dup, "g").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        )
        .drop("grp")
    )


def llr_collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k adjacent bigrams by Dunning's log-likelihood ratio (G²).

    Margins derive from the bigram counts themselves (c1=Σ_b c12,
    c2=Σ_a c12) so the 2×2 contingency is exactly consistent; each
    k·ln(k·N/(R·C)) term takes an exact-int rational ln argument and is
    1e-10-floor-quantized, and ranking happens on the quantized INTEGER
    with a (w1, w2) tie-break — deterministic top-k on any engine or
    partitioning. Bigrams are emitted row-locally (zero shuffle);
    margin re-joins key on the aggregated vocab. Int64 bound: k·N <
    2^63 needs N ≲ 3e9 bigrams per slice; beyond that compute the ln
    argument as (k/N)/((R/N)(C/N)) in doubles.
    """
    t = tokens(F.lower(F.col(text_col)))
    bi = (
        df.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i ->"
                    " struct(element_at(t, i) AS w1,"
                    " element_at(t, i + 1) AS w2))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    c12 = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = c12.agg(F.sum("c12").alias("n"))
    j = (
        c12.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
    )
    k11 = F.col("c12")
    k12 = F.col("c1") - F.col("c12")
    k21 = F.col("c2") - F.col("c12")
    k22 = F.col("n") - F.col("c1") - F.col("c2") + F.col("c12")
    nn = F.col("n")

    def term(kk, r, c):
        # kk · ln(kk·N / (R·C)), quantized; 0·ln(0)=0 by the kk>0 guard
        q = F.floor(
            kk.cast("double")
            * F.log((kk * nn).cast("double") / (r * c).cast("double"))
            * F.lit(1e10)
        ).cast("bigint")
        return F.when(kk > 0, q).otherwise(F.lit(0))

    llr_q = (
        term(k11, F.col("c1"), F.col("c2"))
        + term(k12, F.col("c1"), nn - F.col("c2"))
        + term(k21, nn - F.col("c1"), F.col("c2"))
        + term(k22, nn - F.col("c1"), nn - F.col("c2"))
    )
    return (
        j.select("w1", "w2", "c12", "c1", "c2", llr_q.alias("llr_q"))
        .orderBy(F.desc("llr_q"), F.asc("w1"), F.asc("w2"))
        .limit(k)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            (F.col("llr_q").cast("double") * 2 / 1e10).alias("llr"),
        )
    )


def burrows_delta(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    top_k: int = 30,
) -> DataFrame:
    """Pairwise Burrows' Delta style distance between groups.

    Z-scores each group's relative frequency of the corpus's ``top_k``
    most frequent tokens against the across-group distribution;
    Delta(a,b) = mean |z_a − z_b| over the markers. All-integer until
    the final z: frequencies are (1e6·c) div T quantized rationals,
    z numerators/variances exact int64, zero-variance markers z=0,
    |Δz| 1e-9-floor-quantized before the per-pair mean — deterministic
    on any engine/partitioning. Everything after the one token-count
    agg operates on ≤ |groups|·top_k rows.
    """
    t = df.select(
        F.col(group_col).alias("source"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    cst = t.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ts = cst.groupBy("source").agg(F.sum("c").alias("t"))
    top = (
        cst.groupBy("tok")
        .agg(F.sum("c").alias("ct"))
        .orderBy(F.desc("ct"), F.asc("tok"))
        .limit(top_k)
        .select("tok")
    )
    grid = (
        ts.crossJoin(F.broadcast(top))
        .join(cst, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr("(coalesce(c, 0) * 1000000) div t").alias("q"),
        )
    )
    stats = grid.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    z = grid.join(stats, "tok").select(
        "source",
        "tok",
        F.when(
            F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq") == 0,
            F.lit(0.0),
        )
        .otherwise(
            (F.col("n") * F.col("q") - F.col("sq")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq"))
                .cast("double")
            )
        )
        .alias("z"),
    )
    a = z.select(F.col("source").alias("s1"), "tok", F.col("z").alias("z1"))
    b = z.select(F.col("source").alias("s2"), "tok", F.col("z").alias("z2"))
    pairs = a.join(b, "tok").filter(F.col("s1") < F.col("s2"))
    return (
        pairs.groupBy("s1", "s2")
        .agg(
            F.sum(
                F.floor(F.abs(F.col("z1") - F.col("z2")) * F.lit(1e9)).cast(
                    "bigint"
                )
            ).alias("dq"),
            F.count(F.lit(1)).cast("bigint").alias("n_markers"),
        )
        .select(
            "s1",
            "s2",
            "n_markers",
            (
                F.col("dq").cast("double")
                / F.col("n_markers").cast("double")
                / 1e9
            ).alias("delta"),
        )
    )


RAKE_STOPWORDS = ("the", "and", "of", "to", "in", "a", "is")


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    k: int = 20,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases =
    maximal stopword-free token runs; word score = degree/frequency
    (degree = Σ lengths of phrases containing the word); phrase score
    = Σ member word scores. The zero-model keyphrase extractor corpus
    pipelines run before anything learned.

    Determinism: word scores are (1e6·deg) div freq integer rationals,
    phrase scores exact int sums, top-k ranked on the quantized int
    with a phrase tie-break. Segment ids come from one per-doc window
    (running stopword count); everything downstream is
    aggregated-vocab-sized. Scale: one doc-keyed window + two
    partial+final aggs; no raw-occurrence joins.
    """
    from pyspark.sql import Window

    tk = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    ).withColumn("stop", F.col("tok").isin(*stopwords))
    w = Window.partitionBy("doc").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seg = tk.withColumn("seg", F.sum(F.col("stop").cast("int")).over(w))
    words = seg.filter(~F.col("stop")).select("doc", "seg", "pos", "tok")
    phrases = words.groupBy("doc", "seg").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("plen"),
    )
    wp = phrases.select(
        "doc", "seg", "phrase", "plen",
        F.explode(F.split("phrase", " ")).alias("tok"),
    )
    wstats = wp.groupBy("tok").agg(
        F.sum("plen").alias("deg"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
    ).withColumn("wq", F.expr("(deg * 1000000) div freq"))
    pscore = (
        wp.join(wstats.select("tok", "wq"), "tok")
        .groupBy("doc", "seg", "phrase")
        .agg(F.sum("wq").alias("pq"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.min("pq").alias("pq"),
        )
        .orderBy(F.desc("pq"), F.asc("phrase"))
        .limit(k)
        .select(
            "phrase",
            "n_occ",
            (F.col("pq").cast("double") / 1e6).alias("score"),
        )
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    level: int = 6,
) -> DataFrame:
    """Per-document deflate compression ratio — the Gopher-style
    low-entropy screen: templated/repetitive text compresses far below
    natural prose, and the ratio needs no model, no vocabulary, no
    corpus pass. Runs as an Arrow `mapInPandas` kernel (zlib is pure
    per-row CPU — the one legitimate Python tier, batched, never
    row-at-a-time), so it is partitioning-invariant and linear-scan
    shaped; no shuffle at all.

    Output: (id, n_bytes, n_compressed, ratio). Registered rows-only
    (no SQL engine can replay zlib); the semantic contract is pinned by
    tests instead: repetitive ≪ varied ratio, byte counts exact,
    partitioning invariance.
    """
    import pandas as pd  # noqa: F401

    out_schema = (
        f"{id_col} bigint, n_bytes bigint, n_compressed bigint, ratio double"
    )
    src = df.select(id_col, text_col)

    def kernel(batches):
        import zlib

        for pdf in batches:
            enc = pdf[text_col].fillna("").str.encode("utf-8")
            nb = enc.str.len().astype("int64")
            nc = enc.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio": nc.astype("float64")
                    / nb.where(nb > 0, 1).astype("float64"),
                }
            )

    return src.mapInPandas(kernel, out_schema)


#: Latin-lookalike map: Cyrillic homoglyphs + fullwidth forms that spam
#: uses to slip past exact-match dedup. Kept as one (from, to) pair so
#: the DuckDB oracles can inline the identical translate() arguments.
CONFUSABLES_FROM = "аеорсхуАЕОРСХУ"
CONFUSABLES_TO = "aeopcxyAEOPCXY"


def normalize_confusables(text_col) -> Column:
    """Fold Unicode confusables (Cyrillic lookalikes, fullwidth forms)
    to their ASCII skeletons — the pre-fingerprint normalization that
    catches homoglyph spam: a document with Latin 'a' swapped for
    Cyrillic 'а' is byte-distinct (every exact fingerprint misses it)
    but reads identically. One codegen translate(); compose BEFORE
    dedup_by_fingerprint's whitespace normalization."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.translate(col, CONFUSABLES_FROM, CONFUSABLES_TO)


def split_sentences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sentence segmentation: one row per sentence with its 0-based
    position — the unit C4-style curation dedups at (repeated
    boilerplate sentences across pages are THE dominant web-corpus
    noise; Raffel et al. 2020 dropped any three-sentence span seen
    twice). Rule: a sentence ends at `.`, `!` or `?` followed by
    whitespace.

    Engine-portable without regex lookbehind (RE2, DuckDB's engine,
    has none): regexp_replace '([.!?])\\s+' -> terminator + \\x01
    sentinel (each engine's own backreference syntax, same output
    bytes), then split on the sentinel. Pure codegen — zero shuffles;
    the explode multiplies rows by sentences-per-doc, the one
    working-set number to size for (SCALE.md §5).

    Output: (id, sent_no int, sentence string), whitespace-trimmed,
    empty sentences dropped.
    """
    col = F.col(text_col)
    marked = F.regexp_replace(col, r"([.!?])\s+", "$1\x01")
    sent = F.posexplode(F.split(marked, "\x01"))
    return (
        df.select(F.col(id_col), sent.alias("sent_no", "sentence"))
        .withColumn("sentence", F.trim(F.col("sentence")))
        .filter(F.length("sentence") > 0)
        .select(
            id_col, F.col("sent_no").cast("int").alias("sent_no"), "sentence"
        )
    )


def duplicated_sentences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cross-document repeated sentences: every distinct sentence that
    appears in 2+ documents, with how many docs and total occurrences
    — the audit BEFORE cutting (run the removal as an anti-join of
    split_sentences against this set). One sentence-keyed shuffle;
    boilerplate skew (one sentence in millions of docs) is bounded
    because the partial aggregate collapses per-partition counts
    before the exchange.

    Output: (sentence, n_docs, n_occurrences).
    """
    s = split_sentences(df, id_col, text_col)
    return (
        s.groupBy("sentence")
        .agg(
            F.countDistinct(id_col).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def tag_keywords(
    df: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gazetteer / dictionary tagging — match a fixed phrase list
    (1- and 2-token phrases) against every document and count exact
    occurrences per (document, phrase): the distributed form of the
    Aho–Corasick / FlashText pass every curation pipeline runs for
    topic tags, blocklists, and PII gazetteers.

    Spark-first shape: token positions explode ONCE; unigram phrases
    hash-join the position stream on the token, bigram phrases join on
    their FIRST token and verify the successor via a co-partitioned
    (id, pos+1) self-join — so dictionary size scales the broadcast
    side only, never the number of passes over the corpus (the naive
    per-phrase LIKE scan is |dict| full scans).

    Output: (id_col, phrase, n_hits), hits > 0 only.

    Scale: positions shuffle once on token for the unigram/first-token
    probe; the bigram verify joins on (id, pos) — co-partitioned with
    itself; dictionary is broadcast.  Overlapping matches count per
    start position (standard gazetteer semantics).
    """
    spark = df.sparkSession
    parts = [p.split() for p in phrases]
    if any(len(p) not in (1, 2) for p in parts):
        raise ValueError("tag_keywords supports 1- and 2-token phrases")
    dict_rows = [
        (" ".join(p), p[0], p[1] if len(p) == 2 else None) for p in parts
    ]
    from loan_etl_data_pipeline_spark.functions.localframe import values_frame

    d = values_frame(
        spark, dict_rows, "phrase string, tok1 string, tok2 string"
    )
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    uni = (
        pos.join(
            F.broadcast(d.filter(F.col("tok2").isNull())),
            pos.tok == F.col("tok1"),
        )
        .groupBy("id", "phrase")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    firsts = pos.join(
        F.broadcast(d.filter(F.col("tok2").isNotNull())),
        pos.tok == F.col("tok1"),
    ).select("id", "pos", "phrase", "tok2")
    nxt = pos.select(
        F.col("id").alias("id2"),
        (F.col("pos") - 1).alias("ppos"),
        F.col("tok").alias("ntok"),
    )
    bi = (
        firsts.join(
            nxt,
            (F.col("id") == F.col("id2"))
            & (F.col("pos") == F.col("ppos"))
            & (F.col("tok2") == F.col("ntok")),
        )
        .groupBy("id", "phrase")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return uni.unionByName(bi).select(
        F.col("id").alias(id_col), "phrase", "n_hits"
    )
