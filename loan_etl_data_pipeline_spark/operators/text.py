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

from pyspark.sql import Column, DataFrame
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
