"""Corpus n-gram language-model scoring: the CCNet/KenLM-style quality
signal, Spark-native.

Production curation pipelines (CCNet, RefinedWeb, FineWeb) score every
document with a small language model trained on a trusted corpus and
keep the low-perplexity tail. The model here is a bigram conditional
model with add-one smoothing — small enough to train inside the engine,
faithful to the shape of the real thing: a (context, next-token) count
table plus a vocabulary size.

Cross-engine exactness: probabilities are quantized to integers at the
moment of creation — ``p9 = ((c12 + 1) * 1e9) div (c1 + V)`` is pure
int64 arithmetic, so per-document SUMS of p9 are exact under any
partitioning and any engine, and only the final mean divides (one
float op). A float log-prob sum would re-associate per partition and
could never be oracle-checked; callers who want perplexity apply
``-ln(mean_p)`` to the returned exact mean themselves.

Scale: training is two chained aggregates over the exploded bigram
stream (the (w1, w2) count table, then its (w1) marginal — the second
agg reads the first's output, never the corpus). Scoring joins the
per-document bigram stream against the model on the (w1, w2) key — an
equality shuffle join on both sides' natural key; the model is NOT
broadcast because a real vocabulary² table can be arbitrarily large.
No Python row functions anywhere — tokenize/slice/zip/explode are all
codegen expressions.

There is no LM / perplexity scoring anywhere in the reference (its
entire engine is airflow/dags/etl/pyspark_etl.py — 71 lines of
null-fill + timestamp split); this is EXT surface per SURVEY.md §2
Part B (E4 text analysis family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from loan_etl_data_pipeline_spark.operators.text import tokens

_P_SCALE = 10**9


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE (multiplicity kept;
    a repeated bigram scores every time, as in a real LM). Lowercased
    whitespace tokens via the shared corpus-wide tokenization contract
    (operators/text.py tokens() — not re-implemented here, so LM vocab
    can never drift from what the other text operators produce)."""
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"),
        F.slice(toks, 2, n - 1).alias("w2"),
    )
    return (
        df.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("bg"))
        .select("__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_lm_train(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train the bigram model: returns (model, vocab_size_df).

    model     = (w1, w2, c12, c1): bigram count and its context
                marginal — c1 is derived from the c12 aggregate
                (groupBy w1 over it), NOT a second corpus scan.
    vocab_df  = 1-row (v: bigint) distinct-token count, the smoothing
                denominator's V. Kept as a DataFrame so callers can
                cross-join it without collecting.
    """
    bg = _bigrams(df, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy(F.col("w1").alias("m_w1")).agg(F.sum("c12").alias("c1"))
    model = c12.join(c1, c12.w1 == c1.m_w1).select("w1", "w2", "c12", "c1")
    tok = F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    vocab_df = (
        df.select(tok).agg(F.count_distinct(F.col("tok")).cast("bigint").alias("v"))
    )
    return model, vocab_df


def bigram_lm_score(
    docs: DataFrame,
    model: DataFrame,
    vocab_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained model: (id_col, n_bigrams,
    sum_p9, mean_p9) where per-bigram
    ``p9 = ((c12 + 1) * 1e9) div (c1 + V)`` (add-one smoothing,
    quantized at 1e-9) and mean_p9 = sum_p9 / n_bigrams as double.

    Documents with < 2 tokens have no bigrams: they surface with
    n_bigrams = 0 and NULL mean (a left join from the full doc set —
    silently dropping them would misread as "filtered by quality").
    Unseen bigrams get the smoothed floor ((0+1)·1e9) div (c1+V), and
    unseen contexts (c1 NULL after the left model join) degrade to
    1e9 div V — the uniform prior.
    """
    bg = _bigrams(docs, id_col, text_col)
    # the context marginal joins on w1 ALONE — an unseen bigram whose
    # context IS known must still see c1 (riding c1 on the (w1, w2)
    # model row would silently fall back to the uniform prior)
    contexts = model.groupBy("w1").agg(F.max("c1").alias("c1"))
    scored = (
        bg.join(model.select("w1", "w2", "c12"), ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab_df))
        .select(
            "__id",
            F.expr(
                f"((coalesce(c12, 0L) + 1L) * {_P_SCALE}L)"
                " div (coalesce(c1, 0L) + v)"
            ).alias("p9"),
        )
    )
    per_doc = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("p9").alias("sum_p9")
    )
    ids = docs.select(F.col(id_col).alias("__id")).distinct()
    return (
        ids.join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("sum_p9"), F.lit(0)).cast("bigint").alias("sum_p9"),
            (F.col("sum_p9").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "mean_p9"
            ),
        )
    )


def kneser_ney_train(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train an interpolated Kneser–Ney bigram model (absolute discount
    D = 3/4) — the smoothing the real perplexity filters use (KenLM is
    modified KN; add-one over-penalizes frequent contexts with big
    vocabularies).

    Returns (model, stats):

    model = (w1, w2, c12): the bigram count table — the ONLY corpus-
            shaped state. Context marginals (c1 = Σ_w2 c12,
            n1p = N₁₊(w1·)) and the continuation counts
            (ncont = N₁₊(·w2)) are derived from it by the scorer,
            never by a second corpus scan.
    stats = 1 row (nct, v): total bigram TYPES N₁₊(··) and the unigram
            vocabulary size — the continuation distribution's add-one
            smoothing denominator (raw KN gives unseen words zero
            mass; a filter must rank them, not crash on them).
    """
    bg = _bigrams(df, id_col, text_col)
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    tok = F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    stats = (
        df.select(tok)
        .agg(F.count_distinct(F.col("tok")).cast("bigint").alias("v"))
        .crossJoin(
            F.broadcast(
                model.agg(F.count(F.lit(1)).cast("bigint").alias("nct"))
            )
        )
    )
    return model, stats


def kneser_ney_score(
    docs: DataFrame,
    model: DataFrame,
    stats: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under interpolated Kneser–Ney with D = 3/4,
    quantized to integers at creation so the whole train→score
    pipeline is value-exact under any partitioning (same contract as
    ``bigram_lm_score``):

        P_KN(w2|w1) = (max(c12 − D, 0) + D·N₁₊(w1·)·P_cont(w2)) / c1
        P_cont(w2)  = (N₁₊(·w2) + 1) / (N₁₊(··) + V)

    With D = 3/4 everything is rational; cross-multiplying gives the
    one integer division per bigram:

        p9 = (max(4·c12−3, 0)·(nct+v) + 3·n1p·(ncont+1)) · 1e9
             div (4·c1·(nct+v))

    computed in DECIMAL(38,0): the numerator is ≤ 4·c12·(nct+v)·1e9 —
    at a 100 TB corpus (~1e14 bigram tokens, ~1e10 types) that is ~34
    digits, inside decimal-38 but far past int64 (it already overflows
    int64 at sf0.01). ``div`` on Spark decimals and ``//`` on DuckDB
    HUGEINTs truncate identically (verified), so the oracle holds.

    Backoff is total: an unseen bigram in a seen context keeps the
    discounted continuation mass (c12→0 zeroes the first term), and an
    unseen CONTEXT (c1 NULL after the left join) degrades to the
    smoothed continuation distribution itself — every branch stays a
    rational in the same quantization.

    Scale shape mirrors ``bigram_lm_score``: the model joins on its
    natural (w1, w2) key and the derived marginals on w1 / w2 — never
    broadcast (vocabulary² state), no Python row functions.
    """
    bg = _bigrams(docs, id_col, text_col)
    ctx = model.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    cont = model.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    p9 = F.expr(
        f"""CASE WHEN c1 IS NULL THEN
            (CAST(coalesce(ncont, 0L) + 1L AS DECIMAL(38,0)) * {_P_SCALE})
              div CAST(nct + v AS DECIMAL(38,0))
        ELSE
            ((CAST(greatest(4L * coalesce(c12, 0L) - 3L, 0L) AS DECIMAL(38,0))
                * CAST(nct + v AS DECIMAL(38,0))
              + CAST(3L * n1p AS DECIMAL(38,0))
                * CAST(coalesce(ncont, 0L) + 1L AS DECIMAL(38,0)))
             * {_P_SCALE})
              div (CAST(4L * c1 AS DECIMAL(38,0))
                   * CAST(nct + v AS DECIMAL(38,0)))
        END"""
    ).alias("p9")
    scored = (
        bg.join(model, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .crossJoin(F.broadcast(stats))
        .select("__id", p9)
    )
    per_doc = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("p9").alias("sum_p9")
    )
    ids = docs.select(F.col(id_col).alias("__id")).distinct()
    return (
        ids.join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("sum_p9"), F.lit(0)).cast("bigint").alias("sum_p9"),
            (F.col("sum_p9").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "mean_p9"
            ),
        )
    )
