"""Multinomial naive-Bayes text classifier (train + score), exact-int.

The quality/domain-classifier shape of LLM data pipelines (CCNet /
fastText-style: fit a cheap linear model on labeled docs, score the
whole corpus). Everything is engine-deterministic:

- per-(label, token) Laplace-smoothed log-likelihoods
  ``ln((c_lt + 1) / (T_l + V))`` take exact-int rational arguments and
  are floor-quantized ONCE per (label, token);
- per-doc scores are integer dot products (token count × quantized
  log-prob) plus the quantized log-prior — int64 sums, so the argmax
  never flips under partitioning/accumulation reorder;
- ties break to the lexicographically smallest label.

Scale: token counting is one partial+final agg; scoring joins doc
tokens to the AGGREGATED (label, token) model keyed on token; the
label frame (|labels| rows) broadcasts. Unseen tokens fall out of the
left join as pure smoothing mass. The returned model frames can be
persisted and reused — retraining never touches the scoring plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from loan_etl_data_pipeline_spark.operators.text import tokens as _tokens

_Q = 1e12  # log-prob quantizer: ~12 significant digits, int64-safe to
#            ~2e5 tokens/doc × ln-magnitude 30


def nb_train(train: DataFrame, *, label_col: str, text_col: str):
    """Fit the model: returns (token_likelihoods, label_frame).

    ``token_likelihoods``: (label, tok, ctl) — raw counts (the
    smoothed log comes at score time so V/T_l stay consistent).
    ``label_frame``: (label, tl, v, prior_q) — per-label token total,
    global vocab size, quantized log-prior. |labels| rows: broadcast it.
    """
    ctl = (
        train.select(
            F.col(label_col).alias("label"),
            F.explode(_tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy("label", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ctl"))
    )
    tl = ctl.groupBy("label").agg(F.sum("ctl").alias("tl"))
    vb = ctl.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    nd = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    ntr = train.agg(F.count(F.lit(1)).cast("bigint").alias("ntr"))
    label_frame = (
        nd.join(tl, "label")
        .crossJoin(F.broadcast(ntr))
        .crossJoin(F.broadcast(vb))
        .select(
            "label",
            "tl",
            "v",
            F.floor(
                F.log(F.col("nd").cast("double") / F.col("ntr").cast("double"))
                * F.lit(_Q)
            )
            .cast("bigint")
            .alias("prior_q"),
        )
    )
    return ctl, label_frame


def nb_score(
    score: DataFrame,
    ctl: DataFrame,
    label_frame: DataFrame,
    *,
    id_col: str,
    text_col: str,
    true_label_col: str | None = None,
) -> DataFrame:
    """Score docs against a trained model → one row per doc:
    (id, [true_label,] pred_label[, correct]). Deterministic argmax
    over exact-int scores, min-label tie-break."""
    keep = [F.col(id_col)]
    group = [id_col]
    if true_label_col:
        keep.append(F.col(true_label_col).alias("true_label"))
        group.append("true_label")
    dtok = (
        score.select(
            *keep, F.explode(_tokens(F.lower(F.col(text_col)))).alias("tok")
        )
        .groupBy(*group, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    model = label_frame.select(
        F.col("label").alias("pl"), "tl", "v", "prior_q"
    )
    jt = dtok.crossJoin(F.broadcast(model)).join(
        ctl.select(F.col("label").alias("pl"), "tok", "ctl"),
        ["pl", "tok"],
        "left",
    )
    term = F.col("cnt") * F.floor(
        F.log(
            (F.coalesce(F.col("ctl"), F.lit(0)) + 1).cast("double")
            / (F.col("tl") + F.col("v")).cast("double")
        )
        * F.lit(_Q)
    ).cast("bigint")
    scores = (
        jt.groupBy(*group, "pl", "prior_q")
        .agg(F.sum(term).alias("s"))
        .select(*group, "pl", (F.col("s") + F.col("prior_q")).alias("score"))
    )
    best = scores.groupBy(id_col).agg(F.max("score").alias("ms"))
    pred = (
        scores.join(best, id_col)
        .filter(F.col("score") == F.col("ms"))
        .groupBy(*group)
        .agg(F.min("pl").alias("pred_label"))
    )
    if true_label_col:
        pred = pred.select(
            id_col,
            F.col("true_label"),
            "pred_label",
            (F.col("pred_label") == F.col("true_label"))
            .cast("bigint")
            .alias("correct"),
        )
    return pred
