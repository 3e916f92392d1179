"""Declarative quality-filter battery — the C4/Gopher "rule stack"
(Raffel et al. 2020 §2.2; Rae et al. 2021 Appendix A) as a composable
rule engine over one scan.

The reference pipeline hardcodes its cleaning steps inline
(`airflow/dags/etl/pyspark_etl.py:14-36`); production corpus curation
instead wants a *declarative* rule list — named thresholds over shared
per-document metrics — compiled into a single projection so the whole
battery stays inside whole-stage codegen. Every rule yields a boolean
column; a document is kept iff all rules pass, and the first failing
rule (in declaration order) is reported as ``fail_reason`` so filter
hit-rates can be audited per rule (the standard "why was this doc
dropped" debugging loop at 100 TB, where you cannot re-run per-rule).

Nothing here shuffles: metrics are narrow char/array expressions over
the scan, rules are comparisons, and the output is one row per input
row. Aggregating pass-rates afterwards is an ordinary groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.text import (
    STOPWORDS_EN,
    _in_set,
    tokens,
)

#: comparison operators permitted in a rule spec. Kept to a closed set
#: so a rule list is data (serializable, auditable), not code.
_OPS = {
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "==": lambda c, v: c == v,
}


def _metric_columns(text_col: str) -> dict[str, Column]:
    """Shared per-document metrics the rules draw from. All are exact
    integer counts or single IEEE divisions — cross-engine portable."""
    lower = F.lower(F.col(text_col))
    t = tokens(lower)
    n_tokens = F.size(t)
    nonspace = F.length(F.regexp_replace(lower, r"\s", ""))
    n_stop = F.size(F.filter(t, lambda x: _in_set(x, STOPWORDS_EN)))
    return {
        "n_tokens": n_tokens.cast("bigint"),
        "n_chars": F.length(lower).cast("bigint"),
        "max_token_len": F.array_max(F.transform(t, F.length)).cast("bigint"),
        "avg_token_len": nonspace.cast("double") / n_tokens.cast("double"),
        "distinct_ratio": F.size(F.array_distinct(t)).cast("double")
        / n_tokens.cast("double"),
        "stopword_ratio": n_stop.cast("double") / n_tokens.cast("double"),
    }


#: the default battery — C4/Gopher-flavored thresholds adapted to
#: whitespace token streams (each row: rule name, metric, op, value).
DEFAULT_RULES: tuple[tuple[str, str, str, float], ...] = (
    ("min_tokens", "n_tokens", ">=", 10),
    ("max_tokens", "n_tokens", "<=", 100_000),
    ("min_avg_token_len", "avg_token_len", ">=", 2.0),
    ("max_avg_token_len", "avg_token_len", "<=", 12.0),
    ("max_token_len", "max_token_len", "<=", 30),
    ("min_distinct_ratio", "distinct_ratio", ">=", 0.2),
)


def rule_battery(
    df: DataFrame,
    rules: tuple[tuple[str, str, str, float], ...] = DEFAULT_RULES,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Compile ``rules`` into one projection: per-rule boolean columns
    (named after the rule), ``keep`` (all pass), and ``fail_reason``
    (first failing rule in declaration order, NULL when kept)."""
    metrics = _metric_columns(text_col)
    flags: list[tuple[str, Column]] = []
    for name, metric, op, value in rules:
        if metric not in metrics:
            raise ValueError(f"unknown metric {metric!r} in rule {name!r}")
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r} in rule {name!r}")
        flags.append((name, _OPS[op](metrics[metric], F.lit(value))))
    keep = F.lit(True)
    for _, flag in flags:
        keep = keep & flag
    reason = F.lit(None).cast("string")
    for name, flag in reversed(flags):
        reason = F.when(~flag, F.lit(name)).otherwise(reason)
    return df.select(
        id_col,
        *keep_cols,
        *[flag.alias(name) for name, flag in flags],
        keep.alias("keep"),
        reason.alias("fail_reason"),
    )
