"""Declarative filter battery (operators/filters.py): rule compilation,
first-fail reason ordering, custom rule lists, and spec validation."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.operators.filters import (
    DEFAULT_RULES,
    rule_battery,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            # clean: 10 ordinary tokens
            (1, "the quick brown fox jumps over the lazy dog again"),
            # too short
            (2, "tiny doc"),
            # one pathological mega-token (fails max_token_len AND
            # max_avg_token_len; fail_reason must be the FIRST declared)
            (3, " ".join(["x" * 40] * 12)),
            # all-identical tokens: fails distinct ratio only
            (4, " ".join(["dup"] * 20)),
        ],
        "doc_id long, text string",
    )


def test_default_battery(spark, docs):
    rows = {r["doc_id"]: r for r in rule_battery(docs).collect()}
    assert rows[1]["keep"] and rows[1]["fail_reason"] is None
    assert not rows[2]["keep"] and rows[2]["fail_reason"] == "min_tokens"
    # declaration order: max_avg_token_len precedes max_token_len
    assert not rows[3]["keep"]
    assert rows[3]["fail_reason"] == "max_avg_token_len"
    assert not rows[3]["max_token_len"]
    assert not rows[4]["keep"]
    assert rows[4]["fail_reason"] == "min_distinct_ratio"
    # per-rule flags exist and are booleans
    assert rows[1]["min_tokens"] is True
    assert set(r[0] for r in DEFAULT_RULES) <= set(rows[1].asDict())


def test_custom_rules_and_keep_cols(spark, docs):
    out = rule_battery(
        docs,
        (("exact_ten", "n_tokens", "==", 10),),
        keep_cols=("text",),
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["keep"] and rows[1]["exact_ten"]
    assert rows[2]["fail_reason"] == "exact_ten"
    assert rows[1]["text"].startswith("the quick")


def test_bad_spec_rejected(spark, docs):
    with pytest.raises(ValueError, match="unknown metric"):
        rule_battery(docs, (("r", "no_such_metric", ">=", 1),))
    with pytest.raises(ValueError, match="unknown op"):
        rule_battery(docs, (("r", "n_tokens", "!=", 1),))
