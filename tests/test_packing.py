"""Sequence packing (operators/packing.py): budget/coverage invariants,
density, oversized isolation — the properties that hold under ANY
partitioning (pack composition legitimately varies with it)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.operators.packing import pack_documents


def _packs(df, **kw):
    out = {}
    for r in pack_documents(df, **kw).collect():
        out.setdefault(r["pack_id"], []).append((r["doc_id"], r["n_tokens"]))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    # doc i has ~i+1 words -> a spread of token counts incl. oversized
    rows = [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_invariants_hold_under_any_partitioning(docs):
    budget = 40
    for n_parts in (1, 7):
        packs = _packs(docs.repartition(n_parts), budget=budget)
        all_docs = [d for members in packs.values() for d, _ in members]
        assert sorted(all_docs) == list(range(120))  # every doc exactly once
        for members in packs.values():
            total = sum(t for _, t in members)
            if len(members) > 1:
                assert total <= budget
            else:
                (_, t), = members
                assert t <= budget or len(members) == 1  # oversized isolated


def test_oversized_docs_are_singletons(docs):
    packs = _packs(docs, budget=40)
    for members in packs.values():
        if any(t > 40 for _, t in members):
            assert len(members) == 1


def test_packing_density(docs):
    """BFD on one partition should land well above half-full on average
    (theory: >= OPT/(11/9) — loose check, not exact)."""
    budget = 40
    packs = _packs(docs.coalesce(1), budget=budget)
    normal = [m for m in packs.values() if sum(t for _, t in m) <= budget]
    fill = sum(sum(t for _, t in m) for m in normal) / (len(normal) * budget)
    assert fill > 0.6, f"mean fill {fill:.2f} too low for BFD"


def test_bad_budget(docs):
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, budget=0)
