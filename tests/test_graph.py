"""Connected components (operators/graph.py): known graphs, convergence.

Cross-engine check is q_dup_components vs a DuckDB recursive CTE
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_chain(spark):
    # component {1,2,3,4} via a chain + one triangle {10,11,12}
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_long_path_converges(spark):
    n = 12  # diameter 11 — needs several propagation rounds
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(12)], max_iter=2)


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 5), (5, 6), (6, 5), (5, 6)])
    assert got == {5: 5, 6: 5}
