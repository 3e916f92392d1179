"""pareto_frontier_2d (operators/skyline.py): dominance semantics on
hand-built points. The sf-scale cross-engine check is q_pareto_parts
(NOT EXISTS dominance oracle)."""

from __future__ import annotations

from loan_etl_data_pipeline_spark.operators.skyline import pareto_frontier_2d


def test_pareto_frontier_basic(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, 50),   # frontier (cheapest)
            (2, 2.0, 30),   # frontier (staircase step)
            (3, 2.0, 40),   # dominated by 2 (same x, bigger y)
            (4, 3.0, 30),   # dominated by 2 (bigger x, same y)
            (5, 4.0, 10),   # frontier
            (6, 5.0, 10),   # dominated by 5
        ],
        ["id", "x", "y"],
    )
    got = {r["id"] for r in pareto_frontier_2d(df, "x", "y").collect()}
    assert got == {1, 2, 5}


def test_pareto_duplicate_points_all_kept(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4), (4, 2.0, 9)],
        ["id", "x", "y"],
    )
    got = {r["id"] for r in pareto_frontier_2d(df, "x", "y").collect()}
    # (1,5)x2: identical points don't dominate each other; 4 dominated
    assert got == {1, 2, 3}


def test_pareto_single_and_empty(spark):
    df = spark.createDataFrame([(1, 1.0, 1)], ["id", "x", "y"])
    assert pareto_frontier_2d(df, "x", "y").count() == 1
    assert pareto_frontier_2d(df.limit(0), "x", "y").count() == 0
