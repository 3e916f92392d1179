"""resolve_entities (plans/entity.py): clustering + survivorship on a
hand-built registry. SF-scale cross-engine check: q_entity_resolution."""

from __future__ import annotations

from loan_etl_data_pipeline_spark.plans.entity import resolve_entities


def test_resolve_entities_merges_typos(spark):
    df = spark.createDataFrame(
        [
            (1, "alice smith", 100.0),
            (2, "alice smyth", 250.0),   # 1 sub from #1
            (3, "alice smythe", 50.0),   # 1 insert from #2 (chain!)
            (4, "bob jones", 70.0),
            (5, "bob jones", 90.0),      # exact duplicate
            (6, "carol wu", 10.0),       # singleton
        ],
        ["id", "name", "bal"],
    )
    got = {r["entity_id"]: r for r in
           resolve_entities(df, "id", "name", "bal").collect()}
    assert set(got) == {1, 4, 6}
    # transitive chain 1~2~3 is ONE entity even though lev(1,3)=2
    assert got[1]["n_members"] == 3
    assert got[1]["canonical_name"] == "alice smith"  # min member id's name
    assert got[1]["best_score"] == 250.0              # survivorship max
    assert got[4]["n_members"] == 2 and got[4]["best_score"] == 90.0
    assert got[6]["n_members"] == 1 and got[6]["canonical_name"] == "carol wu"


def test_sorted_neighborhood_candidates_exact_window(spark):
    import pyspark.sql.functions as F  # noqa: F401

    from loan_etl_data_pipeline_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"name{i:03d}") for i in range(1, 11)], "id bigint, key string"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=3).collect()
    }
    # sort order == id order here; window 3 → pairs at distance 1 and 2
    want = {(i, j) for i in range(1, 11) for j in range(1, 11)
            if 0 < j - i <= 2}
    assert pairs == want


def test_sorted_neighborhood_catches_prefix_typos(spark):
    from loan_etl_data_pipeline_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corpx"),  # sorts adjacent to its typo twin
            (3, "zzz unrelated"),
        ],
        "id bigint, key string",
    )
    cand = sorted_neighborhood_pairs(df, "id", "key", window=2)
    matched = cand.filter(F.levenshtein("key_a", "key_b") <= 1).collect()
    assert {(r.id_a, r.id_b) for r in matched} == {(1, 2)}


def test_sorted_neighborhood_rejects_window_one(spark):
    import pytest

    from loan_etl_data_pipeline_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "a")], "id bigint, key string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "key", window=1)
