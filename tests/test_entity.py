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


# ---- Fellegi–Sunter scoring (fs_score_pairs) --------------------------


def _fs_tiny(spark):
    # 4 records, 2 fields: city (2 values, 2+2) and tier (a:3, b:1)
    return spark.createDataFrame(
        [
            (1, "nyc", "a"),
            (2, "nyc", "a"),
            (3, "sf", "a"),
            (4, "sf", "b"),
        ],
        ["id", "city", "tier"],
    )


def test_fs_hand_computed_weights_and_scores(spark):
    import math

    from loan_etl_data_pipeline_spark.operators.entity import fs_score_pairs

    recs = _fs_tiny(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], ["id_a", "id_b"]
    )
    out = {
        (r["id_a"], r["id_b"]): (r["score9"], r["n_agree"])
        for r in fs_score_pairs(
            pairs, recs, "id", ["city", "tier"], [(9, 10), (4, 5)]
        ).collect()
    }
    # u_city = (4+4)/16 = 1/2; u_tier = (9+1)/16 = 5/8
    n2 = 16.0
    wa0 = math.floor(1e9 * math.log((9.0 * n2) / (10.0 * 8.0)))
    wd0 = math.floor(1e9 * math.log((1.0 * n2) / (10.0 * (n2 - 8.0))))
    wa1 = math.floor(1e9 * math.log((4.0 * n2) / (5.0 * 10.0)))
    wd1 = math.floor(1e9 * math.log((1.0 * n2) / (5.0 * (n2 - 10.0))))
    assert out[(1, 2)] == (wa0 + wa1, 2)   # agree on both
    assert out[(1, 3)] == (wd0 + wa1, 1)   # city differs, tier agrees
    assert out[(3, 4)] == (wa0 + wd1, 1)   # city agrees, tier differs


def test_fs_null_safe_agreement(spark):
    from loan_etl_data_pipeline_spark.operators.entity import fs_score_pairs

    recs = spark.createDataFrame(
        [(1, None, "a"), (2, None, "a"), (3, "x", "b")],
        "id long, city string, tier string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    out = {
        (r["id_a"], r["id_b"]): r["n_agree"]
        for r in fs_score_pairs(
            pairs, recs, "id", ["city", "tier"], [(9, 10), (9, 10)]
        ).collect()
    }
    assert out[(1, 2)] == 2   # NULL <=> NULL agrees
    assert out[(1, 3)] == 0   # NULL vs 'x' disagrees


def test_fs_validates_m(spark):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.operators.entity import fs_score_pairs

    recs = _fs_tiny(spark)
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with _pt.raises(ValueError):
        fs_score_pairs(pairs, recs, "id", ["city"], [(10, 10)])
    with _pt.raises(ValueError):
        fs_score_pairs(pairs, recs, "id", ["city", "tier"], [(1, 2)])
    with _pt.raises(ValueError):
        fs_score_pairs(pairs, recs, "id", [], [])


def test_fs_partitioning_invariant(spark):
    from loan_etl_data_pipeline_spark.operators.entity import fs_score_pairs

    recs = spark.range(0, 300).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS city", "CAST(id % 3 AS STRING) AS tier"
    )
    pairs = spark.range(0, 299).selectExpr("id AS id_a", "id + 1 AS id_b")
    args = (pairs, recs, "id", ["city", "tier"], [(9, 10), (4, 5)])
    a = sorted(map(tuple, fs_score_pairs(*args).collect()))
    b = sorted(
        map(
            tuple,
            fs_score_pairs(
                pairs.repartition(11), recs.repartition(13), *args[2:]
            ).collect(),
        )
    )
    assert a == b


def test_fs_rejects_constant_field(spark):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.operators.entity import fs_score_pairs

    recs = spark.createDataFrame(
        [(1, "same", "a"), (2, "same", "b"), (3, "same", "a")],
        ["id", "city", "tier"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = fs_score_pairs(
        pairs, recs, "id", ["city", "tier"], [(9, 10), (9, 10)]
    )
    with _pt.raises(Exception, match="city is constant"):
        out.collect()


def test_jaro_winkler_fuzz_bitwise_vs_duckdb(spark):
    """The kernel's contract is BITWISE equality with DuckDB's
    jaro_winkler_similarity (the oracle engine) — fuzz it over random
    pairs spanning tiny alphabets (forced transpositions), realistic
    name-ish strings, empties, and repeated characters."""
    import random
    import string

    import duckdb

    from loan_etl_data_pipeline_spark.operators.entity import add_jaro_winkler

    random.seed(20260816)
    pairs = []
    for _ in range(3000):
        alpha = random.choice(
            ["ab", "abc", string.ascii_lowercase, "Customer#0123456789", " aA"]
        )
        pairs.append(
            (
                "".join(random.choice(alpha) for _ in range(random.randint(0, 24))),
                "".join(random.choice(alpha) for _ in range(random.randint(0, 24))),
            )
        )
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): r["jw_sim"]
        for r in add_jaro_winkler(df, "a", "b").collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert repr(got[(a, b)]) == repr(want), (a, b, got[(a, b)], want)
    con.close()


def test_jaro_winkler_hand_values_and_nulls(spark):
    """Winkler's canonical example plus the edge semantics the DuckDB
    pin fixes: martha/marhta = 0.961111... (jaro 17/18, prefix 3);
    either side empty -> 0.0 (even both-empty); NULL propagates."""
    from loan_etl_data_pipeline_spark.operators.entity import add_jaro_winkler

    df = spark.createDataFrame(
        [
            (1, "martha", "marhta"),
            (2, "", ""),
            (3, "", "x"),
            (4, None, "x"),
            (5, "dwayne", "duane"),
        ],
        "id bigint, a string, b string",
    )
    out = {r["id"]: r["jw_sim"] for r in add_jaro_winkler(df, "a", "b").collect()}
    # martha/marhta: m=6 matches, th<->ht = 2 half-transpositions -> t=1,
    # jaro = (6/6 + 6/6 + 5/6)/3, prefix "mar" = 3
    jaro_m = (6 / 6 + 6 / 6 + 5 / 6) / 3.0
    assert out[1] == jaro_m + 0.1 * 3 * (1.0 - jaro_m) == 0.9611111111111111
    assert out[2] == 0.0 and out[3] == 0.0
    assert out[4] is None
    jaro_d = (4 / 6 + 4 / 5 + 4 / 4) / 3.0
    assert out[5] == jaro_d + 0.1 * 1 * (1.0 - jaro_d)


def test_jaro_winkler_rejects_collision(spark):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.operators.entity import add_jaro_winkler

    df = spark.createDataFrame([("x", "y", 0.5)], "a string, b string, jw_sim double")
    with _pt.raises(ValueError, match="already exists"):
        add_jaro_winkler(df, "a", "b")
