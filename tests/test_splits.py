"""hash_split (functions/splits.py): determinism, fraction, salt.

Cross-engine assignment equality is q_hash_split vs the DuckDB oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.functions.splits import hash_split


def _assignments(df, **kw):
    return {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", **kw).collect()}


def test_fraction_and_partitioning_invariance(spark):
    df = spark.range(0, 5000).selectExpr("id AS doc_id")
    a = _assignments(df, train_frac=0.8, salt="s")
    b = _assignments(df.repartition(13), train_frac=0.8, salt="s")
    assert a == b, "assignment must not depend on partitioning"
    frac = sum(v == "train" for v in a.values()) / len(a)
    assert abs(frac - 0.8) < 0.02


def test_assignment_is_stable_under_data_growth(spark):
    """New rows never move old rows between splits (the randomSplit bug)."""
    small = spark.range(0, 1000).selectExpr("id AS doc_id")
    big = spark.range(0, 5000).selectExpr("id AS doc_id")
    a_small = _assignments(small, salt="s")
    a_big = _assignments(big, salt="s")
    assert all(a_big[k] == v for k, v in a_small.items())


def test_salt_rerolls(spark):
    df = spark.range(0, 2000).selectExpr("id AS doc_id")
    a = _assignments(df, salt="exp1")
    b = _assignments(df, salt="exp2")
    assert a != b
    with pytest.raises(ValueError, match="train_frac"):
        hash_split(df, "doc_id", train_frac=1.5)


def test_extreme_fractions_stay_valid(spark):
    """frac→1 must approach all-train (the unclamped threshold '10000'
    used to INVERT to all-test via 5-char string compare), frac→0 all-test."""
    df = spark.range(0, 2000).selectExpr("id AS doc_id")
    hi = _assignments(df, train_frac=0.99999)
    lo = _assignments(df, train_frac=0.00001)
    assert sum(v == "train" for v in hi.values()) / len(hi) > 0.99
    assert sum(v == "train" for v in lo.values()) < 5


def test_stratified_sample(spark):
    from loan_etl_data_pipeline_spark.functions.splits import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(4000)] + [(9999, "c")],
        "doc_id long, s string",
    )
    out = stratified_sample(df, "doc_id", "s", {"a": 0.5, "b": 1.0}, salt="x")
    rows = out.collect()
    by_s = {}
    for r in rows:
        by_s.setdefault(r["s"], []).append(r["doc_id"])
    assert "c" not in by_s  # unlisted stratum dropped
    assert len(by_s["b"]) == 2000  # frac 1.0 keeps everything
    assert abs(len(by_s["a"]) / 2000 - 0.5) < 0.05
    # deterministic under repartitioning
    again = stratified_sample(
        df.repartition(7), "doc_id", "s", {"a": 0.5, "b": 1.0}, salt="x"
    ).collect()
    assert sorted((r["doc_id"]) for r in again) == sorted(r["doc_id"] for r in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one stratum"):
        stratified_sample(df, "doc_id", "s", {"a": 0.0})


# --- corpus mixture expansion ----------------------------------------------


def test_expand_mixture_copy_counts(spark):
    from loan_etl_data_pipeline_spark.functions.splits import expand_mixture

    df = spark.createDataFrame(
        [(i, "a" if i < 400 else "b" if i < 500 else "c") for i in range(600)],
        "id long, src string",
    )
    out = expand_mixture(df, "id", "src", {"a": 2.5, "b": 1.0}, salt="t")
    rows = out.groupBy("src").count().collect()
    got = {r["src"]: r["count"] for r in rows}
    # a: 400 keys × (2 full + ~50% fractional) ≈ 1000; b: exactly 100;
    # c: dropped entirely
    assert got.get("b") == 100
    assert "c" not in got
    assert 400 * 2 < got["a"] < 400 * 3
    assert abs(got["a"] - 1000) < 80  # binomial noise bound, deterministic data

    # copies of the same key are identical rows apart from copy_idx,
    # and copy_idx values are dense from 0
    per_key = {}
    for r in out.filter("src = 'a'").collect():
        per_key.setdefault(r["id"], []).append(r["copy_idx"])
    for copies in per_key.values():
        assert sorted(copies) == list(range(len(copies)))
        assert len(copies) in (2, 3)


def test_expand_mixture_deterministic_and_partition_invariant(spark):
    from loan_etl_data_pipeline_spark.functions.splits import expand_mixture

    df = spark.createDataFrame(
        [(i, "x") for i in range(300)], "id long, src string"
    )
    a = sorted(map(tuple, expand_mixture(df, "id", "src", {"x": 0.3}, salt="s").collect()))
    b = sorted(
        map(
            tuple,
            expand_mixture(
                df.repartition(13), "id", "src", {"x": 0.3}, salt="s"
            ).collect(),
        )
    )
    assert a == b and 0 < len(a) < 300
    # different salt → different draw
    c = sorted(map(tuple, expand_mixture(df, "id", "src", {"x": 0.3}, salt="u").collect()))
    assert c != a


def test_expand_mixture_rejects_bad_weights(spark):
    from loan_etl_data_pipeline_spark.functions.splits import expand_mixture

    df = spark.createDataFrame([(1, "x")], "id long, src string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expand_mixture(df, "id", "src", {"x": -0.5})
    with _pytest.raises(ValueError):
        expand_mixture(df, "id", "src", {})


def test_sample_per_key_caps_and_is_partition_invariant(spark):
    from loan_etl_data_pipeline_spark.functions.splits import sample_per_key

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(700)], "id long, g long"
    )
    a = sorted(map(tuple, sample_per_key(df, "g", "id", 5, salt="s").collect()))
    # exactly 5 survivors per group (every group has 100 candidates)
    assert len(a) == 35
    from collections import Counter

    assert all(c == 5 for c in Counter(g for _, g in a).values())
    # same survivors under a different partitioning
    b = sorted(
        map(tuple, sample_per_key(df.repartition(13), "g", "id", 5, salt="s").collect())
    )
    assert a == b
    # re-salting draws an independent sample; k >= group size keeps all
    c = sorted(map(tuple, sample_per_key(df, "g", "id", 5, salt="t").collect()))
    assert c != a
    assert len(sample_per_key(df, "g", "id", 100).collect()) == 700
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_per_key(df, "g", "id", 0)


def test_weighted_sample_monotone_deterministic(spark):
    """E-S priority sampling: heavier keys appear more often across
    independent salts; selection is partition-invariant; w<=0 excluded."""
    import pytest as _pytest
    from loan_etl_data_pipeline_spark.functions.splits import weighted_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")

    heavy_hits = 0
    for salt in ("a", "b", "c"):
        got = {r["id"] for r in weighted_sample(df, "id", "w", 50, salt=salt).collect()}
        assert len(got) == 50
        heavy_hits += sum(1 for i in got if i < 50)
    # 50 keys at weight 100 vs 450 at weight 1: heavy keys dominate any
    # plausible draw (expected ~46/50 heavy per draw)
    assert heavy_hits > 0.6 * 150

    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 50, salt="a").collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(17), "id", "w", 50, salt="a").collect()
    )
    assert a == b  # partition-invariant

    # zero/negative/null weights never sampled, even with k > n
    bad = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None)], "id long, w double"
    )
    assert {r["id"] for r in weighted_sample(bad, "id", "w", 10).collect()} == {1}

    with _pytest.raises(ValueError):
        weighted_sample(df, "id", "w", 0)


def test_curriculum_tiles_balanced_total_order(spark):
    from loan_etl_data_pipeline_spark.functions.splits import curriculum_tiles
    import pytest as _pytest

    # 95 rows sharing 10 scores: tie-break must still yield balanced,
    # reproducible tiles
    df = spark.createDataFrame([(i, i % 10) for i in range(95)], "id long, s long")
    a = {r["id"]: r["tile"] for r in curriculum_tiles(df, "s", 10, id_col="id").collect()}
    from collections import Counter

    sizes = Counter(a.values())
    assert sorted(sizes.values()) == [9] * 5 + [10] * 5  # 95 = 5*10 + 5*9
    b = {
        r["id"]: r["tile"]
        for r in curriculum_tiles(df.repartition(7), "s", 10, id_col="id").collect()
    }
    assert a == b
    with _pytest.raises(ValueError):
        curriculum_tiles(df, "s", 0, id_col="id")


def test_negative_samples_ring_properties(spark):
    from loan_etl_data_pipeline_spark.functions.splits import negative_samples
    import pytest as _pytest

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    out = negative_samples(df, "id", 4, salt="x", n_buckets=8).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["anchor"], []).append(r["neg"])
    # 300 ids over 8 buckets: every arc has > 5 members, so every anchor
    # gets exactly 4 distinct non-self negatives
    assert set(by_anchor) == set(range(300))
    for a, negs in by_anchor.items():
        assert len(negs) == 4 and len(set(negs)) == 4 and a not in negs

    # partition-invariant and salt-redrawn
    again = sorted(
        (r["anchor"], r["j"], r["neg"])
        for r in negative_samples(df.repartition(11), "id", 4, salt="x", n_buckets=8).collect()
    )
    assert again == sorted((r["anchor"], r["j"], r["neg"]) for r in out)
    other = sorted(
        (r["anchor"], r["j"], r["neg"])
        for r in negative_samples(df, "id", 4, salt="y", n_buckets=8).collect()
    )
    assert other != again

    # tiny arcs: 2 ids in 1 bucket -> each gets the single other id
    tiny = negative_samples(
        spark.createDataFrame([(1,), (2,)], "id long"), "id", 5, n_buckets=1
    ).collect()
    assert {(r["anchor"], r["neg"]) for r in tiny} == {(1, 2), (2, 1)}
    # singleton corpus -> no negatives, no crash
    assert (
        negative_samples(
            spark.createDataFrame([(1,)], "id long"), "id", 3, n_buckets=1
        ).count()
        == 0
    )
    with _pytest.raises(ValueError):
        negative_samples(df, "id", 0)


# --- epoch_shuffle ---


def test_epoch_shuffle_permutation_and_balance(spark):
    from loan_etl_data_pipeline_spark.functions.splits import epoch_shuffle

    df = spark.range(0, 1000).selectExpr("id AS doc_id")
    rows = epoch_shuffle(df, "doc_id", n_shards=8, salt="e0").collect()
    assert sorted(r["pos"] for r in rows) == list(range(1, 1001))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["doc_id"])
    # round-robin over 1000 rows and 8 shards: exactly balanced
    assert sorted(len(v) for v in by_shard.values()) == [125] * 8
    # it actually shuffles: positions are not the id order
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])][:20] != list(
        range(20)
    )


def test_epoch_shuffle_deterministic_and_salted(spark):
    from loan_etl_data_pipeline_spark.functions.splits import epoch_shuffle

    df = spark.range(0, 500).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", n_shards=4, salt="e0").collect()}
    b = {
        r["doc_id"]: r["pos"]
        for r in epoch_shuffle(df.repartition(7), "doc_id", n_shards=4, salt="e0").collect()
    }
    c = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", n_shards=4, salt="e1").collect()}
    assert a == b, "shuffle order must not depend on partitioning"
    assert a != c, "salt must re-roll the epoch order"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(df, "doc_id", n_shards=0)


# --- token_budget_select ---


def test_token_budget_prefix_rule(spark):
    from loan_etl_data_pipeline_spark.functions.splits import token_budget_select

    df = spark.createDataFrame(
        [
            # src a, biggest-first walk: 50, 40, 30, 20 → budget 100
            # keeps 50 (50), 40 (90) and stops: 30 would hit 120
            (1, "a", 50),
            (2, "a", 40),
            (3, "a", 30),
            (4, "a", 20),
            # src b: head row alone exceeds the budget → nothing kept
            (5, "b", 150),
            (6, "b", 10),
        ],
        "doc_id long, source string, n long",
    )
    kept = token_budget_select(df, "n", 100, by="source", id_col="doc_id").collect()
    assert {(r["doc_id"], r["cum_weight"]) for r in kept} == {(1, 50), (2, 90)}


def test_token_budget_exact_boundary_and_ties(spark):
    from loan_etl_data_pipeline_spark.functions.splits import token_budget_select

    df = spark.createDataFrame(
        [(1, "a", 60), (2, "a", 40), (3, "a", 40)],
        "doc_id long, source string, n long",
    )
    # tie on n=40 breaks by doc_id asc: 60, then 2 (100 == budget, kept),
    # then 3 (140, dropped)
    kept = token_budget_select(df, "n", 100, by="source", id_col="doc_id").collect()
    assert {r["doc_id"] for r in kept} == {1, 2}


def test_token_budget_rejects_fractional_weights(spark):
    from loan_etl_data_pipeline_spark.functions.splits import token_budget_select

    df = spark.createDataFrame(
        [(1, "a", 0.9)], "doc_id long, source string, n double"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integral"):
        token_budget_select(df, "n", 100, by="source", id_col="doc_id")


# --- temperature_sample ---


def test_temperature_sample_rebalances_toward_sqrt(spark):
    from loan_etl_data_pipeline_spark.functions.splits import temperature_sample

    # big:small = 6400:100 (64:1); sqrt weights 80:10 (8:1) — the small
    # source's SHARE must grow from 100/6500 (1.5%) toward 10/90 (11%)
    rows = [(i, "big") for i in range(6400)] + [(10000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(df, "doc_id", "source", budget=900, salt="t")
    by = {r[0]: r[1] for r in kept.groupBy("source").count().collect()}
    total = sum(by.values())
    assert 700 <= total <= 1100  # budget hit within sampling noise
    small_share = by.get("small", 0) / total
    assert 0.06 <= small_share <= 0.16, by  # ~11% target, was 1.5%
    # determinism + partitioning invariance
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(
            df.repartition(7), "doc_id", "source", budget=900, salt="t"
        ).collect()
    )
    assert a == b


def test_temperature_sample_keep_all_and_validation(spark):
    from loan_etl_data_pipeline_spark.functions.splits import temperature_sample

    # budget >= corpus: every row kept (the "zzzz" sentinel path —
    # hex(65536) would sort below 'ffff' and silently drop rows)
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
    )
    kept = temperature_sample(df, "doc_id", "source", budget=10000, salt="t")
    assert kept.count() == 90
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        temperature_sample(df, "doc_id", "source", budget=-1)


def test_source_quota_cap_and_determinism(spark):
    """q_source_quota's window: at most N per source, identical pick
    set across two runs, and picks are md5-order (engine-portable),
    not input-order."""
    import os, tempfile
    from loan_etl_data_pipeline_spark.queries import q_source_quota

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, f"t{i}", "en", f"src{i % 2}", 5) for i in range(100)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        a = {(r["source"], r["doc_id"]) for r in q_source_quota(spark, d).collect()}
        b = {(r["source"], r["doc_id"]) for r in q_source_quota(spark, d).collect()}
    assert a == b
    per_src = {}
    for src, doc in a:
        per_src.setdefault(src, set()).add(doc)
    assert all(len(v) == 20 for v in per_src.values())
    # md5 order differs from natural id order: picks are not 0..19
    assert per_src["src0"] != set(range(0, 40, 2))


def test_neyman_alloc_sums_to_budget(spark):
    """Largest-remainder invariants: allocations are non-negative ints
    summing exactly to the 1000 budget, and the noisier/bigger stratum
    gets more."""
    import os, tempfile
    from loan_etl_data_pipeline_spark.queries import q_neyman_alloc

    with tempfile.TemporaryDirectory() as d:
        rows = []
        k = 0
        # stratum A: 300 rows, low spread; B: 100 rows, high spread
        for i in range(300):
            rows.append((k, 1, "O", 100.0 + (i % 3), "1995-01-01 00:00:00", "A")); k += 1
        for i in range(100):
            rows.append((k, 1, "O", 100.0 + (i % 2) * 900, "1995-01-01 00:00:00", "B")); k += 1
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["stratum"]: r["alloc_n"] for r in q_neyman_alloc(spark, d).collect()}
    assert sum(out.values()) == 1000
    assert all(v >= 0 for v in out.values())
    # B: n_h*sigma = 100*450 = 45000 vs A: 300*~0.8 — B dominates
    assert out["B"] > out["A"]


def test_bootstrap_se_plausible(spark, sf_dir):
    """Bootstrap mean tracks the true mean and the SE is positive and
    near sigma/sqrt(n) (within 3x either way)."""
    import math
    import pyspark.sql.functions as F
    from loan_etl_data_pipeline_spark.queries import q_bootstrap_se
    from loan_etl_data_pipeline_spark.sources.tables import load_table

    r = q_bootstrap_se(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("cast(floor(o_totalprice*100) as bigint)").alias("c")
    )
    stats = o.agg(
        F.count(F.lit(1)).alias("n"), F.avg("c").alias("m"),
        F.stddev("c").alias("sd"),
    ).collect()[0]
    assert r["n_resamples"] == 20
    assert abs(r["boot_mean"] * 100 - stats["m"]) < 4 * stats["sd"] / math.sqrt(stats["n"]) * 100
    ref = stats["sd"] / math.sqrt(stats["n"]) / 100
    assert 0 < r["se"] < 3 * ref + 1e-9
    assert r["se"] > ref / 3


# ------------------------------------------------------------ UniMax


def test_unimax_water_filling_hand_case(spark):
    """caps [4, 10, 20], budget 18 -> level (18-4)//2 = 7:
    smallest source fully consumed, the rest level-capped."""
    from loan_etl_data_pipeline_spark.functions.splits import (
        unimax_allocation,
    )

    counts = spark.createDataFrame(
        [("a", 4), ("b", 10), ("c", 20)], "src string, cap long"
    )
    got = {
        r["src"]: (r["capacity"], r["alloc"])
        for r in unimax_allocation(counts, "src", "cap", budget=18).collect()
    }
    assert got == {"a": (4, 4), "b": (10, 7), "c": (20, 7)}


def test_unimax_budget_covers_everything(spark):
    from loan_etl_data_pipeline_spark.functions.splits import (
        unimax_allocation,
    )

    counts = spark.createDataFrame(
        [("a", 4), ("b", 10)], "src string, cap long"
    )
    got = {
        r["src"]: r["alloc"]
        for r in unimax_allocation(counts, "src", "cap", budget=99).collect()
    }
    assert got == {"a": 4, "b": 10}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        unimax_allocation(counts, "src", "cap", budget=-1)


def test_unimax_never_exceeds_budget_or_caps(spark):
    from loan_etl_data_pipeline_spark.functions.splits import (
        unimax_allocation,
    )

    counts = spark.createDataFrame(
        [(f"s{i}", 100 + 37 * i) for i in range(12)], "src string, cap long"
    )
    for budget in (0, 500, 1234, 2000, 10**6):
        rows = unimax_allocation(
            counts, "src", "cap", budget=budget
        ).collect()
        assert all(r["alloc"] <= r["capacity"] for r in rows)
        assert sum(r["alloc"] for r in rows) <= max(
            budget, 0
        ) or sum(r["alloc"] for r in rows) == sum(
            r["capacity"] for r in rows
        )


def test_kfold_assign_grouped_and_stable(spark):
    """Grouped k-fold: every key's rows share one fold, folds lie in
    [0, k), assignment is partition-invariant, k < 2 rejected."""
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.functions.splits import kfold_assign

    rows = [(i % 40, i) for i in range(400)]  # 40 keys x 10 rows
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    out = kfold_assign(df, "k", 5, salt="t")
    per_key = (
        out.groupBy("k")
        .agg(F.count_distinct("fold").alias("nf"), F.min("fold").alias("f"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_key)  # leakage-safe grouping
    folds = {r["f"] for r in per_key}
    assert folds <= set(range(5)) and len(folds) == 5  # all folds hit
    # partition-invariant: same assignment on a hostile repartition
    out2 = {
        (r["k"], r["fold"])
        for r in kfold_assign(df.repartition(13), "k", 5, salt="t")
        .select("k", "fold")
        .distinct()
        .collect()
    }
    assert out2 == {(r["k"], r["f"]) for r in per_key}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kfold_assign(df, "k", 1)


def test_ht_estimate_plausible_and_consistent(spark, sf_dir):
    """The Hansen–Hurwitz count estimate from the 100-point MUS sample
    must land in the right ballpark of the true order count (PPS
    systematic is low-variance; floor quantization biases < 1 per
    point), and the sample accounting must be internally consistent."""
    from loan_etl_data_pipeline_spark.queries import all_queries

    row = all_queries()["q_ht_estimate"](spark, sf_dir).collect()[0]
    assert row["n_points"] == 100
    assert 0 < row["n_orders_hit"] <= 100
    assert row["true_orders"] > 0
    assert 0.3 * row["true_orders"] < row["ht_order_count_est"] < 3.0 * row["true_orders"]
