"""Round-5 second stats battery: hand-verified fixtures for the
moment/robustness family (Jarque-Bera, Brown-Forsythe, Grubbs) and
ranking invariants for average precision.  Oracle parity at sf0.001 is
covered by test_oracle_parity; these pin the STATISTICS to worked
examples so a symmetric Spark/oracle bug can't slip through.
"""

from __future__ import annotations

import datetime

import pytest

from loan_etl_data_pipeline_spark.queries import all_queries

_D = datetime.date(2024, 1, 15)


def test_jarque_bera_hand_values(spark, tmp_path):
    """q = {1,2,3,4}: s1..s4 = 10/30/100/354; symmetric so skew = 0
    exactly; m2 = 1.25, m4 = 2.5625 -> ex_kurt = 1.64 - 3 = -1.36;
    JB = 4/6 * (-1.36)^2/4 = 0.30826666...."""
    spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,)], "l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    row = all_queries()["q_jarque_bera"](spark, str(tmp_path)).collect()[0]
    assert (row["n"], row["s1"], row["s2"], row["s3"], row["s4"]) == (
        4, 10, 30, 100, 354,
    )
    assert row["skew"] == 0.0
    assert row["ex_kurt"] == pytest.approx(-1.36, abs=1e-12)
    assert row["jb"] == pytest.approx(4 / 6 * 1.36 * 1.36 / 4, abs=1e-12)


def test_brown_forsythe_hand_values(spark, tmp_path):
    """prio A cents {100,300,500}: doubled median 600, dz {400,0,400}
    -> sz 800, szz 320000.  prio B {200,400}: doubled median 600
    (even n sums the two middles), dz {200,200} -> sz 400, szz 80000."""
    rows = [
        ("A", 1.00, 1), ("A", 3.00, 2), ("A", 5.00, 3),
        ("B", 2.00, 4), ("B", 4.00, 5),
    ]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double, o_orderkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["prio"]: r
        for r in all_queries()["q_brown_forsythe"](spark, str(tmp_path)).collect()
    }
    assert (out["A"]["n_i"], out["A"]["sz"], out["A"]["szz_d"]) == (3, 800, 320000.0)
    assert (out["B"]["n_i"], out["B"]["sz"], out["B"]["szz_d"]) == (2, 400, 80000.0)


def test_grubbs_hand_values(spark, tmp_path):
    """Daily cents {100, 200, 600}: mean 300, sample s = sqrt(70000);
    argmax |3x-900| is the 600 day; G = 300/sqrt(70000)."""
    rows = [
        (datetime.date(2024, 1, 1), 1.00),
        (datetime.date(2024, 1, 2), 2.00),
        (datetime.date(2024, 1, 3), 6.00),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = all_queries()["q_grubbs"](spark, str(tmp_path)).collect()[0]
    assert (row["n"], row["sx"]) == (3, 900)
    assert row["out_day"] == datetime.date(2024, 1, 3)
    assert row["out_cents"] == 600
    assert row["g"] == pytest.approx(300 / 70000 ** 0.5, abs=1e-12)


def test_grubbs_tie_breaks_to_earliest_day(spark, tmp_path):
    """Two days tie at max deviation -> the earlier day is reported."""
    rows = [
        (datetime.date(2024, 1, 5), 1.00),
        (datetime.date(2024, 1, 2), 5.00),
        (datetime.date(2024, 1, 3), 3.00),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = all_queries()["q_grubbs"](spark, str(tmp_path)).collect()[0]
    # devs |3x-900|: day5 -> 600, day2 -> 600, day3 -> 0; earliest wins
    assert row["out_day"] == datetime.date(2024, 1, 2)


def test_avg_precision_invariants(spark, sf_dir):
    rows = sorted(
        all_queries()["q_avg_precision"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert rows, "EUROPE suppliers exist at every SF"
    # each emitted row is the i-th positive: cum_pos counts 1..k in order
    assert [r["cum_pos"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["cum_pos"] <= r["rank"]
        assert r["prec_at"] == r["cum_pos"] / r["rank"]


def test_brown_forsythe_odd_group_doubles_single_median(spark, tmp_path):
    """n = 1 group: both middle positions hit the same row, med2 = 2c,
    dz = 0 — the doubled-median contract's degenerate case."""
    rows = [("A", 7.00, 1)]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double, o_orderkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = all_queries()["q_brown_forsythe"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0]["n_i"], out[0]["sz"], out[0]["szz_d"]) == (1, 0, 0.0)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_max_drawdown_hand_values(spark, tmp_path):
    """Flows +100,-300,+500,-200 -> balances 100,-200,300,100; peaks
    100,100,300,300; drawdowns 0,300,0,200 -> max 300."""
    _write_events(spark, tmp_path, [
        (1, _ts(1), 7, "purchase", 1.00),
        (2, _ts(2), 7, "click", 3.00),
        (3, _ts(3), 7, "purchase", 5.00),
        (4, _ts(4), 7, "view", 2.00),
    ])
    rows = all_queries()["q_max_drawdown"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert (rows[0]["user_id"], rows[0]["n_events"], rows[0]["max_dd"]) == (7, 4, 300)


def test_hurst_blocks_hand_values(spark, tmp_path):
    """One month, daily cents {100,200,600}: dev numerators 3*cum-t*900
    = {-600,-900,0} -> rmax 0, rmin -900; sxx 410000."""
    rows = [
        (datetime.date(2024, 1, 1), 1.00),
        (datetime.date(2024, 1, 2), 2.00),
        (datetime.date(2024, 1, 3), 6.00),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = all_queries()["q_hurst_blocks"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["month"], r["n"], r["sx"]) == (datetime.date(2024, 1, 1), 3, 900)
    assert (r["rmax"], r["rmin"], r["sxx_d"]) == (0, -900, 410000.0)


def test_sample_entropy_hand_values(spark, tmp_path):
    """x = {100,100,5000,100}: templates at i<=3; only the (1,2) pair
    is within r=2000, and its successors (100 vs 5000) are not ->
    B=1, A=0, ratio_q=0."""
    _write_events(spark, tmp_path, [
        (1, _ts(1), 7, "click", 1.00),
        (2, _ts(2), 7, "click", 1.00),
        (3, _ts(3), 7, "click", 50.00),
        (4, _ts(4), 7, "click", 1.00),
    ])
    row = all_queries()["q_sample_entropy"](spark, str(tmp_path)).collect()[0]
    assert (row["b_pairs"], row["a_pairs"], row["ratio_q"]) == (1, 0, 0)


def test_sample_entropy_successor_match(spark, tmp_path):
    """All four values equal -> every template pair matches at m=1 AND
    m=2: B = A = C(3,2) = 3, ratio_q = 1e9 exactly."""
    _write_events(spark, tmp_path, [
        (i, _ts(i), 7, "click", 2.00) for i in range(1, 5)
    ])
    row = all_queries()["q_sample_entropy"](spark, str(tmp_path)).collect()[0]
    assert (row["b_pairs"], row["a_pairs"], row["ratio_q"]) == (3, 3, 10 ** 9)


def test_stump_splits_hand_values(spark, tmp_path):
    """x cents {100,200,300,400}, y = F for the two cheapest.  mn=100,
    mx=400, width 301: buckets ((x-100)*64)//301 = {0,21,42,63}.
    Cumulative counts 1,2,3,4; cum_pos 1,2,2,2.  At bucket 21 the
    split is perfect: left = 2 pos of 2, right = 0 of 2 ->
    weighted_gini = 0."""
    rows = [
        (1.00, "F"), (2.00, "F"), (3.00, "O"), (4.00, "O"),
    ]
    spark.createDataFrame(
        rows, "o_totalprice double, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["bucket"]: r
        for r in all_queries()["q_stump_splits"](spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [0, 21, 42, 63]
    assert [out[b]["cum_n"] for b in (0, 21, 42, 63)] == [1, 2, 3, 4]
    assert [out[b]["cum_pos"] for b in (0, 21, 42, 63)] == [1, 2, 2, 2]
    assert out[21]["weighted_gini"] == 0.0
    assert out[0]["weighted_gini"] == pytest.approx(
        (1 / 4) * 0.0 + (3 / 4) * (1 - (1 / 3) ** 2 - (2 / 3) ** 2), abs=1e-12
    )
    assert out[63]["weighted_gini"] is None  # no right side


def test_stump_splits_edges_are_increasing(spark, sf_dir):
    rows = sorted(
        all_queries()["q_stump_splits"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    edges = [r["edge_cents"] for r in rows]
    assert edges == sorted(edges)
    assert rows[-1]["cum_n"] == sum(r["n"] for r in rows)


def test_priority_sample_estimator_unbiased_shape(spark, sf_dir):
    """Structural invariants: 20 rows, every est_w = max(w, tau),
    tau equals the smallest priority NOT in the sample's top-20, and
    the estimate is within 3x of the true total on real data (weak
    sanity bound — the estimator is unbiased, not low-variance at
    k=20)."""
    rows = all_queries()["q_priority_sample"](spark, sf_dir).collect()
    assert len(rows) == 20
    tau = rows[0]["tau"]
    assert all(r["tau"] == tau for r in rows)
    for r in rows:
        assert r["est_w"] == max(float(r["w"]), tau)
    est = sum(r["est_w"] for r in rows)
    true = rows[0]["true_total"]
    assert 0.2 < est / true < 3.0


def test_single_linkage_hand_values(spark, tmp_path):
    """Edges (1,2) sup 3, (2,3) sup 2, (4,5) sup 4.  Cuts:
    t=2 -> {1,2,3} + {4,5}; t=3 -> {1,2} + {4,5}; t=4 -> {4,5}."""
    rows = []
    def basket(ok, parts):
        rows.extend((ok, p) for p in parts)
    for i in range(3):
        basket(10 + i, [1, 2])
    for i in range(2):
        basket(20 + i, [2, 3])
    for i in range(4):
        basket(30 + i, [4, 5])
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        (r["threshold"], r["cluster_size"]): r["n_clusters"]
        for r in all_queries()["q_single_linkage"](spark, str(tmp_path)).collect()
    }
    assert out == {
        (2, 3): 1, (2, 2): 1,
        (3, 2): 2,
        (4, 2): 1,
    }


def test_cronbach_alpha_hand_values(spark, tmp_path):
    """c1 spends (100,200,0) cents across the three years, c2
    (0,0,300): totals 300 each -> stt = 180000; per-item sums
    100/200/300 with squares 10000/40000/90000."""
    rows = [
        (1, datetime.date(1996, 5, 1), 1.00),
        (1, datetime.date(1997, 5, 1), 2.00),
        (2, datetime.date(1998, 5, 1), 3.00),
    ]
    spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["item_year"]: r
        for r in all_queries()["q_cronbach_alpha"](spark, str(tmp_path)).collect()
    }
    assert {(y, out[y]["sx"], out[y]["sxx_d"]) for y in out} == {
        (1996, 100, 10000.0), (1997, 200, 40000.0), (1998, 300, 90000.0),
    }
    any_row = out[1996]
    assert (any_row["n_subjects"], any_row["st"], any_row["stt_d"]) == (
        2, 600, 180000.0,
    )


def test_fleiss_kappa_hand_values(spark, tmp_path):
    """Order 1 rated [A,A,A,B], order 2 [A,A,B,B], order 3 has only
    three items (excluded): N=2, sum nij^2 = 10+8 = 18, s_A=5, s_B=3."""
    sup_region = {1: "ASIA", 2: "ASIA", 3: "EUROPE"}
    li = []
    li += [(1, 1), (1, 1), (1, 2), (1, 3)]          # A A A B
    li += [(2, 1), (2, 2), (2, 3), (2, 3)]          # A A B B
    li += [(3, 1), (3, 1), (3, 1)]                  # 3 items -> excluded
    spark.createDataFrame(
        li, "l_orderkey bigint, l_suppkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, k) for k in sup_region],
        "s_suppkey bigint, s_nationkey bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(k, 1 if v == "ASIA" else 2) for k, v in sup_region.items()],
        "n_nationkey bigint, n_regionkey bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(1, "ASIA"), (2, "EUROPE")], "r_regionkey bigint, r_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "region.parquet"))
    out = {
        r["cat"]: r
        for r in all_queries()["q_fleiss_kappa"](spark, str(tmp_path)).collect()
    }
    assert {(c, out[c]["s_j"]) for c in out} == {("ASIA", 5), ("EUROPE", 3)}
    assert (out["ASIA"]["n_subjects"], out["ASIA"]["sum_nij2"]) == (2, 18)


def test_kernel_smooth_hand_values(spark, tmp_path):
    """Orders at cents {100, 6500} each with 1 and 3 line items.
    mn=100, mx=6500: grid step (6400*(2g+1))//64 = 100*(2g+1)+eps,
    h = 6400//16 + 1 = 401.  Point x=100 falls in windows of g=0
    (gx=200, d=-100) and g=1 (gx=400, d=-300); x=6500 in g=30
    (gx=6200, d=300) and g=31 (gx=6400, d=100).  Kernel weights
    401^2-100^2 = 150801 and 401^2-300^2 = 70801."""
    spark.createDataFrame(
        [(1, 1.00), (2, 65.00)], "o_orderkey bigint, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li = [(1, 10)] + [(2, 20), (2, 21), (2, 22)]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r["g"]: r
        for r in all_queries()["q_kernel_smooth"](spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [0, 1, 30, 31]
    assert out[0]["h"] == 401 and out[0]["gx"] == 200
    assert (out[0]["s_kern"], out[0]["s_kern_y"]) == (150801.0, 150801.0)
    assert (out[1]["s_kern"], out[1]["s_kern_y"]) == (70801.0, 70801.0)
    # the expensive order has y = 3 line items -> NW smooth = 3 there
    assert (out[30]["s_kern"], out[30]["s_kern_y"]) == (70801.0, 3 * 70801.0)
    assert out[30]["nw_smooth"] == 3.0
    assert out[31]["nw_smooth"] == 3.0


def test_kendall_w_rank_sum_invariant(spark, sf_dir):
    """Rank sums over m=3 complete rankings of the same n nations must
    total 3 * n(n+1)/2, each between 3 and 3n."""
    rows = all_queries()["q_kendall_w"](spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["rank_sum"] for r in rows)
    # every year ranks the same nation set at these SFs (all nations
    # supply every year), so rank sums are a permutation-sum identity
    assert total == 3 * n * (n + 1) // 2
    for r in rows:
        assert 3 <= r["rank_sum"] <= 3 * n


def test_kmv_distinct_estimator_accuracy(spark, sf_dir):
    """k=64 KMV has ~1/sqrt(62) relative sd; assert the estimate lands
    within 50% of truth (many sigmas) and the kth hash is consistent
    with the estimator formula (full-sketch regime at every SF)."""
    row = all_queries()["q_kmv_distinct"](spark, sf_dir).collect()[0]
    assert (row["k"], row["n_kept"]) == (64, 64)
    assert row["est_distinct"] == 63.0 * 281474976710656.0 / row["kth_hash"]
    assert 0.5 < row["est_distinct"] / row["true_distinct"] < 2.0


def test_kmv_underfull_sketch_is_exact(spark, tmp_path):
    """Fewer distinct keys than k: the sketch holds every key, so the
    estimate must be the EXACT count, not the (k-1)/h_k formula."""
    rows = [(i, i * 7) for i in range(1, 41) for _ in (0, 1)]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = all_queries()["q_kmv_distinct"](spark, str(tmp_path)).collect()[0]
    assert row["n_kept"] == 40
    assert row["est_distinct"] == 40.0
    assert row["true_distinct"] == 40


def test_random_projection_jl_concentration(spark, sf_dir):
    """Ratios d2_proj / (8 * d2_orig) must center near 1 (JL): the
    mean over the sampled pairs within [0.7, 1.3] and individual
    ratios within [0.05, 5] (64 -> 8 dims is coarse but bounded)."""
    rows = all_queries()["q_random_projection"](spark, sf_dir).collect()
    assert len(rows) > 50
    ratios = [r["ratio"] for r in rows]
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3, mean
    assert all(0.02 < r < 8 for r in ratios)


def test_random_projection_signs_match_hashlib(spark, sf_dir):
    """Replicate one pair's d2_proj in pure Python from the same md5
    sign matrix and quantized embeddings."""
    import hashlib

    from loan_etl_data_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F
    import math

    emb = {
        r["vec_id"]: r["xq"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> cast(floor(cast(x as double)"
                " * 1000000) as bigint))"
            ).alias("xq"),
        )
        .limit(500)
        .collect()
    }

    def sign(i, j):
        h = int(hashlib.md5(f"{i}_{j}jl".encode()).hexdigest()[:12], 16)
        return 1 if h % 2 == 0 else -1

    def proj(x):
        return [sum(sign(i, j) * x[i] for i in range(64)) for j in range(8)]

    rows = all_queries()["q_random_projection"](spark, sf_dir).collect()
    r = min(rows, key=lambda r: (r["ida"], r["idb"]))
    pa, pb = proj(emb[r["ida"]]), proj(emb[r["idb"]])
    d2p = sum((u - v) ** 2 for u, v in zip(pa, pb))
    assert d2p == r["d2_proj"]
    d2o = sum((u - v) ** 2 for u, v in zip(emb[r["ida"]], emb[r["idb"]]))
    assert d2o == r["d2_orig"]


def test_energy_distance_hand_values(spark, tmp_path):
    """X (F) = {100, 300}, Y (O) = {200}.  S_xx = |100-300| = 200;
    S_yy = 0; S_xy = |100-200| + |300-200| = 200."""
    rows = [
        ("F", 1.00), ("F", 3.00), ("O", 2.00),
    ]
    spark.createDataFrame(
        rows, "o_orderstatus string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_energy_distance"](spark, str(tmp_path)).collect()[0]
    assert (r["n_x"], r["n_y"]) == (2, 1)
    assert (r["s_xy_d"], r["s_xx_d"], r["s_yy_d"]) == (200.0, 200.0, 0.0)


def test_energy_distance_brute_force(spark, tmp_path):
    """Random two-sample fixture vs O(n^2) Python brute force."""
    import random

    rng = random.Random(3)
    rows = [
        ("F" if rng.random() < 0.5 else "O", round(rng.uniform(1, 50), 2))
        for _ in range(60)
    ]
    spark.createDataFrame(
        rows, "o_orderstatus string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import math
    # same double arithmetic as the engine: floor(v * 100), no rounding
    x = [int(math.floor(v * 100)) for s, v in rows if s == "F"]
    y = [int(math.floor(v * 100)) for s, v in rows if s == "O"]
    r = all_queries()["q_energy_distance"](spark, str(tmp_path)).collect()[0]
    sxx = sum(abs(a - b) for i, a in enumerate(x) for b in x[i + 1:])
    syy = sum(abs(a - b) for i, a in enumerate(y) for b in y[i + 1:])
    sxy = sum(abs(a - b) for a in x for b in y)
    assert (r["n_x"], r["n_y"]) == (len(x), len(y))
    assert (r["s_xx_d"], r["s_yy_d"], r["s_xy_d"]) == (
        float(sxx), float(syy), float(sxy),
    )


def test_chow_test_hand_values(spark, tmp_path):
    """Two days pre-break (t=0,1; cents 100,200) and one post (t=400;
    cents 700): segment moments check by hand."""
    rows = [
        (datetime.date(1995, 1, 1), 1.00),
        (datetime.date(1995, 1, 2), 2.00),
        (datetime.date(1996, 2, 5), 7.00),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["segment"]: r
        for r in all_queries()["q_chow_test"](spark, str(tmp_path)).collect()
    }
    pre, post = out["pre"], out["post"]
    assert (pre["n"], pre["st"], pre["sy"], pre["stt"]) == (2, 1, 300, 1)
    assert (pre["sty_d"], pre["syy_d"]) == (200.0, 50000.0)
    t_post = (datetime.date(1996, 2, 5) - datetime.date(1995, 1, 1)).days
    assert (post["n"], post["st"], post["sy"]) == (1, t_post, 700)
    assert post["sty_d"] == float(t_post * 700)


def test_median_polish_hand_values(spark, tmp_path):
    """2x2 additive table v = row + col: rows {0, 40}, cols {0, 6} in
    cents — residuals of a perfectly additive table polish to exactly
    0 at every scale.  Cells: (n1,1996)=0.10, (n1,1997)=0.16,
    (n2,1996)=0.50, (n2,1997)=0.56 dollars via single line items."""
    li, orders, sup = [], [], [(1, 1), (2, 2)]
    k = 0
    for nk, yr, price in [
        (1, 1996, 0.10), (1, 1997, 0.16), (2, 1996, 0.50), (2, 1997, 0.56),
    ]:
        k += 1
        orders.append((k, datetime.date(yr, 6, 1)))
        li.append((k, nk, price))
    spark.createDataFrame(
        li, "l_orderkey bigint, l_suppkey bigint, l_extendedprice double"
    ).selectExpr(
        "l_orderkey", "l_suppkey", "l_extendedprice",
        "cast(0.0 as double) as l_discount",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        sup, "s_suppkey bigint, s_nationkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = all_queries()["q_median_polish"](spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert all(r["scale"] == 16 for r in out)
    assert all(r["resid16"] == 0 for r in out), out


def test_median_polish_residual_medians_are_zeroish(spark, sf_dir):
    """After two full sweeps every row's doubled median of residuals
    is small relative to the scale-16 values (polish convergence
    direction), and the decomposition preserves cell count."""
    rows = all_queries()["q_median_polish"](spark, sf_dir).collect()
    by_nk = {}
    for r in rows:
        by_nk.setdefault(r["nk"], []).append(r["resid16"])
    assert all(len(v) == 3 for v in by_nk.values())
    for vs in by_nk.values():
        vs = sorted(vs)
        assert vs[1] == 0 or abs(vs[1]) <= max(map(abs, vs))


def test_siegel_slope_hand_values(spark, tmp_path):
    """Days t={0,1,2} with cents {100, 200, 900}.  Slopes per day:
    t0: {100, 400} -> med2 = 500; t1: {100, 700} -> med2 = 800;
    t2: {400, 700} -> med2 = 1100.  Final doubled median of
    {500, 800, 1100} = 800 + 800 = 1600 -> slope 400 (robust to the
    t2 spike pulling OLS to 400 too on this tiny case)."""
    rows = [
        (datetime.date(2024, 1, 1), 1.00),
        (datetime.date(2024, 1, 2), 2.00),
        (datetime.date(2024, 1, 3), 9.00),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_siegel_slope"](spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 3
    assert r["slope4"] == 1600.0
    assert r["slope"] == 400.0


def test_siegel_robust_to_minority_outliers(spark, tmp_path):
    """A clean slope-100 line of 9 days with 2 wild spikes: the
    repeated median must stay at exactly 100 cents/day."""
    base = datetime.date(2024, 1, 1)
    rows = []
    for t in range(9):
        v = 1.00 * (t + 1)
        if t in (3, 7):
            v += 500.0
        rows.append((base + datetime.timedelta(days=t), v))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_siegel_slope"](spark, str(tmp_path)).collect()[0]
    assert r["slope"] == 100.0


def test_simpsons_pooled_consistency(spark, sf_dir):
    rows = all_queries()["q_simpsons"](spark, sf_dir).collect()
    # all supplier nations present at the given SF (10 at sf0.001)
    assert len(rows) >= 10
    pooled = {r["pooled_num"] for r in rows}
    assert len(pooled) == 1
    for r in rows:
        expect = (r["num"] > 0 > r["pooled_num"]) or (
            r["num"] < 0 < r["pooled_num"]
        )
        assert r["reversed"] == expect


def test_cooks_distance_flags_planted_outlier(spark, tmp_path):
    """A clean slope-100 line of 20 days with one wild endpoint: the
    planted day must rank first by Cook's D, with high leverage (it's
    at the extreme t) and the largest |residual|."""
    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=t), 1.00 * (t + 1)) for t in range(19)
    ]
    rows.append((base + datetime.timedelta(days=19), 200.00))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = all_queries()["q_cooks_distance"](spark, str(tmp_path)).collect()
    assert out[0]["day"] == base + datetime.timedelta(days=19)
    assert out[0]["cooks_d"] == max(r["cooks_d"] for r in out)
    assert abs(out[0]["residual"]) == max(abs(r["residual"]) for r in out)
    assert all(0 < r["leverage"] < 1 for r in out)


def test_crosstab_stdres_margins_consistent(spark, sf_dir):
    """Residuals weighted by sqrt(exp) must sum to ~0 along every row
    margin (obs and exp share margins), and exp_num/n reproduces the
    expected count."""
    rows = all_queries()["q_crosstab_stdres"](spark, sf_dir).collect()
    n = rows[0]["n"]
    assert sum(r["obs"] for r in rows) == n
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r["prio"], []).append(r)
    for prio, cells in by_prio.items():
        # sum over row of (obs - exp) = 0 exactly in rationals
        delta = sum(r["obs"] - r["exp_num"] / n for r in cells)
        assert abs(delta) < 1e-6, (prio, delta)


def test_lmoments_hand_values(spark, tmp_path):
    """Daily cents sorted {100,200,600}: B0=900, B1=0*100+1*200+2*600
    = 1400, B2=C(1,2)? no — C(r-1,2) = {0,0,1} -> B2=600, B3=0.
    lambda1 = 300, lambda2 = 2*1400/(3*2)... downstream; here the
    emitted numerators must be exact."""
    rows = [
        (datetime.date(2024, 1, 1), 1.00),
        (datetime.date(2024, 1, 2), 2.00),
        (datetime.date(2024, 1, 3), 6.00),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_lmoments"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["b0_d"], r["b1_d"], r["b2_d"], r["b3_d"]) == (
        3, 900.0, 1400.0, 600.0, 0.0,
    )
    # L-scale from the numerators: lambda2 = 2*B1/(n*(n-1)) - B0/n
    lam2 = 2 * r["b1_d"] / (3 * 2) - r["b0_d"] / 3
    assert lam2 == pytest.approx(1400 / 3 - 300, abs=1e-12)


def test_mahalanobis_flags_joint_outlier(spark, tmp_path):
    """Points on the x=y diagonal plus one off-diagonal point that is
    NOT extreme in either axis alone — Mahalanobis must rank the
    off-diagonal point first (the reason it exists over per-axis
    fences)."""
    cust = [(k, 10.0 * k) for k in range(1, 9)]  # balances 10..80
    cust.append((9, 40.0))  # middle balance
    spark.createDataFrame(
        cust, "c_custkey bigint, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [(k, k, 10.0 * k) for k in range(1, 9)]  # spend == balance
    orders.append((99, 9, 10.0))  # off-diagonal: mid balance, low spend
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = all_queries()["q_mahalanobis"](spark, str(tmp_path)).collect()
    assert out[0]["c_custkey"] == 9
    assert out[0]["d2"] == max(r["d2"] for r in out)


def test_pps_systematic_pacing_identity(spark, sf_dir):
    """The grid is capped at exactly k = 24 points (the integer
    interval's remainder tail would otherwise admit a 25th), so
    sum(multiplicity) == 24 is an identity; every unit's multiplicity
    is bounded by its weight span."""
    rows = all_queries()["q_pps_systematic"](spark, sf_dir).collect()
    assert rows
    I = rows[0]["ival"]
    assert sum(x["multiplicity"] for x in rows) == 24
    for x in rows:
        assert x["multiplicity"] <= -(-x["w"] // I) + 1


def test_partial_corr_bounds_and_consistency(spark, sf_dir):
    r = all_queries()["q_partial_corr"](spark, sf_dir).collect()[0]
    for c in ("r_xy", "r_xz", "r_yz", "r_xy_z"):
        assert -1.0 <= r[c] <= 1.0
    # replicating the partial from the emitted r's must be exact
    expect = (r["r_xy"] - r["r_xz"] * r["r_yz"]) / (
        (1.0 - r["r_xz"] * r["r_xz"]) * (1.0 - r["r_yz"] * r["r_yz"])
    ) ** 0.5
    assert r["r_xy_z"] == pytest.approx(expect, abs=1e-15)


def test_cmh_cells_partition_strata(spark, sf_dir):
    rows = all_queries()["q_cmh"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["a"] + r["b"] + r["c"] + r["d"] == r["n"]
        # quantized MH terms reproduce the rational within 1 ulp of 1e-9
        assert r["ad_over_n_q"] == (r["a"] * r["d"] * 10 ** 9) // r["n"]
        assert r["bc_over_n_q"] == (r["b"] * r["c"] * 10 ** 9) // r["n"]


def test_harmonic_centrality_layers_match_per_source_bfs(spark, tmp_path):
    """Path graph 1-2-3-4-5 plus isolated edge (10,11): probe sources
    are the 4 lowest node ids {1,2,3,4}.  Hand distances (<=3):
    src 1: d(2)=1,d(3)=2,d(4)=3 -> harm12 = 12+6+4 = 22, reach 3;
    src 2: d(1)=1,d(3)=1,d(4)=2,d(5)=3 -> 12+12+6+4 = 34, reach 4;
    src 3: d=1 to 2,4; d=2 to 1,5 -> 12+12+6+6 = 36, reach 4;
    src 4: d(3)=1,d(5)=1,d(2)=2,d(1)=3 -> 12+12+6+4 = 34, reach 4."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    # lineitem fixture: each edge needs support >= 2 (two shared orders)
    li = []
    ok = 0
    for a, b in edges:
        for _ in range(2):
            ok += 1
            li += [(ok, a), (ok, b)]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r["src_node"]: (r["reach"], r["harm12"])
        for r in all_queries()["q_harmonic_centrality"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: (3, 22), 2: (4, 34), 3: (4, 36), 4: (4, 34)}


def test_youden_threshold_hand_values(spark, tmp_path):
    """Scores {100,200,300,400} with positives at {100,200}: the
    perfect rule is score <= 200 -> tp=2, fp=0, J = 1 exactly; the
    integer argmax key is tp*N - fp*P = 2*2 - 0 = 4."""
    cust = [(1, 1.00), (2, 2.00), (3, 3.00), (4, 4.00)]
    spark.createDataFrame(
        cust, "c_custkey bigint, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [(1, 1, "F"), (2, 2, "F"), (3, 3, "O"), (4, 4, "O")]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = all_queries()["q_youden_threshold"](spark, str(tmp_path)).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["threshold_cents"], r["tp"], r["fp"]) == (200, 2, 0)
    assert (r["n_pos"], r["n_neg"], r["j_num"]) == (2, 2, 4)
    assert r["youden_j"] == 1.0


def test_youden_threshold_argmax_is_exact(spark, tmp_path):
    """Scores {100, 200, 300} with the single positive at 200
    (negatives at 100 and 300): J numerators tp*N - fp*P per cutoff
    are -1 / 1 / 0, so the exact integer argmax picks 200."""
    cust = [(1, 1.00), (2, 2.00), (3, 3.00)]
    spark.createDataFrame(
        cust, "c_custkey bigint, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [(1, 2, "F")]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_youden_threshold"](spark, str(tmp_path)).collect()[0]
    # J(100) = 0*2-1*1 <0; J(200) = 1*2-1*1 = 1; J(300) = 1*2-2*1 = 0
    assert r["threshold_cents"] == 200
    assert r["j_num"] == 1


def test_pps_systematic_degenerate_tiny_weights(spark, tmp_path):
    """ADVICE r5: with total weight W < k = 24 the raw interval
    W div 24 is 0 and the start-offset modulo / hit division would
    divide by zero (Spark NULL vs DuckDB error — a silent cross-engine
    divergence).  The greatest(ival, 1) pin turns the degenerate case
    into a well-defined every-unit sample: 5 units of weight 1 ->
    ival = 1, five hits, multiplicity 1 each."""
    cust = [(i, 0.01) for i in range(1, 6)]  # floor(0.01*100) = 1 cent
    spark.createDataFrame(
        cust, "c_custkey bigint, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    rows = all_queries()["q_pps_systematic"](spark, str(tmp_path)).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ival"] == 1
        assert r["r"] == 0
        assert r["multiplicity"] == 1
