"""Hand-value fixtures for the round-7 additions.  Each plants a
fixture whose answer is known in closed form, so a green oracle can
never be green-by-both-engines-wrong."""

from __future__ import annotations

import datetime

from loan_etl_data_pipeline_spark.queries import all_queries

QUERIES = all_queries()


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_heavy_hitters_maintained_hand_counts(spark, tmp_path):
    """Planted corpus: 40 signup rows (one heavy item) + 60 click rows
    spread over user_ids 0..59 (items click#0..click#49, ~1 each — far
    more distinct items than the capacity-6 MG summaries, so eviction
    runs) + one null-user click that must vanish from both the item
    stream and the denominator.  Threshold 6·n > N=100 admits exactly
    signup (240 > 100); the densest tail item has n=2 (12 < 100).
    Rows span all three micro-batch chunks so the MG state genuinely
    carries across batches."""
    c0 = datetime.datetime(2024, 1, 5, 12, 0, 0)  # chunk 0 (< Jan 11)
    c1 = datetime.datetime(2024, 1, 15, 12, 0, 0)  # chunk 1
    c2 = datetime.datetime(2024, 1, 25, 12, 0, 0)  # chunk 2
    rows = []
    eid = 0
    for i in range(40):  # heavy item, spread over all chunks
        eid += 1
        rows.append((eid, 7, [c0, c1, c2][i % 3], "signup", 1.0))
    for i in range(60):  # tail items — force MG decrements
        eid += 1
        rows.append((eid, i, [c0, c1, c2][i % 3], "click", 1.0))
    eid += 1
    rows.append((eid, None, c1, "click", 1.0))  # null item: excluded
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, ts timestamp, "
           "event_type string, value double")
    out = QUERIES["q_heavy_hitters_maintained"](spark, str(tmp_path)).collect()
    assert [(r["item"], r["n"], r["n_events"]) for r in out] == [
        ("signup", 40, 100)
    ]


def test_vwap_hand_ratio(spark, tmp_path):
    """Two items on one day: cents 1000+2000, qty 1+2 → vwap 1000.0."""
    d = datetime.datetime(2024, 3, 1, 0, 0, 0)
    _write(spark, tmp_path, "lineitem",
           [(1, d, 1.0, 10.0), (2, d, 2.0, 20.0)],
           "l_orderkey bigint, l_shipdate timestamp, l_quantity double, "
           "l_extendedprice double")
    out = QUERIES["q_vwap"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["price_cents"], r["qty"], r["vwap_cents"]) == (3000, 3, 1000.0)


def test_turning_points_hand_series(spark, tmp_path):
    """Daily revenue 1,3,2,5,4 → interior 3,2,5: peaks {3,5}, trough
    {2}; expectation 2(5−2)/3 = 2."""
    rows = []
    for i, v in enumerate([1, 3, 2, 5, 4]):
        rows.append((i + 1, datetime.datetime(2024, 3, 1 + i), float(v)))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    r = QUERIES["q_turning_points"](spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["n_peaks"], r["n_troughs"], r["n_turning"]) == (
        5, 2, 1, 3)
    assert r["expected_turning"] == 2.0


def test_page_hinkley_hand_path(spark, tmp_path):
    """Cents 100,200,300: dev_q = 0, 50, 100 → path 0,50,150 →
    range 150, peaking on the last day."""
    rows = [(i + 1, datetime.datetime(2024, 3, 1 + i), v)
            for i, v in enumerate([1.0, 2.0, 3.0])]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    r = QUERIES["q_page_hinkley"](spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["ph_range"]) == (3, 150)
    assert r["peak_day"] == datetime.date(2024, 3, 3)


def test_cliffs_delta_hand_counts(spark, tmp_path):
    """R = {1, 3} cents vs A = {2}: one win, one loss → δ = 0."""
    d = datetime.datetime(2024, 3, 1)
    _write(spark, tmp_path, "lineitem",
           [(1, d, 1.0, 0.01, "R"), (2, d, 1.0, 0.03, "R"),
            (3, d, 1.0, 0.02, "A")],
           "l_orderkey bigint, l_shipdate timestamp, l_quantity double, "
           "l_extendedprice double, l_returnflag string")
    r = QUERIES["q_cliffs_delta"](spark, str(tmp_path)).collect()[0]
    assert (r["n_r"], r["n_a"], r["d_gt"], r["d_lt"], r["cliffs_delta"]) == (
        2, 1, 1.0, 1.0, 0.0)


def test_cohens_d_hand_moments(spark, tmp_path):
    """R = {200, 400}, A = {100, 300} cents: pooled s² = 20000,
    d = 100/√20000."""
    import math

    d = datetime.datetime(2024, 3, 1)
    _write(spark, tmp_path, "lineitem",
           [(1, d, 1.0, 2.0, "R"), (2, d, 1.0, 4.0, "R"),
            (3, d, 1.0, 1.0, "A"), (4, d, 1.0, 3.0, "A")],
           "l_orderkey bigint, l_shipdate timestamp, l_quantity double, "
           "l_extendedprice double, l_returnflag string")
    r = QUERIES["q_cohens_d"](spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"]) == (2, 2)
    assert abs(r["cohens_d"] - 100.0 / math.sqrt(20000.0)) < 1e-12


def test_weighted_kappa_perfect_agreement(spark, tmp_path):
    """Five orders whose priority class equals their price quintile →
    zero weighted disagreement → κ_w = 1 exactly."""
    rows = [(i, f"{i}-X", float(i * 100)) for i in range(1, 6)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderpriority string, o_totalprice double")
    r = QUERIES["q_weighted_kappa"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["weighted_kappa"]) == (5, 1.0)


def test_gk_gamma_perfect_concordance(spark, tmp_path):
    """Cells (x=1,y=1) and (x=2,y=2) only → C=1, D=0 → γ = 1."""
    d = datetime.datetime(2024, 3, 1)
    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", 1.0), (2, "2-HIGH", 1.0)],
           "o_orderkey bigint, o_orderpriority string, o_totalprice double")
    _write(spark, tmp_path, "lineitem",
           [(1, d, 1.0, 1.0), (2, d, 2.0, 1.0)],
           "l_orderkey bigint, l_shipdate timestamp, l_quantity double, "
           "l_extendedprice double")
    r = QUERIES["q_gk_gamma"](spark, str(tmp_path)).collect()[0]
    assert (r["concordant"], r["discordant"], r["gamma"]) == (1.0, 0.0, 1.0)


def test_tvd_weekend_hand_mix(spark, tmp_path):
    """Weekday {click:2} vs weekend {click:1, view:1} → TVD = ½(½+½)
    = 0.5 (2024-01-10 is a Wednesday, 2024-01-13 a Saturday)."""
    wd = datetime.datetime(2024, 1, 10, 12, 0, 0)
    we = datetime.datetime(2024, 1, 13, 12, 0, 0)
    _write(spark, tmp_path, "events",
           [(1, wd, "click"), (2, wd, "click"),
            (3, we, "click"), (4, we, "view")],
           "event_id bigint, ts timestamp, event_type string")
    r = QUERIES["q_tvd_weekend"](spark, str(tmp_path)).collect()[0]
    assert (r["n_weekday"], r["n_weekend"], r["tvd"]) == (2, 2, 0.5)


def test_bhattacharyya_identical_histograms(spark, tmp_path):
    """Identical 1-point histograms overlap fully: BC = 1."""
    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", 1000.0), (2, "5-LOW", 1000.0)],
           "o_orderkey bigint, o_orderpriority string, o_totalprice double")
    r = QUERIES["q_bhattacharyya"](spark, str(tmp_path)).collect()[0]
    assert (r["n_bins"], r["bc_q"], r["bc"]) == (1, 10**9, 1.0)


def test_poisson_dispersion_hand_counts(spark, tmp_path):
    """Daily counts {1, 3}: D = (2·10 − 16)/(1·4) = 1.0."""
    d1 = datetime.datetime(2024, 3, 1, 1, 0, 0)
    d2 = datetime.datetime(2024, 3, 2, 1, 0, 0)
    rows = [(1, d1, "click"), (2, d2, "click"), (3, d2, "click"),
            (4, d2, "click")]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, ts timestamp, event_type string")
    r = QUERIES["q_poisson_dispersion"](spark, str(tmp_path)).collect()[0]
    assert (r["event_type"], r["n_days"], r["dispersion"]) == ("click", 2, 1.0)


def test_kish_ess_equal_weights(spark, tmp_path):
    """Equal weights: ESS = n exactly (here 2)."""
    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", 1.0), (2, "1-URGENT", 1.0)],
           "o_orderkey bigint, o_orderpriority string, o_totalprice double")
    r = QUERIES["q_kish_ess"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["ess"]) == (2, 2.0)


def test_l_diversity_hand_bands(spark, tmp_path):
    """Class A has three $1000-bands (l=3, strong); class B one (weak)."""
    _write(spark, tmp_path, "customer",
           [(1, 0, "AUTO", 0.0), (2, 0, "AUTO", 1000.0),
            (3, 0, "AUTO", 2500.0), (4, 1, "AUTO", 10.0)],
           "c_custkey bigint, c_nationkey int, c_mktsegment string, "
           "c_acctbal double")
    out = {(r["nk"], r["c_mktsegment"]): r
           for r in QUERIES["q_l_diversity"](spark, str(tmp_path)).collect()}
    assert (out[(0, "AUTO")]["n"], out[(0, "AUTO")]["l"],
            out[(0, "AUTO")]["weak"]) == (3, 3, False)
    assert (out[(1, "AUTO")]["l"], out[(1, "AUTO")]["weak"]) == (1, True)


def test_lattice_structure_invariants(spark, sf_dir):
    """The 16×16 rook lattice is a constant of the grid: 256 cells,
    960 ordered adjacent pairs; Moran's I and Geary's C stay in their
    theoretical ranges on real data."""
    mi = QUERIES["q_moran_i"](spark, sf_dir).collect()[0]
    gc = QUERIES["q_geary_c"](spark, sf_dir).collect()[0]
    assert (mi["n_cells"], mi["w_pairs"]) == (256, 960)
    assert (gc["n_cells"], gc["w_pairs"]) == (256, 960)
    assert -1.2 <= mi["moran_i"] <= 1.2
    assert 0.0 <= gc["geary_c"] <= 3.0


def _copurchase_lineitem(tmp_path, spark, edge_list):
    """Stage a lineitem whose support-2 co-purchase graph is exactly
    edge_list: two orders per edge, each holding both parts."""
    d = datetime.datetime(2024, 3, 1)
    rows, ok = [], 1
    for (a, b) in edge_list:
        for _ in range(2):
            rows.append((ok, a, d, 1.0, 1.0))
            rows.append((ok, b, d, 1.0, 1.0))
            ok += 1
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint, l_shipdate timestamp, "
           "l_quantity double, l_extendedprice double")


def test_rich_club_clique_plus_leaf(spark, tmp_path):
    """K4 on parts 1–4 (degree 3) plus leaf 5–1 (degree 1/4): at k=2
    the club is the K4 nodes {2,3,4} plus hub 1 → all four, φ = 1 on
    the 6 clique edges; at k=3 only the hub survives (φ null)."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    _copurchase_lineitem(tmp_path, spark, edges)
    out = {r["k"]: r for r in
           QUERIES["q_rich_club"](spark, str(tmp_path)).collect()}
    assert (out[2]["n_nodes"], out[2]["n_edges"], out[2]["phi"]) == (4, 6, 1.0)
    assert (out[3]["n_nodes"], out[3]["n_edges"], out[3]["phi"]) == (1, 0, None)
    assert (out[8]["n_nodes"], out[8]["n_edges"], out[8]["phi"]) == (0, 0, None)


def test_link_prediction_path_graph(spark, tmp_path):
    """Path 1–2–3: the only non-adjacent wedge pair is (1,3) through
    hub 2 (degree 2) → cn=1, ra_q = 10^12 div 2."""
    _copurchase_lineitem(tmp_path, spark, [(1, 2), (2, 3)])
    out = QUERIES["q_ra_link_prediction"](spark, str(tmp_path)).collect()
    assert [(r["pa"], r["pb"], r["cn"], r["ra_q"]) for r in out] == [
        (1, 3, 1, 500000000000)
    ]


def test_dunn_index_two_clusters(spark, tmp_path):
    """Clusters {0,100} and {500,600} cents: max diameter 100, min
    inter-gap 400 → Dunn = 4."""
    _write(spark, tmp_path, "customer",
           [(1, 0, "A", 0.0), (2, 0, "A", 1.0),
            (3, 1, "A", 5.0), (4, 1, "A", 6.0)],
           "c_custkey bigint, c_nationkey int, c_mktsegment string, "
           "c_acctbal double")
    r = QUERIES["q_dunn_index"](spark, str(tmp_path)).collect()[0]
    assert (r["min_inter"], r["max_diam"], r["dunn"]) == (400, 100, 4.0)


def test_katz_bounded_path_graph(spark, tmp_path):
    """Path 1–2–3: w = (deg, Σdeg(N), ΣΣ) gives katz_q 26/44/26 — the
    middle node dominates, leaves tie and break by node id."""
    _copurchase_lineitem(tmp_path, spark, [(1, 2), (2, 3)])
    out = [(r["node"], r["katz_q"]) for r in
           QUERIES["q_katz_bounded"](spark, str(tmp_path)).collect()]
    assert out == [(2, 44), (1, 26), (3, 26)]


def test_mk_seasonal_monday_trend(spark, tmp_path):
    """Three rising Mondays → S=3 over 3 pairs for isodow 1; a lone
    Tuesday contributes no pair and no row."""
    rows = [(1, datetime.datetime(2024, 1, 1), 1.0),   # Mon
            (2, datetime.datetime(2024, 1, 8), 2.0),   # Mon
            (3, datetime.datetime(2024, 1, 15), 3.0),  # Mon
            (4, datetime.datetime(2024, 1, 2), 9.0)]   # Tue
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    out = {r["dow"]: (r["s"], r["n_pairs"]) for r in
           QUERIES["q_mk_seasonal"](spark, str(tmp_path)).collect()}
    assert out == {1: (3, 3)}


def test_bowker_asymmetric_cells(spark, tmp_path):
    """Priorities (1,2,4) with prices ranking (2,1,3): the (1,2) pair
    is symmetric (contrib 0), the (3,4) pair is pure one-way flow
    (contrib 1)."""
    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", 200.0), (2, "2-HIGH", 100.0),
            (3, "4-NOT SPECIFIED", 300.0)],
           "o_orderkey bigint, o_orderpriority string, o_totalprice double")
    out = {(r["i"], r["j"]): r for r in
           QUERIES["q_bowker"](spark, str(tmp_path)).collect()}
    assert (out[(1, 2)]["nij"], out[(1, 2)]["nji"],
            out[(1, 2)]["contrib"]) == (1, 1, 0.0)
    assert (out[(3, 4)]["nij"], out[(3, 4)]["nji"], out[(3, 4)]["s"],
            out[(3, 4)]["contrib"]) == (0, 1, 1, 1.0)


def test_lorenz_deciles_linear_revenue(spark, tmp_path):
    """Customers with revenue $1..$10 land one per decile; the curve's
    endpoints and one interior point are closed-form."""
    rows = [(i, i, float(i)) for i in range(1, 11)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_totalprice double")
    out = {r["decile"]: r for r in
           QUERIES["q_lorenz_deciles"](spark, str(tmp_path)).collect()}
    assert all(out[k]["n_cust"] == 1 for k in range(1, 11))
    assert out[1]["cents"] == 100 and out[10]["cents"] == 1000
    assert out[1]["cum_share"] == 100.0 / 5500.0
    assert out[10]["cum_share"] == 1.0


def test_ljung_box_consistent_with_acf(spark, sf_dir):
    """Q must equal n(n+2)·Σ r_k²/m_k recomputed in Python from the
    certified q_autocorr output, with the same left-to-right addition
    order (bit-identical doubles)."""
    ac = {r["lag"]: r for r in QUERIES["q_autocorr"](spark, sf_dir).collect()}
    from loan_etl_data_pipeline_spark.queries import _daily_cents

    n = _daily_cents(spark, sf_dir).count()
    acc = 0.0
    for k in range(1, 8):
        acc = acc + ac[k]["r"] * ac[k]["r"] / float(ac[k]["n_pairs"])
    expected = float(n) * (float(n) + 2.0) * acc
    r = QUERIES["q_ljung_box"](spark, sf_dir).collect()[0]
    assert (r["n_days"], r["n_lags"]) == (n, 7)
    assert r["q_lb"] == expected


def test_xyz_parts_steady_vs_erratic(spark, tmp_path):
    """Part 1 ships (10, 10) monthly (cv²=0 → X); part 2 ships (1, 9)
    (cv² = 1.28 → Z)."""
    jan = datetime.datetime(2024, 1, 15)
    feb = datetime.datetime(2024, 2, 15)
    _write(spark, tmp_path, "lineitem",
           [(1, 1, jan, 10.0, 1.0), (2, 1, feb, 10.0, 1.0),
            (3, 2, jan, 1.0, 1.0), (4, 2, feb, 9.0, 1.0)],
           "l_orderkey bigint, l_partkey bigint, l_shipdate timestamp, "
           "l_quantity double, l_extendedprice double")
    out = {r["xyz_class"]: r["n_parts"] for r in
           QUERIES["q_xyz_parts"](spark, str(tmp_path)).collect()}
    assert out == {"X": 1, "Z": 1}


def test_footrule_reversed_ranks(spark, tmp_path):
    """Two parts whose revenue order REVERSES between eras: ranks
    (1,2)→(2,1) give footrule 2, normalized 2·2/2² = 1."""
    e1 = datetime.datetime(1996, 6, 1)
    e2 = datetime.datetime(1999, 6, 1)
    _write(spark, tmp_path, "lineitem",
           [(1, 1, e1, 1.0, 10.0), (2, 2, e1, 1.0, 5.0),
            (3, 1, e2, 1.0, 5.0), (4, 2, e2, 1.0, 10.0)],
           "l_orderkey bigint, l_partkey bigint, l_shipdate timestamp, "
           "l_quantity double, l_extendedprice double")
    r = QUERIES["q_footrule"](spark, str(tmp_path)).collect()[0]
    assert (r["n_common"], r["footrule"], r["norm_footrule"]) == (2, 2, 1.0)


def test_holiday_lift_hand_ratio(spark, tmp_path):
    """Dec 25 revenue 300 vs two other days averaging 100 → lift 3."""
    rows = [(1, datetime.datetime(2023, 12, 25), 3.0),
            (2, datetime.datetime(2023, 12, 26), 1.0),
            (3, datetime.datetime(2023, 12, 27), 1.0)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    r = QUERIES["q_holiday_lift"](spark, str(tmp_path)).collect()[0]
    assert (r["hol_days"], r["hol_cents"], r["other_days"],
            r["other_cents"], r["lift"]) == (1, 300, 2, 200, 3.0)


def test_cold_start_rate_two_months(spark, tmp_path):
    """Month 1: both customers new (rate 1); month 2: one returning
    customer plus one new → rate 0.5."""
    rows = [(1, 10, datetime.datetime(2024, 1, 5), 1.0),
            (2, 20, datetime.datetime(2024, 1, 9), 1.0),
            (3, 10, datetime.datetime(2024, 2, 5), 1.0),
            (4, 30, datetime.datetime(2024, 2, 6), 1.0)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp, "
           "o_totalprice double")
    out = {r["mon"]: r for r in
           QUERIES["q_cold_start_rate"](spark, str(tmp_path)).collect()}
    assert (out["2024-01"]["n_orders"], out["2024-01"]["n_new"],
            out["2024-01"]["new_rate"]) == (2, 2, 1.0)
    assert (out["2024-02"]["n_orders"], out["2024-02"]["n_new"],
            out["2024-02"]["new_rate"]) == (2, 1, 0.5)


def test_ship_delay_bands_hand_weeks(spark, tmp_path):
    """Delays of 0, 6, 7 and 15 days band into weeks {0:2, 1:1, 2:1}."""
    od = datetime.datetime(2024, 1, 1)
    _write(spark, tmp_path, "orders", [(1, od, 1.0)],
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    _write(spark, tmp_path, "lineitem",
           [(1, od, 1.0, 1.0),
            (1, od + datetime.timedelta(days=6), 1.0, 1.0),
            (1, od + datetime.timedelta(days=7), 1.0, 1.0),
            (1, od + datetime.timedelta(days=15), 1.0, 1.0)],
           "l_orderkey bigint, l_shipdate timestamp, l_quantity double, "
           "l_extendedprice double")
    out = {r["week_band"]: r["n_items"] for r in
           QUERIES["q_ship_delay_bands"](spark, str(tmp_path)).collect()}
    assert out == {0: 2, 1: 1, 2: 1}


def test_sign_test_three_weeks(spark, tmp_path):
    """Week 1 weekend wins (300 vs 100), week 2 loses (100 vs 500),
    week 3 ties (200 vs 200) → (n⁺, n⁻, ties) = (1, 1, 1)."""
    rows = [
        (1, datetime.datetime(2024, 1, 1), 1.0),   # Mon wk1
        (2, datetime.datetime(2024, 1, 6), 3.0),   # Sat wk1
        (3, datetime.datetime(2024, 1, 8), 5.0),   # Mon wk2
        (4, datetime.datetime(2024, 1, 13), 1.0),  # Sat wk2
        (5, datetime.datetime(2024, 1, 15), 2.0),  # Mon wk3
        (6, datetime.datetime(2024, 1, 20), 2.0),  # Sat wk3
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    r = QUERIES["q_sign_test"](spark, str(tmp_path)).collect()[0]
    assert (r["n_weeks"], r["n_plus"], r["n_minus"], r["n_ties"],
            r["k_tail"]) == (3, 1, 1, 1, 1)


def test_yule_q_perfect_association(spark, tmp_path):
    """Diagonal-only 2×2 (a=d=1, b=c=0) → Q = 1 exactly."""
    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", 1.0), (2, "3-MEDIUM", 1.0)],
           "o_orderkey bigint, o_orderpriority string, o_totalprice double")
    d = datetime.datetime(2024, 1, 1)
    _write(spark, tmp_path, "lineitem",
           [(1, d, 1.0, 1.0, "R"), (2, d, 1.0, 1.0, "A")],
           "l_orderkey bigint, l_shipdate timestamp, l_quantity double, "
           "l_extendedprice double, l_returnflag string")
    r = QUERIES["q_yule_q"](spark, str(tmp_path)).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["yule_q"]) == (1, 0, 0, 1, 1.0)
