"""Hand-value fixtures for the round-8 additions.  Each plants a
fixture whose answer is known in closed form, so a green oracle can
never be green-by-both-engines-wrong."""

from __future__ import annotations

import datetime
import hashlib

from loan_etl_data_pipeline_spark.queries import all_queries

QUERIES = all_queries()


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _orders_2rater(spark, tmp_path):
    """10 orders, prices 10..100 (price order == orderkey order, so
    quintiles come out [1,1,2,2,3,3,4,4,5,5]) and priorities
    [1,2,1,2,3,3,4,4,5,5] — 8 diagonal hits, uniform margins m_q = 4."""
    pris = ["1-U", "2-H", "1-U", "2-H", "3-M", "3-M", "4-L", "4-L",
            "5-N", "5-N"]
    rows = [
        (i + 1, float((i + 1) * 10), pris[i],
         datetime.datetime(2024, 1, 1))
        for i in range(10)
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_totalprice double, o_orderpriority string, "
           "o_orderdate timestamp")


def test_scott_pi_hand_value(spark, tmp_path):
    """D=8, N=10, Σm² = 5·16 = 80 → π = (320−80)/(400−80) = 0.75."""
    _orders_2rater(spark, tmp_path)
    r = QUERIES["q_scott_pi"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["d"]) == (10, 8)
    assert r["scott_pi"] == 0.75


def test_gwet_ac1_hand_value(spark, tmp_path):
    """Σm(2N−m) = 5·4·16 = 320 → AC1 = (1280−320)/(1600−320) = 0.75."""
    _orders_2rater(spark, tmp_path)
    r = QUERIES["q_gwet_ac1"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["d"]) == (10, 8)
    assert r["gwet_ac1"] == 0.75


def test_gk_lambda_hand_value(spark, tmp_path):
    """Σ_x max_y = 1+1+2+2+2 = 8, max marginal = 2 →
    λ = (8−2)/(10−2) = 0.75."""
    _orders_2rater(spark, tmp_path)
    r = QUERIES["q_gk_lambda"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["sum_mx"], r["max_marg"]) == (10, 8, 2)
    assert r["gk_lambda"] == 0.75


def _qty_fixture(spark, tmp_path):
    """Orders ok1 (priority 1) and ok2 (priority 2); quantities
    ok1 → {1, 2}, ok2 → {2, 3}.  Doubled pairs: 2C = 6, 2D = 0, tied-
    on-Y-cross-X doubled = 2."""
    _write(spark, tmp_path, "orders",
           [(1, "1-U", datetime.datetime(2024, 1, 1)),
            (2, "2-H", datetime.datetime(2024, 1, 1))],
           "o_orderkey bigint, o_orderpriority string, "
           "o_orderdate timestamp")
    d = datetime.datetime(2024, 1, 2)
    _write(spark, tmp_path, "lineitem",
           [(1, 1.0, d), (1, 2.0, d), (2, 2.0, d), (2, 3.0, d)],
           "l_orderkey bigint, l_quantity double, l_shipdate timestamp")


def test_somers_d_hand_value(spark, tmp_path):
    """D_Y|X = (6−0)/(6+0+2) = 0.75."""
    _qty_fixture(spark, tmp_path)
    r = QUERIES["q_somers_d"](spark, str(tmp_path)).collect()[0]
    assert (r["c2"], r["d2"], r["ty2"]) == (6.0, 0.0, 2.0)
    assert r["somers_d"] == 0.75


def test_stuart_tau_c_hand_value(spark, tmp_path):
    """m = 2, N = 4 → τ_c = 2·(6−0)/(16·1)·... = m(2C−2D)/(N²(m−1))
    = 2·6/16 = 0.75."""
    _qty_fixture(spark, tmp_path)
    r = QUERIES["q_stuart_tau_c"](spark, str(tmp_path)).collect()[0]
    assert (r["m"], r["n"]) == (2, 4)
    assert r["tau_c"] == 0.75


def test_cox_stuart_hand_signs(spark, tmp_path):
    """Rising daily series 1..5 → pairs (d1,d4),(d2,d5) both +; the
    middle day 3 drops out."""
    rows = [
        (i + 1, datetime.datetime(2024, 3, 1 + i), float(i + 1))
        for i in range(5)
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    r = QUERIES["q_cox_stuart"](spark, str(tmp_path)).collect()[0]
    assert (r["n_pairs"], r["n_plus"], r["n_minus"], r["n_ties"]) == (
        2, 2, 0, 0)


def test_records_test_hand_counts(spark, tmp_path):
    """Series 1,3,2,4,1,0: upper records at days 1,2,4; lower records
    at days 1,6."""
    rows = [
        (i + 1, datetime.datetime(2024, 3, 1 + i), float(v))
        for i, v in enumerate([1, 3, 2, 4, 1, 0])
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    r = QUERIES["q_records_test"](spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["n_upper"], r["n_lower"]) == (6, 3, 2)


def _copurchase_fixture(spark, tmp_path, edge_list):
    """Every requested edge gets exactly two supporting orders, so the
    support-2 prune keeps precisely edge_list."""
    rows = []
    ok = 100
    for a, b in edge_list:
        for _ in range(2):
            ok += 1
            rows.append((ok, a))
            rows.append((ok, b))
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint")


def test_avg_clustering_hand_triangle_plus_pendant(spark, tmp_path):
    """Triangle 1-2-3 plus pendant 3-4: LCCq = 1e9, 1e9, ⌊2e9/6⌋ for
    nodes 1,2,3; node 4 has degree 1 and is excluded."""
    _copurchase_fixture(spark, tmp_path,
                        [(1, 2), (1, 3), (2, 3), (3, 4)])
    r = QUERIES["q_avg_clustering"](spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 3
    expected = (10**9 + 10**9 + (2 * 10**9) // 6) / 1e9 / 3
    assert r["avg_clustering"] == expected


def test_hyperball_replay_hand_registers(spark, tmp_path):
    """Triangle graph: ball(v,1) is all three nodes for every v, so
    the hop-1 register table is the per-node union of the three md5
    init registers — recomputed here independently with hashlib."""
    _copurchase_fixture(spark, tmp_path, [(1, 2), (1, 3), (2, 3)])

    def coord(node, salt):
        return int(
            hashlib.md5(f"{node}{salt}".encode()).hexdigest()[:12], 16
        )

    regs = {}  # (pos) -> max val over members
    for v in (1, 2, 3):
        pos = coord(v, "|hb_bucket") % 64
        h = coord(v, "|hb_rank")
        val = 49 if h == 0 else 49 - h.bit_length()
        regs[pos] = max(regs.get(pos, 0), val)
    exp_units = sum(1 << (49 - val) for val in regs.values()) * 3
    exp_regs = 3 * len(regs)

    out = {r["hops"]: r for r in
           QUERIES["q_hyperball_replay"](spark, str(tmp_path)).collect()}
    assert out[0]["n_regs"] == 3  # one self-register per node
    assert out[1]["n_regs"] == exp_regs
    assert out[1]["harmonic_units"] == float(exp_units)
    # saturated: hop 2+ identical to hop 1 on a diameter-1 graph
    assert out[2]["n_regs"] == exp_regs
    assert out[3]["harmonic_units"] == float(exp_units)


def test_abc_xyz_matrix_hand_cells(spark, tmp_path):
    """Part 1: 80% of revenue (exactly the A boundary), steady 10+10
    monthly demand → AX.  Part 2: 20% tail, demand 1 vs 3 (cv² above
    the Y cut) → CZ."""
    rows = [
        (1, 1, 40.0, 10.0, datetime.datetime(2024, 1, 5)),
        (2, 1, 40.0, 10.0, datetime.datetime(2024, 2, 5)),
        (3, 2, 10.0, 1.0, datetime.datetime(2024, 1, 6)),
        (4, 2, 10.0, 3.0, datetime.datetime(2024, 2, 6)),
    ]
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint, l_extendedprice double, "
           "l_quantity double, l_shipdate timestamp")
    out = [(r["abc"], r["xyz"], r["n_parts"]) for r in
           QUERIES["q_abc_xyz_matrix"](spark, str(tmp_path)).collect()]
    assert out == [("A", "X", 1), ("C", "Z", 1)]


def test_bowley_skew_hand_quartiles(spark, tmp_path):
    """Quantities 1,2,2,3,10 → type-1 quartiles 2,2,3 → skew
    (2+3−4)/(3−2) = 1.0."""
    d = datetime.datetime(2024, 1, 2)
    rows = [(i + 1, "N", float(v), d)
            for i, v in enumerate([1, 2, 2, 3, 10])]
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_returnflag string, l_quantity double, "
           "l_shipdate timestamp")
    r = QUERIES["q_bowley_skew"](spark, str(tmp_path)).collect()[0]
    assert (r["q1"], r["q2"], r["q3"]) == (2, 2, 3)
    assert r["bowley_skew"] == 1.0


def test_source_dup_overlap_hand_pair(spark, tmp_path):
    """Two sources sharing one 40-char head, a third source with a
    distinct head: exactly one (A,B,1) row."""
    head = "x" * 40
    rows = [
        (1, head + " tail one", "en", "srcA", 49),
        (2, head + " tail two", "en", "srcB", 49),
        (3, "y" * 45, "en", "srcC", 45),
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")
    out = [(r["src_a"], r["src_b"], r["n_shared"]) for r in
           QUERIES["q_source_dup_overlap"](spark, str(tmp_path)).collect()]
    assert out == [("srcA", "srcB", 1)]


def test_kendall_tau_b_hand_value(spark, tmp_path):
    """2C=6, 2D=0, 2T_X=4, 2T_Y=2 → τ_b = 6/√(10·8)."""
    import math

    _qty_fixture(spark, tmp_path)
    r = QUERIES["q_kendall_tau_b"](spark, str(tmp_path)).collect()[0]
    assert (r["c2"], r["d2"], r["tx2"], r["ty2"]) == (6.0, 0.0, 4.0, 2.0)
    assert r["tau_b"] == 6.0 / math.sqrt(80.0)


def test_pearson_mode_skew_hand_value(spark, tmp_path):
    """Quantities 1,2,2,5: mode 2, (S−n·mode)/√(nΣx²−S²) = 2/√36."""
    d = datetime.datetime(2024, 1, 2)
    rows = [(i + 1, "N", float(v), d)
            for i, v in enumerate([1, 2, 2, 5])]
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_returnflag string, l_quantity double, "
           "l_shipdate timestamp")
    r = QUERIES["q_pearson_mode_skew"](spark, str(tmp_path)).collect()[0]
    assert r["mode"] == 2
    assert r["mode_skew"] == 2.0 / 6.0


def test_event_type_lift_hand_value(spark, tmp_path):
    """Users {ab, a, b, ab}: lift(a,b) = n_ab·N/(n_a·n_b) = 8/9."""
    t = datetime.datetime(2024, 1, 2)
    rows = [(1, 1, t, "a"), (2, 1, t, "b"), (3, 2, t, "a"),
            (4, 3, t, "b"), (5, 4, t, "a"), (6, 4, t, "b"),
            (7, 4, t, "a")]  # duplicate presence collapses
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, ts timestamp, "
           "event_type string")
    out = QUERIES["q_event_type_lift"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ta"], r["tb"], r["nab"]) == ("a", "b", 2)
    assert r["lift"] == 8.0 / 9.0


def test_edge_jaccard_hand_triangle_plus_pendant(spark, tmp_path):
    """Triangle 1-2-3 + pendant 3-4: quantized Jaccards 1/3, 1/4,
    1/4, 0 in total order."""
    _copurchase_fixture(spark, tmp_path,
                        [(1, 2), (1, 3), (2, 3), (3, 4)])
    out = [(r["a"], r["b"], r["cn"], r["jacc_q"]) for r in
           QUERIES["q_edge_jaccard"](spark, str(tmp_path)).collect()]
    assert out == [
        (1, 2, 1, 333333333),
        (1, 3, 1, 250000000),
        (2, 3, 1, 250000000),
        (3, 4, 0, 0),
    ]


def test_charclass_profile_hand_ratios(spark, tmp_path):
    """'Ab 9' → 4 chars, one each of upper/digit/space → ratios 0.25."""
    rows = [(1, "Ab 9", "en", "srcA", 4)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")
    r = QUERIES["q_charclass_profile"](spark, str(tmp_path)).collect()[0]
    assert (r["n_chars"], r["n_upper"], r["n_digit"], r["n_space"]) == (
        4, 1, 1, 1)
    assert (r["upper_ratio"], r["digit_ratio"], r["space_ratio"]) == (
        0.25, 0.25, 0.25)


def test_upsert_maintained_hand_tombstones(spark, tmp_path):
    """CDC semantics across the three micro-batch chunks: user 1 is
    upserted, tombstoned, then REINSERTED (must survive with the last
    row); user 2 is upserted, updated, then tombstoned (must vanish);
    user 3 never changes (must survive its only row)."""
    c0 = datetime.datetime(2024, 1, 5, 12, 0, 0)
    c1 = datetime.datetime(2024, 1, 15, 12, 0, 0)
    c2 = datetime.datetime(2024, 1, 25, 12, 0, 0)
    rows = [
        (1, 1, c0, "signup", 1.0),
        (2, 1, c1, "error", None),    # tombstone
        (3, 1, c2, "click", 3.0),     # reinsert
        (4, 2, c0, "signup", 2.0),
        (5, 2, c1, "view", 2.5),
        (6, 2, c2, "error", None),    # final tombstone
        (7, 3, c0, "purchase", 9.0),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, ts timestamp, "
           "event_type string, value double")
    out = {r["user_id"]: r for r in
           QUERIES["q_upsert_maintained"](spark, str(tmp_path)).collect()}
    assert sorted(out) == [1, 3]
    assert (out[1]["event_type"], out[1]["cents"]) == ("click", 300)
    assert (out[3]["event_type"], out[3]["cents"]) == ("purchase", 900)
    assert out[1]["shard"] == 1 and out[3]["shard"] == 3


def test_gini_mean_diff_hand_value(spark, tmp_path):
    """Quantities 1,2,4: Σ ordered-pair |u−v| mass = 12 → GMD =
    12/(3·2) = 2, Gini = 12/(2·7·2) = 3/7."""
    d = datetime.datetime(2024, 1, 2)
    rows = [(i + 1, "N", float(v), d) for i, v in enumerate([1, 2, 4])]
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_returnflag string, l_quantity double, "
           "l_shipdate timestamp")
    r = QUERIES["q_gini_mean_diff"](spark, str(tmp_path)).collect()[0]
    assert r["n"] == 3
    assert r["gmd"] == 2.0
    assert r["gini"] == 12.0 / 28.0


def test_orc_roundtrip_hand_aggregate(spark, tmp_path):
    """Keys 5,10 (kept, status O) and 7 (dropped by the %5 filter)."""
    d = datetime.datetime(2024, 1, 2)
    rows = [(5, "O", 10.01, d), (10, "O", 20.02, d), (7, "F", 99.0, d)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
           "o_orderdate timestamp")
    out = QUERIES["q_orc_roundtrip"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["o_orderstatus"], r["n_orders"], r["revenue"]) == (
        "O", 2, 30.03)


def test_point_biserial_hand_value(spark, tmp_path):
    """Two flagged docs (len 100, 200) vs two unique (10, 30):
    r_pb = 520/√353600."""
    import math

    head = "z" * 40
    rows = [
        (1, head + " a", "en", "s0", 100),
        (2, head + " b", "en", "s1", 200),
        (3, "u" * 45, "en", "s0", 10),
        (4, "v" * 45, "en", "s1", 30),
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")
    r = QUERIES["q_point_biserial"](spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n0"]) == (2, 2)
    assert r["r_pb"] == 520.0 / math.sqrt(353600.0)


def test_phi_coefficient_hand_value(spark, tmp_path):
    """Diagonal-heavy 2×2 (a,b,c,d = 2,1,1,2): φ = 3/9."""
    d = datetime.datetime(2024, 1, 2)
    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", d), (2, "2-HIGH", d)],
           "o_orderkey bigint, o_orderpriority string, "
           "o_orderdate timestamp")
    li = [(1, "R"), (1, "R"), (1, "N"), (2, "R"), (2, "N"), (2, "N")]
    _write(spark, tmp_path, "lineitem",
           [(ok, f, d) for ok, f in li],
           "l_orderkey bigint, l_returnflag string, l_shipdate timestamp")
    r = QUERIES["q_phi_coefficient"](spark, str(tmp_path)).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (2, 1, 1, 2)
    assert r["phi"] == 3.0 / 9.0


def test_raking_hand_fold(spark, tmp_path):
    """2×2 cells [[4,2],[1,3]]: the emitted weights must equal an
    independent plain-Python transcription of the integer IPF rule,
    and both row shares must move toward 1/2."""
    d = datetime.datetime(2024, 1, 2)
    rows, ok = [], 0
    for p, s, n in [(1, "O", 4), (1, "F", 2), (2, "O", 1), (2, "F", 3)]:
        for _ in range(n):
            ok += 1
            rows.append((ok, f"{p}-X", s, d))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderpriority string, "
           "o_orderstatus string, o_orderdate timestamp")

    w = {(1, "O"): 4, (1, "F"): 2, (2, "O"): 1, (2, "F"): 3}
    w = {k: v * 1_000_000 for k, v in w.items()}
    nw = sum(w.values())
    for _ in range(2):
        for p in (1, 2):
            rp = w[(p, "O")] + w[(p, "F")]
            for s in ("O", "F"):
                w[(p, s)] = (w[(p, s)] * nw) // (2 * rp)
        for s in ("O", "F"):
            cs = w[(1, s)] + w[(2, s)]
            for p in (1, 2):
                w[(p, s)] = (w[(p, s)] * nw) // (2 * cs)
    out = {(r["p"], r["s"]): r for r in
           QUERIES["q_raking"](spark, str(tmp_path)).collect()}
    assert {k: r["w"] for k, r in out.items()} == w
    for p in (1, 2):
        share = out[(p, "O")]["row_share"]
        assert abs(share - 0.5) < 0.05
