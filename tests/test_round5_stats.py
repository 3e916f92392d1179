"""Round-5 stats battery: hand-verified fixtures for the rank-trend
family (Kruskal–Wallis, Jonckheere–Terpstra, Page's L,
Cochran–Armitage) and the quantized Markov matrix power, plus the
multi-column distributed cumsum they ride on. Oracle parity at sf0.001
is covered by test_oracle_parity; these pin the STATISTICS to worked
examples so a symmetric Spark/oracle bug can't slip through.
"""

from __future__ import annotations

import datetime

import pytest
import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.queries import all_queries


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


_D = datetime.date(2024, 1, 15)


def test_kruskal_wallis_hand_values(spark, tmp_path):
    """URGENT={1,3}, LOW={2,3}, HIGH={5} cents. Pooled 1,2,3,3,5 →
    doubled ranks 2,4,7,7,10; r2x: URGENT 9, LOW 11, HIGH 10;
    tie3 = 2³−2 = 6; Σ r2x = N(N+1) = 30."""
    rows = [
        ("1-URGENT", 0.01, _D), ("1-URGENT", 0.03, _D),
        ("5-LOW", 0.02, _D), ("5-LOW", 0.03, _D),
        ("2-HIGH", 0.05, _D),
    ]
    _write_orders(spark, tmp_path, rows)
    out = {r["prio"]: r for r in
           all_queries()["q_kruskal_wallis"](spark, str(tmp_path)).collect()}
    assert {(p, r["n_i"], r["r2x_i"]) for p, r in out.items()} == {
        ("1-URGENT", 2, 9), ("5-LOW", 2, 11), ("2-HIGH", 1, 10),
    }
    any_row = next(iter(out.values()))
    assert (any_row["n_total"], any_row["tie3"]) == (5, 6)
    assert sum(r["r2x_i"] for r in out.values()) == 5 * 6


def test_kruskal_wallis_rank_sum_invariant(spark, sf_dir):
    rows = all_queries()["q_kruskal_wallis"](spark, sf_dir).collect()
    n = rows[0]["n_total"]
    assert sum(r["r2x_i"] for r in rows) == n * (n + 1)
    assert sum(r["n_i"] for r in rows) == n


def test_jonckheere_hand_values(spark, tmp_path):
    """g1={1,3}, g2={2,3}, g3={4} cents.  2·JT: g1×g2 pairs
    (1<2)+(1<3) count 2 each, (3,3) tie counts 1 → 5; g1×g3 and
    g2×g3 all strictly increasing → +4 +4; total 13.
    2·E[JT] = n1n2 + n1n3 + n2n3 = 4+2+2 = 8."""
    rows = [
        ("1-URGENT", 0.01, _D), ("1-URGENT", 0.03, _D),
        ("2-HIGH", 0.02, _D), ("2-HIGH", 0.03, _D),
        ("3-MEDIUM", 0.04, _D),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_jonckheere"](spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"], r["n3"], r["n4"], r["n5"]) == (2, 2, 1, 0, 0)
    assert r["jt2x"] == 13
    assert r["mean_jt2x"] == 8


def test_jonckheere_reversed_groups_mirror(spark, tmp_path):
    """Swapping the group labels mirrors the statistic:
    jt2x + jt2x_rev = 2·Σ n_i n_j (every cross pair counted once
    either way, ties contributing 1 to each)."""
    rows = [
        ("1-URGENT", 0.01, _D), ("1-URGENT", 0.03, _D),
        ("2-HIGH", 0.02, _D), ("2-HIGH", 0.03, _D),
    ]
    _write_orders(spark, tmp_path, rows)
    fwd = all_queries()["q_jonckheere"](spark, str(tmp_path)).collect()[0]
    rows_rev = [("2-HIGH" if p == "1-URGENT" else "1-URGENT", v, d)
                for p, v, d in rows]
    _write_orders(spark, tmp_path, rows_rev)
    rev = all_queries()["q_jonckheere"](spark, str(tmp_path)).collect()[0]
    assert fwd["jt2x"] + rev["jt2x"] == 2 * fwd["mean_jt2x"]


def test_page_trend_hand_values(spark, tmp_path):
    """Three complete month blocks: Jan ascending revenue by k (ranks
    = k), Feb descending (ranks = 6−k), Mar with a low-end tie.
    Per-treatment doubled rank sums 15,15,18,20,22 (Σ = m·k(k+1) =
    90) and L·2 = Σ k·r2x_i = 289. An incomplete April (2 priorities)
    must be excluded."""
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    jan, feb, mar = (datetime.date(2024, 1, 5), datetime.date(2024, 2, 5),
                     datetime.date(2024, 3, 5))
    for k in range(1, 6):
        rows.append((prios[k - 1], k * 0.10, jan))          # asc: rank k
        rows.append((prios[k - 1], (6 - k) * 0.10, feb))    # desc: rank 6-k
    mar_cents = {1: 0.10, 2: 0.10, 3: 0.30, 4: 0.40, 5: 0.50}
    for k, v in mar_cents.items():
        rows.append((prios[k - 1], v, mar))
    rows += [("1-URGENT", 1.0, datetime.date(2024, 4, 5)),
             ("5-LOW", 2.0, datetime.date(2024, 4, 5))]     # incomplete
    _write_orders(spark, tmp_path, rows)
    out = {r["k"]: r for r in
           all_queries()["q_page_trend"](spark, str(tmp_path)).collect()}
    assert {(k, r["r2x_i"], r["m_blocks"]) for k, r in out.items()} == {
        (1, 15, 3), (2, 15, 3), (3, 18, 3), (4, 20, 3), (5, 22, 3),
    }
    assert out[1]["l2x"] == 289
    assert sum(r["r2x_i"] for r in out.values()) == 3 * 5 * 6


def test_cochran_armitage_hand_values(spark, tmp_path):
    """(s, flag): (1,R),(1,N),(2,R),(3,N) → N=4, R=2, Σs=7, Σs²=15,
    Σs·r=3; T = 4·3 − 2·7 = −2; var_core = 4·15 − 49 = 11."""
    rows = [(1, "R"), (1, "N"), (2, "R"), (3, "N")]
    spark.createDataFrame(
        rows, "l_linenumber int, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = all_queries()["q_cochran_armitage"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["r_total"], r["s_sum"], r["s2_sum"], r["sr_sum"]) == (
        4, 2, 7, 15, 3)
    assert r["t_num"] == -2
    assert r["var_core"] == 11


def _write_events(spark, tmp_path, seqs):
    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = []
    eid = 0
    for user, types in seqs.items():
        for i, et in enumerate(types):
            eid += 1
            rows.append((eid, t0 + datetime.timedelta(minutes=i), user, et,
                         1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_markov_power_hand_values(spark, tmp_path):
    """u1: A,B,A,B,A and u2: A,A,B → counts A→B 3, A→A 1, B→A 2;
    P(e6): A→B 750000, A→A 250000, B→A 1000000. Hand matrix cube
    with div-requantization at each multiply."""
    _write_events(spark, tmp_path, {1: list("ABABA"), 2: list("AAB")})
    out = {(r["from_type"], r["to_type"]): r["p3_e6"] for r in
           all_queries()["q_markov_power"](spark, str(tmp_path)).collect()}
    assert out == {
        ("A", "A"): 390625, ("A", "B"): 609375,
        ("B", "A"): 812500, ("B", "B"): 187500,
    }


def test_markov_power_deterministic_chain_stays_unit(spark, tmp_path):
    """A deterministic cycle A→B→C→A keeps every step at exactly 10⁶
    through the integer matrix powers — no quantization bleed."""
    _write_events(spark, tmp_path, {1: list("ABCABCA")})
    out = {(r["from_type"], r["to_type"]): r["p3_e6"] for r in
           all_queries()["q_markov_power"](spark, str(tmp_path)).collect()}
    # the cube of a 3-cycle permutation is the identity
    assert out == {
        ("A", "A"): 1000000, ("B", "B"): 1000000, ("C", "C"): 1000000,
    }


def test_global_cumsum_multi_matches_single(spark):
    from loan_etl_data_pipeline_spark.functions.ranking import (
        global_cumsum,
        global_cumsum_multi,
    )

    rows = [(i, (i * 7) % 13, (i * 3) % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, a bigint, b bigint")
    multi = global_cumsum_multi(df, [F.asc("k")], ["a", "b"], suffix="_cum")
    got = {r["k"]: (r["a_cum"], r["b_cum"]) for r in multi.collect()}
    for col in ("a", "b"):
        single = global_cumsum(df, [F.asc("k")], col, cum_col="cum")
        for r in single.collect():
            assert got[r["k"]][0 if col == "a" else 1] == r["cum"], (col, r)


def test_global_cumsum_multi_rejects_nulls_and_floats(spark):
    from loan_etl_data_pipeline_spark.functions.ranking import (
        global_cumsum_multi,
    )

    df = spark.createDataFrame([(1, None), (2, 5)], "k bigint, a bigint")
    # opt r8: the NULL guard is a row-level assert (no driver pre-scan
    # job), so the loud failure surfaces at action time
    with pytest.raises(Exception, match="NULL"):
        global_cumsum_multi(df, [F.asc("k")], ["a"]).collect()
    fdf = spark.createDataFrame([(1, 1.0)], "k bigint, a double")
    with pytest.raises(ValueError, match="integral"):
        global_cumsum_multi(fdf, [F.asc("k")], ["a"])
    with pytest.raises(ValueError, match="non-empty"):
        global_cumsum_multi(df, [F.asc("k")], [])


def test_mcnemar_hand_table(spark, tmp_path):
    """c1 hi→lo (n10), c2 lo→hi (n01), c3 lo→lo with an ignored middle
    order (n00), c4 single-order (excluded), c5 hi→hi (n11)."""
    d1, d2, d3 = (datetime.date(2024, 1, 1), datetime.date(2024, 2, 1),
                  datetime.date(2024, 3, 1))
    rows = [
        (1, "1-URGENT", d1, 10), (1, "5-LOW", d2, 11),
        (2, "5-LOW", d1, 20), (2, "2-HIGH", d2, 21),
        (3, "5-LOW", d1, 30), (3, "3-MEDIUM", d2, 31), (3, "4-NOT SPECIFIED", d3, 32),
        (4, "1-URGENT", d1, 40),
        (5, "2-HIGH", d1, 50), (5, "1-URGENT", d2, 51),
    ]
    spark.createDataFrame(
        rows,
        "o_custkey bigint, o_orderpriority string, o_orderdate date,"
        " o_orderkey bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_mcnemar"](spark, str(tmp_path)).collect()[0]
    assert (r["n_pairs"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        4, 1, 1, 1, 1)
    assert (r["chi2_num"], r["chi2_den"]) == (0, 2)


def test_mcnemar_same_date_tiebreak_on_orderkey(spark, tmp_path):
    """Two orders on the SAME date: o_orderkey decides first vs last."""
    d = datetime.date(2024, 1, 1)
    rows = [(1, "1-URGENT", d, 1), (1, "5-LOW", d, 2)]
    spark.createDataFrame(
        rows,
        "o_custkey bigint, o_orderpriority string, o_orderdate date,"
        " o_orderkey bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = all_queries()["q_mcnemar"](spark, str(tmp_path)).collect()[0]
    assert (r["n10"], r["n01"]) == (1, 0)  # urgent(key 1) first, low last


def test_logrank_hand_values(spark, tmp_path):
    """Two deaths at bucket 0 (one per group) and two at bucket 2:
    e1_e6 = 1e6 + 1e6; v_e6 = 333333 + 0 (staged-div order)."""
    d0 = datetime.date(2024, 1, 1)
    orders = [
        (1, d0), (2, d0), (2, datetime.date(2024, 7, 19)),   # b2: +200d
        (3, d0), (4, d0), (4, datetime.date(2024, 7, 19)),
        (5, d0),  # other segment: filtered out
    ]
    spark.createDataFrame(
        orders, "o_custkey bigint, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    cust = [(1, "BUILDING"), (2, "BUILDING"), (3, "AUTOMOBILE"),
            (4, "AUTOMOBILE"), (5, "MACHINERY")]
    spark.createDataFrame(
        cust, "c_custkey bigint, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    r = all_queries()["q_logrank"](spark, str(tmp_path)).collect()[0]
    assert (r["n1_total"], r["n2_total"]) == (2, 2)
    assert r["o1_sum"] == 2
    assert r["e1_e6"] == 2_000_000
    assert r["v_e6"] == 333_333


def test_seq_patterns_gap_and_distinct_semantics(spark, tmp_path):
    """Support counts USERS once each; the gap bound is ≤3 positions
    inclusive: u6's A..B at gap 3 counts, u7's at gap 4 does not;
    u1's repeated A,B,A,B still contributes exactly 1."""
    seqs = {1: list("ABAB")}
    for u in (2, 3, 4, 5):
        seqs[u] = list("AB")
    seqs[6] = list("AqwB".replace("q", "Q").replace("w", "W"))
    seqs[7] = list("AQWEB")
    _write_events(spark, tmp_path, seqs)
    out = {(r["a"], r["b"]): r["support"] for r in
           all_queries()["q_seq_patterns"](spark, str(tmp_path)).collect()}
    assert out == {("A", "B"): 6}


def test_mood_median_hand_values(spark, tmp_path):
    """URGENT={1,2}, HIGH={3}, LOW={4,5} cents: pooled lower median =
    rank-3 value = 3; above-median counts 0/0/2."""
    rows = [
        ("1-URGENT", 0.01, _D), ("1-URGENT", 0.02, _D),
        ("2-HIGH", 0.03, _D),
        ("5-LOW", 0.04, _D), ("5-LOW", 0.05, _D),
    ]
    _write_orders(spark, tmp_path, rows)
    out = {r["prio"]: r for r in
           all_queries()["q_mood_median"](spark, str(tmp_path)).collect()}
    assert {(p, r["n_i"], r["gt_i"]) for p, r in out.items()} == {
        ("1-URGENT", 2, 0), ("2-HIGH", 1, 0), ("5-LOW", 2, 2),
    }
    row = out["2-HIGH"]
    assert (row["median_cents"], row["n_total"]) == (3, 5)


def test_mood_median_split_invariant(spark, sf_dir):
    """The pooled lower median must put >= ceil(N/2) values at-or-below
    it, and at most floor(N/2) strictly above."""
    rows = all_queries()["q_mood_median"](spark, sf_dir).collect()
    n = rows[0]["n_total"]
    gt_total = sum(r["gt_i"] for r in rows)
    assert sum(r["n_i"] for r in rows) == n
    assert n - gt_total >= (n + 1) // 2
    assert gt_total <= n // 2


def test_hodges_lehmann_hand_values(spark, tmp_path):
    """A={10,20}, B={1,2} cents → differences {8,9,18,19}; k = 2 →
    HL = 9; cnt(d<=9) = 2."""
    rows = [
        ("1-URGENT", 0.10, _D), ("1-URGENT", 0.20, _D),
        ("5-LOW", 0.01, _D), ("5-LOW", 0.02, _D),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_hodges_lehmann"](spark, str(tmp_path)).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_pairs"], r["k"]) == (2, 2, 4, 2)
    assert r["hl_cents"] == 9
    assert r["cnt_le_hl"] == 2


def test_hodges_lehmann_wide_domain_conv_path(spark, tmp_path):
    """A={0,10000,5000000}, B={0,1}: differences sorted
    −1,0,9999,10000,4999999,5000000; k=3 → HL=9999 — the >4096-wide
    domain exercises the coarse-histogram convolution bracket."""
    rows = [
        ("1-URGENT", 0.00, _D), ("1-URGENT", 100.00, _D),
        ("1-URGENT", 50000.00, _D),
        ("5-LOW", 0.00, _D), ("5-LOW", 0.01, _D),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_hodges_lehmann"](spark, str(tmp_path)).collect()[0]
    assert (r["n_pairs"], r["k"]) == (6, 3)
    assert r["hl_cents"] == 9999
    assert r["cnt_le_hl"] == 3


def test_hodges_lehmann_all_tied(spark, tmp_path):
    rows = [("1-URGENT", 0.05, _D), ("1-URGENT", 0.05, _D),
            ("5-LOW", 0.05, _D)]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_hodges_lehmann"](spark, str(tmp_path)).collect()[0]
    assert (r["hl_cents"], r["cnt_le_hl"]) == (0, 2)


def test_hodges_lehmann_one_sided_empty(spark, tmp_path):
    rows = [("1-URGENT", 0.05, _D)]
    _write_orders(spark, tmp_path, rows)
    assert all_queries()["q_hodges_lehmann"](spark, str(tmp_path)).count() == 0


def test_hodges_lehmann_matches_bruteforce(spark, tmp_path):
    """Pseudo-random integer fixture vs an exhaustive pairwise-median
    in Python — covers duplicated values and both search regimes."""
    a_vals = [((i * 7919) % 4000) * 37 for i in range(30)]   # wide, dup-y
    b_vals = [((i * 104729) % 3000) * 41 for i in range(40)]
    rows = [("1-URGENT", v / 100.0, _D) for v in a_vals] + [
        ("5-LOW", v / 100.0, _D) for v in b_vals]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_hodges_lehmann"](spark, str(tmp_path)).collect()[0]
    diffs = sorted(x - y for x in a_vals for y in b_vals)
    k = (len(diffs) + 1) // 2
    assert r["k"] == k
    assert r["hl_cents"] == diffs[k - 1]
    assert r["cnt_le_hl"] == sum(1 for d in diffs if d <= diffs[k - 1])


def test_ansari_bradley_hand_values(spark, tmp_path):
    """A={5}, B={5,5}: one tie block over ranks 1..3, scores 1,2,1 →
    block sum 4, per-member average 4/3 → ab_e6 = 1_333_333;
    score_total = 4 = f(N)."""
    rows = [("1-URGENT", 0.05, _D), ("5-LOW", 0.05, _D),
            ("5-LOW", 0.05, _D)]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 2)
    assert r["score_total"] == 4
    assert r["ab_e6"] == 1_333_333
    assert r["mean_ab_e6"] == 1 * (4 * 1_000_000 // 3)


def test_ansari_bradley_extremes_score_low(spark, tmp_path):
    """A at both extremes of the pooled order, B in the middle:
    N=4, scores 1,2,2,1 → A scores 1+1=2e6, B 2+2=4e6 — the
    dispersion signature (spread-out group scores LOW)."""
    rows = [("1-URGENT", 0.01, _D), ("1-URGENT", 0.04, _D),
            ("5-LOW", 0.02, _D), ("5-LOW", 0.03, _D)]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    assert r["score_total"] == 6
    assert r["ab_e6"] == 2_000_000
    assert r["mean_ab_e6"] == 2 * (6 * 1_000_000 // 4)


def test_ansari_bradley_score_total_is_f_of_n(spark, sf_dir):
    """Invariant: Σ block scores = f(N) = the closed-form total of
    min(i, N+1−i) over i=1..N."""
    r = all_queries()["q_ansari_bradley"](spark, sf_dir).collect()[0]
    n = r["n_a"] + r["n_b"]
    m, h = n + 1, (n + 1) // 2
    f_n = (h * (h + 1)) // 2 + ((m - h - 1 + m - n) * (n - h)) // 2
    assert r["score_total"] == f_n


def test_cramer_von_mises_hand_values(spark, tmp_path):
    """A={1,2}, B={3,4}: diffs (2·cumA − 2·cumB) per value = 2,4,2,0 →
    d2 = 4+16+4+0 = 24 (fully separated CDFs)."""
    rows = [("1-URGENT", 0.01, _D), ("1-URGENT", 0.02, _D),
            ("5-LOW", 0.03, _D), ("5-LOW", 0.04, _D)]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_cramer_von_mises"](spark, str(tmp_path)).collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert (r["d2_lo"], r["d2_mid"], r["d2_hi"]) == (24, 0, 0)


def test_cramer_von_mises_identical_distributions_zero(spark, tmp_path):
    """Identical samples: n_b·cumA == n_a·cumB at every value → d2 = 0."""
    rows = [("1-URGENT", 0.01, _D), ("1-URGENT", 0.02, _D),
            ("5-LOW", 0.01, _D), ("5-LOW", 0.02, _D)]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_cramer_von_mises"](spark, str(tmp_path)).collect()[0]
    assert (r["d2_lo"], r["d2_mid"], r["d2_hi"]) == (0, 0, 0)


def test_cramer_von_mises_limbs_reassemble(spark, sf_dir):
    """The three 2³² limbs must reassemble to the brute-force d2 at
    sf0.001 (small enough to recompute in Python exactly)."""
    import collections

    import duckdb

    r = all_queries()["q_cramer_von_mises"](spark, sf_dir).collect()[0]
    d2 = r["d2_lo"] + (r["d2_mid"] << 32) + (r["d2_hi"] << 64)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(floor(o_totalprice*100) AS BIGINT),"
        f" CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END"
        f" FROM '{sf_dir}/orders.parquet'"
        f" WHERE o_orderpriority IN ('1-URGENT','5-LOW')"
    ).fetchall()
    per = collections.Counter()
    for cents, ia in rows:
        per[(cents, ia)] += 1
    values = sorted({c for c, _ in per})
    n_a = sum(v for (c, ia), v in per.items() if ia == 1)
    n_b = sum(v for (c, ia), v in per.items() if ia == 0)
    ca = cb = 0
    expect = 0
    for v in values:
        ca += per[(v, 1)]
        cb += per[(v, 0)]
        cnt = per[(v, 1)] + per[(v, 0)]
        expect += cnt * (n_b * ca - n_a * cb) ** 2
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert d2 == expect


def _limbs(lo, mid, hi):
    return lo + (mid << 32) + (hi << 64)


def test_durbin_watson_hand_values(spark, tmp_path):
    """Monthly counts y=[1,2,4]: n=3, St=6, Stt=14, Sy=7, Sty=17,
    D=3*14-36=6, Nb=3*17-6*7=9; E = e*nD = [3,-6,3] (sums to 0);
    num = (-9)^2 + 9^2 = 162, den = 9+36+9 = 54 -> DW = 3 (the
    alternating worst case)."""
    import datetime as _dt

    rows = [("1-URGENT", 1.0, _dt.date(2024, m, d)) for m, d in
            [(1, 5), (2, 5), (2, 20), (3, 1), (3, 2), (3, 3), (3, 4)]]
    _write_orders(spark, tmp_path, rows)
    r = all_queries()["q_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert r["n_months"] == 3
    assert _limbs(r["dw_num_lo"], r["dw_num_mid"], r["dw_num_hi"]) == 162
    assert _limbs(r["dw_den_lo"], r["dw_den_mid"], r["dw_den_hi"]) == 54


def test_durbin_watson_range_invariant(spark, sf_dir):
    """DW = num/den is mathematically confined to [0, 4]: num =
    sum((E_t - E_{t-1})^2) <= 2*(sum E^2 + sum E_prev^2) <= 4*den."""
    r = all_queries()["q_durbin_watson"](spark, sf_dir).collect()[0]
    num = _limbs(r["dw_num_lo"], r["dw_num_mid"], r["dw_num_hi"])
    den = _limbs(r["dw_den_lo"], r["dw_den_mid"], r["dw_den_hi"])
    assert den > 0 and 0 <= num <= 4 * den


def test_cochran_q_hand_values(spark, tmp_path):
    """Customers A,B,C over 1996/97/98: A active all three (L=3),
    B active 96+98 (L=2), C active 97 only (L=1). G = (2,2,2);
    n_blocks=3, sum_l=6, sum_l2=14. Q = 2*(3*12-36)/(18-14) = 0."""
    import datetime as _dt

    rows = []
    for ck, years in [("A", [1996, 1997, 1998]), ("B", [1996, 1998]),
                      ("C", [1997])]:
        for y in years:
            rows.append((hash(ck) % 100, 9.99, _dt.date(y, 3, 1), ck))
    spark.createDataFrame(
        [(ord(ck[0]), 9.99, d) for _, _, d, ck in rows],
        "o_custkey bigint, o_totalprice double, o_orderdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["yr"]: r for r in
           all_queries()["q_cochran_q"](spark, str(tmp_path)).collect()}
    assert {y: r["g_j"] for y, r in out.items()} == {1996: 2, 1997: 2, 1998: 2}
    r = out[1996]
    assert (r["n_blocks"], r["sum_l"], r["sum_l2"]) == (3, 6, 14)


def test_cochran_q_invariants(spark, sf_dir):
    """Column sums equal block sums (both count the activity cells);
    sum_l <= k*n_blocks and sum_l2 <= k*sum_l (l_i <= k = 3)."""
    rows = all_queries()["q_cochran_q"](spark, sf_dir).collect()
    r = rows[0]
    assert sum(x["g_j"] for x in rows) == r["sum_l"]
    assert r["sum_l"] <= 3 * r["n_blocks"]
    assert r["sum_l2"] <= 3 * r["sum_l"]
