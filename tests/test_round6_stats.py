"""Hand-value fixtures for the round-6 additions: Friedman blocks,
Wilcoxon signed-rank, Good–Turing / Chao1 vocabulary estimators,
Herfindahl/CR4 concentration, Cohen's kappa, and the streaming
maintainer parity queries.  Each plants a fixture whose statistic is
known in closed form, so a green oracle can never be green-by-both-
engines-wrong."""

from __future__ import annotations

import datetime

from loan_etl_data_pipeline_spark.queries import all_queries

QUERIES = all_queries()


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_friedman_perfectly_consistent_blocks(spark, tmp_path):
    """Two months, five priorities, identical orderings: avgrank2 per
    month = 2,4,6,8,10 → R2 = 4..20, dev = -8,-4,0,4,8, Σdev² = 160,
    χ²_F = 3·160/(2·5·6) = 8 — the b=2, k=5 maximum (perfect
    consistency)."""
    rows = []
    for m, day in ((1, datetime.date(2024, 1, 15)), (2, datetime.date(2024, 2, 15))):
        for i, prio in enumerate(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT", "5-LOW"]):
            rows.append((day, prio, 100.0 * (i + 1)))
    _write(spark, tmp_path, "orders",
           rows, "o_orderdate date, o_orderpriority string, o_totalprice double")
    out = {r["treatment"]: r for r in QUERIES["q_friedman"](spark, str(tmp_path)).collect()}
    assert len(out) == 5
    assert [out[p]["r2"] for p in sorted(out)] == [4, 8, 12, 16, 20]
    assert out["1-URGENT"]["dev"] == -8 and out["5-LOW"]["dev"] == 8
    for r in out.values():
        assert r["b"] == 2 and r["k"] == 5
        assert r["chi_f"] == 8.0


def test_friedman_drops_incomplete_blocks(spark, tmp_path):
    """A month missing a priority must not contribute ranks."""
    rows = [
        (datetime.date(2024, 1, 15), p, 100.0 * (i + 1))
        for i, p in enumerate(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT", "5-LOW"])
    ]
    rows += [(datetime.date(2024, 2, 15), "1-URGENT", 50.0)]  # incomplete
    _write(spark, tmp_path, "orders",
           rows, "o_orderdate date, o_orderpriority string, o_totalprice double")
    out = QUERIES["q_friedman"](spark, str(tmp_path)).collect()
    assert all(r["b"] == 1 for r in out)


def test_wilcoxon_signed_hand_ranks(spark, tmp_path):
    """Three pairs with diffs +10, -20, +30 (and one zero pair that
    must drop): |diff| ranks 1,2,3 → doubled 2,4,6; W+2 = 8, W-2 = 4,
    total = n(n+1) = 12."""
    base = datetime.date(2024, 1, 1)
    rows = []
    # day d revenue x, day d+182 revenue y -> diff = x - y (cents)
    for i, (x, y) in enumerate([(1.10, 1.00), (1.00, 1.20), (1.50, 1.20), (2.00, 2.00)]):
        d = base + datetime.timedelta(days=i)
        rows.append((d, x))
        rows.append((d + datetime.timedelta(days=182), y))
    _write(spark, tmp_path, "orders",
           rows, "o_orderdate date, o_totalprice double")
    r = QUERIES["q_wilcoxon_signed"](spark, str(tmp_path)).collect()[0]
    assert r["n_nonzero"] == 3
    assert r["w_plus2"] == 8 and r["w_minus2"] == 4
    assert r["w_total2"] == 12  # n(n+1) identity, doubled encoding


def test_wilcoxon_identity_on_sf(spark, sf_dir):
    r = QUERIES["q_wilcoxon_signed"](spark, sf_dir).collect()[0]
    n = r["n_nonzero"]
    assert r["w_total2"] == n * (n + 1)


def test_good_turing_hand_spectrum(spark, tmp_path):
    """Tokens a×3 b×1 c×1 d×2 → N1=2, N2=1, N3=1; r*(1) = 2·N2/N1 = 1
    → 1e9; r*(2) = 3·N3/N2 = 3 → 3e9; r*(3) = 4·N4/N3 = 0."""
    _write(spark, tmp_path, "documents",
           [(1, "a a a b"), (2, "c d d")], "doc_id bigint, text string")
    out = {r["r"]: r for r in QUERIES["q_good_turing"](spark, str(tmp_path)).collect()}
    assert out[1]["n_r"] == 2 and out[1]["n_r1"] == 1
    assert out[1]["rstar_q"] == 10**9
    assert out[2]["rstar_q"] == 3 * 10**9
    assert out[3]["n_r1"] == 0 and out[3]["rstar_q"] == 0


def test_chao1_hand_counts(spark, tmp_path):
    """Same fixture: D=4, f1=2, f2=1 → add = 2·1·1e9/(2·2) = 5e8."""
    _write(spark, tmp_path, "documents",
           [(1, "a a a b"), (2, "c d d")], "doc_id bigint, text string")
    r = QUERIES["q_chao1"](spark, str(tmp_path)).collect()[0]
    assert (r["d_types"], r["f1"], r["f2"]) == (4, 2, 1)
    assert r["chao1_add_q"] == 5 * 10**8


def test_herfindahl_two_suppliers(spark, tmp_path):
    """Suppliers 3:1 → shares 0.75/0.25, HHI = 0.625 → 6.25e8; CR4
    covers both = 1e9; top1 = 7.5e8."""
    _write(spark, tmp_path, "lineitem",
           [(1, 2.00), (1, 1.00), (2, 1.00)],
           "l_suppkey bigint, l_extendedprice double")
    r = QUERIES["q_herfindahl"](spark, str(tmp_path)).collect()[0]
    assert r["n_suppliers"] == 2
    assert r["top1_share9"] == 750_000_000
    assert r["cr4_share9"] == 10**9
    assert r["hhi_q"] == 625_000_000


def test_reconcile_maintained_matches_batch_sibling(spark, sf_dir):
    """The stream-maintained reconciliation must equal the certified
    batch q_reconcile on the same tables — the rebuild identity the
    oracle also pins, asserted engine-side for a second angle."""
    a = {tuple(r) for r in QUERIES["q_reconcile_maintained"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["q_reconcile"](spark, sf_dir).collect()}
    assert a == b


def test_ewma_control_hand_recursion(spark, tmp_path):
    """Days 100, 200, 300 cents: s = 100, (400+800)div10 = 120,
    (600+960)div10 = 156; resid = 0, 100, 180."""
    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 1.00 * (i + 1)) for i in range(3)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderdate date, o_totalprice double")
    out = {r["day"]: r for r in QUERIES["q_ewma_control"](spark, str(tmp_path)).collect()}
    assert [out[d]["ewma"] for d in sorted(out)] == [100, 120, 156]
    assert [out[d]["resid"] for d in sorted(out)] == [0, 100, 180]


def test_dirichlet_lm_hand_probability(spark, tmp_path):
    """doc1 = 'spark join x' (candidate), doc2 = 'y y' (no query term
    -> not a candidate).  C = 5 tokens; cf(spark) = cf(join) = 1;
    'window' is corpus-absent so it contributes no grid row (engine
    and oracle agree on dropping zero-mass terms).  p9(spark|doc1) =
    (1·5 + 2000·1)·1e9 div ((3+2000)·5)."""
    _write(spark, tmp_path, "documents",
           [(1, "spark join x"), (2, "y y")], "doc_id bigint, text string")
    rows = QUERIES["q_dirichlet_lm"](spark, str(tmp_path)).collect()
    assert {r["id"] for r in rows} == {1}
    assert {r["tok"] for r in rows} == {"spark", "join"}
    expect = (1 * 5 + 2000 * 1) * 10**9 // ((3 + 2000) * 5)
    for r in rows:
        assert r["tf"] == 1 and r["dl"] == 3
        assert r["p9"] == expect


def test_lincoln_petersen_chapman_hand(spark, tmp_path):
    """Samples {A,B,C} / {B,C,D}: n1 = n2 = 3, m = 2; Chapman
    N-hat = 4·4/3 − 1 -> nhat_q = 16e9 div 3 − 1e9."""
    rows = [
        (1, datetime.date(1995, 3, 1)), (2, datetime.date(1995, 4, 1)),
        (3, datetime.date(1995, 5, 1)), (2, datetime.date(1996, 3, 1)),
        (3, datetime.date(1996, 4, 1)), (4, datetime.date(1996, 5, 1)),
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_custkey bigint, o_orderdate date")
    r = QUERIES["q_lincoln_petersen"](spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"], r["m"]) == (3, 3, 2)
    assert r["nhat_q"] == 16 * 10**9 // 3 - 10**9


def test_qq_deciles_hand_positions(spark, tmp_path):
    """F group = 100..1000 cents, O group = 200..2000: at decile 5
    (n = 10, lo = 5, hi = 6) q2_f = 500+600, q2_o = 1000+1200."""
    rows = []
    key = 0
    for i in range(10):
        key += 1
        rows.append((key, "F", 1.00 * (i + 1)))
    for i in range(10):
        key += 1
        rows.append((key, "O", 2.00 * (i + 1)))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderstatus string, o_totalprice double")
    out = {r["dec"]: r for r in QUERIES["q_qq_deciles"](spark, str(tmp_path)).collect()}
    assert len(out) == 9
    assert out[5]["q2_f"] == 1100 and out[5]["q2_o"] == 2200
    assert out[5]["q2_diff"] == -1100
    # decile 10·(n−1)/10 exact-position case: d=10 excluded; d≠exact
    # positions double both endpoints — identity q2 parity with sorted
    vals_f = [100 * (i + 1) for i in range(10)]
    for d in range(1, 10):
        lo = (d * 9) // 10
        hi = lo + (1 if (d * 9) % 10 else 0)
        assert out[d]["q2_f"] == vals_f[lo] + vals_f[hi]


def test_theil_u2_hand_fold(spark, tmp_path):
    """Days 100, 110, 120 cents: EWMA s = 100, 102; residuals 10, 18
    -> sr2 = 424; naive diffs 10, 10 -> sd2 = 200; U2²·1e6 = 2,120,000."""
    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 1.00 + 0.10 * i) for i in range(3)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderdate date, o_totalprice double")
    r = QUERIES["q_theil_u2"](spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 3
    assert r["u2_num"] == 424.0 and r["u2_den"] == 200.0
    assert r["u2sq_6"] == 424 * 10**6 // 200


def test_quade_hand_weights(spark, tmp_path):
    """Two consistent months, month 2 with 10x the spread: block
    weights 1 and 2, S_j = ±12, ±6, 0; F = 1·360/(2·200−360) = 9."""
    rows = []
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT", "5-LOW"]
    for i, p in enumerate(prios):
        rows.append((datetime.date(2024, 1, 15), p, 1.00 * (i + 1)))
        rows.append((datetime.date(2024, 2, 15), p, 10.00 * (i + 1)))
    _write(spark, tmp_path, "orders", rows,
           "o_orderdate date, o_orderpriority string, o_totalprice double")
    out = {r["treatment"]: r for r in QUERIES["q_quade"](spark, str(tmp_path)).collect()}
    assert [out[p]["s2_j"] for p in prios] == [-12, -6, 0, 6, 12]
    for r in out.values():
        assert r["a4"] == 200
        assert r["quade_f"] == 9.0


def test_betweenness_probe_path_graph(spark):
    """Path 1-2-3-4-5, sources 1..4 layered like the query: hand-run
    Brandes gives bc_q(2) = 4e9 (2e9 from s1 + 1e9 each from s3/s4),
    bc_q(3) = 5e9 (1e9 from s1's level-2 dependency + 2e9 each from
    s2/s4), bc_q(4) = 2e9, endpoints 0."""
    from pyspark.sql import functions as F

    from loan_etl_data_pipeline_spark.operators.graph import betweenness_probe

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "pa bigint, pb bigint"
    )
    layered = None
    for s in range(4):
        layer = edges.select(
            (F.col("pa") * 8 + s).alias("la"), (F.col("pb") * 8 + s).alias("lb")
        )
        layered = layer if layered is None else layered.union(layer)
    seeds = spark.createDataFrame(
        [(n * 8 + (n - 1),) for n in (1, 2, 3, 4)], "id bigint"
    )
    d = betweenness_probe(layered, "la", "lb", seeds=seeds, max_hops=3)
    bc = {
        r["part"]: r["bc"]
        for r in d.groupBy(F.expr("id div 8").alias("part"))
        .agg(F.sum("delta_q").alias("bc"))
        .collect()
    }
    G = 10**9
    assert bc[2] == 4 * G and bc[3] == 5 * G
    assert bc[4] == 2 * G
    assert bc.get(1, 0) == 0 and bc.get(5, 0) == 0


def test_t_closeness_hand_emd(spark, tmp_path):
    """Class A = 2 rows bracket 0; class B = 1 row br0 + 2 rows br1
    (N = 5, m = 2, cum_all = 3,5): EMD_q(A) = |2·5−3·2|·1e9/(2·5·1)
    = 4e8 > EMD_q(B) = 4e9/(3·5) = 266666666."""
    rows = [
        (1, "X", 500.0), (1, "X", 600.0),          # class A, bracket 0
        (2, "X", 700.0), (2, "X", 1500.0), (2, "X", 1600.0),  # class B
    ]
    _write(spark, tmp_path, "customer", rows,
           "c_nationkey bigint, c_mktsegment string, c_acctbal double")
    out = QUERIES["q_t_closeness"](spark, str(tmp_path)).collect()
    assert [(r["c_nationkey"], r["t_q"]) for r in out] == [
        (1, 400_000_000), (2, 266_666_666)]


def test_attack_robustness_star_plus_edge(spark, tmp_path):
    """Co-purchase graph = star 1-{2,3,4,5} plus isolated edge 6-7
    (each pair planted in two orders to clear the support>=2 floor):
    hubs = {1,2,3,4}, kept edges = {6-7}, LCC 5 -> 2."""
    rows = []
    ok = 0
    for a, b in [(1, 2), (1, 3), (1, 4), (1, 5), (6, 7)]:
        for _ in range(2):  # support >= 2
            ok += 1
            rows.append((ok, a))
            rows.append((ok, b))
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint")
    r = QUERIES["q_attack_robustness"](spark, str(tmp_path)).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (7, 5)
    assert r["lcc_before"] == 5
    assert (r["n_edges_after"], r["lcc_after"]) == (1, 2)


def test_shapley_attribution_hand_values(spark, tmp_path):
    """User 1 converts after {click}; user 2 converts after
    {click, view}: v(∅)=0 and Shapley splits user 2 equally —
    φ24(click) = 24 + 12 = 36, φ24(view) = 12, others 0; efficiency
    Σφ24 = 24·v(full) = 48."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, base, "click"), (2, 1, base + datetime.timedelta(hours=1), "purchase"),
        (3, 2, base, "click"), (4, 2, base + datetime.timedelta(minutes=30), "view"),
        (5, 2, base + datetime.timedelta(hours=2), "purchase"),
        (6, 3, base, "view"),  # never converts: no purchase event
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, ts timestamp, event_type string")
    out = {r["channel"]: r for r in
           QUERIES["q_shapley_attribution"](spark, str(tmp_path)).collect()}
    assert out["click"]["phi24"] == 36
    assert out["view"]["phi24"] == 12
    assert out["error"]["phi24"] == 0 and out["signup"]["phi24"] == 0
    assert all(r["v_full"] == 2 for r in out.values())
    assert sum(r["phi24"] for r in out.values()) == 24 * 2


def test_sax_motifs_cycling_weeks(spark, tmp_path):
    """12 full weeks with daily prices cycling 1,2,3,4 dollars by week:
    symbols a,b,c,d repeat; words abcd x3, bcda/cdab/dabc x2 each."""
    base = datetime.date(2024, 1, 1)
    rows = []
    for w in range(12):
        price = 1.00 * (w % 4 + 1)
        for i in range(7):
            rows.append((base + datetime.timedelta(days=7 * w + i), price))
    _write(spark, tmp_path, "orders", rows,
           "o_orderdate date, o_totalprice double")
    out = {r["word"]: r for r in QUERIES["q_sax_motifs"](spark, str(tmp_path)).collect()}
    assert out["abcd"]["n_occ"] == 3 and out["abcd"]["first_week"] == 0
    assert out["bcda"]["n_occ"] == 2
    assert out["cdab"]["n_occ"] == 2
    assert out["dabc"]["n_occ"] == 2


def test_interval_join_streamed_cross_chunk_match(spark, tmp_path):
    """The pair whose sides arrive in DIFFERENT micro-batches (error
    100 s before the 2024-01-11 chunk cut, click 100 s after) must
    survive the watermark/state-eviction horizon: n_pairs = 2 for
    user 1 (in-chunk lag 100 + cross-chunk lag 200), none for user 2
    (click at 400 s is past the 300 s interval)."""
    cut = datetime.datetime(2024, 1, 11, 0, 0, 0)
    t0 = datetime.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (1, 1, t0, "error", 1.0),
        (2, 1, t0 + datetime.timedelta(seconds=100), "click", 1.0),
        (3, 2, t0, "error", 1.0),
        (4, 2, t0 + datetime.timedelta(seconds=400), "click", 1.0),
        # cross-chunk pair for user 1
        (5, 1, cut - datetime.timedelta(seconds=100), "error", 1.0),
        (6, 1, cut + datetime.timedelta(seconds=100), "click", 1.0),
        # a late third-chunk row so every chunk is non-empty
        (7, 3, datetime.datetime(2024, 1, 25, 0, 0, 0), "view", 1.0),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, ts timestamp, "
           "event_type string, value double")
    out = {r["user_id"]: r for r in
           QUERIES["q_interval_join_streamed"](spark, str(tmp_path)).collect()}
    assert out[1]["n_pairs"] == 2
    assert out[1]["lag_sec_sum"] == 300  # 100 + 200
    assert 2 not in out


def test_sql_recursive_bfs_matches_operator(spark, sf_dir):
    """Spark's native WITH RECURSIVE BFS must equal the bfs_hops
    frontier-loop operator on the same graph/seed."""
    from pyspark.sql import functions as F

    from loan_etl_data_pipeline_spark.operators.graph import bfs_hops
    from loan_etl_data_pipeline_spark.queries import (
        _copurchase_edges,
        all_queries,
    )

    sql_hist = {
        r["hops"]: r["n_nodes"]
        for r in all_queries()["q_sql_recursive_bfs"](spark, sf_dir).collect()
    }
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    src = edges.agg(F.min("pa").alias("id"))
    op_hist = {
        r["hops"]: r["n"]
        for r in bfs_hops(edges, "pa", "pb", seeds=src, max_hops=3)
        .groupBy("hops")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sql_hist == op_hist


def test_spark_recursive_cte_union_boundary(spark):
    """Engine boundary pin: Spark 4.1 recursive CTEs reject set-
    semantics UNION (cyclic closures stay with the iterative
    operators). If an upgrade lifts this, the q_sql_recursive_bfs
    docstring and the CC oracle strategy can both revisit."""
    import pytest as _pytest

    with _pytest.raises(Exception, match="UNION_NOT_SUPPORTED|UNION ALL"):
        spark.sql(
            """
            WITH RECURSIVE t(n) AS (
                SELECT 1 UNION SELECT n + 1 FROM t WHERE n < 3
            ) SELECT * FROM t
            """
        ).collect()
