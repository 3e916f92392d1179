"""Semantic tests for the round-4 statistics / text-modeling queries.

Exact cross-engine parity is covered by tests/test_oracle_parity.py
(these queries all register oracles); here we assert the STATISTICS
mean what they claim — ranges, known-answer structure, and
better-than-baseline behavior — on the driver testdata.
"""

from __future__ import annotations

import math

from loan_etl_data_pipeline_spark.queries import (
    q_chi2_independence,
    q_kendall_tau,
    q_llr_collocations,
    q_nb_langid,
    q_ses_level,
)


def test_chi2_independence_shape(spark, sf_dir):
    row = q_chi2_independence(spark, sf_dir).collect()[0]
    # TPC-H semantics force returnflag↔linestatus dependence (R/A only
    # ship as F), so the statistic must be large and V in (0, 1].
    assert row.chi2 > 0
    assert row.dof == 2  # (3-1)(2-1)
    assert 0.0 < row.cramers_v <= 1.0
    # V = sqrt(chi2 / (n·min(r-1,c-1))) must be internally consistent
    assert math.isclose(
        row.cramers_v, math.sqrt(row.chi2 / (row.n_rows * 1.0)), rel_tol=1e-12
    )


def test_kendall_tau_range_and_counters(spark, sf_dir):
    n = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter("p_partkey <= 300")
        .count()
    )
    row = q_kendall_tau(spark, sf_dir).collect()[0]
    n0 = row.n0
    assert n0 == n * (n - 1) // 2
    assert -1.0 <= row.tau_b <= 1.0
    # concordant + discordant + (pairs tied in x or y) == all pairs;
    # conc/disc exclude ties by construction
    assert row.conc + row.disc <= n0
    assert row.ties_x < n0  # p_size has ~50 distinct values → many ties
    assert row.ties_x > 0


def test_kendall_tau_perfect_monotone(spark, tmp_path):
    # Known answer: y strictly increasing in x → tau_b = 1 exactly.
    import pyspark.sql.functions as F

    df = spark.range(1, 51).select(
        F.col("id").alias("p_partkey"),
        F.col("id").cast("int").alias("p_size"),
        (F.col("id") * 7).cast("double").alias("p_retailprice"),
        F.lit("n").alias("p_name"),
        F.lit("b").alias("p_brand"),
        F.lit("t").alias("p_type"),
    )
    path = str(tmp_path / "part.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    import loan_etl_data_pipeline_spark.sources.tables as tables

    # point load_table at the synthetic dir for this call
    row = (
        q_kendall_tau(spark, str(tmp_path)).collect()[0]
        if hasattr(tables, "load_table")
        else None
    )
    assert row.tau_b == 1.0
    assert row.disc == 0 and row.ties_x == 0 and row.ties_y == 0


def test_llr_collocations_properties(spark, sf_dir):
    rows = q_llr_collocations(spark, sf_dir).collect()
    assert len(rows) == 20
    # scores sorted desc, all non-negative (G² of a 2x2 with consistent
    # margins is ≥ 0 up to quantization −4e-10 worst case)
    llrs = [r.llr for r in rows]
    assert llrs == sorted(llrs, reverse=True)
    assert all(x >= -1e-9 for x in llrs)
    # every reported pair respects the min-support gate and margins
    for r in rows:
        assert r.c12 >= 5
        assert r.c1 >= r.c12 and r.c2 >= r.c12


def test_nb_langid_query_shape(spark, sf_dir):
    # the registered query certifies the exact machinery; the testdata
    # lang labels are random w.r.t. text, so only structure is asserted
    rows = q_nb_langid(spark, sf_dir).collect()
    assert rows, "no test docs"
    assert all(r.doc_id % 5 == 0 for r in rows)
    labels = {r.true_lang for r in rows}
    assert all(r.pred_lang in labels for r in rows)
    assert all(r.correct == int(r.pred_lang == r.true_lang) for r in rows)


def test_nb_learns_planted_signal(spark):
    # plant a token-label signal: label A docs speak {alpha,beta},
    # label B docs speak {gamma,delta}, with shared filler tokens
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.nb import nb_score, nb_train

    rows = []
    for i in range(200):
        lab = "A" if i % 2 == 0 else "B"
        own = "alpha beta" if lab == "A" else "gamma delta"
        rows.append((i, lab, f"{own} filler common word {own}"))
    df = spark.createDataFrame(rows, "id bigint, lab string, text string")
    train = df.filter(F.col("id") < 150)
    test = df.filter(F.col("id") >= 150)
    ctl, lf = nb_train(train, label_col="lab", text_col="text")
    out = nb_score(
        test, ctl, lf, id_col="id", text_col="text", true_label_col="lab"
    ).collect()
    assert len(out) == 50
    acc = sum(r.correct for r in out) / len(out)
    assert acc == 1.0, f"separable classes must classify perfectly: {acc}"


def test_nb_tie_breaks_to_smallest_label(spark):
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.nb import nb_score, nb_train

    # two labels with IDENTICAL token distributions and equal priors →
    # every score ties → pred must be the lexicographically smaller
    train = spark.createDataFrame(
        [(0, "x", "tok tok"), (1, "y", "tok tok")],
        "id bigint, lab string, text string",
    )
    test = spark.createDataFrame(
        [(2, "x", "tok")], "id bigint, lab string, text string"
    )
    ctl, lf = nb_train(train, label_col="lab", text_col="text")
    out = nb_score(
        test, ctl, lf, id_col="id", text_col="text", true_label_col="lab"
    ).collect()
    assert out[0].pred_label == "x"


def test_ses_level_semantics(spark, sf_dir):
    rows = {r.month_idx: r for r in q_ses_level(spark, sf_dir).collect()}
    assert 1 in rows
    # s_1 == x_1 exactly (the 2^-0 weight); quantization is exact there
    assert math.isclose(rows[1].level, rows[1].actual, rel_tol=1e-6)
    # s_2 == (x_1 + x_2)/2 up to the 2^-20 quantizer
    if 2 in rows:
        want = (rows[1].actual + rows[2].actual) / 2
        assert abs(rows[2].level - want) < 0.01
    # every level lies within the running min/max envelope (convexity)
    lo = hi = rows[1].actual
    for t in sorted(rows):
        lo, hi = min(lo, rows[t].actual), max(hi, rows[t].actual)
        assert lo - 0.01 <= rows[t].level <= hi + 0.01


def test_table_fingerprint_partitioning_invariant(spark, sf_dir):
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.quality import (
        table_fingerprint,
    )

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    canon = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")
    )
    a = {r.bucket: (r.n_rows, r.checksum)
         for r in table_fingerprint(df, canon).collect()}
    b = {r.bucket: (r.n_rows, r.checksum)
         for r in table_fingerprint(
             df.repartition(17, "o_custkey"), canon).collect()}
    assert a == b  # any partitioning, same multiset → same fingerprint


def test_table_fingerprint_detects_single_row_change(spark, sf_dir):
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.quality import (
        table_fingerprint,
    )

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    canon = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")
    )
    mutated = df.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == df.agg(
            F.min("o_orderkey")).collect()[0][0], F.lit("Z"))
        .otherwise(F.col("o_orderstatus")),
    )
    a = {r.bucket: (r.n_rows, r.checksum)
         for r in table_fingerprint(df, canon).collect()}
    b = {r.bucket: (r.n_rows, r.checksum)
         for r in table_fingerprint(mutated, canon).collect()}
    assert a != b  # a single flipped value must surface
    # and the damage is localized: at most 2 buckets differ
    diff = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
    assert 1 <= len(diff) <= 2


def test_burrows_delta_separates_planted_styles(spark):
    # s_a and s_b share a style (heavy "alpha"), s_c differs (heavy
    # "omega") — Delta(a,b) must be the smallest pairwise distance
    import pyspark.sql.functions as F  # noqa: F401

    from loan_etl_data_pipeline_spark.operators.text import burrows_delta

    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append((i, "s_a", "alpha alpha alpha beta common word"))
        elif i % 3 == 1:
            rows.append((i, "s_b", "alpha alpha alpha gamma common word"))
        else:
            rows.append((i, "s_c", "omega omega omega delta common word"))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    d = {(r.s1, r.s2): r.delta
         for r in burrows_delta(df, "source", "text", top_k=8).collect()}
    assert set(d) == {("s_a", "s_b"), ("s_a", "s_c"), ("s_b", "s_c")}
    assert d[("s_a", "s_b")] < d[("s_a", "s_c")]
    assert d[("s_a", "s_b")] < d[("s_b", "s_c")]


def test_burrows_delta_symmetric_zero_on_identical(spark):
    from loan_etl_data_pipeline_spark.operators.text import burrows_delta

    rows = [(0, "x", "one two three"), (1, "y", "one two three")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = burrows_delta(df, "source", "text", top_k=3).collect()
    assert len(out) == 1
    # identical token distributions → every marker variance is 0 → z=0
    assert out[0].delta == 0.0


def test_rake_known_answer(spark):
    from loan_etl_data_pipeline_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [
            (1, "red apple and green pear"),
            (2, "red apple in the basket"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.phrase: r for r in rake_keywords(df, "text", "doc_id").collect()}
    # "red apple" occurs twice; each of red/apple: deg=2+2=4, freq=2
    # → word score 2.0 each → phrase score 4.0
    assert rows["red apple"].n_occ == 2
    assert rows["red apple"].score == 4.0
    # "green pear": deg=2, freq=1 → 2.0 each → 4.0; occurs once
    assert rows["green pear"].n_occ == 1
    assert rows["green pear"].score == 4.0
    # "basket": lone word after a stopword run → deg=1 freq=1 → 1.0
    assert rows["basket"].score == 1.0


def test_decay_attribution_planted_shares(spark, tmp_path):
    import datetime

    import pyspark.sql.functions as F  # noqa: F401

    from loan_etl_data_pipeline_spark.queries import q_decay_attribution

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, dt_hours, user, etype):
        return (
            eid,
            t0 + datetime.timedelta(hours=dt_hours),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, -1, 7, "view"),    # k=0 → w=2^28
        ev(2, -13, 7, "click"),  # k=2 → w=2^26
        ev(3, 0, 7, "purchase"),
        ev(4, -200, 7, "view"),  # outside the 7-day lookback → ignored
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.channel: r for r in
           q_decay_attribution(spark, str(tmp_path)).collect()}
    # shares: 2^28/(2^28+2^26) = 0.8, 2^26/(2^28+2^26) = 0.2
    assert abs(out["view"].credited - 0.8) < 1e-6
    assert abs(out["click"].credited - 0.2) < 1e-6
    assert out["view"].n_touches == 1 and out["click"].n_touches == 1


def test_decay_attribution_conserves_credit(spark, sf_dir):
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.queries import q_decay_attribution
    from loan_etl_data_pipeline_spark.sources.tables import load_table

    out = q_decay_attribution(spark, sf_dir).collect()
    total = sum(r.credited for r in out)
    # every attributed conversion hands out exactly ≤1 credit (floor
    # quantization loses < 1e-9 per touch)
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    conv = e.filter("event_type = 'purchase'").select("user_id", "us")
    touch = e.filter("event_type in ('view','click')").select(
        "user_id", F.col("us").alias("tus"))
    attributed = (
        touch.join(conv, "user_id")
        .filter("tus < us and us - tus <= 604800000000")
        .select("user_id", "us").distinct().count()
    )
    assert attributed > 0
    assert total <= attributed + 1e-6
    assert total > attributed - 1  # floors lose ≪ 1 credit in total


def test_table_fingerprint_maintains_incrementally(spark, sf_dir):
    # checksum components are (count, int sum) — both fold_batches
    # measures — so the fingerprint of a growing table can be
    # MAINTAINED from delta batches without rescanning, and must equal
    # the one-shot fingerprint bit-for-bit
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.incremental import (
        fold_batches,
    )
    from loan_etl_data_pipeline_spark.operators.quality import (
        table_fingerprint,
    )

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    canon = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")
    )
    h = F.md5(canon)
    prepared = df.select(
        F.substring(h, 32, 1).alias("bucket"),
        F.conv(F.substring(h, 1, 10), 16, 10).cast("bigint").alias("coord"),
    )
    batches = [prepared.filter(F.col("coord") % 3 == i) for i in range(3)]
    folded = fold_batches(
        batches,
        ["bucket"],
        {"n_rows": ("count", None), "checksum": ("sum", "coord")},
    )
    inc = {r.bucket: (r.n_rows, r.checksum) for r in folded.collect()}
    one = {r.bucket: (r.n_rows, r.checksum)
           for r in table_fingerprint(df, canon).collect()}
    assert inc == one


def test_cdc_chunks_boundary_stability_vs_fixed_width(spark):
    # THE content-defined property: prepending one token re-chunks only
    # the head neighborhood — most chunk digests survive. Fixed-width
    # windows lose (almost) all of them.
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.dedup import cdc_chunks

    base_text = " ".join(f"tok{i}" for i in range(400))
    edited_text = "inserted " + base_text
    df = spark.createDataFrame(
        [(1, base_text), (2, edited_text)], "doc_id bigint, text string"
    )
    ch = cdc_chunks(df, "doc_id", "text").select("doc", "chunk_md5").collect()
    a = {r.chunk_md5 for r in ch if r.doc == 1}
    b = {r.chunk_md5 for r in ch if r.doc == 2}
    shared = len(a & b) / len(a)
    assert shared > 0.8, f"CDC should preserve most chunks: {shared:.2f}"
    # fixed-width 4-token windows of the same pair shift everywhere
    def fixed_digests(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + 4]) for i in range(0, len(toks) - 3, 4)
        }
    fa, fb = fixed_digests(base_text), fixed_digests(edited_text)
    assert len(fa & fb) / len(fa) < 0.05


def test_cdc_chunks_cover_and_reconstruct(spark):
    from loan_etl_data_pipeline_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    rows = sorted(
        cdc_chunks(df, "doc_id", "text").collect(), key=lambda r: r.seg
    )
    # chunks partition the token stream: concatenation reconstructs it
    joined = " ".join(r.chunk for r in rows)
    assert joined == "alpha beta gamma delta epsilon zeta eta theta"
    assert sum(r.n_tokens for r in rows) == 8


def test_matryoshka_recall_bounds_and_identity(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import q_matryoshka_recall

    rows = q_matryoshka_recall(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_at_5 == r.n_hits / 5
    # truncation must retain SOME signal on 64-dim vectors
    assert sum(r.n_hits for r in rows) > 0


def test_calibration_semantics(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import q_calibration

    rows = q_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.predicted_rate <= 1.0
        assert 0.0 <= r.observed_rate <= 1.0
        # Brier per bin is bounded by max((1-p)^2, p^2) ≤ 1
        assert 0.0 <= r.brier <= 1.0
        # Brier decomposition floor: brier >= (pred - obs)^2 is NOT
        # generally true per-bin, but brier >= variance of y given the
        # constant prediction minus quantization: check the identity
        # brier = p^2 + obs*(1 - 2p) up to the 1e-6 p-quantization
        p, o = r.predicted_rate, r.observed_rate
        assert abs(r.brier - (p * p + o * (1 - 2 * p))) < 1e-5


def test_mcc_range_and_consistency(spark, sf_dir):
    import math as _math

    from loan_etl_data_pipeline_spark.queries import q_mcc

    r = q_mcc(spark, sf_dir).collect()[0]
    assert -1.0 <= r.mcc <= 1.0
    n = r.tp + r.fp + r.fn + r.tn
    assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # MCC is the phi coefficient: mcc^2 * n == chi2 of the same 2x2
    num = r.tp * r.tn - r.fp * r.fn
    den = _math.sqrt(
        float((r.tp + r.fp) * (r.tp + r.fn))
        * float((r.tn + r.fp) * (r.tn + r.fn))
    )
    assert _math.isclose(r.mcc, num / den, rel_tol=1e-12)


def test_wasserstein_metric_properties(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import q_wasserstein

    r = q_wasserstein(spark, sf_dir).collect()[0]
    assert r.wasserstein >= 0.0
    assert r.n_src0 > 0 and r.n_src1 > 0


def test_wasserstein_known_shift(spark, tmp_path):
    # distributions that differ by a constant shift d have W1 == d
    from loan_etl_data_pipeline_spark.queries import q_wasserstein

    rows = [(i, "t", "en", "src0", 100 + (i % 5)) for i in range(50)]
    rows += [(1000 + i, "t", "en", "src1", 107 + (i % 5)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = q_wasserstein(spark, str(tmp_path)).collect()[0]
    assert abs(r.wasserstein - 7.0) < 1e-9


def test_compression_ratio_separates_entropy(spark):
    from loan_etl_data_pipeline_spark.operators.text import compression_ratio

    rep = "spam " * 400
    varied = " ".join(f"w{i}x{i * 7919 % 104729}" for i in range(400))
    df = spark.createDataFrame(
        [(1, rep), (2, varied), (3, "")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in
            compression_ratio(df, "doc_id", "text").collect()}
    assert rows[1].ratio < 0.05          # pure repetition crushes
    assert rows[2].ratio > 3 * rows[1].ratio
    assert rows[1].n_bytes == len(rep.encode())
    assert rows[3].n_bytes == 0 and rows[3].ratio > 0  # guarded /0


def test_compression_ratio_partitioning_invariant(spark, sf_dir):
    from loan_etl_data_pipeline_spark.operators.text import compression_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id: (r.n_bytes, r.n_compressed)
         for r in compression_ratio(docs, "doc_id", "text").collect()}
    b = {r.doc_id: (r.n_bytes, r.n_compressed)
         for r in compression_ratio(
             docs.repartition(13), "doc_id", "text").collect()}
    assert a == b


def test_link_prediction_scores_non_edges_only(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import (
        _copurchase_edges,
        q_link_prediction,
    )

    rows = q_link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    edges = {(r.pa, r.pb) for r in _copurchase_edges(spark, sf_dir).collect()}
    for r in rows:
        assert (r.a, r.b) not in edges
        assert 0.0 < r.jaccard <= 1.0
        assert r.cn >= 1


def test_token_adaptation_bursty_vs_uniform(spark, tmp_path):
    # planted: "bursty" appears 3x in few docs; "spread" once per doc.
    # adaptation(bursty) must be high, adaptation(spread) exactly 0.
    from loan_etl_data_pipeline_spark.queries import q_token_adaptation

    rows = []
    for i in range(40):
        base = "spread filler" + (" bursty bursty bursty" if i < 10 else "")
        rows.append((i, base, "en", "s", len(base)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.tok: r for r in q_token_adaptation(spark, str(tmp_path)).collect()}
    assert out["spread"].adaptation == 0.0
    assert out["bursty"].adaptation == 1.0  # every host doc repeats it
    assert out["spread"].baseline == 1.0
    assert abs(out["bursty"].baseline - 0.25) < 1e-12


def test_mirror_sources_planted_syndication(spark, tmp_path):
    # sources A and B share a copied span; C is original — (A,B) must
    # dominate, and pairs with no shared 4-gram must not appear
    from loan_etl_data_pipeline_spark.queries import q_mirror_sources

    span = "copied boilerplate navigation footer text here now"
    rows = [
        (1, f"alpha beta {span}", "en", "A", 10),
        (2, f"{span} gamma delta", "en", "B", 10),
        (3, "completely different words in every position", "en", "C", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {(r.s1, r.s2): r.n_shared_grams
           for r in q_mirror_sources(spark, str(tmp_path)).collect()}
    assert ("A", "B") in out and out[("A", "B")] == 4  # 7-token span → 4 grams
    assert ("A", "C") not in out and ("B", "C") not in out


def test_coordinated_sample_join_consistency(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import q_coordinated_sample

    r = q_coordinated_sample(spark, sf_dir).collect()[0]
    assert r.n_orphans_coord == 0  # the whole point
    # independent sampling orphans ≈ (1-p)=75% of its sampled children
    assert r.n_orphans_indep > 0.6 * r.n_li_indep
    # both samples land near p=25%
    total_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for n in (r.n_li_coord, r.n_li_indep):
        assert abs(n / total_li - 0.25) < 0.05


def test_rbo_bounds_and_consistency_with_recall(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import (
        q_matryoshka_recall,
        q_rbo_truncation,
    )

    rbo = {r.query_id: r for r in q_rbo_truncation(spark, sf_dir).collect()}
    rec = {r.query_id: r for r in
           q_matryoshka_recall(spark, sf_dir).collect()}
    assert set(rbo) == set(rec)
    # truncated RBO_min at p=0.9 over 5 depths is bounded by
    # 0.1 * sum(p^(d-1)) = 0.40951
    for q, r in rbo.items():
        assert 0.0 <= r.rbo <= 0.40951 + 1e-12
        # depth-5 agreement equals the recall query's hit count
        assert r.overlap_at_5 == rec[q].n_hits
        # identical rankings would give the max; zero overlap gives 0
        if r.overlap_at_5 == 0:
            assert r.rbo == 0.0


# ---- seasonal_decompose / theil_sen (operators/windows.py) ------------


def test_seasonal_decompose_recovers_planted_structure(spark):
    from loan_etl_data_pipeline_spark.operators.windows import (
        seasonal_decompose,
    )

    # y = 1000·t (pure linear trend) + planted period-4 pattern
    seas = {0: 80, 1: -40, 2: 60, 3: -100}
    rows = [(t, 1000 * t + seas[t % 4]) for t in range(1, 41)]
    out = {
        r["t"]: r
        for r in seasonal_decompose(
            spark.createDataFrame(rows, ["t", "y"]), "t", "y", period=4
        ).collect()
    }
    # interior months: the centered MA of a linear trend IS the trend,
    # and the planted pattern's window sum cancels (sum of one full
    # period appears twice) — trend = 1000·t exactly
    for t in range(3, 39):
        assert out[t]["trend"] == 1000.0 * t, (t, out[t])
    # seasonal estimates recover the centered planted pattern
    mean_s = sum(seas.values()) / 4  # decomposition centers the pattern
    for t in range(3, 39):
        assert abs(out[t]["seasonal"] - (seas[t % 4] - mean_s)) < 1e-9
        assert abs(out[t]["resid"] - mean_s) < 1e-9  # constant leftover
    # edges: no trend/resid, seasonal still attaches
    assert out[1]["trend"] is None and out[1]["resid"] is None
    assert out[1]["seasonal"] is not None


def test_seasonal_decompose_validates_period(spark):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.operators.windows import (
        seasonal_decompose,
    )

    df = spark.createDataFrame([(1, 1)], ["t", "y"])
    with _pt.raises(ValueError):
        seasonal_decompose(df, "t", "y", period=5)
    with _pt.raises(ValueError):
        seasonal_decompose(df, "t", "y", period=0)


def test_theil_sen_robust_to_outlier(spark):
    from loan_etl_data_pipeline_spark.operators.windows import theil_sen

    # clean slope 7; one wrecked point that drags OLS far off
    rows = [(t, 7 * t) for t in range(1, 30)] + [(30, 100000)]
    r = theil_sen(spark.createDataFrame(rows, ["t", "y"]), "t", "y").collect()[0]
    assert r["n_pairs"] == 30 * 29 // 2
    assert r["slope_med"] == 7.0  # the median slope ignores the outlier


def test_theil_sen_even_pair_count_averages_middles(spark):
    from loan_etl_data_pipeline_spark.operators.windows import theil_sen

    # 4 points → 6 pairwise slopes: y = t² gives slopes t_i + t_j
    # pairs of (1,2,3,4): 3,4,5,5,6,7 → median = (5+5)/2 = 5
    rows = [(t, t * t) for t in (1, 2, 3, 4)]
    r = theil_sen(spark.createDataFrame(rows, ["t", "y"]), "t", "y").collect()[0]
    assert (r["n_pairs"], r["slope_med"]) == (6, 5.0)


def test_mann_whitney_hand_values(spark, tmp_path):
    """A={1,3}, B={2,3} (cents): sorted 1a,2b,3a,3b — doubled avg ranks
    2, 4, 7, 7; R_a2x = 2+7 = 9; U_a = 1.5 -> u_a2x = 9 - 2*3 = 3;
    u_b2x = 2*4 - 3 = 5 (direct pair count: #(a>b) + ties/2 = 1.5)."""
    from loan_etl_data_pipeline_spark.queries import all_queries

    rows = [
        ("1-URGENT", 0.01), ("1-URGENT", 0.03),
        ("5-LOW", 0.02), ("5-LOW", 0.03),
        ("3-MEDIUM", 99.0),  # filtered out
    ]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    row = all_queries()["q_mann_whitney"](spark, str(tmp_path)).collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2)
    assert row["r_a2x"] == 9
    assert row["u_a2x"] == 3
    assert row["u_b2x"] == 5
    assert row["mean_u2x"] == 4
