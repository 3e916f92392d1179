"""Plan-shape audits: the scale properties the docstrings claim, asserted
against the actual physical plans at sf0.001 (shapes are SF-invariant)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.queries import all_queries


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = all_queries()

    def plan_of(name):
        return (
            qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )

    return plan_of


def test_star_join_broadcasts_dimensions(plans):
    p = plans("q_local_supplier")
    # supplier + nation⋈region chain broadcast; lineitem⋈orders and
    # customer remain shuffle joins — never a broadcast of a fact table
    assert p.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in p


def test_star_join_pushes_date_filter(plans):
    p = plans("q_local_supplier")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in p


def test_filter_project_pushdown(plans):
    p = plans("q_filter_project")
    assert "PushedFilters: [" in p and "ReadSchema" in p


def test_region_rollup_all_broadcast(plans):
    p = plans("q_region_rollup")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_bm25_no_wide_shuffle(plans):
    # scoring scan + TakeOrdered only: no hash-partitioned exchange
    p = plans("q_bm25_search")
    assert "Exchange hashpartitioning" not in p
    assert "TakeOrderedAndProject" in p


def test_pricing_summary_partial_aggregation(plans):
    p = plans("q_pricing_summary")
    # partial + final HashAggregate pair around one exchange
    assert p.count("HashAggregate") >= 2
    assert "SortAggregate" not in p


def test_curriculum_tiles_not_single_partition(plans):
    # global ntile computed via range partition + offsets, never an
    # Exchange SinglePartition of the data (the bare Window.orderBy plan)
    p = plans("q_curriculum")
    assert "rangepartitioning" in p
    assert "Exchange SinglePartition" not in p


def test_sql_entry_point_pushes_filters(plans):
    """q_sql_q6 (spark.sql over registered views) must reach the same
    parquet pushdown a DataFrame plan gets — the SQL surface is not a
    slower path."""
    p = plans("q_sql_q6")
    assert "PushedFilters: [" in p
    seg = p.split("PushedFilters: [", 1)[1][:300]
    assert "l_shipdate" in seg and "l_discount" in seg and "l_quantity" in seg, seg


def test_mean_token_rank_broadcasts_vocab(plans):
    """The ranked vocabulary re-joins the token stream as a broadcast —
    the fact-side explode must not shuffle for the join."""
    assert "BroadcastHashJoin" in plans("q_mean_token_rank")


def test_disjunctive_brackets_still_push_envelope(plans):
    # OR-of-ANDs alone defeats per-bracket pushdown; the factored-out
    # quantity envelope must still reach the lineitem parquet scan, and
    # part must broadcast (never shuffle a fact for a 3-bracket probe)
    p = plans("q_disjunctive_parts")
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p
    assert "LessThanOrEqual(l_quantity,30.0)" in p
    assert "BroadcastHashJoin" in p


def test_argmin_join_back_single_hash_exchange(plans):
    # min(struct(...)) argmin: exactly ONE hash-partitioned Exchange
    # (the per-partkey aggregate); supplier/part joins are broadcasts
    p = plans("q_min_cost_supplier")
    hash_exchanges = [
        ln
        for ln in p.split("\n")
        if "Exchange hashpartitioning" in ln and "Reused" not in ln
    ]
    assert len(hash_exchanges) == 1, hash_exchanges
    assert p.count("BroadcastHashJoin") >= 3


def test_part_profit_one_fact_shuffle_pair(plans):
    """Q9 shape: part/supplier/nation broadcast; at most the
    lineitem⋈orders exchange pair + the group agg's exchange survive
    (at tiny SF orders auto-broadcasts too and only the agg exchange
    remains — either way the fact table never shuffles twice)."""
    p = plans("q_part_profit")
    assert p.count("BroadcastHashJoin") >= 3
    assert p.count("Exchange hashpartitioning") <= 3
    assert "BroadcastNestedLoopJoin" not in p


def test_part_profit_pushes_name_filter(plans):
    p = plans("q_part_profit")
    assert "StringContains(p_name,widget)" in p, p[:400]


def test_winnow_fingerprint_summary_single_wide_shuffle(plans):
    """Fingerprinting is narrow (array expressions per row): besides
    the opt-in round-robin fan-out, the only exchange is the final
    per-doc agg's hashpartitioning."""
    p = plans("q_winnow_fingerprint")
    assert p.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_semantic_dedup_survivors_via_anti_join(plans):
    """Survivors come back through a hash anti-join (AQE broadcasts it
    when the measured dropped-set size permits — no forced hint: the
    dropped set is unbounded on a redundant corpus), never a
    nested-loop product."""
    p = plans("q_semantic_dedup")
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dsir_weights_broadcast_and_topn_is_take_ordered(plans):
    """dsir_select scale shape: the ≤4096-row bucket-weight table joins
    the postings as a BROADCAST (never a wide shuffle keyed on the
    bucket), and the global top-N is a TakeOrderedAndProject, never a
    full-sort Exchange SinglePartition."""
    p = plans("q_dsir_select")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_materialized_pair_graph_consumers_scan_parquet(spark, sf_dir, tmp_path):
    """materialize() contract: after the snapshot write, a consumer's
    physical plan is a parquet FileScan of the snapshot — it must NOT
    re-derive the pair graph (no postings self-join, no xxhash64 gram
    hashing, no shuffle joins at all for a simple aggregate)."""
    from loan_etl_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_intermediates,
    )
    from loan_etl_data_pipeline_spark.sources.tables import load_table
    from loan_etl_data_pipeline_spark.sources.versioned import materialize

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5
    )
    snap = materialize(pairs, str(tmp_path / "pairsnap"), key="k1")
    release_intermediates(pairs)

    import pyspark.sql.functions as F

    consumer = snap.groupBy("id_a").agg(F.count(F.lit(1)).alias("n"))
    p = consumer._jdf.queryExecution().executedPlan().toString()
    # (Location strings are truncated to ~100 chars, so match the scan
    # node + pruned schema, not the snapshot path)
    assert "FileScan parquet" in p
    assert "ReadSchema: struct<id_a:bigint>" in p  # column pruning holds
    assert "xxhash64" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p

    # memoization: same key → same snapshot read back, no second write
    from loan_etl_data_pipeline_spark.sources.versioned import list_versions

    again = materialize(pairs, str(tmp_path / "pairsnap"), key="k1")
    assert list_versions(spark, str(tmp_path / "pairsnap")) == [1]
    assert again.count() == snap.count()
    # different key → a fresh certified version
    materialize(pairs.limit(1), str(tmp_path / "pairsnap"), key="k2")
    assert list_versions(spark, str(tmp_path / "pairsnap")) == [1, 2]


def test_kmeans_assign_bench_snapshot_parity(spark, sf_dir, tmp_path, monkeypatch):
    """_kmeans_assign bench routing: with SPARK_GRAFT_MATERIALIZE_DIR
    set, the assignment comes back as a parquet FileScan of the
    certified snapshot (no Lloyd re-run — no posexplode / distance
    aggregates in the consumer plan) and its values are identical to
    the self-contained path the driver's correctness gate runs."""
    from loan_etl_data_pipeline_spark.queries import _kmeans_assign

    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE_DIR", raising=False)
    plain = sorted(map(tuple, _kmeans_assign(spark, sf_dir).collect()))

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_DIR", str(tmp_path))
    snap = _kmeans_assign(spark, sf_dir)
    p = snap._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in p
    assert "posexplode" not in p and "SortMergeJoin" not in p
    assert sorted(map(tuple, snap.collect())) == plain

    # memoized: a second bench-mode call reads the same version back
    from loan_etl_data_pipeline_spark.sources.versioned import list_versions

    again = _kmeans_assign(spark, sf_dir)
    assert sorted(map(tuple, again.collect())) == plain
    snap_dirs = [d for d in tmp_path.iterdir() if d.name.startswith("snap_")]
    assert len(snap_dirs) == 1
    assert list_versions(spark, str(snap_dirs[0])) == [1]


def test_supplier_variety_anti_is_broadcast(plans):
    p = plans("q_supplier_variety")
    assert "LeftAnti, BuildRight" in p
    # part-size IN-list reaches the parquet scan
    assert "In(p_size, [1,5,9])" in p, p[:400]


def test_event_transitions_single_user_shuffle(plans):
    """lead() runs on the user_id partitioning; the transition count
    re-shuffles only the ≤|types|² aggregate."""
    p = plans("q_event_transitions")
    assert p.count("Exchange hashpartitioning") == 2
    assert "Exchange SinglePartition" not in p


@pytest.fixture()
def plans_no_autobroadcast(spark, sf_dir):
    """Plans with statistics-driven broadcasting OFF: at test SF every
    table fits under the threshold, so AQE broadcasts even fact-fact
    joins — the scale-relevant assertion is what the plan does when
    nothing auto-broadcasts (explicit F.broadcast() hints still win)."""
    qs = all_queries()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    def plan_of(name):
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield plan_of
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ship_mode_counts_is_shuffle_join_with_pushdown(plans_no_autobroadcast):
    # Q12 shape: big-big join with no broadcast hint anywhere — must
    # compile to a shuffle join once statistics can't flip it, with the
    # shipdate filter pushed to the lineitem scan and CASE counts
    # partial-aggregated
    p = plans_no_autobroadcast("q_ship_mode_counts")
    assert "BroadcastHashJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p
    assert p.count("HashAggregate") >= 2


def test_cust_order_distribution_reuses_join_partitioning(plans):
    # Q13 shape: join on custkey + first groupBy on custkey must share
    # one partitioning — exactly 2 big exchanges (join sides), plus the
    # tiny histogram exchange
    p = plans("q_cust_order_distribution")
    assert p.count("Exchange hashpartitioning") <= 3


def test_excess_shippers_broadcasts_filtered_sides(plans):
    # Q20 shape: part list, per-part totals, and qualifying suppkeys
    # all broadcast; the only shuffles key on the compound agg
    p = plans("q_excess_shippers")
    assert p.count("BroadcastHashJoin") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p


def test_cube_single_expand_pass(plans):
    p = plans("q_cube_returns")
    assert p.count("Expand") == 1
    assert p.count("HashAggregate") >= 2


def test_sparse_topk_corpus_never_broadcast(plans_no_autobroadcast):
    # sparse_topk hints NO broadcasts (vocab² can be arbitrarily
    # large): with statistics off, every join must be a shuffle join
    p = plans_no_autobroadcast("q_sparse_topk")
    assert "BroadcastHashJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)


def test_filter_battery_no_shuffle(plans):
    # one JVM projection over the scan: no exchange, no Python eval
    # (the stopword HOF lambda is CodegenFallback, so the plan is a
    # plain Project rather than a WholeStageCodegen span — still
    # JVM-side and shuffle-free, which is the claim that matters)
    p = plans("q_filter_battery")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_important_parts_scalar_is_broadcast(plans):
    # global total reaches the HAVING as a broadcast, not a wide shuffle
    p = plans("q_important_parts")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_cooccur_support_prune_is_broadcast(plans):
    # surviving-token filter broadcasts onto the postings scan; the
    # pair join shuffles on doc_id only
    p = plans("q_cooccur")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_revenue_share_window_over_aggregate_only(plans):
    # the single-partition window input is the per-nation aggregate:
    # exactly one SinglePartition exchange, fed by a HashAggregate
    p = plans("q_revenue_share")
    assert p.count("Exchange SinglePartition") == 1


def test_source_quota_single_source_shuffle(plans):
    # one source-keyed exchange for the window; no global sort
    p = plans("q_source_quota")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in p


def test_repeated_spans_no_cartesian(plans):
    p = plans("q_repeated_spans")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pareto_skyline_no_single_partition_exchange(plans):
    # the staircase runs on range partitions + per-partition windows;
    # a naive global-window skyline would show Exchange SinglePartition
    p = plans("q_pareto_parts")
    assert "Exchange SinglePartition" not in p
    assert "rangepartitioning" in p
    # the frontier join back to the base rows is a broadcast, not a
    # shuffled self-join
    assert "BroadcastHashJoin" in p


def test_weighted_median_no_single_partition_exchange(spark, sf_dir):
    # assert the PRE-checkpoint plan (the query wrapper collapses to
    # Scan ExistingRDD after localCheckpoint)
    from loan_etl_data_pipeline_spark.queries import _weighted_median_build

    out, c = _weighted_median_build(spark, sf_dir)
    p = out._jdf.queryExecution().executedPlan().toString()
    # the cumsum rides range partitions with __pid-partitioned windows;
    # SinglePartition exchanges exist only as scalar-aggregate reduces
    # (sum(w) total, final min) moving nparts rows each
    assert "rangepartitioning" in p
    for line in p.splitlines():
        if "Window " in line:
            assert "__pid" in line, line
    from loan_etl_data_pipeline_spark.operators.dedup import release_intermediates
    release_intermediates(c)


def test_rrf_windows_partitioned_by_nation(plans):
    # every window carries the nation partition key — no global sort
    p = plans("q_rrf_customers")
    assert "Exchange SinglePartition" not in p


def test_proration_single_group_shuffle(plans):
    # all three windows share the l_orderkey partitioning: ONE exchange
    # on the group key, reused by every window stage
    p = plans("q_proration")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_cusum_fact_aggregates_before_range_shuffle(spark, sf_dir):
    # the fact table collapses to the daily aggregate BEFORE the two
    # tiny range shuffles; no SinglePartition funnel anywhere
    from loan_etl_data_pipeline_spark.queries import _cusum_build

    out, frames = _cusum_build(spark, sf_dir)
    p = out._jdf.queryExecution().executedPlan().toString()
    # SinglePartition appears only as the (n, tot) scalar reduce; both
    # cumsum windows are __pid-partitioned over range partitions
    assert "rangepartitioning" in p
    for line in p.splitlines():
        if "Window " in line:
            assert "__pid" in line, line
    assert "TakeOrderedAndProject" in p
    from loan_etl_data_pipeline_spark.operators.dedup import release_intermediates
    for f in frames:
        release_intermediates(f)


def test_benford_single_aggregation_pass(plans):
    # digit agg (partial+final) + 1-row total broadcast — nothing wide
    p = plans("q_benford_audit")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def _assert_ranged_pid_windows(out, frames):
    from loan_etl_data_pipeline_spark.operators.dedup import release_intermediates

    p = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in p
    for line in p.splitlines():
        if "Window " in line:
            assert "__pid" in line, line
    for f in frames:
        release_intermediates(f)


def test_ks_test_rides_range_partitions(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import _ks_test_build

    out, frames = _ks_test_build(spark, sf_dir)
    _assert_ranged_pid_windows(out, frames)


def test_abc_classes_ride_range_partitions(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import _abc_build

    out, frames = _abc_build(spark, sf_dir)
    _assert_ranged_pid_windows(out, frames)


def test_pareto_8020_rides_range_partitions(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import _pareto_8020_build

    out, frames = _pareto_8020_build(spark, sf_dir)
    _assert_ranged_pid_windows(out, frames)


def test_peak_concurrency_rides_range_partitions(spark, sf_dir):
    from loan_etl_data_pipeline_spark.queries import _peak_concurrency_build

    out, frames = _peak_concurrency_build(spark, sf_dir)
    _assert_ranged_pid_windows(out, frames)


def test_chi2_scan_prunes_to_two_columns(plans):
    p = plans("q_chi2_independence")
    assert "ReadSchema: struct<l_returnflag:string,l_linestatus:string>" in p
    assert "SortMergeJoin" not in p  # everything after the agg is tiny
    assert "Python" not in p


def test_llr_collocations_single_text_scan_topk(plans):
    p = plans("q_llr_collocations")
    # bigrams generated row-locally: the only scan column is text
    assert "ReadSchema: struct<text:string>" in p
    # top-20 via TakeOrdered, never a global sort of the whole vocab
    assert "TakeOrderedAndProject" in p
    assert "Python" not in p


def test_nb_model_join_is_the_only_wide_join(plans):
    p = plans("q_nb_langid")
    # the aggregated (label, token) model joins the doc tokens — that is
    # the ONE legitimate shuffle join; the label frame must broadcast
    assert p.count("SortMergeJoin") <= 1
    assert p.count("BroadcastHashJoin") >= 3
    assert "Python" not in p


def test_ses_level_is_scale_free_after_monthly_agg(plans):
    p = plans("q_ses_level")
    # fact scan reads exactly the two needed columns; everything past
    # the monthly agg operates on O(calendar) rows
    assert "o_totalprice" in p and "o_orderdate" in p
    assert "ReadSchema: struct<o_totalprice:double,o_orderdate" in p
    assert "SortMergeJoin" not in p
    assert "Python" not in p


def test_calibration_model_broadcasts(plans):
    p = plans("q_calibration")
    assert "BroadcastHashJoin" in p  # the ≤11-row model never shuffles
    assert "SortMergeJoin" not in p
    assert "Python" not in p


def test_cdc_chunks_single_doc_window(plans):
    p = plans("q_cdc_chunks")
    # one doc-keyed window; text never enters a second wide shuffle —
    # dedup stats aggregate digests
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p
    assert "Python" not in p


def test_rake_single_text_scan(plans):
    p = plans("q_rake_keywords")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p
    assert "TakeOrderedAndProject" in p
    assert "Python" not in p


def test_wasserstein_window_rides_the_support(plans):
    p = plans("q_wasserstein")
    # the global-ordered window runs over the aggregated support, and
    # the fact scan reads only the two needed columns
    assert "ReadSchema: struct<source:string,n_chars:bigint>" in p
    assert "Python" not in p


def test_link_prediction_degree_broadcast(plans):
    p = plans("q_link_prediction")
    assert p.count("BroadcastHashJoin") >= 2  # both degree joins
    assert "Python" not in p


def test_target_encoding_category_broadcast(plans):
    p = plans("q_target_encoding")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # the fact never shuffles
    assert "Python" not in p


def test_bm25_prf_broadcast_terms_no_smj(plans):
    p = plans("q_bm25_prf")
    # every term set and feedback frame broadcasts; both rounds rank
    # via TakeOrdered, never a global sort
    assert p.count("SortMergeJoin") == 0
    assert p.count("TakeOrderedAndProject") >= 3
    assert "Python" not in p


def test_mirror_sources_digest_join_only(plans):
    p = plans("q_mirror_sources")
    # text never joins — the self-join key is the 32-char digest after
    # the distinct collapse
    assert "SortMergeJoin" not in p or "md5" not in p.split("SortMergeJoin")[0]
    assert "Python" not in p


def test_coordinated_sample_no_wide_join(plans):
    p = plans("q_coordinated_sample")
    assert "SortMergeJoin" not in p
    assert "Python" not in p


def test_kn_lm_equality_joins_no_python(plans):
    """kneser_ney_score scale shape: model/marginal joins are plain
    EQUALITY joins on natural keys with no size hint (Catalyst
    broadcasts them only while the model is measurably small — at
    vocabulary² scale the stats flip them to shuffles), the 1-row
    stats frame rides a broadcast, and nothing drops to Python."""
    p = plans("q_kn_lm")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_fs_scores_weights_broadcast_pairs_shuffle(plans):
    """fs_score_pairs: the 1-row weight table broadcasts; candidate
    pairs join the records on the id key; u-estimation is partial+final
    aggregation (no collect-based weighting anywhere)."""
    p = plans("q_fs_scores")
    assert "BroadcastNestedLoopJoin" in p  # 1-row weights crossJoin
    assert p.count("HashAggregate") >= 4  # per-field Σn_v² partial+final
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_incremental_join_has_no_dedup_step(plans):
    """The IVM identity needs NO distinct/dedup: the plan is unions of
    plain joins plus the final rollup — a Deduplicate/distinct node
    would mean the delta terms overlapped."""
    p = plans("q_incremental_join")
    assert "Deduplicate" not in p
    # the final rollup aggregates partially before its one exchange
    assert p.count("HashAggregate") >= 2


def test_mmr_greedy_no_cartesian_and_pool_pairs_keyed(plans):
    """MMR's pool×pool pairwise-sim join and every greedy round must be
    keyed joins on query_id — a cartesian anywhere would explode at a
    real probe count."""
    p = plans("q_mmr_diversify")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_random_walks_no_cartesian_per_step(plans):
    """Each walk step is a degree join + an indexed-adjacency equi-join;
    nothing may degrade to a nested-loop join."""
    p = plans("q_random_walks")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_node2vec_edge_lookup_is_equi_join(plans):
    p = plans("q_node2vec_walks")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_walk_corpus_bench_snapshot_shared(spark, sf_dir, tmp_path, monkeypatch):
    """In bench mode the skip-gram consumer must SCAN the walk-corpus
    snapshot instead of re-deriving the walk loop (the pair-graph
    pattern applied to walks)."""
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_DIR", str(tmp_path))
    qs = all_queries()
    qs["q_random_walks"](spark, sf_dir).count()  # builds the snapshot
    p = (
        qs["q_walk_skipgrams"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert str(tmp_path) in p  # scans the snapshot parquet
    assert "row_number" not in p  # the walk loop's adjacency indexing is gone


def test_amortization_fold_is_one_scan_one_agg(plans):
    """The 12-month recurrence is row-local codegen: exactly the final
    aggregation's exchange, no Python evaluator, no join."""
    p = plans("q_amortization")
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p  # codegen markers absent in AQE initial plans


def test_seq_edit_single_user_shuffle(plans):
    """The journey agg is persisted, so the modal branch and the
    distance pass share ONE user_id exchange (unpersisted, Catalyst
    re-runs the scan+shuffle for the modal subtree); the modal journey
    arrives as a 1-row broadcast (nested-loop on a singleton is the
    scalar-join shape, not a data-sized cartesian)."""
    p = plans("q_seq_edit")
    # both consumers read the SAME cache (each InMemoryRelation reprints
    # its build plan, so counting raw exchanges double-counts; the two
    # InMemoryTableScans over one relation are the single-build proof)
    assert p.count("InMemoryTableScan") == 2
    assert p.count("InMemoryRelation") == 2
    assert "BroadcastNestedLoopJoin" in p  # the 1-row scalar
    assert "SortMergeJoin" not in p


def test_dtw_kernel_after_single_agg(plans):
    """Series build = one nation-keyed agg PERSISTED and read by both
    the per-nation and global branches (re-deriving the global series
    from the fact join would run the wide join twice); the DP kernel is
    the only Python stage and the plan root; the global series arrives
    as a 1-row broadcast."""
    p = plans("q_dtw_shape")
    assert p.count("MapInPandas") == 1
    root = p.split("MapInPandas")[0]
    assert "Exchange" not in root  # no shuffle downstream of the kernel
    assert "BroadcastNestedLoopJoin" in p  # the 1-row global series
    # both consumers read ONE cached nation aggregate
    assert p.count("InMemoryTableScan") == 2
    assert p.count("InMemoryRelation") == 2


def test_bitemporal_scalar_bound_no_driver_roundtrip(plans):
    """The knowledge bound joins as a 1-row broadcast (no collect);
    snapshots window on user_id only — no range/single-partition
    exchange outside the scalar max(txn) subtree."""
    p = plans("q_bitemporal")
    assert "windowspecdefinition(user_id" in p
    assert "Exchange rangepartitioning" not in p
    # the only SinglePartition exchange is the 1-row knowledge scalar
    assert p.count("Exchange SinglePartition") <= 1


def test_cliffs_delta_pushes_group_filter(plans):
    # the R/A group restriction must reach the parquet scan — the
    # dominance sweep never reads the third return flag
    p = plans("q_cliffs_delta")
    assert "In(l_returnflag" in p


def test_vwap_prunes_to_three_columns(plans):
    # a 3-column rollup must not scan the 11-column lineitem
    p = plans("q_vwap")
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_shipdate" in p


def test_ra_link_prediction_ends_in_take_ordered(plans):
    # top-50 under a total order compiles to TakeOrdered, never a
    # global sort of every candidate pair
    p = plans("q_ra_link_prediction")
    assert "TakeOrderedAndProject" in p


def test_ordinal_cuts_use_distributed_rank(plans):
    """The round-7 quintile/decile queries must ride global_rank +
    ntile_from_rank, never a bare global ntile window whose Exchange
    SinglePartition funnels the SF-proportional frame through one task
    (ADVICE r8 medium finding). Opt r8 replaced the rank's
    row_number-over-partition-id window (which itself forced a second
    full hash Exchange) with monotonically_increasing_id positions —
    so the pin is now: no ntile, no window at all on the rank path,
    no SinglePartition, and the id expression present."""
    for name in ("q_weighted_kappa", "q_bowker", "q_lorenz_deciles"):
        p = plans(name)
        assert "ntile(" not in p, name
        assert "monotonically_increasing_id" in p, name


def test_dunn_adjacency_is_rank_join_not_global_lag(plans):
    # sorted adjacency = global_rank self-join on rank+1; a bare
    # lag() OVER (ORDER BY ...) would single-partition all customers
    p = plans("q_dunn_index")
    assert "lag(" not in p
    assert "monotonically_increasing_id" in p


def test_footrule_rank_window_rides_top100_cut(plans):
    # each era is pre-cut by a distributed TakeOrderedAndProject; the
    # only rank window input is the constant ≤100-row cut
    p = plans("q_footrule")
    assert p.count("TakeOrderedAndProject") >= 2


def test_edge_jaccard_ends_in_take_ordered(plans):
    # top-20 under the quantized total order compiles to TakeOrdered,
    # never a global sort of every edge
    p = plans("q_edge_jaccard")
    assert "TakeOrderedAndProject" in p


def test_charclass_profile_prunes_to_two_columns(plans):
    # the per-source profile reads text + source only
    p = plans("q_charclass_profile")
    assert "ReadSchema: struct<text:string,source:string>" in p


def test_lattice_stats_have_no_global_windows(plans):
    # the round-8 agreement/association family runs on the
    # global_rank quintile cut or the contingency lattice — a bare
    # ntile/global row_number would be an SF-scaling funnel
    for name in ("q_scott_pi", "q_gwet_ac1", "q_gk_lambda",
                 "q_somers_d", "q_stuart_tau_c", "q_kendall_tau_b"):
        p = plans(name)
        assert "ntile(" not in p, name
