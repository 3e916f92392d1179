"""Structured physical-plan health report (the plan-audit primitive).

The repo pins its scale claims with physical-plan assertions
(tests/test_plan_audit.py); those began as substring checks over
``executedPlan().toString()``, which double-count anything a cached
InMemoryRelation reprints and silently break when Spark renames a node.
This walks the actual SparkPlan tree via the same TreeNode API the
lineage utility uses on the logical side — counts come from node
CLASSES, and cached-relation subtrees are counted once under their own
key instead of polluting the live counts.

Driver-side plan metadata only; never touches data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def plan_health(df: DataFrame) -> dict:
    """Counts of the plan features every scale review asks about.

    Returns a dict with: ``exchanges`` (shuffle exchanges),
    ``single_partition_exchanges``, ``broadcast_exchanges``,
    ``broadcast_joins``, ``sort_merge_joins``, ``nested_loop_joins``,
    ``cartesian_products``, ``python_stages`` (Arrow/batch eval +
    mapInPandas), ``scans``, ``pushed_filter_scans`` (parquet scans
    that reached the reader with at least one pushed filter),
    ``cached_relations`` — all for the LIVE plan; a cached relation's
    build plan is not re-counted into the live totals.

    AQE: on a DataFrame that has already executed (collect/count/write),
    counts reflect the FINAL adaptive plan — including runtime SMJ→BHJ
    conversions and skew-join splits; before execution they reflect the
    pre-AQE initial plan (the only one that exists). Audit after
    running when the runtime shape is what you're asserting.
    """
    plan = df._jdf.queryExecution().executedPlan()
    out = {
        "exchanges": 0,
        "single_partition_exchanges": 0,
        "broadcast_exchanges": 0,
        "broadcast_joins": 0,
        "sort_merge_joins": 0,
        "nested_loop_joins": 0,
        "cartesian_products": 0,
        "python_stages": 0,
        "row_udf_stages": 0,  # BatchEvalPythonExec: row-at-a-time UDFs
        "scans": 0,
        "pushed_filter_scans": 0,
        "cached_relations": 0,
    }

    def visit(node):
        name = node.getClass().getSimpleName()
        if name == "InMemoryTableScanExec":
            # the cached build plan is NOT part of this query's live
            # execution: count the cache itself, skip its subtree
            out["cached_relations"] += 1
            return
        if name == "ShuffleExchangeExec":
            out["exchanges"] += 1
            if "SinglePartition" in node.outputPartitioning().toString():
                out["single_partition_exchanges"] += 1
        elif name == "BroadcastExchangeExec":
            out["broadcast_exchanges"] += 1
        elif name in ("BroadcastHashJoinExec",):
            out["broadcast_joins"] += 1
        elif name == "SortMergeJoinExec":
            out["sort_merge_joins"] += 1
        elif name == "BroadcastNestedLoopJoinExec":
            out["nested_loop_joins"] += 1
        elif name == "CartesianProductExec":
            out["cartesian_products"] += 1
        elif name in (
            "ArrowEvalPythonExec",
            "BatchEvalPythonExec",
            "MapInPandasExec",
            "PythonMapInArrowExec",
            "MapInArrowExec",
            "FlatMapGroupsInPandasExec",
            "FlatMapGroupsInPandasWithStateExec",
        ):
            out["python_stages"] += 1
            if name == "BatchEvalPythonExec":
                out["row_udf_stages"] += 1
        elif name == "FileSourceScanExec":
            out["scans"] += 1
            try:
                meta = node.metadata()
                pushed = meta.get("PushedFilters").get()
                if pushed and pushed != "[]":
                    out["pushed_filter_scans"] += 1
            except Exception:
                pass
        # AQE wrappers / reused subtrees: descend through logical
        # indirections so the counts reflect the whole live plan
        if name == "AdaptiveSparkPlanExec":
            # Once the query has RUN, AQE's final plan is the truth —
            # runtime SMJ→BHJ conversions and skew-join splits replace
            # the static guess (ADVICE r4: initialPlan-only counts can
            # disagree with what actually executed). Before execution
            # only the initial plan exists; counts are then the
            # pre-AQE static shape, as documented.
            # narrow try: only PROBING for the final plan may fail (older
            # Spark without the accessor); once we have it, walk it
            # OUTSIDE the try — a mid-walk exception must propagate, not
            # fall through to a second initialPlan count on top of the
            # partial final-plan tallies
            final = None
            try:
                if node.isFinalPlan():
                    final = node.executedPlan()
            except Exception:
                final = None
            visit(final if final is not None else node.initialPlan())
            return
        if name.endswith("QueryStageExec"):
            # materialized AQE stages (Shuffle/Broadcast/Result/
            # TableCache) are leaf-like: the executed subtree hangs off
            # .plan(), not children()
            visit(node.plan())
            return
        if name == "ReusedExchangeExec":
            return  # the original exchange is counted where it lives
        for ch in _children(node):
            visit(ch)
        # subqueries (scalar subquery exchanges hide here)
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                visit(sq.apply(i))
        except Exception:
            pass

    visit(plan)
    return out
