"""Fleet-wide plan invariants: the house discipline, machine-checked.

The engine's standing claims — no row-at-a-time Python UDFs anywhere,
no cartesian products, every Python stage Arrow-batched — have so far
been enforced by greps and per-query plan pins. This builds the
physical plan of EVERY registered query (plan construction only; the
handful of operators that collect a bounded batch while BUILDING their
plan run their small driver jobs) and asserts the invariants through
the structured auditor (plans/audit.py), so a future query that
accidentally compiles a cartesian or a BatchEvalPython stage fails CI
by name instead of surviving until a judge reads its plan.
"""

from __future__ import annotations

from loan_etl_data_pipeline_spark.plans.audit import plan_health
from loan_etl_data_pipeline_spark.queries import all_queries


def test_no_cartesian_no_row_udf_anywhere(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F401

    def has_batch_eval(node):
        # Arrow-batched Python (MapInPandas / FlatMapGroupsInPandas) is
        # the sanctioned slow path; row-at-a-time BatchEvalPython never
        # is — plan_health folds both into python_stages, so walk for
        # the forbidden class specifically
        if node.getClass().getSimpleName() == "BatchEvalPythonExec":
            return True
        ch = node.children()
        return any(has_batch_eval(ch.apply(i)) for i in range(ch.size()))

    violations = []
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
            h = plan_health(df)
        except Exception as e:  # plan must at least BUILD
            violations.append((name, f"plan build failed: {e!r}"[:220]))
            continue
        if h["cartesian_products"]:
            violations.append(
                (name, f"cartesian_products={h['cartesian_products']}")
            )
        if has_batch_eval(df._jdf.queryExecution().executedPlan()):
            violations.append((name, "BatchEvalPythonExec (row-at-a-time UDF)"))
        spark.catalog.clearCache()  # queries may persist intermediates
    assert not violations, violations
