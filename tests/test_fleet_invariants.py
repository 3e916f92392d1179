"""Fleet-wide plan invariants: the house discipline, machine-checked.

The engine's standing claims — no row-at-a-time Python UDFs anywhere,
no cartesian products, every Python stage Arrow-batched — are enforced
by building the physical plan of EVERY registered query and asserting
the invariants through the structured auditor (plans/audit.py).  The
per-query plan builds are hash-sharded across
``test_fleet_invariants_{0..3}.py`` (same discipline as the
oracle-parity split — one all-plans test was partest's ~6 min critical
path); this file keeps the partition-integrity check and the positive
controls that prove the auditor is not vacuous.
"""

from __future__ import annotations

from _fleet_common import N_SHARDS, QUERIES, shard_names

from loan_etl_data_pipeline_spark.plans.audit import plan_health


def test_shards_partition_every_query():
    """The four shard files must form an EXACT partition of the query
    registry — no plan lost, none double-built."""
    union: list[str] = []
    for k in range(N_SHARDS):
        union.extend(shard_names(k))
    assert sorted(union) == sorted(QUERIES)
    assert len(union) == len(set(union))


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
