"""Shared harness for the sharded fleet-invariants gate (the r6
follow-up to VERDICT r5 ask #2: after the oracle-parity split, the
single all-plans invariant test became the partest critical path at
~6 min).  Same crc32 sharding discipline as _oracle_parity_common —
``test_fleet_invariants.py::test_shards_partition_every_query``
asserts the shards form an exact partition so no plan escapes the
auditor."""

from __future__ import annotations

import zlib

from loan_etl_data_pipeline_spark.queries import all_queries

QUERIES = all_queries()
N_SHARDS = 4


def shard_names(shard: int) -> list[str]:
    return [
        n
        for n in sorted(QUERIES)
        if zlib.crc32(n.encode()) % N_SHARDS == shard
    ]


def check_no_cartesian_no_row_udf(names, spark, sf_dir) -> None:
    """Build every named query's physical plan and assert the house
    invariants through the structured auditor (plans/audit.py)."""
    from loan_etl_data_pipeline_spark.plans.audit import plan_health

    violations = []
    for name in names:
        try:
            h = plan_health(QUERIES[name](spark, sf_dir))
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
