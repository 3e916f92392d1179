"""Fleet-invariants shard 2/4 — see tests/_fleet_common.py (plan-build
audit of every registered query: no cartesian products, no
row-at-a-time Python UDF stages)."""

from _fleet_common import check_no_cartesian_no_row_udf, shard_names


def test_no_cartesian_no_row_udf_shard(spark, sf_dir):
    check_no_cartesian_no_row_udf(shard_names(2), spark, sf_dir)
