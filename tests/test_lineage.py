"""Column-level lineage (plans/lineage.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.plans.lineage import column_lineage


def _names(depset):
    return sorted(c for _, c in depset)


def test_join_agg_filter_lineage(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = (
        o.filter(F.col("o_orderpriority") == "5-LOW")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.expr("o_totalprice * 2")).alias("rev2"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    lin = column_lineage(df)
    assert _names(lin["rev2"]["data"]) == ["o_totalprice"]
    assert _names(lin["c_nationkey"]["data"]) == ["c_nationkey"]
    assert lin["n"]["data"] == set()  # count(1) touches no column's value
    # join keys + the filter column gate rows for every output
    for col in ("rev2", "n", "c_nationkey"):
        assert _names(lin[col]["control"]) == [
            "c_custkey",
            "o_custkey",
            "o_orderpriority",
        ]
    # sources resolve to the parquet root paths
    assert any(s.endswith("orders.parquet") for s, _ in lin["rev2"]["data"])


def test_multi_hop_rename_chain(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = (
        o.withColumn("a", F.col("o_totalprice") * 2)
        .withColumn("b", F.col("a") + F.col("o_orderkey"))
        .withColumnRenamed("b", "c")
        .select("c")
    )
    lin = column_lineage(df)
    assert _names(lin["c"]["data"]) == ["o_orderkey", "o_totalprice"]
    assert lin["c"]["control"] == set()


def test_window_and_union(spark, sf_dir):
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    ranked = o.select(
        F.row_number().over(w).alias("rn"),
        F.col("o_totalprice").alias("v"),
    )
    lin = column_lineage(ranked)
    assert set(_names(lin["rn"]["data"])) == {"o_custkey", "o_orderdate"}
    assert _names(lin["v"]["data"]) == ["v"] or _names(lin["v"]["data"]) == [
        "o_totalprice"
    ]

    u = ranked.select("v").union(
        o.select(F.col("o_orderkey").cast("double").alias("v"))
    )
    lu = column_lineage(u)
    assert set(_names(lu["v"]["data"])) == {"o_orderkey", "o_totalprice"}


def test_control_is_plan_wide_by_contract(spark, sf_dir):
    """Documented semantics (ADVICE r4): control deps are the PLAN-WIDE
    row-population gate — a filter in either union/join branch is
    reported on every output column (conservative for governance: a PII
    gate is never missed), minus the column's own data deps."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    u = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_totalprice").alias("v")
    ).union(
        c.filter(F.col("c_acctbal") > 0).select(F.col("c_acctbal").alias("v"))
    )
    lin = column_lineage(u)
    names = {n for _, n in lin["v"]["control"]}
    # both branches' gates appear, own data deps are excluded
    assert {"o_orderstatus"} <= names
    assert "c_acctbal" not in names  # it IS a data dep of v
    j = o.join(
        c.filter(F.col("c_mktsegment") == "BUILDING"),
        o["o_custkey"] == c["c_custkey"],
    ).select("o_totalprice")
    lj = column_lineage(j)
    cn = {n for _, n in lj["o_totalprice"]["control"]}
    # the OTHER side's filter and the join keys gate this column's rows
    assert {"c_mktsegment", "o_custkey", "c_custkey"} <= cn


def test_pii_governance_screen(spark, sf_dir):
    """The governance use case: is any output column DATA-derived from
    a declared-PII source column?"""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pii = {"c_name"}
    report = c.groupBy("c_mktsegment").agg(
        F.avg("c_acctbal").alias("avg_bal"),
        F.count(F.lit(1)).alias("n"),
    )
    lin = column_lineage(report)
    derived_from_pii = {
        col
        for col, deps in lin.items()
        if {name for _, name in deps["data"]} & pii
    }
    assert derived_from_pii == set()
    leaky = c.groupBy("c_mktsegment").agg(
        F.max("c_name").alias("sample_name")
    )
    lin2 = column_lineage(leaky)
    assert {n for _, n in lin2["sample_name"]["data"]} == {"c_name"}


def test_duplicate_output_names_refused(spark, sf_dir):
    import pytest

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    dup = o.join(c, o.o_custkey == c.o_custkey)  # two o_custkey outputs
    with pytest.raises(ValueError, match="duplicate column names"):
        column_lineage(dup)
