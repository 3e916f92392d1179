"""ORC round-trip: values survive, partition pruning works, and
predicates reach the ORC scan as PushedFilters."""

from __future__ import annotations

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.sources.orc import read_orc, write_orc


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "t.orc")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        (F.col("id") * 2.5).alias("v"),
    )
    write_orc(df, path, partition_by="part", sort_cols="k")

    back = read_orc(spark, path, columns=["k", "v"], predicate="k = 123")
    rows = back.collect()
    assert len(rows) == 1 and rows[0]["v"] == 123 * 2.5

    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,123)" in plan
    # column pruning: only k and v are read, not part
    assert "ReadSchema: struct<k:bigint,v:double>" in plan

    # hive partition column round-trips and prunes by directory (its
    # type is re-inferred from the dir value — '2' comes back as int)
    part = read_orc(spark, path, predicate="part = '2'")
    assert part.count() == 2500
    assert set(part.select("part").distinct().toPandas()["part"]) == {2}


def test_orc_full_table_equals_source(spark, tmp_path):
    path = str(tmp_path / "u.orc")
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 2.5), (3, "c", -0.0)],
        "k long, s string, v double",
    )
    write_orc(df, path)
    got = sorted(map(tuple, read_orc(spark, path).collect()))
    assert got == sorted(map(tuple, df.collect()))
