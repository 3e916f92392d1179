"""Sorted parquet layout (sources/layout.py): row-group stats actually
become disjoint, and filters reach the scan to use them."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from loan_etl_data_pipeline_spark.sources.layout import write_sorted


def _rowgroup_ranges(path, col):
    """(min, max) of ``col`` for every row group in every part file."""
    ranges = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col:
                    ranges.append((c.statistics.min, c.statistics.max))
    return ranges


def test_sorted_layout_gives_disjoint_rowgroups(spark, tmp_path):
    # keys written in a scattered order, as a shuffled pipeline would
    df = spark.range(0, 200_000).selectExpr(
        "cast(id * 16547 % 200000 as bigint) AS k", "id AS payload"
    )
    sorted_path = str(tmp_path / "sorted")
    plain_path = str(tmp_path / "plain")
    write_sorted(df, sorted_path, sort_cols="k", partitions=8)
    df.repartition(8).write.parquet(plain_path)

    sorted_rgs = sorted(_rowgroup_ranges(sorted_path, "k"))
    plain_rgs = _rowgroup_ranges(plain_path, "k")
    assert len(sorted_rgs) >= 8

    # sorted layout: ranges are pairwise disjoint -> a point probe hits 1
    for (lo1, hi1), (lo2, hi2) in zip(sorted_rgs, sorted_rgs[1:]):
        assert hi1 <= lo2, f"overlapping row groups: ({lo1},{hi1}) vs ({lo2},{hi2})"
    probe = 123_456
    hits = sum(1 for lo, hi in sorted_rgs if lo <= probe <= hi)
    assert hits == 1
    # control: scattered layout leaves (nearly) every row group matching
    plain_hits = sum(1 for lo, hi in plain_rgs if lo <= probe <= hi)
    assert plain_hits == len(plain_rgs)

    # and the predicate actually reaches the scan for the skipping to fire
    plan = (
        spark.read.parquet(sorted_path)
        .filter("k = 123456")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,123456)" in plan
    got = spark.read.parquet(sorted_path).filter("k = 123456").collect()
    assert len(got) == 1


# --- Z-order -----------------------------------------------------------------


def test_zorder_key_interleaves_bits(spark):
    from loan_etl_data_pipeline_spark.sources.layout import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 2), (7, 7)], "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=3).alias("z")).collect()
    }
    # x=0b011,y=0b001 → bits (y2 x2 y1 x1 y0 x0) = 0b000111 = 7
    assert got[(3, 1)] == 0b000111
    # x=0b000,y=0b010 → y1 set at position 3 → 0b001000
    assert got[(0, 2)] == 0b001000
    assert got[(7, 7)] == 0b111111


def test_zorder_key_rejects_overflowing_width(spark):
    """bits × n_cols > 63 would wrap Java's mod-64 shifts and silently
    interleave garbage; must raise instead."""
    import pytest

    from loan_etl_data_pipeline_spark.sources.layout import zorder_key

    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(["a", "b", "c", "d", "e"], bits=16)
    # 5 dims × 12 bits = 60 is fine
    zorder_key(["a", "b", "c", "d", "e"], bits=12)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.layout import write_sorted, write_zordered

    # two independent 0..255 dimensions, scattered write order
    df = spark.range(0, 200_000).selectExpr(
        "cast(id * 16547 % 256 as bigint) AS a",
        "cast(id * 48271 % 256 as bigint) AS b",
        "id AS payload",
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "singlesort")
    # 32 z-partitions: repartitionByRange SAMPLES its boundaries, and at
    # 16 partitions only ~4 leading z-bits are cut, leaving the per-dim
    # hit count hovering exactly at the zn//2 threshold (observed 8/16
    # flake); 32 cuts ~5 bits and the expectation (~8/32) clears the
    # threshold with margin on every sampling outcome
    write_zordered(df, z_path, zorder_cols=["a", "b"], bits=8, partitions=32)
    write_sorted(df, s_path, sort_cols="a", partitions=16)

    def hits(path, col, probe):
        rgs = _rowgroup_ranges(path, col)
        return sum(1 for lo, hi in rgs if lo <= probe <= hi), len(rgs)

    # single-column sort: perfect on a, useless on b
    sa, na = hits(s_path, "a", 100)
    sb, nb = hits(s_path, "b", 100)
    assert sa <= max(2, na // 8)
    assert sb == nb  # every row group matches on b

    # z-order: selective on BOTH dimensions
    za, zn = hits(z_path, "a", 100)
    zb, _ = hits(z_path, "b", 100)
    assert za < zn // 2, f"a-dim hits {za}/{zn}"
    assert zb < zn // 2, f"b-dim hits {zb}/{zn}"
    # round-trip: same rows
    assert spark.read.parquet(z_path).count() == 200_000


def test_compact_files(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.layout import compact_files

    src = str(tmp_path / "fragmented")
    # simulate micro-batch appends: 40 tiny files
    for i in range(10):
        spark.range(i * 1000, (i + 1) * 1000).selectExpr(
            "id AS k", "cast(id AS string) AS v"
        ).repartition(4).write.mode("append").parquet(src)
    n_files_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files_before >= 40

    out = str(tmp_path / "compacted")
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n_out = compact_files(spark, src, out, target_file_bytes=total // 2 + 1)
    n_files_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out == 2 and n_files_after == 2
    # content preserved exactly
    assert sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(out).collect()
    ) == sorted((r["k"], r["v"]) for r in spark.read.parquet(src).collect())

    # sort_cols variant restores a pruning layout in the same pass
    out2 = str(tmp_path / "compacted_sorted")
    compact_files(spark, src, out2, target_file_bytes=total // 2 + 1, sort_cols="k")
    rgs = sorted(_rowgroup_ranges(out2, "k"))
    for (lo1, hi1), (lo2, hi2) in zip(rgs, rgs[1:]):
        assert hi1 <= lo2


def test_date_partitioned_scan_prunes_partitions(spark, tmp_path, sf_dir):
    """The classic 100 TB pattern: a date-partitioned table + a date
    filter must prune at the PARTITION level (directory skipping —
    'partitions read: 1' in the scan), not just at row-group stats.
    Complements the sorted/zorder row-group tests: this pruning happens
    before any file footer is opened."""
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.sources.tables import load_table

    d = str(tmp_path / "events_by_date")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date(F.col("ts"))
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(d)
    dates = [r["event_date"] for r in ev.select("event_date").distinct().collect()]
    assert len(dates) > 1, "fixture must span multiple partitions"

    one = sorted(dates)[0]
    q = spark.read.parquet(d).filter(F.col("event_date") == F.lit(one))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    got_dates = {r["event_date"] for r in q.select("event_date").collect()}
    assert got_dates == {one}


def test_dynamic_partition_pruning_fires(spark, tmp_path, sf_dir):
    """Star-join over a partitioned fact: the partition filter must be
    DYNAMIC (derived at runtime from the filtered dimension via a
    reused broadcast), so the fact scan reads only the dimension's
    surviving partitions — static pruning can't see through a join,
    and at 100 TB this is the difference between scanning one
    partition and all of them."""
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.sources.tables import load_table

    d = str(tmp_path / "fact_by_priority")
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderpriority"
    ).mode("overwrite").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 2)], "pr string, lvl int"
    ).filter(F.col("lvl") == 1)
    j = fact.join(dim, fact.o_orderpriority == dim.pr).groupBy("pr").agg(
        F.count(F.lit(1)).alias("n")
    )
    p = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in p
    rows = j.collect()
    assert len(rows) == 1 and rows[0]["pr"] == "1-URGENT"


def test_bloom_indexed_write_and_footer_audit(spark, tmp_path):
    """write_bloom_indexed: the enabled column's row groups carry a
    bloom filter (offset >= 0 in the footer), other columns carry
    none, and the data reads back unchanged."""
    import glob

    from loan_etl_data_pipeline_spark.sources.layout import (
        bloom_filter_offsets,
        write_bloom_indexed,
    )

    df = spark.range(0, 20_000).selectExpr(
        "id", "CAST(xxhash64(id) AS STRING) AS lookup_key", "id % 7 AS grp"
    )
    out = str(tmp_path / "bloomed")
    write_bloom_indexed(
        df, out, bloom_cols="lookup_key", expected_ndv=20_000
    )

    f = glob.glob(f"{out}/*.parquet")[0]
    offs = bloom_filter_offsets(spark, f)
    assert all(o >= 0 for o in offs["lookup_key"]), offs
    assert all(o == -1 for o in offs["id"]), offs
    assert all(o == -1 for o in offs["grp"]), offs

    back = spark.read.parquet(out)
    assert back.count() == 20_000
    key = df.filter("id = 123").collect()[0]["lookup_key"]
    assert back.filter(back.lookup_key == key).collect()[0]["id"] == 123


def test_bloom_indexed_validates_columns(spark, tmp_path):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.sources.layout import (
        write_bloom_indexed,
    )

    df = spark.range(3).selectExpr("id")
    with _pt.raises(ValueError, match="not in DataFrame"):
        write_bloom_indexed(df, str(tmp_path / "x"), bloom_cols="nope")
    with _pt.raises(ValueError, match="at least one"):
        write_bloom_indexed(df, str(tmp_path / "x"), bloom_cols=[])
