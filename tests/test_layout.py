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
