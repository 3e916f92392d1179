"""Data layout for scan pruning: range-partitioned, sorted parquet.

Parquet footers carry min/max statistics per row group, and Spark's
scan skips any row group whose [min, max] cannot satisfy the pushed
filter. Whether that helps is purely a LAYOUT property: randomly
written data has every row group spanning nearly the full key range
(nothing skips — the stats are useless), while range-partitioned +
sorted data gives disjoint ranges, so a point or range predicate
touches the few row groups that actually contain it.

At 100 TB this is the cheapest read optimization there is — one sort at
write time buys every future filtered scan a ~(selectivity) read. Use
it for the columns queries actually filter on (event time, customer,
key prefixes). The plan-shape/footer test in tests/test_layout.py
verifies the row-group ranges really are disjoint and that the filter
reaches the scan as a pushed filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    *,
    sort_cols: list[str] | str,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned and sorted on ``sort_cols``.

    ``repartitionByRange`` samples the key distribution so output files
    get contiguous, balanced key ranges (skew-tolerant — a hot key
    simply spans adjacent files); ``sortWithinPartitions`` then orders
    inside each file so every row group's min/max is tight. One shuffle
    total, same as any repartition write.
    """
    sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    out = (
        df.repartitionByRange(partitions, *sort_cols)
        if partitions
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
