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


def zorder_key(cols, *, bits: int = 16):
    """Interleaved-bit (Morton / Z-order) key over bounded ints.

    Sorting by this key clusters data so that range predicates on ANY
    of the participating dimensions skip row groups — the multi-column
    generalization of :func:`write_sorted` (a single-column sort gives
    perfect pruning on that column and none on the others; Z-order
    gives ~√-grade pruning on each).

    Inputs must already be non-negative ints < 2**bits — rank/bin your
    real columns first (``F.ntile`` per dimension, or fixed binning
    like epoch-day) so the interleave sees uniform coordinates. The
    expression is ~``bits × n_cols`` shift/mask/or terms — all codegen,
    evaluated once per row at write time.
    """
    import pyspark.sql.functions as F

    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if bits * n > 63:
        # Java long shifts mask the amount mod 64: a shift of 64+k
        # silently wraps to k and ORs high-dimension bits over low
        # positions — the layout would cluster on garbage with no error.
        raise ValueError(
            f"bits * n_cols = {bits * n} exceeds 63 (bigint key width); "
            f"lower bits (e.g. bits={63 // n}) or drop a dimension"
        )
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_cols: list[str],
    bits: int = 16,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on ``zorder_cols`` (each pre-binned to
    ``[0, 2**bits)`` by the caller). Same one-shuffle cost as
    :func:`write_sorted`, but min/max stats stay selective on every
    participating dimension instead of just the leading one.
    """
    key = zorder_key(zorder_cols, bits=bits)
    tagged = df.withColumn("__z", key)
    out = (
        tagged.repartitionByRange(partitions, "__z")
        if partitions
        else tagged.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def compact_files(
    spark,
    table_dir: str,
    out_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | str | None = None,
) -> int:
    """Rewrite a many-small-files table into ~``target_file_bytes`` files.

    The small-files problem is the dominant operational tax of
    streaming/incremental ingestion at scale: every micro-batch append
    leaves a file, and a year later the NameNode/listing/scheduler all
    crawl. Compaction = read + repartition to ceil(bytes/target) +
    rewrite; pass ``sort_cols`` to restore a pruning layout
    (write_sorted) in the same pass, since the data is being rewritten
    anyway. Returns the output partition count.

    Writes to ``out_dir`` (swap directories/partitions atomically in
    the caller's metastore step) — compacting in place would race
    readers and lose data on failure, the same reason merge_upsert
    materializes before overwrite.
    """
    import math

    df = spark.read.parquet(table_dir)
    # physical bytes on disk via the Hadoop FileSystem (any scheme —
    # file:, hdfs:, s3a:), not a Catalyst estimate: compaction sizing
    # must track real compressed bytes
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if sort_cols is not None:
        write_sorted(df, out_dir, sort_cols=sort_cols, partitions=n_out)
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(out_dir)
    return n_out


def write_bloom_indexed(
    df: DataFrame,
    path: str,
    *,
    bloom_cols: list[str] | str,
    expected_ndv: int = 100_000,
    mode: str = "overwrite",
    sort_cols: list[str] | str | None = None,
) -> None:
    """Write parquet with per-column BLOOM FILTERS for the named
    columns — the third leg of the layout toolbox: min/max row-group
    stats (write_sorted) prune RANGE predicates, Z-order keeps several
    dimensions range-prunable at once, and bloom filters prune POINT
    lookups on high-cardinality columns where min/max is useless (a
    uuid-ish key's min/max spans everything; its bloom filter rejects
    a row group in one probe with ~1% false positives).

    ``expected_ndv`` sizes each filter (parquet-mr derives the bitset
    from it); readers that pre-date bloom filters just ignore the
    extra footer bytes, so the format stays fully compatible. Spark's
    parquet reader consults the filter for pushed equality/IN
    predicates automatically.

    Optionally sorts like :func:`write_sorted` first — bloom pruning
    composes with tight min/max on different columns.
    """
    bloom_cols = (
        [bloom_cols] if isinstance(bloom_cols, str) else list(bloom_cols)
    )
    if not bloom_cols:
        raise ValueError("bloom_cols must name at least one column")
    missing = [c for c in bloom_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bloom_cols not in DataFrame: {missing}")
    out = df
    if sort_cols is not None:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        out = df.repartitionByRange(*sc).sortWithinPartitions(*sc)
    w = out.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv))
    w.parquet(path)


def bloom_filter_offsets(spark, file_path: str) -> dict[str, list[int]]:
    """Footer-level audit for :func:`write_bloom_indexed`: per column,
    the bloom-filter offset of every row group in ``file_path`` (−1 =
    no filter written). Reads ONLY the footer via parquet-mr — the
    same metadata a scan consults before deciding to skip a row group.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(file_path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hpath, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        out: dict[str, list[int]] = {}
        for block in reader.getFooter().getBlocks():
            for col in block.getColumns():
                name = ".".join(list(col.getPath().toArray()))
                out.setdefault(name, []).append(col.getBloomFilterOffset())
        return out
    finally:
        reader.close()
