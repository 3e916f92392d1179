"""Key-level upsert into partitioned parquet (merge-by-key).

Plain parquet has no MERGE: the reference's answer is "delete
everything and rewrite" (reference: airflow/dags/spark_etl_dag.py:63-69),
and even our incremental sink (plans/etl.py run_etl_incremental)
replaces whole partitions with whatever the new batch contains. This
is the finer-grained op a dimension/state table needs: update-or-insert
individual keys while rewriting ONLY the partitions the update batch
touches.

Mechanics: (1) list the distinct partition values in the updates —
that's a tiny driver-side collect of partition keys, not data; (2) read
just those partitions of the existing table (partition pruning does
this for free); (3) anti-join out the old versions of updated keys,
union the updates; (4) eagerly materialize (``localCheckpoint``) —
Spark refuses to overwrite a path it is still reading from, and the
checkpoint severs that read — then dynamic-partition-overwrite the
touched partitions.

Honesty note: this is the parquet-only approximation of what Delta/
Iceberg do transactionally. A crash between materialize and commit can
leave touched partitions stale-or-new (never half-written — the
parquet committer is atomic per partition directory), and concurrent
writers are not coordinated. At 100 TB with many writers, use a table
format; the operator's *plan shape* (prune → merge → rewrite touched
partitions) is identical there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    *,
    key_cols: list[str] | str,
    partition_col: str,
    deletes: DataFrame | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``table_dir``;
    optionally DELETE the keys in ``deletes`` (key_cols +
    partition_col — the CDC tombstone shape: a Debezium-style delete
    event carries the key and, via its before-image, the partition).

    Rows whose ``key_cols`` match an existing row replace it; new keys
    append; delete keys vanish. Only partitions present in ``updates``
    or ``deletes`` are rewritten.

    Precondition: ``partition_col`` must be functionally determined by
    the key (a key never changes partitions between versions) — this
    is what makes the partition-pruned merge sound. An update that
    moves a key to a different partition value would leave the old
    partition's version in place (only touched partitions are read);
    the same is true of every partition-pruned merge, including
    Delta/Iceberg MERGEs whose ON clause pins the partition.

    Deletes expose a dynamic-partition-overwrite pitfall this function
    handles explicitly: a partition whose LAST rows were deleted is
    absent from the written output, and dynamic overwrite only
    replaces partitions it writes — the stale directory would survive.
    Emptied touched partitions are removed directly after the write.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    dup = (
        updates.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "merge_upsert: updates contain duplicate keys — collapse them first "
            "(e.g. dedup_exact with a recency order), or the table would "
            "silently keep multiple versions of one key"
        )
    knockout = updates.select(key_cols)
    touched_src = updates.select(partition_col)
    if deletes is not None:
        knockout = knockout.unionByName(deletes.select(key_cols))
        touched_src = touched_src.unionByName(deletes.select(partition_col))
    touched = [r[0] for r in touched_src.distinct().collect()]
    # isin() never matches NULL (SQL semantics) — without the explicit
    # isNull branch, an update batch touching the null partition would
    # overwrite it WITHOUT merging, silently deleting its other keys
    cond = F.col(partition_col).isin([t for t in touched if t is not None])
    if any(t is None for t in touched):
        cond = cond | F.col(partition_col).isNull()
    existing = spark.read.parquet(table_dir).filter(cond)
    merged = (
        existing.join(knockout.distinct(), key_cols, "left_anti")
        .unionByName(updates)
        .localCheckpoint()  # sever the self-read before overwriting
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, None)
    spark.conf.set(mode_key, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(table_dir)
    finally:
        if prev is None:
            spark.conf.unset(mode_key)
        else:
            spark.conf.set(mode_key, prev)
    if deletes is not None:
        # remove emptied touched partitions the dynamic overwrite
        # could not rewrite (they produced zero output rows)
        remaining = {
            r[0]
            for r in merged.select(partition_col).distinct().collect()
        }
        emptied = [t for t in touched if t not in remaining]
        if emptied:
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            for t in emptied:
                name = (
                    "__HIVE_DEFAULT_PARTITION__" if t is None else str(t)
                )
                path = jvm.org.apache.hadoop.fs.Path(
                    f"{table_dir}/{partition_col}={name}"
                )
                fs = path.getFileSystem(conf)
                if fs.exists(path):
                    fs.delete(path, True)
