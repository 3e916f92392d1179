"""CSV ingestion (reference operators S1 + S4).

The reference reads one CSV with header + full schema inference
(reference: airflow/dags/etl/pyspark_etl.py:51) and its discovery step
silently processes only the FIRST matching file in the landing directory
(reference: airflow/dags/spark_etl_dag.py:60). Here:

- ``read_csv`` keeps the schema-tolerant contract but takes an optional
  explicit ``StructType`` / ``samplingRatio`` so callers can skip the
  inference double-scan (at 100 TB, inference means reading the whole
  dataset twice — pass a schema).
- ``discover_input_files`` generalizes discovery to ALL matching files
  (fixing the first-file-only bug) while keeping the same filtering
  semantics: keep ``*.csv`` / ``*.csv.gz``, ignore dotfiles and JSON
  sidecars (reference: airflow/dags/spark_etl_dag.py:44-60).

Gzip needs no special casing: Spark's CSV reader auto-detects the
``.gz`` codec, same as the reference relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CSV_EXTENSIONS = (".csv", ".csv.gz")


def discover_input_files(
    directory: str, extensions: tuple[str, ...] = CSV_EXTENSIONS
) -> list[str]:
    """All non-hidden files in ``directory`` with a matching extension, sorted.

    Sorted for determinism; returns [] when the directory is missing or
    empty (the reference early-returns "no_files",
    reference: airflow/dags/spark_etl_dag.py:53-55).
    """
    if not os.path.isdir(directory):
        return []
    out = []
    for fn in sorted(os.listdir(directory)):
        if fn.startswith("."):
            continue
        if fn.lower().endswith(tuple(e.lower() for e in extensions)):
            out.append(os.path.join(directory, fn))
    return out


def write_csv(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Write CSV(.gz) — the write-side of the reference's gzip step.

    The reference gzips landed files driver-side with ``gzip.open`` +
    ``copyfileobj`` (reference: airflow/dags/drive_watch_dag.py:95-101);
    here the codec is applied by each writing task (``compression``
    option), so compression scales with executors and never funnels
    through one process. ``single_file=True`` coalesces to one part —
    only for small exports; a 100 TB result stays many parts.
    """
    if single_file:
        df = df.coalesce(1)
    writer = df.write.option("header", header).mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    *,
    schema: StructType | None = None,
    header: bool = True,
    sampling_ratio: float | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read CSV(.gz) file(s) into a DataFrame.

    With ``schema=None`` this matches the reference's
    ``header=True, inferSchema=True`` behavior
    (reference: airflow/dags/etl/pyspark_etl.py:51). Passing a schema is
    the scale path: a single scan, and predicate/column pruning can be
    planned before any data is read. ``sampling_ratio`` bounds the
    inference scan when you want inference but not a full extra pass.

    ``corrupt_col`` (requires ``schema``) quarantines malformed lines
    instead of silently null-padding them: parses run PERMISSIVE, rows
    that failed land with their raw text in that column (filter
    ``IS NOT NULL`` to route them to a dead-letter sink; everything
    else of the row is null). The reference would crash or silently
    mangle a bad landed file; at pipeline scale you want the batch to
    finish AND the bad lines accounted for.
    """
    reader = spark.read.option("header", header)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        from pyspark.sql.types import StringType, StructField

        # copy the field list — StructType(schema.fields) aliases the
        # caller's list, and .add() would mutate their schema in place
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
        if sampling_ratio is not None:
            reader = reader.option("samplingRatio", sampling_ratio)
    if isinstance(paths, str):
        paths = [paths]
    return reader.csv(paths)
