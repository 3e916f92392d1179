"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training corpora.

Spark's JSON datasource is already line-delimited by default, so these
are thin, explicit wrappers pinning the options that matter for corpus
work: explicit schema (inference reads everything twice — same story
as CSV, sources/csv.py), gzip on both sides (splittable reads are
lost with .gz — shard upstream rather than writing one giant file),
and quarantine of malformed lines via the same PERMISSIVE +
corrupt-column contract as ``read_csv``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    *,
    schema: StructType | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read JSONL(.gz) files; malformed lines quarantined if asked.

    Note Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN rule: ``cache()`` the
    returned frame before running a query that references only
    ``corrupt_col`` (e.g. a dead-letter export).
    """
    reader = spark.read
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        # copy the field list — .add() on a shared list would mutate the
        # caller's schema (same contract as read_csv)
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(paths, str):
        paths = [paths]
    return reader.json(paths)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Write JSONL(.gz); ``single_file`` only for small exports."""
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
