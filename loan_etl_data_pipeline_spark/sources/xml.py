"""XML ingestion (S1+ extension): file-based rowTag reader and a
column-level ``from_xml`` parser with corrupt-record quarantine.

The reference ingests CSV/Excel landings only
(`airflow/dags/etl/spark_etl_dag.py:55-63`); enterprise landings also
arrive as XML exports. Spark 4 ships the XML data source in core (the
former spark-xml package), so both routes stay JVM-side:

- ``read_xml``: one record per ``row_tag`` element, schema inferred or
  explicit — the file-landing route, composable with the same
  discovery/quarantine conventions as ``sources/csv.py``.
- ``xml_records``: parse an XML *column* (e.g. a payload field inside
  an event envelope) with ``from_xml`` — the in-stream route; malformed
  payloads land in a quarantine flag instead of killing the job
  (PERMISSIVE + explicit probe, mirroring the CSV corrupt-record
  contract).

No SQL oracle: DuckDB has no XML parser, so coverage is golden-file
pytest (the S6/streaming stance for engine-external surfaces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str,
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read XML files: one row per ``row_tag`` element.

    With ``schema`` (DDL string) the scan skips inference (one pass,
    the only sane contract at 100 TB — inference reads everything
    once before the real read); extra ``options`` pass through to the
    data source (e.g. ``{"mode": "PERMISSIVE"}``).
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def xml_records(
    df: DataFrame,
    col: str,
    schema: str,
    *,
    keep_cols: tuple[str, ...] = (),
    quarantine_col: str = "xml_corrupt",
) -> DataFrame:
    """Parse an XML string column into typed fields.

    Output = ``keep_cols`` + the parsed struct's fields +
    ``quarantine_col`` (true when the payload failed to parse into ANY
    field — the row survives with nulls instead of failing the job,
    the CSV corrupt-record contract applied to XML).
    """
    parsed = F.from_xml(F.col(col), schema)
    fields = [f.strip().split()[0] for f in schema.split(",")]
    out = df.select(
        *keep_cols,
        *[parsed.getField(f).alias(f) for f in fields],
        F.col(col).alias("__raw"),
    )
    all_null: Column = F.lit(True)
    for f in fields:
        all_null = all_null & F.col(f).isNull()
    return out.withColumn(
        quarantine_col, all_null & F.col("__raw").isNotNull()
    ).drop("__raw")
