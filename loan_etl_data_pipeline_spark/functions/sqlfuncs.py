"""SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ... RETURN``).

The engine's determinism idioms — exact-cents quantization, md5 split
buckets — exist as Python Column helpers (functions/deterministic.py,
functions/splits.py), but a SQL-first consumer (the register_tables /
spark.sql entry point, sources/tables.py) can't call those. SQL UDFs
close that gap: the SAME formulas registered as catalog functions, so
the literal SQL text stays portable and the body is a plain expression
the optimizer inlines into codegen — these are NOT Python UDFs; there
is no serialization boundary and no perf cliff.

The reference has no SQL surface at all (71-line DataFrame script);
EXT A.10+/S-family per SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name -> (signature, body). One definition so tests, queries, and the
#: DuckDB oracles (which inline the identical expression text) can't
#: drift.
SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # exact-cents quantization (functions/deterministic.py dsum's unit)
    "cents": ("(x DOUBLE) RETURNS BIGINT", "CAST(FLOOR(x * 100) AS BIGINT)"),
    # the md5 split coordinate (functions/splits.py split_bucket_hex)
    "split_bucket": (
        "(key STRING, salt STRING) RETURNS STRING",
        "substr(md5(key || salt), 1, 4)",
    ),
    # portable integer share: (num*part) div den (the cross-multiplied
    # compare idiom as a reusable scalar)
    "int_share": (
        "(num BIGINT, part BIGINT, den BIGINT) RETURNS BIGINT",
        "(num * part) div den",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every SQL_FUNCTIONS entry as a temporary catalog
    function (CREATE OR REPLACE — idempotent per session); returns the
    registered names."""
    for name, (sig, body) in SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    return list(SQL_FUNCTIONS)
