"""JVM-literal local frames.

``spark.createDataFrame(python_list, schema)`` builds a PICKLED PYTHON
RDD: every downstream task that touches it launches (or round-trips) a
Python worker, which costs ~0.5-5 s of pure scheduling even for a
4-row frame on local[32] (measured in round 8 — q_shapley_attribution
spent 4-5 of its 5.7 s shipping a 4-row result through the Python
serializer chain).  A ``VALUES`` literal compiles to a JVM
LocalRelation instead: no Python workers, constant-folds into the
plan, ~0.1 s.

:func:`values_frame` is the drop-in for SMALL, driver-known frames
(models, term lists, constant lattices).  It is NOT for data-sized
input — a frame that grows with the dataset belongs in a distributed
source, not a SQL literal.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _split_ddl(schema: str) -> list[tuple[str, str]]:
    """Split a DDL string into (name, type) pairs, honoring ``<>``
    nesting (``centroid array<double>``)."""
    cols, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    out = []
    for c in cols:
        name, typ = c.strip().split(None, 1)
        out.append((name, typ.strip()))
    return out


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"{v!r}D"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_lit(x) for x in v) + ")"
    raise TypeError(f"values_frame cannot render {type(v).__name__!r}")


def values_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A small driver-known frame as a pure-JVM ``VALUES`` literal.

    ``schema`` is a DDL string (``"tok string"``, ``"cell int,
    centroid array<double>"``).  Every column is CAST to its declared
    type, so NULL-only columns and int→double coercions behave exactly
    like createDataFrame.  Empty ``rows`` falls back to an empty
    LocalRelation via a WHERE-false select (VALUES cannot be empty).
    """
    cols = _split_ddl(schema)
    # nullif(x, NULL) is identity on values but marks the column
    # nullable, matching createDataFrame's schema exactly (a bare
    # VALUES literal of non-null values infers non-nullable)
    proj = ", ".join(
        f"nullif(CAST(c{i} AS {typ}), NULL) AS {name}"
        for i, (name, typ) in enumerate(cols)
    )
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    if not rows:
        nulls = ", ".join(f"NULL AS c{i}" for i in range(len(cols)))
        return spark.sql(f"SELECT {proj} FROM (SELECT {nulls}) WHERE 1 = 0")
    body = ", ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    return spark.sql(f"SELECT {proj} FROM VALUES {body} AS t({names})")
