"""Int8 embedding quantization + quantized top-k (EXT E3 scale path).

Symmetric per-vector int8 quantization is the standard memory lever for
ANN over a 100 TB embedding corpus: 4× smaller scans and integer dot
products, with an exact re-rank tier available on the original floats
(compose :func:`quantized_topk` for candidates with
``similarity.cosine_topk_bruteforce`` over the survivors).

Determinism (the oracle contract):

- ``scale = max(|v|) / 127.0`` — one IEEE divide;
- ``q_i = floor(v_i / scale + 0.5)`` — divide, add, floor: every step
  is a single correctly-rounded IEEE op, so numpy, the JVM, and DuckDB
  produce bit-identical int codes (no round() — engines disagree on
  half-even vs half-up; floor(x+0.5) is tie-free and portable);
- integer dot products are computed in float64 BLAS: every elementwise
  product is ≤ 127² and a 4096-dim sum stays far below 2⁵³, so the
  result is EXACT regardless of summation order or batch boundaries;
- quantized cosine is ``dot / (sqrt(qq) * sqrt(cc))`` in that fixed
  order.

Like the rest of the E3 tier (see similarity.py module docstring),
vector math runs in Arrow-batched numpy kernels, not higher-order
array expressions (CodegenFallback → interpreted per element — and a
fused transform() would re-evaluate the scale reduction per element).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from loan_etl_data_pipeline_spark.operators.similarity import (
    MAX_QUERY_BATCH,
    _collect_query_batch,
)
from loan_etl_data_pipeline_spark.session import ensure_worker_imports

_PAIR_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("qcosine", DoubleType()),
    ]
)


def _quantize_mat(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes int32, scales float64) for a float64 row-matrix."""
    scale = np.abs(m).max(axis=1) / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor(m / scale[:, None] + 0.5)
    q = np.where(scale[:, None] == 0.0, 0.0, q).astype(np.int32)
    return q, scale


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Project (id, vec) → (id, qvec int8-coded array<int>, scale).

    Pure per-row projection — zero shuffle; at 100 TB this runs inside
    the scan stage and the quantized table it writes is what the serving
    path scans (4 bytes/dim here for checkability; a production sink
    would pack to 1 byte/dim with the identical codes).
    """
    ensure_worker_imports(df.sparkSession)
    schema = StructType(
        [
            StructField("__qid", LongType()),
            StructField("qvec", ArrayType(IntegerType())),
            StructField("scale", DoubleType()),
        ]
    )

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q, scale = _quantize_mat(m)
            yield pd.DataFrame(
                {"__qid": ids, "qvec": list(q), "scale": scale}
            )

    return (
        df.select(id_col, vec_col)
        .mapInPandas(_scan, schema=schema)
        .withColumnRenamed("__qid", id_col)
    )


def quantized_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    max_queries: int = MAX_QUERY_BATCH,
) -> DataFrame:
    """Top-k by quantized cosine: integer dot products over int8 codes.

    Same plan shape as ``cosine_topk_bruteforce`` (broadcast probe
    batch, corpus streams through one kernel emitting local top-ks, a
    tiny window merges) but the corpus scan reads 4× fewer bytes and
    the scoring matmul is exact integer math — the shape you run the
    FIRST pass of a two-tier exact-re-rank ANN with.

    Output: (query_id, neighbor_id, qcosine, rank); self-pairs
    excluded; ties broken by neighbor_id ascending.
    """
    ensure_worker_imports(queries_df.sparkSession)
    q_rows = _collect_query_batch(queries_df, id_col, qvec_col, max_queries)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qq = (q_mat * q_mat).sum(axis=1)
    bq = queries_df.sparkSession.sparkContext.broadcast((q_ids, q_mat, qq))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, q_mat_, qq_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[qvec_col]])
            cc = (c_mat * c_mat).sum(axis=1)
            dot = q_mat_ @ c_mat.T  # exact: int products in float64
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (np.sqrt(qq_)[:, None] * np.sqrt(cc)[None, :])
            cos[~np.isfinite(cos)] = -np.inf
            cos[q_ids_[:, None] == c_ids[None, :]] = -np.inf
            kk = min(k, cos.shape[1])
            order = np.lexsort((c_ids[None, :].repeat(len(q_ids_), 0), -cos), axis=1)
            top = order[:, :kk]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids_, kk),
                    "neighbor_id": c_ids[top].ravel(),
                    "qcosine": np.take_along_axis(cos, top, axis=1).ravel(),
                }
            )
            yield out[np.isfinite(out["qcosine"])]

    local = corpus_df.select(id_col, qvec_col).mapInPandas(_scan, schema=_PAIR_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qcosine", "rank")
    )
