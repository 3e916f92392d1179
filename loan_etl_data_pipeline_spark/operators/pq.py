"""Product quantization (PQ) + asymmetric-distance (ADC) top-k — the
third ANN compression tier (EXT E3 scale path).

Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each ``dim``-vector into ``m`` subspaces,
k-means each subspace to ``ksub`` codewords, store one code byte per
subspace. At ``m=8, ksub=16`` a 64-dim float32 vector compresses
256 B → 8 B (32×) — the tier beyond int8 (4×, operators/quantize.py)
for corpora whose codes must fit in memory. Queries score codes
WITHOUT decompressing: per query, an (m × ksub) table of
subspace dot products is built once, and each corpus code costs m
table lookups (ADC).

Composition across the E3 family (each certified separately):

    IVF cells (ivf.py)  →  prune which vectors to score
    PQ/ADC (this file)  →  cheap approximate scoring of the survivors
    int8 / floats       →  exact re-rank of the ADC top candidates

Determinism contract (house rules, see similarity.py): training reuses
the exact-integer partial scheme of ``train_ivf_centroids`` — per
Arrow batch the kernel emits (subspace, code, count, Σ floor(x·1e9))
partials combined on the driver in Python ints, so codebooks are
bit-identical under any partitioning; init is the ``ksub``
smallest-id vectors (no RNG). Encoding and ADC scoring are row-local
float64 numpy with a fixed evaluation order, so results don't depend
on batch boundaries. ADC scores are *approximations* of cosine by
construction (the codebook reconstruction), hence no SQL oracle —
correctness is pinned by a pure-python reference parity test, a
recall floor vs exact top-k, and training-determinism tests.
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
    _mat,
)
from loan_etl_data_pipeline_spark.session import ensure_worker_imports

_ACC_SCALE = 1e9

_CODE_SCHEMA_FIELDS = [
    StructField("vec_id", LongType()),
    StructField("codes", ArrayType(IntegerType())),
]

_ADC_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("adc_cosine", DoubleType()),
    ]
)


def _split(mat: np.ndarray, m: int) -> list[np.ndarray]:
    """Column-slice a row matrix into m equal subspaces."""
    dsub = mat.shape[1] // m
    return [mat[:, s * dsub : (s + 1) * dsub] for s in range(m)]


def _assign_codes(sub: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Nearest codeword per row by exact argmin of ||x-c||² (ties → the
    lowest code, via argmin's first-occurrence rule — deterministic)."""
    d = (cb * cb).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
    return d.argmin(axis=1)


def train_pq_codebooks(
    corpus_df: DataFrame,
    *,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = 16384,
) -> np.ndarray:
    """Deterministic per-subspace Lloyd: returns (m, ksub, dim//m)
    codebooks. Empty codes keep their previous codeword; ``dim`` must
    divide evenly by ``m``.

    Training set: a deterministic pseudo-random sample — the first
    ``train_cap`` rows under (md5(id), id) order (hash order, not id
    order: an id-prefix sample would inherit whatever source/ingest
    bias the ids carry) — ONE TakeOrdered job, then all ``iters``
    rounds run driver-side in numpy (driver memory bounded at
    cap·dim float64). Codebook training never needs the full corpus
    (FAISS trains on ≤ a few hundred samples per centroid); what must
    scale is the *encode/scan*, which stays a distributed mapInPandas
    over everything. Pass ``train_cap=None`` to force full-corpus
    distributed training (one scan per iteration emitting
    (subspace, code, n, Σ floor(x·1e9)) partials). Both paths share
    the init rule and the exact fixed-point accumulation, so for
    corpora that fit under the cap they produce bit-identical
    codebooks.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    ensure_worker_imports(corpus_df.sparkSession)
    init_n = ksub if train_cap is None else max(ksub, train_cap)
    sample_key = F.md5(F.col(id_col).cast("string"))
    init_rows = (
        corpus_df.select(id_col, vec_col)
        .orderBy(sample_key.asc(), F.col(id_col).asc())
        .limit(init_n)
        .collect()
    )
    if len(init_rows) < ksub:
        raise ValueError(f"corpus has only {len(init_rows)} rows; need >= {ksub}")
    init = np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows[:ksub]])
    books = np.stack([s.copy() for s in _split(init, m)])  # (m, ksub, dsub)

    if train_cap is not None:
        # driver-side exact Lloyd over the bounded sample: identical
        # arithmetic to the distributed path (int64 sums of
        # floor(x·1e9)), minus iters× job launches.
        mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows])
        subs = _split(mat, m)
        fixed = [np.floor(s * _ACC_SCALE).astype(np.int64) for s in subs]
        for _ in range(iters):
            new = books.copy()
            for s in range(m):
                codes = _assign_codes(subs[s], books[s])
                for c in np.unique(codes):
                    sel = fixed[s][codes == c]
                    new[s, c] = (
                        sel.sum(axis=0, dtype=np.int64) / _ACC_SCALE / len(sel)
                    )
            books = new
        return books

    sc = corpus_df.sparkSession.sparkContext
    partial_schema = StructType(
        [
            StructField("sub", IntegerType()),
            StructField("code", IntegerType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(LongType())),
        ]
    )
    data = corpus_df.select(vec_col)

    for _ in range(iters):
        bc = sc.broadcast(books)

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bks = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = _mat(pdf[vec_col])
                out = []
                for s, sub in enumerate(_split(mat, m)):
                    codes = _assign_codes(sub, bks[s])
                    fixed = np.floor(sub * _ACC_SCALE).astype(np.int64)
                    for c in np.unique(codes):
                        rows = fixed[codes == c]
                        out.append(
                            (int(s), int(c), len(rows), rows.sum(axis=0).tolist())
                        )
                yield pd.DataFrame(out, columns=["sub", "code", "n", "s"])

        partials = data.mapInPandas(_partials, schema=partial_schema).collect()
        counts = [[0] * ksub for _ in range(m)]
        sums = [[[0] * dsub for _ in range(ksub)] for _ in range(m)]
        for r in partials:
            counts[r["sub"]][r["code"]] += r["n"]
            acc = sums[r["sub"]][r["code"]]
            for j, v in enumerate(r["s"]):
                acc[j] += v
        new = books.copy()
        for s in range(m):
            for c in range(ksub):
                if counts[s][c] > 0:
                    new[s, c] = np.array(
                        [float(v) / _ACC_SCALE / counts[s][c] for v in sums[s][c]]
                    )
        books = new
    return books


def pq_encode(
    corpus_df: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): one nearest-codeword index per subspace, row-local
    numpy over the scan — the 32×-smaller representation you persist.
    """
    ensure_worker_imports(corpus_df.sparkSession)
    m = codebooks.shape[0]
    sc = corpus_df.sparkSession.sparkContext
    bc = sc.broadcast(codebooks)
    schema = StructType(
        [StructField(id_col, LongType()), StructField("codes", ArrayType(IntegerType()))]
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _mat(pdf[vec_col])
            codes = np.stack(
                [_assign_codes(sub, bks[s]) for s, sub in enumerate(_split(mat, m))],
                axis=1,
            ).astype(np.int32)
            yield pd.DataFrame({id_col: ids, "codes": list(codes)})

    return corpus_df.select(id_col, vec_col).mapInPandas(_enc, schema=schema)


def _query_table(q: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(m, ksub) subspace dot tables for one query — the ONE place this
    product is computed: the distributed kernel and the adc_score
    reference both call it, so their floats are bit-identical (a GEMM
    einsum over the query batch accumulates in a different order than
    per-query matvecs and drifts in the last ulp — measured)."""
    m = codebooks.shape[0]
    return np.stack(
        [codebooks[s] @ qs[0] for s, qs in enumerate(_split(q[None, :], m))], axis=0
    )


def adc_score(q: np.ndarray, codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Pure-python/numpy ADC reference: approximate cosine of ``q``
    against each encoded row — exactly the kernel's math, importable by
    tests. score = Σ_s table[s, code_s] / (‖q‖ · ‖x̂‖), with
    ‖x̂‖² = Σ_s ‖codeword‖² (reconstruction norm).
    """
    m = codebooks.shape[0]
    table = _query_table(q, codebooks)  # (m, ksub)
    norms2 = (codebooks * codebooks).sum(axis=2)  # (m, ksub)
    sub_idx = np.arange(m)
    dots = table[sub_idx, codes].sum(axis=1)
    rnorm = np.sqrt(norms2[sub_idx, codes].sum(axis=1))
    qn = float(np.sqrt(q @ q))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = dots / (qn * rnorm)
    return np.where((rnorm == 0.0) | (qn == 0.0), -np.inf, out)


def pq_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    *,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    codebooks: np.ndarray | None = None,
    codes_df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_BATCH,
) -> DataFrame:
    """Approximate top-k over PQ codes via ADC table lookups.

    Pass precomputed ``codebooks`` (and optionally ``codes_df`` from
    :func:`pq_encode`) to skip training/encoding — the 100 TB pattern:
    train once on a sample, encode once, then every query batch scans
    only the 32×-smaller code table; the float corpus is touched only
    by the downstream exact re-rank (compose with
    ``similarity.cosine_topk_bruteforce`` on the candidate ids).

    Output: (query_id, neighbor_id, adc_cosine, rank) — ranked by the
    ADC approximation, neighbor-id tie-break, self-matches excluded.
    """
    ensure_worker_imports(corpus_df.sparkSession)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus_df, dim=dim, m=m, ksub=ksub, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    if codes_df is None:
        codes_df = pq_encode(corpus_df, codebooks, id_col=id_col, vec_col=vec_col)
    q_rows = _collect_query_batch(queries_df, id_col, vec_col, max_queries)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])

    # per-query (m, ksub) dot tables + shared codeword norms, built once
    tables = np.stack([_query_table(q_mat[i], codebooks) for i in range(len(q_ids))])
    norms2 = (codebooks * codebooks).sum(axis=2)  # (m, ksub)
    # same op as adc_score's qn (q @ q), NOT (q*q).sum() — see _query_table
    qn = np.array([float(np.sqrt(q_mat[i] @ q_mat[i])) for i in range(len(q_ids))])

    sc = corpus_df.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, tables, norms2, qn))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, tables_, norms2_, qn_ = bq.value
        sub_idx = np.arange(tables_.shape[1])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["vec_id_c"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (nc, m)
            rnorm = np.sqrt(norms2_[sub_idx, codes].sum(axis=1))  # (nc,)
            frames = []
            for qi in range(len(q_ids_)):
                dots = tables_[qi][sub_idx, codes].sum(axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    score = dots / (qn_[qi] * rnorm)
                score = np.where((rnorm == 0.0) | (qn_[qi] == 0.0), -np.inf, score)
                keep = c_ids != q_ids_[qi]
                ids_k, sc_k = c_ids[keep], score[keep]
                if len(ids_k) == 0:
                    continue
                # local top-k with the SAME (score desc, id asc) order as
                # the global window — a plain score sort could drop the
                # globally-preferred member of a tie at the batch edge
                top = np.lexsort((ids_k, -sc_k))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids_[qi],
                            "neighbor_id": ids_k[top],
                            "adc_cosine": sc_k[top],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    local = codes_df.select(
        F.col(id_col).alias("vec_id_c"), "codes"
    ).mapInPandas(_scan, schema=_ADC_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_cosine", "rank")
    )


def build_pq_index(
    corpus_df: DataFrame,
    index_dir: str,
    *,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Persist the PQ index: train once, encode once, query forever.

    - ``index_dir/codebooks`` — (sub, code, centroid) rows (tiny:
      m·ksub·dsub doubles; binary64 round-trips through parquet
      unchanged, so reloaded ADC scores are bit-identical);
    - ``index_dir/codes`` — the 32×-smaller (id, codes) table, the only
      thing a query scan reads.

    The float corpus is never touched again except by a downstream
    exact re-rank of ADC candidates. Returns the codebooks.
    """
    books = train_pq_codebooks(
        corpus_df, dim=dim, m=m, ksub=ksub, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    pq_encode(corpus_df, books, id_col=id_col, vec_col=vec_col).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/codes")
    spark = corpus_df.sparkSession
    rows = [
        (s, c, books[s, c].tolist())
        for s in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    from loan_etl_data_pipeline_spark.functions.localframe import values_frame

    values_frame(
        spark, rows, "sub int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    return books


def load_pq_codebooks(spark, index_dir: str) -> np.ndarray:
    """(m, ksub, dsub) codebooks back from ``index_dir`` — bit-exact."""
    rows = spark.read.parquet(f"{index_dir}/codebooks").orderBy("sub", "code").collect()
    m = max(r["sub"] for r in rows) + 1
    ksub = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["centroid"])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        books[r["sub"], r["code"]] = np.asarray(r["centroid"], dtype=np.float64)
    return books


def pq_topk_indexed(
    spark,
    index_dir: str,
    queries_df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_BATCH,
) -> DataFrame:
    """ADC top-k against a persisted PQ index: reads ONLY the code
    table (32× smaller than the float corpus) + the kilobyte codebook
    row set. Identical output to :func:`pq_topk` with the same
    codebooks — the reload is bit-exact, which the index test pins.
    """
    books = load_pq_codebooks(spark, index_dir)
    codes = spark.read.parquet(f"{index_dir}/codes")
    # with codebooks AND codes_df supplied, pq_topk touches corpus_df
    # only for the session handle — the codes frame serves as both
    return pq_topk(
        queries_df,
        codes,
        k=k,
        dim=books.shape[0] * books.shape[2],
        m=books.shape[0],
        ksub=books.shape[1],
        codebooks=books,
        codes_df=codes,
        id_col=id_col,
        vec_col=vec_col,
        max_queries=max_queries,
    )
