"""Unit tests for int8 quantization + quantized top-k
(operators/quantize.py): code correctness on boundary vectors, the
zero-vector guard, quantization error bound, and end-to-end agreement
with the exact brute-force ranking on the real embeddings table."""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.quantize import (
    quantize_embeddings,
    quantized_topk,
)
from loan_etl_data_pipeline_spark.operators.similarity import cosine_topk_bruteforce
from loan_etl_data_pipeline_spark.sources.tables import load_table


def test_quantize_codes_boundaries_and_zero(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, -1.0, 0.5, 0.0]),  # max=1 → scale=1/127
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector → all-zero codes
            (3, [-2.0, 1.0, 0.0, 0.25]),  # negative max magnitude
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[1]["qvec"] == [127, -127, 64, 0]  # 63.5 rounds half-up to 64
    assert got[1]["scale"] == pytest.approx(1 / 127)
    assert got[2]["qvec"] == [0, 0, 0, 0] and got[2]["scale"] == 0.0
    # scale = 2/127; 1.0/scale = 63.5 → 64; 0.25/scale = 15.875 → 16
    assert got[3]["qvec"] == [-127, 64, 0, 16]


def test_quantize_error_bound(spark):
    rng = np.random.default_rng(7)
    vecs = [(i, rng.standard_normal(32).astype("float32").tolist()) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    for r in quantize_embeddings(df).collect():
        orig = np.asarray(dict(vecs)[r["vec_id"]], dtype=np.float64)
        deq = np.asarray(r["qvec"], dtype=np.float64) * r["scale"]
        # symmetric quantization error ≤ scale/2 per element
        assert np.abs(deq - orig).max() <= r["scale"] / 2 + 1e-12
        assert max(abs(c) for c in r["qvec"]) <= 127


def test_quantized_topk_matches_exact_ranking_closely(spark, sf_dir):
    """On 64-dim near-random embeddings int8 codes barely perturb
    cosine: quantized top-5 must recall ≥ 0.8 of the exact top-5."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(probes, emb, k=5).collect()
    qemb = quantize_embeddings(emb)
    quant = quantized_topk(qemb.filter(F.col("vec_id") < 10), qemb, k=5).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    for r in quant:
        tot += 1
        hit += r["neighbor_id"] in exact_sets[r["query_id"]]
    assert tot == len(exact) > 0
    assert hit / tot >= 0.8, f"quantized recall {hit}/{tot}"


def test_quantized_then_exact_rerank_composition(spark, sf_dir):
    """Two-tier ANN: quantized candidates (c·k) re-ranked exactly — the
    production shape — must reproduce the exact top-3 exactly here."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    qemb = quantize_embeddings(emb)
    cand = quantized_topk(qemb.filter(F.col("vec_id") < 5), qemb, k=15)
    cand_corpus = emb.join(
        cand.select(F.col("neighbor_id").alias("vec_id")).distinct(), "vec_id"
    )
    rerank = cosine_topk_bruteforce(probes, cand_corpus, k=3).collect()
    exact = cosine_topk_bruteforce(probes, emb, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rerank) == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in exact
    )
