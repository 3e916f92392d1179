"""Recall and guard tests for the similarity operators (E3).

- ``lsh_topk`` (banded, OR-amplified) recall vs the exact
  ``cosine_topk_bruteforce`` baseline: asserted ≥ 0.8; measured 1.0 at
  the query defaults (bands=16 × 2 planes) on the driver testdata —
  which is what lets q_lsh_topk share the brute-force oracle.
- ``cosine_neardup_lsh`` at a production-style high threshold on a
  synthetic corpus with REAL near-duplicates (the driver embeddings max
  out at cosine ≈ 0.51): pair set must equal the exact
  ``cosine_neardup_pairs`` output exactly — banding finds every pair,
  and the in-bucket re-rank reproduces the identical floored-int64
  cosine. planes_per_band=6 here demonstrates actual pruning (64
  buckets per band) rather than the wide demo buckets the sf queries
  use.
- The driver-collect cap on the query batch raises a clear error.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from loan_etl_data_pipeline_spark.operators.similarity import (
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    cosine_topk_bruteforce,
    lsh_topk,
)
from loan_etl_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_lsh_topk_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(queries, emb, k=5)
    approx = lsh_topk(queries, emb, dim=64, k=5, bands=16, planes_per_band=2)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"LSH top-k recall {recall:.2f} below floor 0.8"


def _neardup_corpus(spark):
    """200 base vectors + 40 perturbed near-dup copies (cosine ≥ ~0.95).

    Deterministic RNG: the high-cosine pairs are exactly
    (i, 1000+i) for i < 40, plus whatever the exact operator finds.
    """
    rng = np.random.default_rng(7)
    dim = 32
    base = rng.normal(size=(200, dim))
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(200)]
    for i in range(40):
        noise = rng.normal(size=dim) * 0.08 * np.linalg.norm(base[i]) / np.sqrt(dim)
        rows.append((1000 + i, (base[i] + noise).astype(np.float32).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), dim


def test_neardup_lsh_equals_exact_at_high_threshold(spark):
    df, dim = _neardup_corpus(spark)
    exact = cosine_neardup_pairs(df, threshold=0.9, n_blocks=4)
    approx = cosine_neardup_lsh(
        df, threshold=0.9, dim=dim, bands=16, planes_per_band=6
    )
    exact_rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in exact.collect()}
    approx_rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in approx.collect()}
    assert len(exact_rows) >= 40, "corpus should contain the planted near-dups"
    assert set(approx_rows) == set(exact_rows), (
        f"missed={set(exact_rows) - set(approx_rows)} "
        f"spurious={set(approx_rows) - set(exact_rows)}"
    )
    for pair, cos in exact_rows.items():
        assert approx_rows[pair] == cos, f"{pair}: cosine mismatch (non-deterministic?)"


def test_ivf_topk_recall_on_clustered_data(spark):
    """The recall contract IVF actually makes: when the data HAS
    cluster structure, few probes recover nearly all true neighbors.
    (The sf fixture embeddings are uniform noise — same-label mean
    cosine 0.019 — where ANY well-balanced quantizer can only reach
    ~n_probe/n_cells recall; the old ≥0.8-at-4/16 floor on that data
    was quietly pinning DEGENERATE skewed cells from the arbitrary-
    prefix init, not retrieval quality.)"""
    import numpy as np

    from loan_etl_data_pipeline_spark.operators.ivf import ivf_topk

    rng = np.random.RandomState(7)
    centers = rng.randn(16, 64) * 5.0
    rows = []
    for i in range(800):
        c = i % 16
        rows.append((i, (centers[c] + rng.randn(64) * 0.3).tolist(), c))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    queries = df.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(queries, df, k=5)
    approx = ivf_topk(queries, df, dim=64, k=5, n_cells=16, n_probe=4)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"IVF top-k recall {recall:.2f} below floor 0.9"


def test_ivf_topk_uniform_data_coverage_and_exhaustive(spark, emb):
    from loan_etl_data_pipeline_spark.operators.ivf import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(queries, emb, k=5)
    # uniform noise: recall tracks probed-mass; 8/16 probes must beat
    # the 8/16 coverage floor (sanity that probing ranks cells usefully)
    approx = ivf_topk(queries, emb, dim=64, k=5, n_cells=16, n_probe=8)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall {recall:.2f} under probed-mass floor"
    # probing every cell must reproduce brute force exactly (same
    # deterministic floored cosine, exhaustive candidates)
    full = ivf_topk(queries, emb, dim=64, k=5, n_cells=16, n_probe=16)
    full_rows = sorted(map(tuple, full.collect()))
    assert full_rows == sorted(map(tuple, exact.collect()))


def test_ivf_training_partitioning_independent(spark, emb):
    """Centroid accumulation is exact int64 — repartitioning the corpus
    (different Arrow batch boundaries, different partial order) must
    yield bit-identical centroids."""
    import numpy as np

    from loan_etl_data_pipeline_spark.operators.ivf import train_ivf_centroids

    a = train_ivf_centroids(emb.repartition(3), dim=64, n_cells=8, iters=2)
    b = train_ivf_centroids(emb.repartition(11), dim=64, n_cells=8, iters=2)
    assert np.array_equal(a, b)


def test_bruteforce_query_batch_cap(spark, emb):
    with pytest.raises(ValueError, match="max_queries"):
        cosine_topk_bruteforce(emb, emb, k=5, max_queries=10)


def test_lsh_topk_query_batch_cap(spark, emb):
    with pytest.raises(ValueError, match="max_queries"):
        lsh_topk(emb, emb, dim=64, k=5, max_queries=10)


def test_ivf_index_roundtrip_equals_in_kernel(spark, sf_dir, tmp_path):
    """build_ivf_index -> ivf_topk_indexed must equal ivf_topk with the
    same centroids, and the pruned read must touch only probed cell
    partitions."""
    from loan_etl_data_pipeline_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        load_ivf_centroids,
    )
    from loan_etl_data_pipeline_spark.sources.tables import load_table
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    dim = len(emb.select("embedding").first()[0])
    idx_dir = str(tmp_path / "ivf")

    cents = build_ivf_index(emb, idx_dir, dim=dim, n_cells=8, iters=2)
    assert np.array_equal(cents, load_ivf_centroids(spark, idx_dir))

    want = sorted(
        map(tuple, ivf_topk(
            queries, emb, dim=dim, k=5, n_cells=8, n_probe=3, centroids=cents
        ).collect())
    )
    got_df = ivf_topk_indexed(spark, idx_dir, queries, k=5, n_probe=3)
    got = sorted(map(tuple, got_df.collect()))
    assert got == want and len(got) > 0

    # partition pruning: the cell filter reaches the scan as a
    # partition filter, not a post-scan row filter
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell#" in plan or "PartitionFilters: [isnotnull(cell" in plan or "cell IN" in plan


# ------------------------------------------------------------------ MMR


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def test_mmr_diversifies_across_clusters(spark):
    """Two tight clusters: relevance-only top-3 stays inside the
    cluster nearest the probe; MMR must cross over."""
    from loan_etl_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mmr_topk,
    )

    # cluster A hugs the probe direction; cluster B is orthogonal-ish
    corpus = _emb_df(
        spark,
        [
            (1, [1.0, 0.01, 0.0]), (2, [1.0, 0.02, 0.0]),
            (3, [1.0, 0.03, 0.0]), (4, [0.2, 1.0, 0.0]),
            (5, [0.2, 1.0, 0.01]),
        ],
    )
    probe = _emb_df(spark, [(100, [1.0, 0.0, 0.0])])
    plain = {
        r["neighbor_id"]
        for r in cosine_topk_bruteforce(probe, corpus, k=3).collect()
    }
    assert plain == {1, 2, 3}
    # lam=0.5 is degenerate here (cluster A ≈ probe direction makes
    # maxsim(c, sel) ≈ rel(c), zeroing every score); 0.3 weights
    # diversity decisively
    mmr = mmr_topk(probe, corpus, k=3, pool=5, lam=0.3)
    picked = {r["neighbor_id"] for r in mmr.collect()}
    assert picked & {4, 5}, picked  # crossed into the far cluster


def test_mmr_matches_python_greedy_replay(spark, sf_dir):
    """Bit-replay the greedy trajectory in numpy on real embeddings."""
    import numpy as np
    from loan_etl_data_pipeline_spark.operators.similarity import mmr_topk
    from loan_etl_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter("vec_id < 3")
    got = sorted(
        (r["query_id"], r["mmr_rank"], r["neighbor_id"])
        for r in mmr_topk(probes, emb, k=4, pool=10, lam=0.7).collect()
    )

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])

    def fcos(a, b):
        d = np.floor((a * b) * 1e12).astype(np.int64).sum()
        aa = np.floor((a * a) * 1e12).astype(np.int64).sum()
        bb = np.floor((b * b) * 1e12).astype(np.int64).sum()
        return (float(d) / 1e12) / (
            np.sqrt(float(aa) / 1e12) * np.sqrt(float(bb) / 1e12)
        )

    want = []
    for qid in (0, 1, 2):
        q = mat[ids == qid][0]
        rel = {
            int(i): fcos(q, mat[ids == i][0]) for i in ids if i != qid
        }
        pool = sorted(rel, key=lambda i: (-rel[i], i))[:10]
        sel = [min(pool, key=lambda i: (-rel[i], i))]
        for r in range(2, 5):
            rest = [c for c in pool if c not in sel]
            def score(c):
                ms = max(
                    fcos(mat[ids == c][0], mat[ids == s][0]) for s in sel
                )
                return 0.7 * rel[c] - 0.3 * ms
            sel.append(min(rest, key=lambda c: (-score(c), c)))
        want.extend((qid, r + 1, n) for r, n in enumerate(sel))
    assert got == sorted(want)


def test_mmr_rank1_is_relevance_argmax_and_validates(spark):
    import pytest as _pytest

    from loan_etl_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mmr_topk,
    )

    corpus = _emb_df(
        spark, [(i, [1.0 + 0.01 * i, float(i % 3), 0.5]) for i in range(8)]
    )
    probe = _emb_df(spark, [(50, [1.0, 0.2, 0.4])])
    top1 = cosine_topk_bruteforce(probe, corpus, k=1).collect()[0]
    first = (
        mmr_topk(probe, corpus, k=3, pool=6, lam=0.7)
        .filter("mmr_rank = 1")
        .collect()[0]
    )
    assert first["neighbor_id"] == top1["neighbor_id"]
    with _pytest.raises(ValueError):
        mmr_topk(probe, corpus, k=10, pool=5)
    with _pytest.raises(ValueError):
        mmr_topk(probe, corpus, k=2, pool=5, lam=0.0)


def test_threshold_scan_matches_bruteforce_pairs(spark, sf_dir):
    """Threshold scan == exhaustive numpy pair filter, incl. cosines."""
    import numpy as np
    from loan_etl_data_pipeline_spark.operators.similarity import (
        cosine_threshold_scan,
    )
    from loan_etl_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r["query_id"], r["corpus_id"], r["cosine"])
        for r in cosine_threshold_scan(
            emb.filter("vec_id < 20"), emb.filter("vec_id >= 20"),
            threshold=0.3,
        ).collect()
    )
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    sq = np.floor((mat * mat) * 1e12).astype(np.int64).sum(axis=1)
    want = []
    for qi in np.nonzero(ids < 20)[0]:
        for ci in np.nonzero(ids >= 20)[0]:
            d = np.floor((mat[qi] * mat[ci]) * 1e12).astype(np.int64).sum()
            cos = (float(d) / 1e12) / (
                np.sqrt(float(sq[qi]) / 1e12) * np.sqrt(float(sq[ci]) / 1e12)
            )
            if cos >= 0.3:
                want.append((int(ids[qi]), int(ids[ci]), cos))
    assert got == sorted(want)


def test_threshold_scan_empty_when_bar_too_high(spark, sf_dir):
    from loan_etl_data_pipeline_spark.operators.similarity import (
        cosine_threshold_scan,
    )
    from loan_etl_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_threshold_scan(
        emb.filter("vec_id < 5"), emb.filter("vec_id >= 5"), threshold=0.999
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "corpus_id", "cosine"]
