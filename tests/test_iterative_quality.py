"""Verification for the two iterative (non-SQL-expressible) operators:
instead of an oracle, pin mathematical properties a correct
implementation must satisfy, checked against independent numpy
recomputations of the same quantities."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_etl_studio_spark.operators import load_all
from tests.conftest import SF_DIR

QUERIES, _ = load_all()


@pytest.fixture(scope="module")
def emb_matrix(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    collected = df.collect()
    X = np.array([r.embedding for r in collected], dtype=np.float64)
    labels = np.array([r.label for r in collected])
    vec_ids = np.array([r.vec_id for r in collected])
    return X, labels, vec_ids


def test_kmeans_partitions_all_vectors_and_beats_trivial_clustering(
    spark, emb_matrix
):
    X, _, _ = emb_matrix
    out = QUERIES["kmeans_embeddings"](spark, SF_DIR).collect()
    # every vector assigned exactly once
    assert sum(r.n_vecs for r in out) == len(X)
    assert all(r.n_vecs > 0 for r in out)
    # K-partition inertia with per-cluster means is PROVABLY <= the
    # single-cluster variance around the global mean; a broken
    # assignment or update step violates this. (The synthetic
    # embeddings are near-uniform, so the margin is small — the bound,
    # not the margin, is the invariant.)
    inertia = sum(r.inertia for r in out)
    baseline = float(((X - X.mean(axis=0)) ** 2).sum())
    assert inertia < baseline


def test_kmeans_inertia_matches_numpy_replay(spark, emb_matrix):
    """Replay Lloyd's with the same deterministic init (K lowest vec_ids,
    quantized means, 6dp rounding) in numpy; per-cluster sizes and
    inertias must agree to rounding."""
    from ai_etl_studio_spark.operators.similarity import KMEANS_ITERS, KMEANS_K

    X, _, vec_ids = emb_matrix
    order = np.argsort(vec_ids)
    X = X[order]
    cents = X[:KMEANS_K].copy()
    for _ in range(KMEANS_ITERS):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = []
        for k in range(KMEANS_K):
            blk = X[assign == k]
            if len(blk) == 0:
                new.append(cents[k])
                continue
            micro = np.round(blk * 1_000_000).sum(axis=0)
            new.append(np.round(micro / 1_000_000 / len(blk), 6))
        cents = np.array(new)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    expected_sizes = {k: int((assign == k).sum()) for k in set(assign.tolist())}

    got = QUERIES["kmeans_embeddings"](spark, SF_DIR).collect()
    got_sizes = {r.cluster: r.n_vecs for r in got if r.n_vecs}
    # the replay differs from the engine only in rounding mode
    # (F.round = HALF_UP vs numpy HALF_EVEN on the micro-quantized
    # means), so allow boundary vectors to flip: sizes agree within 5%
    # of N in total absolute difference, inertia within 2%.
    assert set(got_sizes) == set(expected_sizes)
    total_diff = sum(
        abs(got_sizes[k] - expected_sizes[k]) for k in expected_sizes
    )
    assert total_diff <= 0.05 * len(X)
    d2min = d2.min(axis=1)
    assert abs(sum(r.inertia for r in got) - float(d2min.sum())) <= 0.02 * float(
        d2min.sum()
    )


def test_pca_eigenvalue_matches_numpy_eigh(spark, emb_matrix):
    """The power-iteration top eigenvalue per label must satisfy the
    Rayleigh-quotient bound against numpy's full eigendecomposition of
    the same covariance, converge within 1%, and report a leading
    dimension among the true PC1's heaviest coordinates."""
    X, labels, _ = emb_matrix
    out = {
        r.label: (r.top_eigenvalue, r.pc1_argmax_dim)
        for r in QUERIES["embedding_pca_power"](spark, SF_DIR).collect()
    }
    assert set(out) == set(labels.tolist())
    for lab in sorted(out):
        blk = X[labels == lab]
        c = blk - blk.mean(axis=0)
        cov = (c.T @ c) / max(len(blk) - 1, 1)
        w, v = np.linalg.eigh(cov)
        top_w = w[-1]
        top_v = v[:, -1]
        got_w, got_dim = out[lab]
        # Rayleigh-quotient bounds: for ANY unit vector the quotient is
        # <= the true top eigenvalue (exact math, modulo the 6dp output
        # rounding), and 30 power iterations must get within 1% of it.
        # The eigenVECTOR converges much more slowly than the value on
        # a near-degenerate spectrum, so the leading-dimension check
        # asserts only that the reported dim is a top-3 coordinate of
        # the true PC1 rather than exactly its argmax.
        assert got_w <= top_w + 1e-6
        assert got_w >= 0.99 * top_w
        top3 = set(np.argsort(np.abs(top_v))[-3:].tolist())
        assert got_dim in top3, (got_dim, sorted(top3))
