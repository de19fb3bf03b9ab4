"""PCA operator tests: orthonormal basis, variance ordering, numpy
reference equivalence, reconstruction behavior, partitioning tolerance."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.embedding import (
    embedding_moments,
    pca_project,
    pca_train,
)
from bonobo_sqlalchemy_spark.sources.files import load_table


def test_moments_match_numpy(spark, sf_small):
    embs = load_table(spark, sf_small, "embeddings")
    n, mean, cov = embedding_moments(embs)
    x = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in embs.collect()])
    assert n == x.shape[0]
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(x.T, bias=True), atol=1e-9)


def test_pca_basis_properties(spark, sf_small):
    embs = load_table(spark, sf_small, "embeddings")
    mean, comps, var = pca_train(embs, k=8)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-8)
    # variance sorted descending and positive
    assert all(a >= b for a, b in zip(var, var[1:]))
    assert var[0] > 0
    # numpy reference agrees on the eigenvalues
    x = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in embs.collect()])
    ref = np.sort(np.linalg.eigvalsh(np.cov(x.T, bias=True)))[::-1][:8]
    assert np.allclose(var, ref, atol=1e-8)
    # partitioning invariance within float tolerance
    mean2, comps2, var2 = pca_train(embs.repartition(13), k=8)
    assert np.allclose(var, var2, atol=1e-8)
    assert np.allclose(np.abs(comps @ comps2.T), np.eye(8), atol=1e-6)


def test_pca_projection_reconstruction(spark, sf_small):
    embs = load_table(spark, sf_small, "embeddings")
    d = len(embs.select("embedding").first()[0])
    x = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in embs.collect()}
    mean, comps, _ = pca_train(embs, k=d)  # full basis -> lossless
    proj = {r.vec_id: np.asarray(r.proj) for r in pca_project(embs, mean, comps).collect()}
    for vid, v in list(x.items())[:20]:
        rec = comps.T @ proj[vid] + mean
        assert np.allclose(rec, v, atol=1e-8)
    # truncated basis: captured variance grows with k
    def resid(k):
        m, c, _ = pca_train(embs, k=k)
        p = {r.vec_id: np.asarray(r.proj) for r in pca_project(embs, m, c).collect()}
        return float(
            np.mean([np.linalg.norm(c.T @ p[v] + m - x[v]) ** 2 for v in x])
        )

    r4, r16 = resid(4), resid(16)
    assert r16 < r4


def test_pca_ann_recall_on_low_rank_data(spark):
    """The compression-for-ANN contract: when the embedding distribution
    actually has low-rank structure (real encoder outputs do; the
    sf-testdata vectors are deliberately isotropic, where NO linear
    compression can help), PCA-k neighbors must agree with full-space
    neighbors. Planted: 64-d vectors living on an 8-d subspace + small
    noise — PCA-16 captures the subspace, so top-5 recall is near-exact."""
    from bonobo_sqlalchemy_spark.operators.embedding import pca_project, pca_train
    from bonobo_sqlalchemy_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(11)
    basis = rng.normal(size=(8, 64))
    z = rng.normal(size=(300, 8))
    x = z @ basis + rng.normal(scale=0.01, size=(300, 64))
    x -= x.mean(axis=0)  # centered, so PCA centering is cosine-neutral
    embs = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(300)],
        "vec_id bigint, embedding array<double>",
    )
    queries = embs.where(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(embs, queries, k=5).collect()
    }
    mean, comps, var = pca_train(embs, k=16)
    # the plant is visible: top-8 components dominate the spectrum
    assert var[7] > 100 * var[8]
    proj = pca_project(embs, mean, comps).withColumnRenamed("proj", "embedding")
    pq = proj.where(F.col("vec_id") < 8)
    approx = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(proj, pq, k=5).collect()
    }
    assert len(exact & approx) >= len(exact) * 0.9, (len(exact & approx), len(exact))
