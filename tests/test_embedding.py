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


def test_pca_power_partitioning_bit_exact(spark, sf_small):
    """The integer-sufficient-statistics trainer is partition-order FREE:
    any repartitioning yields the bit-identical basis (this is the property
    that makes z_emb_pca_ann value-exact cross-engine)."""
    from bonobo_sqlalchemy_spark.operators.embedding import pca_power_train

    embs = load_table(spark, sf_small, "embeddings")
    n1, s1, m1, c1, l1 = pca_power_train(embs, k=6, iters=8)
    n2, s2, m2, c2, l2 = pca_power_train(embs.repartition(13), k=6, iters=8)
    assert (n1, s1) == (n2, s2)
    assert m1 == m2 and l1 == l2
    assert c1 == c2  # exact float equality, not allclose


def test_pca_power_recovers_planted_direction(spark):
    """On genuinely low-rank data the fixed-iteration power method recovers
    the planted dominant direction (|cos| > 0.999) and eigenvalues come out
    in decreasing order."""
    from bonobo_sqlalchemy_spark.operators.embedding import pca_power_train

    rng = np.random.default_rng(11)
    d, n = 16, 400
    u = rng.standard_normal(d)
    u /= np.linalg.norm(u)
    x = np.outer(rng.standard_normal(n) * 5.0, u) + rng.standard_normal((n, d)) * 0.05
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<float>",
    )
    _, _, _, comps, lams = pca_power_train(df, k=3, iters=20)
    c0 = np.asarray(comps[0])
    assert abs(float(c0 @ u) / np.linalg.norm(c0)) > 0.999
    assert lams[0] > lams[1] >= lams[2] > 0


def test_pca_project_fold_matches_trainer_reference(spark, sf_small):
    """The JVM higher-order-function projection folds in the same index
    order as the trainer's Python loop — projections agree bit-for-bit."""
    from bonobo_sqlalchemy_spark.operators.embedding import (
        pca_power_train,
        pca_project_fold,
    )

    embs = load_table(spark, sf_small, "embeddings").limit(50)
    q = 1 << 20
    _, s_ints, mean, comps, _ = pca_power_train(embs, k=4, iters=6)
    got = {
        r.vec_id: list(r.proj)
        for r in pca_project_fold(embs, mean, comps).collect()
    }
    rows = embs.select("vec_id", "embedding").collect()
    import math

    for r in rows:
        xq = [math.floor(float(v) * q) for v in r.embedding]
        for rr, comp in enumerate(comps):
            acc = 0.0
            for j in range(len(xq)):
                acc += (float(xq[j]) - mean[j]) * comp[j]
            assert got[r.vec_id][rr] == acc  # bit-exact, no tolerance


def test_pca_project_fold_plan_is_jvm_side(spark, sf_small):
    """No Python worker in the projection plan: the fold is pure SQL HOFs
    (scale contract — the per-row math rides whole-stage codegen)."""
    from bonobo_sqlalchemy_spark.operators.embedding import (
        pca_power_train,
        pca_project_fold,
    )

    embs = load_table(spark, sf_small, "embeddings")
    _, _, mean, comps, _ = pca_power_train(embs, k=2, iters=4)
    plan = pca_project_fold(embs, mean, comps)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
