"""Embedding-matrix operators: distributed moments and PCA projection.

Dimensionality reduction is the standard pre-step for large-scale ANN and
SemDeDup-style clustering (project 768-d encoder outputs to 64-128 d
before building the index). The Spark-first shape: sufficient statistics
``(n, Σx, ΣxxT)`` are computed per partition in ONE Arrow pass — each
partition contributes d² + d + 1 floats regardless of row count — the
driver combines the partition stats and eigendecomposes the d×d
covariance (d is the embedding dimension, bounded and small; the DATA
never leaves the executors), and the projection is a second Arrow matmul
pass. No iterative driver loops, no data-sized collect.

Reference scope note: the reference engine has no vector operators; this
module belongs to the driver-mandated training-data extension surface
(SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str = "embedding"):
    """``(n, mean, cov)`` of the embedding matrix as numpy arrays.

    One ``mapInPandas`` pass emits per-partition ``(n, Σx, ΣxxT)`` rows
    (flattened); the driver sums P partition rows and finishes the
    covariance — O(P·d²) driver work, independent of row count.
    """
    import numpy as np

    d_probe = len(df.select(vec_col).first()[0])

    def stats(batches):
        import pandas as pd

        n, s, ss = 0, np.zeros(d_probe), np.zeros((d_probe, d_probe))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(stats, "n bigint, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    ss = np.sum([np.asarray(r.ss).reshape(d_probe, d_probe) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_train(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Top-``k`` principal components of the embedding distribution:
    ``(mean, components (k, d), explained_variance (k,))``.

    Eigendecomposition runs on the driver over the d×d covariance (the
    only driver-side math; d = embedding dim). Sign convention: each
    component's largest-|coordinate| entry is made positive, so the basis
    is deterministic up to the float noise of the partition-sum order.
    """
    import numpy as np

    _, mean, cov = embedding_moments(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def pca_power_train(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 12,
    q: int = 1 << 20,
):
    """Cross-engine-exact PCA: fixed-iteration deflated power method over an
    INTEGER-EXACT covariance — ``(n, s_ints, mean, comps, lams)``.

    ``pca_train`` is rows-only-checkable because ``eigh`` over a
    partition-order-sensitive double covariance has no SQL twin. This
    variant removes both obstacles so the full eigenbasis is reproducible
    bit-for-bit by a DuckDB recursive CTE (``queries/datapipe7.py::
    _pca_power_oracle``):

    - **Quantize** each float32 component onto a ``2^-20`` grid with
      ``floor(x * q)`` — exact in doubles (power-of-two scale, no rounding
      ties, identical in Python / JVM / DuckDB).
    - **Integer sufficient statistics**: per-partition ``(n, Σxq, Σxq·xqᵀ)``
      in ONE Arrow pass (d²+d+1 ints per partition, data never leaves the
      executors), combined on the driver with arbitrary-precision ints —
      integer addition is associative, so the result is partition-order
      FREE. Covariance ``n·Sij − Si·Sj`` is an exact integer; the single
      int→double conversion rounds to nearest-even identically everywhere.
    - **Fixed-iteration power method with deflation**: ``iters`` matvec +
      normalize steps per component, Rayleigh-quotient eigenvalue, rank-one
      deflation, sign fixed by the first |coordinate| > 1e-12. Every sum
      folds left-to-right in index order (Python loop here ≡ DuckDB
      ``list_reduce`` ≡ Spark ``aggregate``), so the basis is DETERMINISTIC
      BY CONSTRUCTION, not convergence-dependent: both engines run the same
      finite recurrence on identical doubles.

    Driver work is O(P·d² + k·iters·d²) — independent of row count. The
    per-partition int64 sums require fewer than 2^23 rows per partition at
    the default grid (|x| < 2 ⇒ products < 2^42); repartition denser inputs
    upstream or lower ``q``.
    """
    import numpy as np

    head = df.select(vec_col).first()
    if head is None:
        raise ValueError(
            "pca_power_train: input DataFrame is empty — cannot infer the "
            "vector dimension or train a basis on zero rows"
        )
    d = len(head[0])

    def stats(batches):
        import pandas as pd

        n, s, ss = 0, np.zeros(d, dtype=np.int64), np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            xq = np.floor(x * q).astype(np.int64)
            n += xq.shape[0]
            s += xq.sum(axis=0)
            ss += xq.T @ xq
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(stats, "n bigint, s array<bigint>, ss array<bigint>")
        .collect()
    )
    n = sum(r.n for r in rows)
    s_ints = [sum(int(r.s[j]) for r in rows) for j in range(d)]
    ss_ints = [
        [sum(int(r.ss[i * d + j]) for r in rows) for j in range(d)] for i in range(d)
    ]
    c = [
        [float(n * ss_ints[i][j] - s_ints[i] * s_ints[j]) for j in range(d)]
        for i in range(d)
    ]

    def _seq(terms):
        acc = 0.0
        for t in terms:
            acc += t
        return acc

    import math

    comps: list[list[float]] = []
    lams: list[float] = []
    for _ in range(k):
        v = [1.0] * d
        for _ in range(iters):
            w = [_seq(c[i][j] * v[j] for j in range(d)) for i in range(d)]
            nrm = math.sqrt(_seq(w[i] * w[i] for i in range(d)))
            if nrm == 0.0:
                # rank-deficient input: the deflated covariance annihilated
                # the start vector, so the remaining components do not
                # exist. Raise rather than divide — propagating NaN/inf
                # would silently poison the basis (r13 ADVICE). No oracled
                # fixture can reach this branch (it would have NaN'd), so
                # the cross-engine recurrence is unchanged where defined.
                raise ValueError(
                    f"pca_power_train: covariance rank < k after "
                    f"{len(comps)} components — lower k or feed "
                    "higher-rank data"
                )
            v = [w[i] / nrm for i in range(d)]
        for i in range(d):
            if abs(v[i]) > 1e-12:
                if v[i] < 0:
                    v = [-x for x in v]
                break
        lam = _seq(v[i] * _seq(c[i][j] * v[j] for j in range(d)) for i in range(d))
        comps.append(v)
        lams.append(lam)
        c = [[c[i][j] - lam * v[i] * v[j] for j in range(d)] for i in range(d)]
    mean = [s_ints[j] / n for j in range(d)]
    return n, s_ints, mean, comps, lams


def pca_project_fold(
    df: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
    q: int = 1 << 20,
) -> DataFrame:
    """Projection twin of ``pca_power_train`` that stays ENTIRELY JVM-side:
    quantize → center → per-component sequential dot, all with SQL
    higher-order functions (``transform`` / ``zip_with`` / ``aggregate``),
    whole-stage-codegen'd — no Python worker at all. ``aggregate`` folds
    left-to-right from 0.0, the same order as the trainer's Python loop and
    the oracle's ``list_reduce``, so projections are bit-identical across
    all three. Basis ships as k·d double literals (k, d bounded)."""
    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.transform(
        F.col(vec_col),
        lambda x, j: F.floor(x.cast("double") * F.lit(float(q))) - F.element_at(mean_arr, j + 1),
    )
    projs = []
    for r, comp in enumerate(components):
        comp_arr = F.array(*[F.lit(float(w)) for w in comp])
        dot = F.aggregate(
            F.zip_with(F.col("_centered"), comp_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        projs.append(dot)
    return (
        df.select(id_col, vec_col)
        .withColumn("_centered", centered)
        .select(F.col(id_col), F.array(*projs).alias(out_col))
    )


def pca_project(
    df: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
) -> DataFrame:
    """Project every embedding onto the component basis: ``(id, proj)``
    with ``proj = C @ (x - mean)``. One Arrow matmul pass; ``mean`` and
    ``components`` ship in the closure (k·d floats)."""
    import numpy as np

    mu = np.asarray(mean, dtype=np.float64)
    comp = np.asarray(components, dtype=np.float64)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            p = (x - mu) @ comp.T
            yield pd.DataFrame({id_col: pdf[id_col], out_col: [row.tolist() for row in p]})

    return df.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} bigint, {out_col} array<double>"
    )
