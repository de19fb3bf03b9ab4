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
