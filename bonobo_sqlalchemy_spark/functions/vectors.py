"""Vector column functions over ``array<float>`` embeddings (SURVEY §2.4).

Built-in higher-order functions only (``zip_with`` / ``aggregate``) — the
dot products run inside codegen, no Python boundary. Elements are cast to
double *before* multiplying so the per-term products are bit-identical to
any engine doing the same (float->double cast is exact); only the summation
order differs across engines, which is why consumers round to 6 decimals
(reordering error ~1e-15 on unit-scale 64-dim vectors).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: str | Column, b: str | Column) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm_sq(a: str | Column) -> Column:
    return dot(a, a)


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def cosine_rounded(a: str | Column, b: str | Column, digits: int = 6) -> Column:
    """Cross-engine-stable cosine (see module docstring)."""
    return F.round(cosine(a, b), digits)


def hyperplane_signature(a: str | Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a string key. ``planes`` is a deterministic (seeded) driver-side list —
    broadcast as literals into the plan, no state on executors."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    _c(a),
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def seeded_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure python LCG — no numpy
    RNG state, reproducible across platforms)."""
    state = seed & 0x7FFFFFFF or 1
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(state / float(1 << 31) - 0.5)
        planes.append(row)
    return planes
