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


def hyperplane_buckets(
    df,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    bits_per_table: int,
    extra_cols: tuple[str, ...] = (),
    out_id: str = "id",
):
    """Exploded ``(out_id, *extra_cols, bucket)`` rows: one multi-table
    hyperplane-LSH bucket key per table per vector — fully codegen.

    The per-row column form (`hyperplane_signature`) runs its
    ``zip_with``/``aggregate`` lambdas interpreted, which dominates wall
    time at corpus scale (~64 planes x 64 dims per row). Here the dot
    products become one posexplode + broadcast join against a
    (dim x n_planes) weight table + ``n_planes`` SUM aggregates — the same
    whole-stage-codegen shape as the MinHash signature agg — with one
    shuffle on the vector id. Sign bits then concatenate into per-table
    bucket strings in a plain projection.

    Bit values match `hyperplane_signature` up to floating-point summation
    order (hash-agg partials vs sequential fold): a sign can differ only
    when a dot product sits within reordering error (~1e-13) of zero.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    n_planes = len(planes)
    dim = len(planes[0])
    n_tables = n_planes // bits_per_table
    spark = df.sparkSession
    rows = [
        (pos, *[float(planes[j][pos]) for j in range(n_planes)])
        for pos in range(dim)
    ]
    schema = "pos int, " + ", ".join(f"w{j} double" for j in range(n_planes))
    wdf = spark.createDataFrame(rows, schema)
    comp = df.select(
        F.col(id_col).alias(out_id),
        *[F.col(c) for c in extra_cols],
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    dots = comp.join(F.broadcast(wdf), "pos").groupBy(out_id, *extra_cols).agg(
        *[
            F.sum(F.col("x").cast("double") * F.col(f"w{j}")).alias(f"d{j}")
            for j in range(n_planes)
        ]
    )
    keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(t)),
                F.concat(
                    *[
                        F.when(
                            F.col(f"d{t * bits_per_table + b}") >= 0, F.lit("1")
                        ).otherwise(F.lit("0"))
                        for b in range(bits_per_table)
                    ]
                ),
            )
            for t in range(n_tables)
        ]
    )
    return dots.select(out_id, *extra_cols, F.explode(keys).alias("bucket"))


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
