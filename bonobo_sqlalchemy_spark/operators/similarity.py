"""Similarity search over embedding columns (SURVEY §2.4).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; one pass, no shuffle of the corpus, top-k
  per query via ROW_NUMBER. The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH buckets: corpus and queries get
  a sign-bit signature; candidates = same bucket (optionally multi-probe by
  shorter prefixes); exact cosine re-rank within candidates. The scale path:
  bucket join replaces the cross product.

Ranking determinism: rank on the *rounded* cosine with the neighbor id as
tie-break, so results are reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        V.cosine_rounded_arrow()("qv", "cv").alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def kmeans_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 3,
) -> list[list[float]]:
    """Distributed spherical k-means codebook for IVF coarse quantization.

    Deterministic init (first *k* corpus vectors by id), then Lloyd
    iterations where every step is distributed: assignment is one fused
    Arrow matmul per batch against the broadcast codebook
    (`matrix_dots` + argmax — spherical: nearest by dot product, matching
    the cosine retrieval metric), the centroid update is a
    (cell, dimension) hash aggregate. ONLY k x dim floats ever reach the
    driver — per iteration, one k·dim-row aggregate result; the corpus
    never moves. Empty cells keep their previous centroid.
    """
    def _unit(vec: list[float]) -> list[float]:
        import math

        n = math.sqrt(sum(x * x for x in vec))
        return [x / n for x in vec] if n > 1e-12 else vec

    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    # Spherical k-means: centroids live on the unit sphere — both the init
    # and every Lloyd update are L2-normalized. Unnormalized means of
    # spread-out members shrink toward zero and deflate the dot-product
    # assignment (the objective would DROP with training).
    codebook = [_unit([float(x) for x in row[0]]) for row in init]
    for _ in range(max(0, iters)):
        dots = V.matrix_dots(corpus, vec_col, id_col, codebook, out_id="_cid")
        assigned = (
            corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_v"))
            .join(
                dots.select(
                    "_cid",
                    F.expr(
                        "array_position(dots, array_max(dots))"
                    ).cast("int").alias("_cell"),
                ),
                "_cid",
            )
        )
        # mean per (cell, dim): one shuffle keyed (cell, pos) — k*dim groups
        sums = (
            assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .collect()
        )
        new_book = [list(c) for c in codebook]  # empty cells keep centroids
        by_cell: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault(r._cell - 1, {})[r._pos] = r._m
        for cell, dims in by_cell.items():
            for pos, m in dims.items():
                new_book[cell][pos] = m
            new_book[cell] = _unit(new_book[cell])
        codebook = new_book
    return codebook


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-style ANN: coarse quantization + probed exact re-rank.

    Cells are defined by K centroids: deterministic first-K corpus vectors
    when ``train_iters=0`` (reproducible, oracle-stable), or a spherical
    k-means codebook (`kmeans_codebook`, ``train_iters`` Lloyd rounds) for
    better-balanced cells / higher recall per probe. Assignment scores
    every vector against the codebook in one fused Arrow/numpy matmul per
    batch (`functions.vectors.matrix_dots` — see that module for why this
    beats the explode+join+agg codegen form); each query probes its
    ``n_probe`` nearest cells and re-ranks exactly inside them. The corpus
    never cross-joins the queries — candidate count is ~n_probe/n_cells of
    the corpus per query.
    """
    if train_iters > 0:
        codebook = kmeans_codebook(
            corpus, vec_col, id_col, k=n_cells, iters=train_iters
        )
    else:
        cents = (
            corpus.orderBy(id_col).limit(n_cells).select(vec_col).collect()
        )  # K small vectors on the driver: the broadcast codebook
        codebook = [[float(x) for x in row[0]] for row in cents]

    def cell_dots(df: DataFrame, out_id: str) -> DataFrame:
        return V.matrix_dots(df, vec_col, id_col, codebook, out_id=out_id).select(
            out_id, F.posexplode("dots").alias("cell", "dot")
        )

    w_assign = W.partitionBy("cid").orderBy(F.col("dot").desc(), F.col("cell"))
    corpus_cells = (
        cell_dots(corpus, "cid")
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select(F.col("cid").alias("neighbor_id"), "cell")
    )
    w_probe = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("cell"))
    query_cells = (
        cell_dots(queries, "qid")
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select(F.col("qid").alias("query_id"), "cell")
    )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cand = (
        corpus_cells.join(F.broadcast(query_cells), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", V.cosine_rounded_arrow()("qv", "cv").alias("sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits_per_table: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + exact re-rank.

    Standard (b, L)-LSH: ``n_tables`` independent ``bits_per_table``-bit
    sign signatures; a corpus vector is a candidate if it matches the query
    in ANY table. Per-table keys go through one explode + bucket join (the
    scale path — the cross product never materializes); candidates are
    deduped then exactly re-ranked. Recall/candidate-fraction tradeoff is
    tunable: for weakly clustered data (near-uniform directions) use more
    tables, not more bits. Deterministic planes from a seeded LCG.
    """
    planes = V.seeded_planes(bits_per_table * n_tables, dim, seed)
    # Signatures via the Arrow matmul path (functions/vectors.py), with
    # per-table bucket keys packed as longs in the same numpy batch (no
    # bit-string materialization or substring slicing; see
    # `hyperplane_table_keys`). Keys are materialized as plain columns on
    # BOTH sides before the join — a key expression mixing the two sides'
    # columns is not an equi-condition to Catalyst and degrades the join
    # to BroadcastNestedLoopJoin (the plan gate caught exactly this).
    # Exploding per table multiplies the broadcast-tiny query side too,
    # which keeps the join a pure (tidx, key) equi-join.
    ct = V.hyperplane_table_keys(
        corpus, vec_col, id_col, planes, bits_per_table, out_id="neighbor_id"
    ).select("neighbor_id", F.posexplode("tkeys").alias("tidx", "ckey"))
    qt = V.hyperplane_table_keys(
        queries, vec_col, id_col, planes, bits_per_table, out_id="query_id"
    ).select("query_id", F.posexplode("tkeys").alias("qtidx", "qkey"))
    # A pair sharing k tables surfaces k times; dedup the slim candidate
    # stream before the vector-fetch joins + Arrow re-rank (bounded by the
    # candidate set size — the expensive stage comes after).
    cand = (
        ct.join(
            F.broadcast(qt),
            (F.col("tidx") == F.col("qtidx"))
            & (F.col("ckey") == F.col("qkey"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", V.cosine_rounded_arrow()("qv", "cv").alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
