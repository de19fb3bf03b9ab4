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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse quantization + probed exact re-rank.

    Cells are defined by K fixed centroids (deterministically the first K
    corpus vectors by id — a real deployment would train k-means offline and
    broadcast the codebook the same way). Assignment scores every vector
    against the codebook in one fused Arrow/numpy matmul per batch
    (`functions.vectors.matrix_dots` — see that module for why this beats
    the explode+join+agg codegen form); each query probes its ``n_probe``
    nearest cells and re-ranks exactly inside them. The corpus never
    cross-joins the queries — candidate count is ~n_probe/n_cells of the
    corpus per query.
    """
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
    # Signatures via the Arrow matmul path (functions/vectors.py) — both
    # the per-row lambda form and the explode+join+agg codegen form
    # dominated the corpus pass. The corpus side explodes one row per
    # table; the query side stays ONE row per query (broadcast), its
    # per-table key sliced from the signature inside the join condition.
    qs = V.hyperplane_signature_bits(
        queries, vec_col, id_col, planes, out_id="query_id", out_col="qsig"
    )
    cs = V.hyperplane_signature_bits(
        corpus, vec_col, id_col, planes, out_id="neighbor_id", out_col="csig"
    )
    tidx = F.explode(F.array(*[F.lit(i) for i in range(n_tables)])).alias("tidx")
    # Per-table bucket keys are materialized as plain columns on BOTH sides
    # before the join: an expression like substring(qsig, tidx*b+1, b) mixes
    # columns of the two sides, which Catalyst cannot recognize as an
    # equi-condition — it degrades the join to BroadcastNestedLoopJoin (the
    # plan gate caught exactly this). Exploding the query side per table
    # multiplies only the broadcast-tiny side.
    ct = cs.select("neighbor_id", "csig", tidx).withColumn(
        "ckey",
        F.expr(f"substring(csig, tidx * {bits_per_table} + 1, {bits_per_table})"),
    )
    qt = qs.select("query_id", "qsig", tidx).withColumnRenamed("tidx", "qtidx").withColumn(
        "qkey",
        F.expr(f"substring(qsig, qtidx * {bits_per_table} + 1, {bits_per_table})"),
    )

    def key(col: str, i: int) -> F.Column:
        return F.expr(f"substring({col}, {i * bits_per_table + 1}, {bits_per_table})")

    # Keep a (query, neighbor) pair only at its FIRST agreeing table — a
    # codegen filter over the two signatures instead of a dropDuplicates
    # exchange over the candidate stream.
    first_agree = None
    for i in range(n_tables):
        term = (F.col("tidx") <= F.lit(i)) | (key("csig", i) != key("qsig", i))
        first_agree = term if first_agree is None else (first_agree & term)
    cand = (
        ct.join(
            F.broadcast(qt),
            (F.col("tidx") == F.col("qtidx"))
            & (F.col("ckey") == F.col("qkey"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .where(first_agree)
        .select("query_id", "neighbor_id")
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
