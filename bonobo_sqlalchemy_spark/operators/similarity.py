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
        V.cosine_rounded("qv", "cv").alias("sim"),
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
    tables = [planes[t * bits_per_table : (t + 1) * bits_per_table] for t in range(n_tables)]

    def keys(col):
        return F.array(
            *[
                F.concat_ws(":", F.lit(str(t)), V.hyperplane_signature(col, tbl))
                for t, tbl in enumerate(tables)
            ]
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(keys(F.col(vec_col))).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(keys(F.col(vec_col))).alias("bucket"),
    )
    cand = (
        c.join(
            F.broadcast(q),
            (q.bucket == c.bucket) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", V.cosine_rounded("qv", "cv").alias("sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
