"""Datapipe batch 2: corpus vocabulary stats, TF-IDF, dedup survivors,
IVF-style ANN — completing the training-data operator inventory."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources.files import load_table
from .base import query


@query(
    "text_vocab_topk",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS token FROM documents
    ), counts AS (
      SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
    ), ranked AS (
      SELECT token, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rn
      FROM counts
    )
    SELECT token, freq, CAST(rn AS BIGINT) AS rank FROM ranked WHERE rn <= 50
    """,
    tags=("text",),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by frequency (explode -> two-phase
    count -> global top-k; the rank tie-breaks on the token for
    determinism).

    The top-k is `orderBy().limit(50)` — TakeOrderedAndProject, per-
    partition heaps, never a global sort — and the rank window runs OVER
    THE 50 SURVIVORS only. Ranking the full vocab table through an
    unpartitioned window first (the previous shape) would sort 1e8+ rows
    on a single partition at 100 TB (r14 verdict item 4; the scale-safe
    idiom of `z_sketch_cms_tokens` / `z_stream_kmv_distinct`)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.trim("text"), " +")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        counts.orderBy(F.col("freq").desc(), "token")
        .limit(50)
        .withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.col("freq").desc(), F.col("token")))
            .cast("bigint"),
        )
    )


@query(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token,
           CAST(tf AS BIGINT) AS tf,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE tf >= 5
    """,
    tags=("text",),
    bench=True,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, token), tf >= 5: classic two-aggregate + broadcast
    join shape; document frequency is the smaller side and broadcasts. The
    corpus size joins in as a broadcast 1-row aggregate (like the oracle's
    scalar subquery) — no separate driver-side count job."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tok = d.select("doc_id", F.explode(F.split(F.trim("text"), " +")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.join(F.broadcast(df), "token")
        .where(F.col("tf") >= 5)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@query(
    "dedup_survivors",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w FROM documents
    ), s AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(w) - 1),
                                          i -> array_to_string(w[i:i+2], ' '))) AS sh
      FROM d
    ), x AS (SELECT doc_id, lang, unnest(sh) AS g FROM s),
    pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
      FROM x a JOIN x b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, len(sh) AS n FROM s),
    losers AS (
      SELECT DISTINCT id2 FROM pairs
      JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
      WHERE round(common / (s1.n + s2.n - common), 6) >= 0.5
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (SELECT id2 FROM losers)
    """,
    tags=("dedup",),
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: corpus minus the higher id of every near-dup pair
    (greedy keep-lowest survivor policy, deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.5)
    return D.survivors(docs, pairs).select("doc_id", "lang", "source")


#: Recursive-CTE transitive closure over the trigram-Jaccard near-dup graph
#: (the DuckDB list slice ``w[i:i+2]`` below is END-INCLUSIVE — 3 tokens —
#: matching the Spark side's ``ngram_jaccard_pairs(n=3)``; do not "fix" it
#: to Python slice semantics)
#: (components + sizes) — shared by the dedup_components and
#: z_dedup_quality_survivor oracles.
COMPONENT_CTES = """
    WITH RECURSIVE d AS (
      SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w FROM documents
    ), s AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(w) - 1),
                                          i -> array_to_string(w[i:i+2], ' '))) AS sh
      FROM d
    ), x AS (SELECT doc_id, lang, unnest(sh) AS g FROM s),
    p AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
      FROM x a JOIN x b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, len(sh) AS n FROM s),
    pairs AS (
      SELECT id1, id2 FROM p
      JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
      WHERE round(common / (s1.n + s2.n - common), 6) >= 0.5
    ),
    edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
              UNION ALL SELECT id2, id1 FROM pairs),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
    sz AS (SELECT component, COUNT(*) AS component_size FROM comp GROUP BY component)
"""


@query(
    "dedup_components",
    oracle=f"""
    {COMPONENT_CTES}
    SELECT doc_id, component, component_size FROM comp JOIN sz USING (component)
    """,
    tags=("dedup", "iterative"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the near-dup pair graph: iterative min-label
    propagation (join-agg rounds, lineage checkpointed per round) vs the
    oracle's recursive-CTE transitive closure. Every document appears —
    singletons are their own component."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.5)
    return D.connected_components(docs, pairs)


@query(
    "text_train_val_split",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                       % 100 < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT doc_id, lang, split FROM tagged
    """,
    tags=("text", "split"),
)
def text_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val assignment per doc_id: hash-stable
    across engines, reruns, and repartitions (the reproducibility property
    a training pipeline needs — no rand(), no order dependence)."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", T.train_val_split("doc_id").alias("split"))


@query(
    "emb_vector_stats",
    oracle="""
    WITH u AS (
      SELECT vec_id, label, unnest(embedding) AS x FROM embeddings
    ), norms AS (
      SELECT vec_id, label,
             round(sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 9) AS nrm
      FROM u GROUP BY 1, 2
    )
    SELECT label, COUNT(*) AS n_vectors,
           round(SUM(nrm) / COUNT(*), 6) AS avg_norm,
           round(MIN(nrm), 6) AS min_norm,
           round(MAX(nrm), 6) AS max_norm
    FROM norms GROUP BY label
    """,
    tags=("similarity", "stats"),
)
def emb_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics (array analytics surface).

    Norms round to 9dp before averaging so the per-vector reordering error
    (~1e-15) can't leak through the sum of thousands of norms into the
    6dp-rounded average.
    """
    from ..functions import vectors as V

    e = load_table(spark, sf_dir, "embeddings")
    norms = e.select(
        "label", F.round(F.sqrt(V.norm_sq("embedding")), 9).alias("nrm")
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.sum("nrm") / F.count(F.lit(1)), 6).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


#: Shared by `sim_ivf_topk` and `sim_ivf_saved_index`: saving + loading
#: the codebook must change NOTHING about the probe's results, so both
#: queries verify against this identical SQL.
_IVF_ORACLE = """
    WITH cb AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS w
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    e AS (SELECT vec_id, embedding FROM embeddings),
    u AS (SELECT e.vec_id, cb.cell, unnest(e.embedding) AS x, unnest(cb.w) AS y
          FROM e, cb),
    dots AS (SELECT vec_id, cell, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS d
             FROM u GROUP BY 1, 2),
    corpus_cells AS (
      SELECT vec_id AS neighbor_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rn
        FROM dots
      ) WHERE rn = 1
    ),
    query_cells AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rn
        FROM dots WHERE vec_id < 8
      ) WHERE rn <= 4
    ),
    cand AS (SELECT DISTINCT query_id, neighbor_id
             FROM corpus_cells JOIN query_cells USING (cell)
             WHERE neighbor_id <> query_id),
    j AS (SELECT query_id, neighbor_id, eq.embedding AS qv, ec.embedding AS cv
          FROM cand JOIN e eq ON query_id = eq.vec_id
                    JOIN e ec ON neighbor_id = ec.vec_id),
    u2 AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y FROM j),
    p2 AS (SELECT query_id, neighbor_id,
                  SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                  SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                  SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           FROM u2 GROUP BY 1, 2),
    r AS (SELECT query_id, neighbor_id, round(dot / sqrt(na * nb), 6) AS sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY round(dot / sqrt(na * nb), 6) DESC,
                                             neighbor_id) AS rn
          FROM p2)
    SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 5
    """


@query(
    "sim_ivf_topk",
    oracle=_IVF_ORACLE,
    tags=("similarity", "sketch"),
    bench=True,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize vectors to the nearest of K fixed
    centroids (deterministic: the first K corpus vectors by id), search only
    the query's nearest `n_probe` cells, exact re-rank inside.

    VALUE-EXACT despite being an approximate index (round 8): with
    ``train_iters=0`` the codebook is the first-16-by-id corpus vectors —
    a shared deterministic constant — so cell assignment (argmax dot,
    ties to the lowest cell), the probed candidate set, and the re-ranked
    top-5 are all reproduced by the DuckDB oracle. Recall vs brute force
    is additionally asserted in tests."""
    from ..operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.where(F.col("vec_id") < 8), k=5, n_cells=16, n_probe=4)


def ivf_codebook_cached(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """The registered fixed IVF-16 codebook (`ivf_train_or_init` with
    ``train_iters=0`` — the deterministic first-16-by-id init the
    `_IVF_ORACLE` reproduces), trained once per (input, engine version)
    and persisted via the atomic artifact cache; every saved-index /
    incremental query LOADS it instead of re-deriving it. Cache key =
    input identity + engine source hash (a codebook trained by older code
    never satisfies newer code); publish is atomic-rename."""
    import os

    from ..cache import artifact_path, ensure_artifact
    from ..operators.similarity import (
        ann_index_load,
        ann_index_save,
        ivf_train_or_init,
    )

    e = load_table(spark, sf_dir, "embeddings")
    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    path = ensure_artifact(
        artifact_path("ivfidx", f"{src}:{st.st_size}:{st.st_mtime_ns}:ivf16"),
        lambda tmp: ann_index_save(
            spark, tmp, ivf_train_or_init(e, "embedding", "vec_id", 16, 0)
        ),
    )
    return ann_index_load(spark, path)


@query(
    "sim_ivf_saved_index",
    oracle=_IVF_ORACLE,
    tags=("similarity", "sketch"),
    bench=True,
)
def sim_ivf_saved_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against a PERSISTED index — the production ANN operating
    mode at 100 TB: the coarse quantizer is trained once, written as a
    codebook-sized parquet next to the corpus
    (operators/similarity.py::ann_index_save), and every ingest
    assignment or query batch LOADS it (`ann_index_load` ->
    ``ivf_topk(codebook=...)``) instead of re-deriving it — index build
    is never an implicit side effect of a query. Save -> load -> probe
    must reproduce `sim_ivf_topk` exactly, so this query shares its
    VALUE-EXACT oracle verbatim."""
    from ..operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    codebook = ivf_codebook_cached(spark, sf_dir)
    return ivf_topk(
        e, e.where(F.col("vec_id") < 8), k=5, n_probe=4, codebook=codebook
    )


@query(
    "text_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 1000
          < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 250
                      WHEN 'fr' THEN 500 ELSE 1000 END
    """,
    tags=("text", "split"),
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling: hash-bucket the key into
    1000 cells, keep a per-language per-mille rate (rebalancing a skewed
    corpus). Reproducible across engines, reruns, and partitionings — the
    property `sample()`/rand() cannot give a training pipeline."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 100)
        .when(F.col("lang") == "de", 250)
        .when(F.col("lang") == "fr", 500)
        .otherwise(1000)
    )
    return d.where(T.split_bucket("doc_id", 1000) < rate).select("doc_id", "lang")


@query(
    "text_pack_sequences",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 8 AS BIGINT) AS shard
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens, shard,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS bin_offset
      FROM d
    )
    SELECT doc_id, lang, n_tokens, shard, bin_offset,
           CAST(bin_offset // 512 AS BIGINT) AS bin
    FROM packed
    """,
    tags=("text", "packing"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents assigned to 512-token bins
    within 8 hash shards (`operators/packing.py::pack_sequences` — one
    window aggregate, shard-parallel, deterministic across engines and
    repartitionings)."""
    from ..operators.packing import pack_sequences
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.n_tokens("text").alias("n_tokens")
    )
    return pack_sequences(
        d, token_col="n_tokens", order_col="doc_id", budget=512, n_shards=8
    ).select("doc_id", "lang", "n_tokens", "shard", "bin_offset", "bin")
