"""Round-8 additions, part 2: membership / LM-fluency / corpus-overlap.

- Bloom-filter membership screen (`operators/dedup.py::bloom_build/
  bloom_probe`) — the zero-shuffle scale path for "is this document in a
  reference set?" (benchmark decontamination, previously-ingested-snapshot
  dedup). Composed here as the production prefilter-then-confirm shape.
- Interpolated bigram LM fluency scoring
  (`operators/quality.py::bigram_interpolated_logprob`) — the CCNet-class
  (Wenzek et al. 2019) perplexity-style filter signal, one order above the
  unigram scorer.
- Pairwise source-overlap estimation via K-Minimum-Values sketches
  (`operators/profile.py::source_overlap_kmv`; Beyer et al. 2007) —
  cross-snapshot n-gram-space overlap without any cross-corpus join.

Reference scope note: none of these exist in the reference engine
(bonobo-sqlalchemy, readers/writers over SQLAlchemy rows); all belong to
the driver-mandated training-data extension surface (SURVEY §2.4). All
three queries are VALUE-EXACT: every hash is md5 (engine-portable), bloom
bit positions are integer arithmetic on md5 prefixes, sketch membership is
total-ordered by hash string, and the two floating-point outputs (mean
log2 prob, Jaccard estimate) follow the determinism policy (round 1e-6,
far above float-reorder noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import bloom_build, bloom_probe
from ..operators.profile import source_overlap_kmv
from ..operators.quality import bigram_interpolated_logprob
from ..sources.files import load_table
from .base import query

_BLOOM_M = 1 << 16
_BLOOM_K = 4

# DuckDB twin of operators/dedup.py::_bloom_positions: j in 0..3,
# position_j = int(first 8 hex of md5(j || '|' || key)) mod m.
_BLOOM_POS_SQL = (
    "CAST(('0x' || substr(md5(j.jj || '|' || {key}), 1, 8)) AS BIGINT) % 65536"
)


@query(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH j AS (SELECT unnest(['0','1','2','3']) AS jj),
    refs AS (SELECT DISTINCT md5(text) AS h FROM documents
             WHERE source = 'src1'),
    bpos AS (SELECT DISTINCT {_BLOOM_POS_SQL.format(key='refs.h')} AS pos
             FROM refs, j),
    probe AS (SELECT doc_id, md5(text) AS h FROM documents),
    pp AS (SELECT probe.doc_id,
                  bool_and({_BLOOM_POS_SQL.format(key='probe.h')}
                           IN (SELECT pos FROM bpos)) AS bloom_hit
           FROM probe, j GROUP BY 1)
    SELECT p.doc_id, pp.bloom_hit,
           p.h IN (SELECT h FROM refs) AS exact_hit
    FROM probe p JOIN pp USING (doc_id)
    """,
    tags=("dedup", "membership"),
    bench=True,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-set membership screen, Bloom-prefiltered: build a 2^16-bit
    k=4 Bloom filter over the `src1` snapshot's document fingerprints, then
    screen the WHOLE corpus against it map-side — ``(doc_id, bloom_hit,
    exact_hit)``. ``bloom_hit=false`` is a certainty (the doc is new);
    hits are confirmed exactly, so the pair of columns also exhibits the
    filter's false-positive behavior under the driver's value check.

    This is the decontamination / already-ingested screen at 100 TB: the
    filter is O(m) regardless of corpus size and rides a broadcast — the
    probed corpus never shuffles (an anti-join would shuffle all of it).
    The exact-confirm join is corpus-vs-reference, acceptable here because
    the reference side is snapshot-sized; production keeps only the
    bloom-hit subset for the confirm, which this query's composition
    mirrors semantically (confirm of a non-hit is constant false).
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", F.md5("text").alias("h"))
    ref = keyed.join(
        docs.where(F.col("source") == "src1").select("doc_id"), "doc_id", "left_semi"
    ).select("h").distinct()
    bloom = bloom_build(ref, "h", m_bits=_BLOOM_M, k=_BLOOM_K)
    probed = bloom_probe(keyed, bloom, "h", m_bits=_BLOOM_M, k=_BLOOM_K)
    exact = ref.withColumn("exact_hit", F.lit(True))
    return (
        probed.join(exact, "h", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_bloom_merge",
    oracle=f"""
    WITH j AS (SELECT unnest(['0','1','2','3']) AS jj),
    refs AS (SELECT DISTINCT md5(text) AS h FROM documents
             WHERE source IN ('src1', 'src2')),
    bpos AS (SELECT DISTINCT {_BLOOM_POS_SQL.format(key='refs.h')} AS pos
             FROM refs, j),
    probe AS (SELECT doc_id, md5(text) AS h FROM documents),
    pp AS (SELECT probe.doc_id,
                  bool_and({_BLOOM_POS_SQL.format(key='probe.h')}
                           IN (SELECT pos FROM bpos)) AS bloom_hit
           FROM probe, j GROUP BY 1)
    SELECT p.doc_id, pp.bloom_hit,
           p.h IN (SELECT h FROM refs) AS exact_hit
    FROM probe p JOIN pp USING (doc_id)
    """,
    tags=("dedup", "membership"),
    bench=True,
)
def dedup_bloom_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest membership screen via Bloom MERGE: the `src1`
    and `src2` snapshots each build their OWN 2^16-bit k=4 filter from
    only their own fingerprints; `bloom_merge` ORs the word maps into the
    accumulated "everything previously ingested" filter, and the whole
    corpus probes against the merged filter map-side — ``(doc_id,
    bloom_hit, exact_hit)``.

    This is the cost profile incremental ingest runs at 100 TB: each new
    crawl builds a filter from its OWN keys only (never re-scanning
    history), and the accumulated filter is a constant-size word-map OR.
    The oracle exploits exact mergeability — probe(merge(A, B)) ≡
    probe(build(A ∪ B)) bit-for-bit — so the merged filter's every probe
    bit, false positives included, reproduces from the unioned reference
    in SQL. VALUE-EXACT. The shared explicit (m_bits, k) across snapshots
    is the `bloom_merge` sizing contract; the mismatch path raises and is
    tested in tests/test_membership.py."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", "source", F.md5("text").alias("h"))
    snaps = [
        bloom_build(
            keyed.where(F.col("source") == s).select("h").distinct(),
            "h",
            m_bits=_BLOOM_M,
            k=_BLOOM_K,
        )
        for s in ("src1", "src2")
    ]
    from ..operators.dedup import bloom_merge

    merged = bloom_merge(*snaps)
    probed = bloom_probe(
        keyed.select("doc_id", "h"), merged, "h", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    exact = (
        keyed.where(F.col("source").isin("src1", "src2"))
        .select("h")
        .distinct()
        .withColumn("exact_hit", F.lit(True))
    )
    return (
        probed.join(exact, "h", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_bigram_logprob",
    oracle="""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
               FROM documents),
    tok AS (SELECT doc_id, ws[t.i] AS tk, ws[t.i + 1] AS nxt
            FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t),
    uni AS (SELECT tk, COUNT(*) AS c1 FROM tok GROUP BY 1),
    n AS (SELECT SUM(c1) AS n_total FROM uni),
    bi AS (SELECT tk, nxt, COUNT(*) AS c2 FROM tok
           WHERE nxt IS NOT NULL GROUP BY 1, 2),
    sc AS (SELECT t.doc_id,
                  0.75 * bi.c2 / u1.c1 + 0.25 * u2.c1 / n.n_total AS p
           FROM tok t
           JOIN bi ON t.tk = bi.tk AND t.nxt = bi.nxt
           JOIN uni u1 ON u1.tk = t.tk
           JOIN uni u2 ON u2.tk = t.nxt, n
           WHERE t.nxt IS NOT NULL)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
           ROUND(SUM(LOG2(p)) / COUNT(*), 6) AS avg_log2p
    FROM sc GROUP BY 1
    """,
    tags=("text", "quality"),
    bench=True,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM fluency per document (CCNet-class signal):
    mean log2 of ``0.75·c(prev,w)/c(prev) + 0.25·c(w)/N`` over every
    token with a predecessor — garbage word ORDER now scores low even
    when every individual token is common, which the unigram score
    (`z_text_unigram_logprob`) cannot see.

    Scale: vocabulary-sized count tables (map-side partial agg); the token
    stream shuffles on gram keys for its three count lookups (AQE bounds
    hot tokens) and on doc id for the mean; N rides as a 1-row broadcast
    (documented scalar-subquery shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_interpolated_logprob(docs, lam=0.75).orderBy("doc_id")


@query(
    "profile_source_overlap",
    oracle="""
    WITH w AS (SELECT source AS g, string_split_regex(trim(text), ' +') AS ws
               FROM documents),
    sz AS (SELECT g, ws, len(ws) AS n FROM w),
    fp AS (SELECT DISTINCT g,
                  md5(array_to_string(ws[t.i + 1 : t.i + 5], ' ')) AS h
           FROM sz, LATERAL (SELECT unnest(range(0, n - 4)) AS i) t
           WHERE n >= 5),
    sk AS (SELECT g, h FROM (
             SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
             FROM fp)
           WHERE rn <= 64),
    gs AS (SELECT DISTINCT g FROM fp),
    pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g),
    u AS (SELECT x.ga, x.gb, x.h,
                 COUNT(DISTINCT x.side) = 2 AS in_both
          FROM (
            SELECT p.ga, p.gb, s.h, 'a' AS side FROM pairs p
            JOIN sk s ON s.g = p.ga
            UNION ALL
            SELECT p.ga, p.gb, s.h, 'b' AS side FROM pairs p
            JOIN sk s ON s.g = p.gb
          ) x GROUP BY 1, 2, 3),
    km AS (SELECT ga, gb, h, in_both,
                  ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
           FROM u)
    SELECT ga AS group_a, gb AS group_b,
           CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(SUM(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(SUM(CASE WHEN in_both THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS jaccard_est
    FROM km WHERE rn <= 64 GROUP BY 1, 2
    """,
    tags=("profile", "dedup"),
)
def profile_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise n-gram-space overlap between sources via KMV sketches:
    each source is sketched by the 64 smallest md5 fingerprints of its
    distinct 5-gram shingles; each source pair reports the estimated
    Jaccard overlap of their shingle sets — the cross-snapshot "how much
    of B is already in A" diagnostic that decides whether a new crawl is
    worth ingesting, computed WITHOUT any corpus-vs-corpus join.

    Scale: one exploded-shingle distinct (data-sized, one shuffle), then
    the per-source bottom-64 runs as a rank-limit window (Partial
    WindowGroupLimit below the exchange — each input partition forwards at
    most 64 rows per source; plan-gated in tests/test_plans.py). All
    pairwise work is sketch-sized: sources² × 64 rows. The source-pair
    expansion crosses the GROUP LIST with itself (sources², never
    data-sized — documented in NO_CARTESIAN_EXEMPT)."""
    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select(
        "source",
        F.split(F.trim("text"), " +").alias("ws"),
    ).withColumn("n", F.size("ws"))
    grams = shingled.where(F.col("n") >= 5).select(
        "source",
        F.explode(F.sequence(F.lit(0), F.col("n") - F.lit(5))).alias("i"),
        "ws",
    ).select(
        "source",
        F.concat_ws(" ", F.slice("ws", F.col("i") + 1, 5)).alias("gram"),
    )
    return source_overlap_kmv(
        grams, group_col="source", text_col="gram", k=64
    ).orderBy("group_a", "group_b")


@query(
    "search_hybrid_rrf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS t
      FROM documents
    ), tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok2
           WHERE t IN ('spark', 'sort', 'window') GROUP BY doc_id, t),
    dft AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    bm AS (
      SELECT tf.doc_id, round(SUM(
          ln(1.0 + ((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5))
          * tf * (1.2 + 1)
          / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (SELECT avgdl FROM stats)))
        ), 6) AS bm25
      FROM tf JOIN dft USING (t) JOIN dl USING (doc_id) GROUP BY tf.doc_id
    ),
    bmr AS (SELECT doc_id, r_lex FROM (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
              FROM bm) WHERE r_lex <= 50),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    u AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qv) AS y
          FROM embeddings e, q WHERE e.vec_id <> 0),
    p AS (SELECT vec_id,
                 SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                 SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
                 SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
          FROM u GROUP BY 1),
    vr AS (SELECT doc_id, r_vec FROM (
             SELECT vec_id AS doc_id,
                    ROW_NUMBER() OVER (
                      ORDER BY round(dot / sqrt(nx * ny), 6) DESC, vec_id
                    ) AS r_vec
             FROM p) WHERE r_vec <= 50),
    f AS (SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
                 round(COALESCE(1.0 / (60 + b.r_lex), 0)
                       + COALESCE(1.0 / (60 + v.r_vec), 0), 6) AS rrf_score,
                 CAST(b.r_lex AS BIGINT) AS bm25_rank,
                 CAST(v.r_vec AS BIGINT) AS cos_rank
          FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id)
    SELECT doc_id, rrf_score, bm25_rank, cos_rank
    FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20
    """,
    tags=("retrieval", "similarity"),
    bench=True,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal rank: BM25
    top-50 for the bag-of-terms query {spark, sort, window} and exact
    cosine top-50 around the vec_id=0 query vector, combined by
    ``Σ 1/(60+rank)`` (`operators/selection.py::rrf_fuse`) into the final
    top-20 — the standard two-tower corpus-search shape (targeted corpus
    mining, contamination triage, eval-set retrieval).

    Scale: each leg is independently bounded BEFORE fusion — BM25's token
    stream is filtered to the broadcast term list ahead of any shuffle and
    its top-50 is a TakeOrdered; the vector leg here is the brute-force
    exact baseline (one corpus pass behind a 1-row broadcast query vector)
    and swaps for `ivf_topk`/`lsh_topk` at 100 TB under the same
    ``(id, rank)`` candidate contract. Fusion then touches only the ≤100
    candidate rows, so every fusion join broadcasts. The 1-row corpus-stats
    and query-vector broadcasts are the documented scalar-subquery shapes
    (tests/test_plans.py NO_CARTESIAN_EXEMPT)."""
    from pyspark.sql import Window as W

    from ..operators import similarity as S
    from ..operators.scale import single_partition_key
    from ..operators.selection import bm25_topk, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["spark", "sort", "window"], k=50).withColumn(
        "rank",
        F.row_number().over(
            # bounded input by construction: bm25_topk LIMITs to 50 rows
            W.partitionBy(single_partition_key()).orderBy(
                F.col("bm25").desc(), "doc_id"
            )
        ),
    )
    vec = S.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=50).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(
        {"bm25": lex.select("doc_id", "rank"), "cos": vec}, k0=60, k=20
    )


def _leakproof_oracle() -> str:
    from .datapipe2 import COMPONENT_CTES

    return f"""
    {COMPONENT_CTES}
    SELECT doc_id, component,
           CASE WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 4))
                     AS INT) % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM comp
    """


@query(
    "text_split_leakproof",
    oracle=_leakproof_oracle(),
    tags=("text", "split", "dedup"),
)
def text_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free 90/10 train/val split: assignment is by NEAR-DUP
    CLUSTER (trigram-Jaccard >= 0.5 connected components), so a val
    document can never have a train twin — the eval-contamination failure
    Lee et al. 2022 measure in C4/RealNews, engineered out by construction
    (contrast `text_train_val_split`, the per-document hash split, which
    strands ~10%% of every cluster across the boundary).

    Oracle: the dedup_components recursive-closure CTEs plus the shared
    md5-bucket split rule on the component label. Scale: the components
    computation itself (iterative min-label propagation, checkpointed per
    round) plus one md5 per row — no additional shuffle."""
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.5)
    return D.group_disjoint_split(docs, pairs)


@query("text_compression_ratio", oracle=None, tags=("text", "quality"))
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio redundancy screen per document
    (`operators/quality.py::compression_ratio`): band-passing on this
    ratio drops templated/repetitive boilerplate (high ratio) and binary
    junk (ratio ~1) in one signal — long-range repetition the fixed-window
    duplicate-bigram gate cannot see. Rows-only by structural necessity
    (no oracle engine ships zlib); value-level checks are the pytest
    equality-vs-python-zlib, null/empty, and partitioning-invariance
    tests in tests/test_membership.py."""
    from ..operators.quality import compression_ratio

    docs = load_table(spark, sf_dir, "documents")
    return compression_ratio(docs).orderBy("doc_id")
