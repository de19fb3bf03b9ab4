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
