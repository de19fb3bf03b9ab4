"""Round-8 queries.

- Exact substring-duplication spans and their removal
  (`operators/dedup.py::duplicate_span_stats`) — the "exact substring
  deduplication" signal of Lee et al. 2022 (*Deduplicating Training Data
  Makes Language Models Better*), the strongest-known dedup intervention
  for LLM training corpora after document-level dedup.
- The Gopher heuristic quality rule bundle (Rae et al. 2021, Appendix A;
  `operators/quality.py::gopher_rules`).
- Temperature (count^tau) mixture sampling
  (`operators/sampling.py::temperature_mixture_sample`).

Reference scope note: none exist in the reference engine
(bonobo-sqlalchemy); all belong to the driver-mandated training-data
extension surface (SURVEY §2.4). Every query here is VALUE-EXACT: gram
fingerprints and sampling keys are md5 (the MinHash/SimHash
hash-determinism policy), rule metrics are integer counts or single IEEE
divisions, and sqrt-share quotas are correctly rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, Window as W

from ..operators.dedup import duplicate_span_stats
from ..sources.files import load_table
from .base import query

# Shared CTE prefix: per-document token arrays -> 8-gram occurrence table
# -> corpus-duplicated grams -> merged (gaps-and-islands) duplicate spans.
# gram=8 on this small-vocab synthetic corpus plays the role 50-token
# windows do on a real crawl: long enough that only genuine repetition
# collides, short enough that the fixture actually contains collisions.
_SPAN_CTES = """
    w AS (SELECT doc_id AS id, string_split_regex(trim(text), ' +') AS w
          FROM documents),
    sz AS (SELECT id, w, len(w) AS n FROM w),
    occ AS (
      SELECT id, CAST(g.i AS BIGINT) AS pos,
             md5(array_to_string(w[g.i + 1 : g.i + 8], ' ')) AS gh
      FROM sz, LATERAL (SELECT unnest(range(0, n - 7)) AS i) g
      WHERE n >= 8
    ),
    dup AS (SELECT gh FROM occ GROUP BY gh HAVING COUNT(*) >= 2),
    docc AS (SELECT id, pos, pos + 7 AS e FROM occ
             WHERE gh IN (SELECT gh FROM dup)),
    isl AS (SELECT id, pos, e,
                   MAX(e) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_end
            FROM docc),
    isl2 AS (SELECT id, pos, e,
                    CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                         THEN 1 ELSE 0 END AS new_span
             FROM isl),
    isl3 AS (SELECT id, pos, e,
                    SUM(new_span) OVER (PARTITION BY id ORDER BY pos) AS span_id
             FROM isl2),
    spans AS (SELECT id, span_id, MIN(pos) AS s, MAX(e) AS e
              FROM isl3 GROUP BY 1, 2)
"""


@query(
    "dedup_substring_spans",
    oracle="WITH " + _SPAN_CTES + """,
    pd AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
           FROM spans GROUP BY 1)
    SELECT sz.id AS doc_id, CAST(sz.n AS BIGINT) AS n_tokens,
           CAST(COALESCE(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(COALESCE(pd.dup_tokens, 0) / greatest(sz.n, 1), 6) AS dup_ratio
    FROM sz LEFT JOIN pd USING (id)
    """,
    tags=("dedup", "text"),
    bench=True,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication stats per document (Lee et al. 2022):
    8-token windows duplicated anywhere in the corpus mark their tokens,
    overlapping/adjacent windows merge into maximal spans, and each doc
    reports its duplicated-token count and ratio — the threshold signal
    for span-level dedup.

    Scale: ONE hash agg on the gram md5 (map-side partial — a boilerplate
    gram seen 10^9 times is one count row) + ONE semi join back; no
    occurrence-vs-occurrence join exists, so there is no quadratic regime
    and no hot-key cap needed. Span merging windows by doc id only."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_span_stats(docs, gram=8, min_count=2).orderBy("doc_id")


@query(
    "dedup_substring_strip",
    oracle="WITH " + _SPAN_CTES + """,
    cov AS (SELECT DISTINCT id, CAST(c.p AS BIGINT) AS pos
            FROM spans, LATERAL (SELECT unnest(range(s, e + 1)) AS p) c),
    tok AS (SELECT id, CAST(t.i AS BIGINT) - 1 AS pos, w[t.i] AS tk
            FROM sz, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t),
    kept AS (SELECT tok.id, tok.pos, tok.tk
             FROM tok LEFT JOIN cov ON tok.id = cov.id AND tok.pos = cov.pos
             WHERE cov.pos IS NULL)
    SELECT sz.id AS doc_id,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(k.clean_md5, md5('')) AS clean_md5
    FROM sz LEFT JOIN (
      SELECT id, COUNT(*) AS n_kept,
             md5(string_agg(tk, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY id
    ) k USING (id)
    """,
    tags=("dedup", "text"),
)
def dedup_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable twin of `dedup_substring_spans`: REMOVE the
    duplicated spans from each document and fingerprint what remains —
    ``(doc_id, n_kept, clean_md5)``. A fully-duplicated document keeps
    zero tokens (md5 of the empty string), matching the cut a curation
    run would apply before tokenization.

    Scale: covered positions come from exploding the merged spans
    (bounded by document length, never corpus size), then one per-doc
    anti join and one ordered string_agg — every window/agg is keyed by
    doc id."""
    docs = load_table(spark, sf_dir, "documents")
    gram = 8
    w = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.split(F.trim(F.col("text")), " +").alias("w"),
        )
        .withColumn("n", F.size("w"))
        .repartition("id")
    )
    occ = w.where(F.col("n") >= gram).select(
        "id",
        F.explode(F.sequence(F.lit(0), F.col("n") - F.lit(gram))).alias("pos"),
        "w",
    ).select(
        "id",
        "pos",
        F.md5(F.concat_ws(" ", F.slice("w", F.col("pos") + 1, gram))).alias("gh"),
    )
    dup_grams = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
        .select("gh")
    )
    dup_occ = occ.join(dup_grams, "gh", "left_semi").select(
        "id", "pos", (F.col("pos") + F.lit(gram - 1)).alias("end")
    )
    w_prev = W.partitionBy("id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.partitionBy("id").orderBy("pos")
    spans = (
        dup_occ.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("span_id", F.sum("new_span").over(w_run))
        .groupBy("id", "span_id")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
    )
    covered = spans.select(
        "id", F.explode(F.sequence("s", "e")).alias("pos")
    ).dropDuplicates(["id", "pos"])
    toks = w.select(
        "id", F.posexplode("w").alias("pos", "tk")
    )
    kept = toks.join(covered, ["id", "pos"], "left_anti")
    agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tk")))
                    ),
                    lambda x: x.tk,
                ),
            )
        ).alias("clean_md5"),
    )
    return (
        w.select("id")
        .join(agg, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_gopher_rules",
    oracle="""
    WITH w AS (SELECT doc_id,
                      CASE WHEN trim(coalesce(text, '')) = ''
                           THEN CAST([] AS VARCHAR[])
                           ELSE string_split_regex(trim(text), ' +') END AS ws
               FROM documents),
    agg AS (SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0)
                        AS BIGINT) AS sumlen,
                   CAST(len(list_filter(ws,
                        x -> x IN ('the','be','to','of','and',
                                   'that','have','with'))) AS BIGINT)
                        AS n_stopwords,
                   CAST(len(list_filter(ws,
                        x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
                        AS alpha,
                   CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS nb,
                   CAST(len(list_distinct(list_transform(ws[1:len(ws) - 1],
                        (x, i) -> x || ' ' || ws[i + 1]))) AS BIGINT) AS db
            FROM w),
    m AS (SELECT doc_id, n_words, n_stopwords,
                 CASE WHEN n_words > 0 THEN sumlen / n_words END AS mwl,
                 CASE WHEN n_words > 0 THEN alpha / n_words END AS ar,
                 CASE WHEN nb > 0 THEN 1.0 - db / nb ELSE 0.0 END AS dbr
          FROM agg)
    SELECT doc_id, n_words,
           round(mwl, 6) AS mean_word_len,
           n_stopwords,
           round(ar, 6) AS alpha_ratio,
           round(dbr, 6) AS dup_bigram_ratio,
           n_words >= 20 AND n_words <= 90 AS ok_n_words,
           coalesce(mwl >= 3.0 AND mwl <= 10.0, false) AS ok_mean_word_len,
           n_stopwords >= 2 AS ok_stopwords,
           coalesce(ar >= 0.8, false) AS ok_alpha,
           dbr <= 0.05 AS ok_dup_bigram,
           (n_words >= 20 AND n_words <= 90)
             AND coalesce(mwl >= 3.0 AND mwl <= 10.0, false)
             AND n_stopwords >= 2 AND coalesce(ar >= 0.8, false)
             AND dbr <= 0.05 AS keep
    FROM m
    """,
    tags=("text", "quality"),
    bench=True,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality rule bundle (Rae et al. 2021,
    Appendix A) — the standard pre-filter before expensive dedup/selection:
    word-count bounds, mean-word-length band, stopword floor, alphabetic
    ratio, repeated-bigram ceiling, and the combined keep verdict, one row
    per document (operators/quality.py::gopher_rules). Bounds tuned to the
    fixture's 10-99-token documents so the verdict genuinely splits the
    corpus (~1/3 keep at sf0.01); every metric is an integer count or a
    single IEEE division, so the bundle is value-exact cross-engine."""
    from ..operators.quality import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(
        docs,
        min_words=20,
        max_words=90,
        min_mean_word_len=3.0,
        max_mean_word_len=10.0,
        min_stopwords=2,
        min_alpha_ratio=0.8,
        max_dup_bigram_ratio=0.05,
    ).orderBy("doc_id")


@query(
    "z_sample_temperature",
    oracle="""
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY 1),
    z AS (SELECT SUM(sqrt(n)) AS z FROM c),
    q AS (SELECT source, least(n, CAST(floor(100 * sqrt(n) / z.z) AS BIGINT))
                   AS quota
          FROM c, z),
    r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('17|' || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rk
          FROM documents)
    SELECT r.doc_id, r.source FROM r JOIN q USING (source)
    WHERE r.rk <= q.quota
    """,
    tags=("sampling",),
)
def z_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (tau = 0.5) domain re-weighting: per-source quotas
    proportional to sqrt(count), normalized to a 100-row budget — the
    multilingual/multi-domain mixing recipe that upsamples small sources
    without a manual target table
    (operators/sampling.py::temperature_mixture_sample). VALUE-EXACT:
    sqrt is IEEE-correctly-rounded in both engines, so quota boundaries
    and the hash-ranked member picks agree bit-for-bit."""
    from ..operators.sampling import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture_sample(
        docs, "source", total_n=100, id_col="doc_id", tau=0.5, seed=17
    ).select("doc_id", "source")
