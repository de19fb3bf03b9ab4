"""Round-8 queries: exact substring-duplication spans and their removal
(`operators/dedup.py::duplicate_span_stats`) — the "exact substring
deduplication" signal of Lee et al. 2022 (*Deduplicating Training Data
Makes Language Models Better*), the strongest-known dedup intervention for
LLM training corpora after document-level dedup.

Reference scope note: not in the reference engine (bonobo-sqlalchemy);
part of the driver-mandated training-data extension surface (SURVEY §2.4).
Both queries are VALUE-EXACT: the gram fingerprint is md5 (the same
hash-determinism policy as MinHash/SimHash), so DuckDB reproduces
occurrence sets, span merges, and cleaned text end-to-end.
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
