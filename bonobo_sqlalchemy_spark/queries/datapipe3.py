"""Datapipe batch 3: corpus cleaning and curation — PII redaction,
repetition (Gopher-style) metrics, fixed-budget chunking, benchmark
contamination, language mix rebalancing.

All five are driver-mandated training-data extensions (SURVEY §2.4); the
reference engine has no text surface. Every query here is oracle-checked
(hash-exact vs DuckDB) — the regex patterns live in the common Java-regex /
RE2 subset, and ratios follow the queries/base.py determinism policy
(exact integer inputs, one IEEE division, round 6dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cleaning as C
from ..functions import text as T
from ..sources.files import load_table
from .base import query


def _pii_oracle() -> str:
    # Patterns contain {m,n} braces and '%', so splice with replace() rather
    # than f-strings/format().
    sql = """
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                          ELSE '' END
                  || CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309' ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, 'EMAILPAT')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, 'IPPAT')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, 'PHONEPAT')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(
               t, 'EMAILPAT', '<EMAIL>', 'g'), 'IPPAT', '<IP>', 'g'),
               'PHONEPAT', '<PHONE>', 'g')) AS redacted_md5
    FROM dirty
    """
    for name, pat, _ in C.PII_PATTERNS:
        sql = sql.replace({"email": "EMAILPAT", "ipv4": "IPPAT", "phone": "PHONEPAT"}[name], pat)
    return sql


@query("text_pii_redact", oracle=_pii_oracle(), tags=("text", "cleaning"))
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact emails / IPv4s / phone numbers.

    The corpus fixture contains no PII, so the query injects a
    deterministic per-document contact line first (varying by doc_id so the
    counts differ) and then redacts it — the redaction path is what's under
    test, hash-exact via the md5 of the scrubbed text. Pure regex in
    whole-stage codegen; no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-867-5309")).otherwise(F.lit("")),
    )
    d = d.select("doc_id", dirty.alias("t"))
    counts = C.pii_counts("t")
    return d.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
        F.md5(C.redact_pii("t").cast("binary")).alias("redacted_md5"),
    )


@query(
    "text_repetition",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
    ), g AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
      FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
            FROM d WHERE len(w) >= 2)
    ), c AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_bigram_frac,
           round(CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt), 6) AS dup_bigram_frac
    FROM c GROUP BY doc_id
    """,
    tags=("text", "cleaning"),
    bench=True,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: fraction of positional
    word bigrams taken by the most common bigram, and the duplicate-bigram
    fraction — the standard machine-generated-page filters.

    Scale shape: one repartition by doc_id up front; both aggregates
    (per-(doc, gram) counts, then per-doc stats) are satisfied by that
    clustering, so the explode→count→stats pipeline runs shuffle-free after
    a single exchange (same pattern as the shingle dedup path).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.trim("text"), " +").alias("w"))
        .where(F.size("w") >= 2)
        .repartition("doc_id")
    )
    grams = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.concat(
            F.element_at("w", F.col("i")), F.lit(" "), F.element_at("w", F.col("i") + 1)
        ).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias("top_bigram_frac"),
        F.round(
            (F.sum("cnt") - F.count(F.lit(1))).cast("double") / F.sum("cnt"), 6
        ).alias("dup_bigram_frac"),
    )


@query(
    "text_chunks",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w FROM documents
    ), c AS (
      SELECT doc_id, lang, w,
             unnest(range(0, CAST(ceil(len(w) / 64.0) AS BIGINT))) AS chunk_id
      FROM d
    )
    SELECT doc_id, lang, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(least(64, len(w) - chunk_id * 64) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(w[chunk_id*64+1 : chunk_id*64+64], ' ')) AS chunk_md5
    FROM c
    """,
    tags=("text", "packing"),
    bench=True,
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget document chunking: split each document into 64-token
    chunks (the pre-tokenization step ahead of sequence packing). Purely
    narrow — explode of the chunk index plus an array slice, no shuffle;
    chunk text is hash-compared (md5) for exactness without shipping it.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.trim("text"), " +").alias("w")
    )
    c = d.select(
        "doc_id",
        "lang",
        "w",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.size("w") / F.lit(64.0)).cast("bigint") - 1)
        ).alias("chunk_id"),
    )
    return c.select(
        "doc_id",
        "lang",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.least(F.lit(64), F.size("w") - F.col("chunk_id") * 64)
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.expr("slice(w, chunk_id*64+1, 64)")).cast("binary")).alias(
            "chunk_md5"
        ),
    )


@query(
    "text_contamination",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
    ), tag AS (
      SELECT doc_id, w,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 50 = 0
               AS is_bench
      FROM d WHERE len(w) >= 3
    ), s AS (
      SELECT doc_id, is_bench,
             unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                                 i -> array_to_string(w[i:i+2], ' ')))) AS g
      FROM tag
    ), corp AS (SELECT doc_id, g FROM s WHERE NOT is_bench),
    bench AS (SELECT doc_id AS bench_id, g FROM s WHERE is_bench)
    SELECT corp.doc_id,
           CAST(COUNT(DISTINCT corp.g) AS BIGINT) AS n_shared_shingles,
           CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_benchmark_docs
    FROM corp JOIN bench ON corp.g = bench.g
    GROUP BY corp.doc_id
    HAVING COUNT(DISTINCT corp.g) >= 2
    """,
    tags=("text", "dedup"),
    bench=True,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: corpus documents sharing >= 2 distinct
    3-gram shingles with a held-out benchmark slice (deterministic 2% of
    docs by hash bucket). The benchmark shingle set broadcasts; corpus
    documents never join each other (`operators/contamination.py`).
    """
    from ..operators.contamination import benchmark_overlap

    d = load_table(spark, sf_dir, "documents")
    is_bench = T.split_bucket("doc_id", 50) == 0
    return benchmark_overlap(
        d.where(~is_bench), d.where(is_bench), n=3, min_shared=2
    )


@query(
    "text_mix_weights",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ), t AS (
      SELECT CAST(SUM(n_docs) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS n_langs
      FROM c
    )
    SELECT lang, n_docs, round(total / (n_langs * n_docs), 6) AS mix_weight
    FROM c CROSS JOIN t
    """,
    tags=("text", "split"),
)
def text_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing: per-language sampling weight that moves the
    corpus to a uniform language distribution (weight > 1 upsamples,
    < 1 downsamples). One aggregate plus a broadcast 1-row totals join —
    the same scalar-subquery shape as text_tfidf; no driver-side count.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    t = c.agg(
        F.sum("n_docs").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_langs"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        F.round(F.col("total") / (F.col("n_langs") * F.col("n_docs")), 6).alias(
            "mix_weight"
        ),
    )
