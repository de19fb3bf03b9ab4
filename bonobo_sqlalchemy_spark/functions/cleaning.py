"""Corpus-cleaning column functions: PII redaction and repetition metrics.

Training-data pipelines scrub personally-identifiable strings before any
other processing and drop machine-generated/repetitive pages (the Gopher
repetition rules). Both are pure built-in-function compositions — regex and
integer arithmetic that whole-stage-codegen compiles, no Python in the hot
path — and every pattern below is written in the common subset of Java
regex (Spark) and RE2 (DuckDB) so the oracle computes the identical result.

Reference scope note: the reference engine (bonobo-sqlalchemy) has no text
cleaning; this module belongs to the driver-mandated training-data
extension surface (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import col_

#: name -> (pattern, replacement token). Order matters: emails are redacted
#: before IPs/phones so their digit/dot substrings can't double-match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-pattern match counts (BIGINT), computed on the raw text."""
    t = col_(text)
    return {
        name: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: str | Column) -> Column:
    """Replace every PII match with its ``<TOKEN>`` placeholder.

    Applied in ``PII_PATTERNS`` order (email first) so that an address's
    dotted-host substring is consumed before the IP/phone patterns run.
    """
    out = col_(text)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def positional_bigrams(words_col: str | Column) -> Column:
    """All positional (non-distinct) word bigrams as an array column.

    Kept as an array only for small per-row uses; corpus-scale repetition
    metrics explode the positions instead (see queries/datapipe3.py) to
    stay inside codegen.
    """
    w = col_(words_col)
    idx = F.when(
        F.size(w) >= 2, F.sequence(F.lit(1), F.size(w) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1))
    )


def strip_shared_chunks(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    max_df: int = 1,
) -> "DataFrame":
    """Boilerplate removal (CCNet/RefinedWeb passage dedup over flat word
    streams): drop every ``chunk_tokens``-token chunk whose document
    frequency exceeds ``max_df`` and rebuild the document from the
    surviving chunks in order. Returns ``(id, clean_text, n_kept,
    n_dropped)`` — one row per input document, empty ``clean_text`` when
    everything was boilerplate.

    Plan shape: narrow codegen chunking, one hash-agg for chunk document
    frequency, one equi-join back, one per-doc ``array_sort`` fold (no
    window), one id-partitioned left join restoring chunk-less docs. The
    chunk stream carries (id, chunk_id, text) only — the document never
    rides the df shuffle twice.

    Null/empty hardening: a null or whitespace-only ``text`` yields ZERO
    chunks (``size`` of a null split is -1, which would otherwise make
    ``sequence(0, -1)`` emit a descending [0, -1] phantom pair; and an
    empty-string chunk's md5 would collide across all empty docs, counting
    them as shared boilerplate). Empty word tokens are dropped before
    chunking and the chunk count is clamped at zero; the final left join
    keeps the one-row-per-doc contract with ``('' , 0, 0)``.
    """
    from pyspark.sql import functions as F

    k = int(chunk_tokens)
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col).cast("string"), F.lit(""))), " +"),
        lambda x: x != F.lit(""),
    )
    d = docs.select(F.col(id_col).alias("__id"), words.alias("w"))
    n_chunks = F.greatest(
        F.ceil(F.size("w") / F.lit(float(k))).cast("bigint"), F.lit(0).cast("bigint")
    )
    c = d.where(F.size("w") > 0).select(
        "__id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_id"),
        "w",
    ).select(
        "__id",
        "chunk_id",
        F.concat_ws(" ", F.expr(f"slice(w, chunk_id*{k}+1, {k})")).alias("txt"),
    ).withColumn("g", F.md5(F.col("txt").cast("binary")))
    df_counts = (
        c.dropDuplicates(["__id", "g"])
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    keep = F.col("n_docs") <= max_df
    stripped = (
        c.join(df_counts, "g")
        .groupBy("__id")
        .agg(
            F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
            F.sum((~keep).cast("int")).cast("bigint").alias("n_dropped"),
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_id", keep.alias("keep"), "txt"))
                        ),
                        lambda x: x["keep"],
                    ),
                    lambda x: x["txt"],
                ),
            ).alias("clean_text"),
        )
    )
    return (
        d.select("__id")
        .join(stripped, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0).cast("bigint")).alias("n_dropped"),
        )
    )
