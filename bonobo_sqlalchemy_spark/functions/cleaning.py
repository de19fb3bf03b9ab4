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
    window). ONE corpus scan: a chunk-less (null/whitespace-only) document
    stays in the chunk stream as a single SENTINEL chunk (``__real =
    false``) instead of being filtered out and restored by a second scan +
    doc-sized left join afterwards (that restore join cost a measured
    1.46x on the bench — the sentinel rides the existing shuffles for
    free). The chunk stream carries (id, chunk_id, text) only — the
    document never rides the df shuffle twice.

    Null/empty hardening: a space-trimmed non-empty string split on
    ``" +"`` cannot contain empty tokens, so the only empty-token case is
    the empty string itself — handled by a codegen ``when``, not a
    higher-order ``filter`` over every word array (measured ~0.3s/500k
    docs saved). A null/whitespace-only ``text`` yields exactly one
    sentinel chunk
    whose empty ``txt`` is EXCLUDED from document-frequency counting (all
    empty docs share md5('') — counting them would flag emptiness itself
    as shared boilerplate) and from the kept/dropped sums, so such a
    document reports ``('', 0, 0)``. Real chunks are never empty strings
    (words are non-empty, k >= 1), so the sentinel hash cannot collide
    with a counted one.
    """
    from pyspark.sql import functions as F

    k = int(chunk_tokens)
    t = F.trim(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    words = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " +")
    )
    d = docs.select(F.col(id_col).alias("__id"), words.alias("w"))
    n_chunks = F.ceil(F.size("w") / F.lit(float(k))).cast("bigint")
    c = d.select(
        "__id",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.greatest(n_chunks, F.lit(1).cast("bigint")) - 1,
            )
        ).alias("chunk_id"),
        "w",
    ).select(
        "__id",
        "chunk_id",
        (F.size("w") > 0).alias("__real"),
        F.concat_ws(" ", F.expr(f"slice(w, chunk_id*{k}+1, {k})")).alias("txt"),
    ).withColumn("g", F.md5(F.col("txt").cast("binary")))
    df_counts = (
        c.where("__real")
        .dropDuplicates(["__id", "g"])
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # sentinel chunks left-join to NULL n_docs: __real AND NULL = false,
    # so they are neither kept nor dropped and contribute no text
    keep = F.col("__real") & (F.col("n_docs") <= max_df)
    return (
        c.join(df_counts, "g", "left")
        .groupBy("__id")
        .agg(
            F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
            F.sum((F.col("__real") & ~keep).cast("int")).cast("bigint").alias("n_dropped"),
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
        .select(
            F.col("__id").alias(id_col), "clean_text", "n_kept", "n_dropped"
        )
    )
