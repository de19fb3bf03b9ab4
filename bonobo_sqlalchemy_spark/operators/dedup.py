"""Deduplication operators over document corpora (SURVEY §2.4).

Five strategies, from exact to fuzzy, each designed for the 100 TB posture:

- **exact**: fingerprint group-by — one shuffle on the fingerprint, partial
  agg map-side. Survivor = min id per group (deterministic).
- **word-ngram Jaccard**: exact set similarity via shingle inverted index —
  explode + self-join on shingle (co-partitioned by shingle key), count
  common, one agg. Quadratic only within shingle posting lists, not corpus.
- **MinHash + LSH banding**: candidate generation by band-bucket join (only
  docs sharing a band collide) then exact-Jaccard verification of the
  candidates — the scalable path when posting lists get hot.
- **SimHash**: 64-bit sketch, hamming-distance pairs within a blocking key.
- **embedding cosine**: near-dup pairs over `array<float>` vectors, blocked
  by a grouping key (label here; an LSH bucket at scale).

All return DataFrames and never collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..functions import vectors as V


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = False
) -> DataFrame:
    """One survivor (min id) per identical document; adds group stats."""
    fp = T.fingerprint_md5(T.normalized(text_col) if normalize else F.col(text_col))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select(id_col, "fingerprint", "group_size")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (id1 < id2, sim >= t).

    Inverted-index plan: explode distinct shingles, self-join on shingle
    (+ optional blocking key), count common shingles per pair, then
    |A∪B| = |A| + |B| - common. The join shuffles on the shingle value, so
    the quadratic blowup is bounded per posting list — at scale, drop
    ultra-frequent shingles first (stop-shingle filtering).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
        T.word_ngrams(text_col, n).alias("sh"),
    )
    sizes = base.select("id", F.size("sh").alias("n_sh"))
    ex = base.select("id", "blk", F.explode("sh").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1, s2 = sizes.alias("s1"), sizes.alias("s2")
    return (
        common.join(s1, F.col("id1") == F.col("s1.id"))
        .join(s2, F.col("id2") == F.col("s2.id"))
        .select(
            "id1",
            "id2",
            F.round(
                F.col("common")
                / (F.col("s1.n_sh") + F.col("s2.n_sh") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidate pairs, verified with exact Jaccard.

    Candidate generation: docs sharing any of ``bands`` band-keys meet in a
    band-bucket join (shuffle on band key — no all-pairs). Verification
    computes exact Jaccard on the candidates only. With 32 perms / 8 bands
    (4 rows per band) the S-curve midpoint sits near 0.5 similarity.
    """
    rows = num_perm // bands
    base = df.select(
        F.col(id_col).alias("id"), T.word_ngrams(text_col, n).alias("sh")
    ).where(F.size("sh") > 0)
    sig = base.select(
        "id", "sh", H.lsh_band_keys(H.minhash_signature("sh", num_perm), bands, rows).alias("bk")
    )
    buckets = sig.select("id", "sh", F.explode("bk").alias("bucket"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.sh").alias("sh1"),
            F.col("b.sh").alias("sh2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (
        cand.select(
            "id1", "id2", F.round(inter / union, 6).alias("jaccard")
        ).where(F.col("jaccard") >= threshold)
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    max_hamming: int = 12,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit sketch, hamming <= t, within a block."""
    base = df.select(
        F.col(id_col).alias("id"),
        *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
        H.simhash64(T.words(text_col)).alias("sig"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            H.hamming64(F.col("a.sig"), F.col("b.sig")).cast("bigint").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """Cosine near-dup pairs within a blocking key (id1 < id2, sim >= t)."""
    base = df.select(
        F.col(id_col).alias("id"),
        *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
        F.col(vec_col).alias("v"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            V.cosine_rounded(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def survivors(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop the higher id of every near-dup pair (greedy, deterministic)."""
    losers = pairs.select(F.col("id2").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
