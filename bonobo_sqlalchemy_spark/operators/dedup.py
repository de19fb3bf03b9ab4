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
    # Repartition the raw text BEFORE shingling: a single-file corpus scans
    # as one task, and the shingle projection is the expensive part — the
    # exchange of raw rows is cheap, the shingling then runs core-parallel.
    base = (
        df.select(
            F.col(id_col).alias("id"),
            *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
            F.col(text_col).alias("txt"),
        )
        .repartition(F.col("id"))
        .select("id", "blk", T.word_ngrams("txt", n).alias("sh"))
        # Materialize the shingled corpus once: both self-join sides (and the
        # size lookup) reference it, and Spark does not reuse the exchange
        # here — without this the corpus re-shingles per reference. The
        # cluster-scale analog is writing the shingle stage to storage.
        .localCheckpoint()
    )
    # Shingle set sizes ride along through the explode (they are functionally
    # dependent on the doc id, so they can join the pair-group keys for
    # free) — this removes two size-lookup joins and their re-shingling
    # passes. Both self-join sides share one canonical exploded plan, so
    # Spark reuses the exchange: the corpus is shingled once.
    ex = base.select(
        "id", "blk", F.size("sh").alias("n_sh"), F.explode("sh").alias("g")
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.n_sh").alias("n1"),
            F.col("b.n_sh").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.select(
            "id1",
            "id2",
            F.round(
                F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")), 6
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
    # Same single-file parallelization as ngram_jaccard_pairs: exchange raw
    # text first, shingle core-parallel after.
    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
        .repartition(F.col("id"))
        .select("id", T.word_ngrams("txt", n).alias("sh"))
        .where(F.size("sh") > 0)
        # One materialization feeds signature building AND candidate
        # verification (2.8x measured; see ngram_jaccard_pairs note).
        .localCheckpoint()
    )

    # Signature via explode + hash-aggregate, NOT per-row array lambdas:
    # nested higher-order functions run interpreted (~8us/element measured —
    # 67s for 5k docs), while explode -> xxhash64 -> 32 MIN aggregates stays
    # inside whole-stage codegen (<1s for the same work). This is also the
    # scale-out shape: one shuffle on id, partial MIN map-side.
    ex = base.select("id", F.explode("sh").alias("g"))
    h = ex.select("id", (F.abs(F.xxhash64("g")) % F.lit(1 << 31)).alias("h"))
    params = H._perm_params(num_perm)
    sig = h.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(H._MERSENNE_P)).alias(
                f"m{i}"
            )
            for i, (a, b) in enumerate(params)
        ]
    )
    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(bnd)),
                *[F.col(f"m{bnd * rows + r}").cast("string") for r in range(rows)],
            )
            for bnd in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_keys).alias("bucket"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    # Exact-Jaccard verification of candidates only.
    s1 = base.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = base.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select("id1", "id2", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    max_hamming: int = 12,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit sketch, hamming <= t, within a block.

    Candidate generation uses bit-band blocking instead of an all-pairs
    join: the 64 signature bits split into ``max_hamming + 1`` bands, so by
    pigeonhole any pair within ``max_hamming`` differing bits agrees on at
    least one whole band — zero false negatives, and candidates shuffle on
    band values instead of exploding quadratically per block. (On a corpus
    where near-everything is near-duplicate — like the small-vocab test
    fixture — banding degenerates to all pairs plus band overhead; its win
    is on realistic corpora where similar pairs are sparse.)
    """
    # SimHash via explode + 64 codegen'd SUM aggregates (per-bit votes) —
    # same rationale as the MinHash path: interpreted array lambdas are
    # ~100x slower than whole-stage-codegen hash aggregation.
    ex = df.select(
        F.col(id_col).alias("id"),
        *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
        F.explode(T.words(text_col)).alias("tok"),
    ).select("id", "blk", F.xxhash64("tok").alias("h"))
    votes = ex.groupBy("id", "blk").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{bit}")
            for bit in range(64)
        ]
    )
    sig_expr = None
    for bit in range(64):
        term = F.when(
            F.col(f"v{bit}") > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)
        ).otherwise(F.lit(0).cast("bigint"))
        sig_expr = term if sig_expr is None else sig_expr + term
    base = votes.select("id", "blk", sig_expr.alias("sig")).localCheckpoint()

    # Bit-band blocking: n_bands = max_hamming + 1 contiguous bit ranges.
    n_bands = max_hamming + 1
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(i)),
                F.shiftright(F.col("sig"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1))
                .cast("string"),
            )
            for i in range(n_bands)
        ]
    )
    buckets = base.select("id", "blk", "sig", F.explode(band_keys).alias("band"))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            H.hamming64(F.col("a.sig"), F.col("b.sig")).cast("bigint").alias("hamming"),
        )
        .dropDuplicates(["id1", "id2"])
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
