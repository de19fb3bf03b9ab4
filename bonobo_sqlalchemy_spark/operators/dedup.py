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

All return DataFrames and never collect corpus-scale data to the driver
(one bounded exception: `embedding_near_dup_pairs`' gathered verify pulls
the vector table when — and only when — it fits the same 64 MB budget a
broadcast-join build side would put on the driver anyway; above the budget
it stays on the join-attach path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..functions import vectors as V
from ..partitioning import rebalance_narrow_input


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


def _exploded_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    block_col: str | None = None,
) -> DataFrame:
    """Distinct ``(id, blk, g)`` word-n-gram shingle rows, fully codegen.

    Shingling via explode of the n-gram start positions + ``slice`` +
    ``concat_ws`` stays inside whole-stage codegen; the array-lambda form
    (``transform`` over a ``sequence``) runs interpreted at ~8µs/element and
    dominated the round-1 dedup bench. Docs with fewer than ``n`` words have
    an empty shingle set and are dropped (they can never pair).
    """
    blk = [F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]
    # One exchange by id up front (a rebalance — ids are unique) WHEN the
    # corpus arrives as one fat scan task: every per-document step after it
    # — the trim+split tokenize, shingle explode, the dedupe to distinct
    # shingles, shingle-set sizes, the MinHash signature agg — requires
    # only clustering by id, which hashpartitioning(id) satisfies, so the
    # per-doc pipeline runs core-parallel. The exchange ships the RAW text
    # (fewer bytes than the split word arrays) and the CPU-dense tokenize
    # runs above it — below it, the split was pinned inside the one-task
    # scan stage (0.30s single-task at sf0.1, r15). At scale the scan fans
    # out on its own and the helper adds NO exchange, leaving tokenize in
    # the scan stage exactly as before.
    w = (
        rebalance_narrow_input(
            df.select(F.col(id_col).alias("id"), *blk, F.col(text_col).alias("__t")),
            "id",
        )
        .select("id", "blk", F.split(F.trim(F.col("__t")), " +").alias("w"))
        .where(F.size("w") >= n)
    )
    pos = w.select(
        "id",
        "blk",
        "w",
        F.explode(F.sequence(F.lit(0), F.size("w") - F.lit(n))).alias("i"),
    )
    # The repartition exchange is the canonical shared subtree: every
    # consumer (self-join sides, signature agg) reuses its shuffle output
    # (AQE exchange reuse), so the corpus is scanned and split once; the
    # narrow explode+dedupe re-runs per consumer but is cheap codegen. At
    # cluster scale, persist this frame instead if consumers outnumber the
    # exchange-reuse coverage.
    return pos.select(
        "id", "blk", F.concat_ws(" ", F.slice("w", F.col("i") + 1, n)).alias("g")
    ).dropDuplicates(["id", "blk", "g"])


def _cap_shingles(ex: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """Stop-shingle filtering: drop shingles appearing in more than
    ``max_shingle_df`` documents (per block) from the shingle universe.

    Semantics match stop-word removal: sizes and similarities are computed
    over the *filtered* sets, so results stay self-consistent. At 100 TB an
    ultra-hot shingle otherwise floods one reducer's posting list with a
    quadratic pair blowup; the document-frequency agg is one cheap pass and
    the hot set is tiny, so the anti-join broadcasts.
    """
    if max_shingle_df is None:
        return ex
    hot = (
        ex.groupBy("blk", "g")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") > max_shingle_df)
        .select("blk", "g")
    )
    return ex.join(F.broadcast(hot), ["blk", "g"], "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (id1 < id2, sim >= t).

    Inverted-index plan: explode distinct shingles, self-join on shingle
    (+ optional blocking key), count common shingles per pair, then
    |A∪B| = |A| + |B| - common. The join shuffles on the shingle value, so
    the quadratic blowup is bounded per posting list; ``max_shingle_df``
    drops ultra-frequent shingles first (stop-shingle filtering, see
    `_cap_shingles`) so no posting list exceeds that bound.
    """
    ex = _cap_shingles(
        _exploded_shingles(df, text_col, id_col, n, block_col), max_shingle_df
    )
    # Shingle-set sizes ride along on every exploded row via a count window
    # over the id-partitioning (no exchange, no third consumer of the
    # shingle stage — the self-join sides are the only two readers, and the
    # second side reuses the first's exchange).
    ex = ex.withColumn("n_sh", F.count(F.lit(1)).over(W.partitionBy("id")))
    # shuffle_hash: an AQE broadcast of one side would re-run the whole
    # shingle explode+dedupe+window pipeline to build the broadcast
    # relation; the symmetric hash join shuffles each side once instead —
    # measured ~1.4x faster steady-state (3x cold) at sf0.1.
    a, b = ex.alias("a"), ex.hint("shuffle_hash").alias("b")
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


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: ``|A ∩ B| / min(|A|, |B|)``.

    Broder's containment coefficient — the dedup modality Jaccard misses:
    a short document fully embedded in a long one (quote inclusion, page
    wrapped in boilerplate, chunk-of-corpus leaks) scores near 1.0 here but
    arbitrarily low on Jaccard (the union is dominated by the long doc).
    Standard in training-data pipelines alongside Jaccard dedup.

    Identical physical plan to :func:`ngram_jaccard_pairs` (shingle
    inverted-index self-join, per-posting-list quadratic bound,
    ``max_shingle_df`` stop-shingle cap) — only the final score expression
    differs, so every scale property measured for the Jaccard path
    (SCALING.md) carries over unchanged.
    """
    ex = _cap_shingles(
        _exploded_shingles(df, text_col, id_col, n, block_col), max_shingle_df
    )
    ex = ex.withColumn("n_sh", F.count(F.lit(1)).over(W.partitionBy("id")))
    a, b = ex.alias("a"), ex.hint("shuffle_hash").alias("b")
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
    return pairs.select(
        "id1",
        "id2",
        F.round(F.col("common") / F.least("n1", "n2"), 6).alias("containment"),
    ).where(F.col("containment") >= threshold)


def minhash_index_frames(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    max_shingle_df: int | None = None,
    materialize: bool = True,
):
    """The three persistable minhash-index frames of a corpus slice:
    ``(ex, sig, buckets)`` — exploded distinct shingles ``(id, g)``, the
    signature aggregate ``(id, n_sh, m0..)``, and band-bucket keys
    ``(id, bucket)``.

    Every hash is md5-derived from row content alone (shingle hash, perm
    params, band key), so the frames are CORPUS-INDEPENDENT: an index
    built over a slice composes with an index built over a disjoint slice
    — union of slice indexes == index of the union. That property is what
    makes a persisted near-dup edge artifact maintainable incrementally
    (:func:`minhash_edges_extend`) with bit-identical results to a
    from-scratch build (``max_shingle_df`` must be None for composability:
    a document-frequency cap is a corpus-level statistic).

    ``materialize=True`` localCheckpoints ``ex`` and ``sig`` exactly as
    :func:`minhash_lsh_pairs` always has (three+ readers each; exchange
    reuse does not cover them — without the checkpoints the documents
    scan + split + explode subtree ran 6x per query). The cluster-scale
    analog is persisting these frames to storage, which is precisely what
    the edge-artifact cache does.
    """
    rows = num_perm // bands
    ex = _cap_shingles(
        _exploded_shingles(df, text_col, id_col, n, None), max_shingle_df
    ).drop("blk")
    if materialize:
        ex = ex.localCheckpoint()

    # Signature via explode + hash-aggregate, NOT per-row array lambdas:
    # nested higher-order functions run interpreted (~8us/element measured —
    # 67s for 5k docs), while hash -> 32 MIN aggregates stays inside
    # whole-stage codegen (<1s for the same work). This is also the
    # scale-out shape: one shuffle on id, partial MIN map-side.
    #
    # The base hash is md5-derived (first 8 hex chars -> 32-bit int, folded
    # to 31 bits), not xxhash64: md5 is bit-identical in DuckDB, which makes
    # the ENTIRE pipeline — signatures, band keys, candidate set, verified
    # Jaccard — expressible as an exact SQL oracle (the repo's
    # hash-determinism policy, operators/sampling.py). Cost parity: both are
    # one codegen hash per distinct shingle row.
    h = ex.select(
        "id",
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint") % F.lit(1 << 31)).alias("h"),
    )
    params = H._perm_params(num_perm)
    # n_sh (distinct-shingle count) folds into the same hash-aggregate as the
    # MIN signature lanes — the verification's size lookup rides the signature
    # shuffle for free instead of re-aggregating the exploded corpus.
    # The signature frame (one slim row per doc) also has four readers —
    # both band-bucket join sides and the two size lookups — so it
    # materializes too; at 32 lanes x 8 bytes it is ~1/30th the shingle
    # stage's size.
    # F.expr() strings — one py4j call per lane instead of ~6 nested
    # Column-API calls (the r15 driver-side build-time fix, see
    # simhash_signatures); expressions and values are identical.
    sig = h.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[
            F.expr(f"min(({a} * h + {b}) % {H._MERSENNE_P})").alias(f"m{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    if materialize:
        sig = sig.localCheckpoint()
    # Band key = first 15 md5 hex chars of 'band:lane0:...:laneR' as one
    # 60-bit long: a single long key instead of a concat_ws string — smaller
    # codegen, narrower shuffle, a long equi-join key — and (unlike
    # xxhash64) reproducible in DuckDB via the strpos hex polynomial.
    # Collisions across distinct lane tuples are 2^-60-rare and harmless:
    # they only add candidates, and every candidate is verified with exact
    # Jaccard below.
    band_sql = ", ".join(
        "CAST(conv(substring(md5(concat_ws(':', '{b}', {lanes})), 1, 15),"
        " 16, 10) AS BIGINT)".format(
            b=bnd, lanes=", ".join(f"m{bnd * rows + r}" for r in range(rows))
        )
        for bnd in range(bands)
    )
    buckets = sig.select(
        "id", F.explode(F.expr(f"array({band_sql})")).alias("bucket")
    )
    return ex, sig, buckets


def _verify_jaccard(
    cand: DataFrame, ex: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs over the exploded
    shingle form: count common shingles per pair (two co-partitioned joins
    — never materializes shingle arrays), then |A∪B| = n1 + n2 - common.
    Pairs with zero common shingles drop out of the join; their Jaccard is
    0 < threshold, so nothing is lost."""
    e1 = ex.select(F.col("id").alias("id1"), "g")
    e2 = ex.select(F.col("id").alias("id2"), "g")
    common = (
        cand.join(e1, "id1")
        .join(e2, ["id2", "g"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .select(
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
    max_shingle_df: int | None = None,
) -> DataFrame:
    """MinHash+LSH candidate pairs, verified with exact Jaccard.

    Candidate generation: docs sharing any of ``bands`` band-keys meet in a
    band-bucket join (shuffle on band key — no all-pairs). Verification
    computes exact Jaccard on the candidates only. With 32 perms / 8 bands
    (4 rows per band) the S-curve midpoint sits near 0.5 similarity.
    ``max_shingle_df`` applies stop-shingle filtering (see `_cap_shingles`).
    """
    ex, sig, buckets = minhash_index_frames(
        df, text_col, id_col, n, num_perm, bands, max_shingle_df, materialize=True
    )
    # shuffle_hash: letting AQE broadcast one side would re-run the whole
    # 32-MIN signature aggregate to build the broadcast relation (no
    # exchange sharing across join strategies) — measured ~1.6x slower
    # steady-state at sf0.1 than the symmetric hash join.
    a, b = buckets.alias("a"), buckets.hint("shuffle_hash").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    return _verify_jaccard(cand, ex, sig.select("id", "n_sh"), threshold)


def minhash_edges_extend(
    spark,
    index_path: str,
    delta_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Extend a PERSISTED near-dup edge index with a delta batch: returns
    the full-corpus edge set ``(id1, id2, jaccard)`` — bit-identical to a
    from-scratch :func:`minhash_lsh_pairs` over base ∪ delta (asserted by
    the registered query's full-recompute oracle).

    ``index_path`` holds the base corpus's four frames, written by
    :func:`minhash_index_write`: ``edges/ buckets/ shingles/ sizes/``.
    Only the delta pays signature cost; candidate generation joins the
    delta's band buckets against base ∪ delta buckets (every NEW pair
    touches a delta doc — base×base pairs are already in ``edges/``), and
    exact-Jaccard verification fetches shingles for both sides from the
    union of the stored shingle frame and the delta's. Hash
    corpus-independence (see :func:`minhash_index_frames`) is what makes
    the composition exact; ``max_shingle_df`` is deliberately not
    supported here (a df-cap is a corpus-level statistic, so capped
    indexes do not compose).

    Scale: at 100 TB the stored ``shingles/``/``buckets/`` frames would be
    bucketed by ``id``/``bucket`` so the delta joins are bucket-local; the
    delta-side work is O(|delta|) signatures + candidate volume, never a
    corpus re-scan.
    """
    dex, dsig, dbuckets = minhash_index_frames(
        delta_df, text_col, id_col, n, num_perm, bands, None, materialize=True
    )
    base_edges = spark.read.parquet(f"{index_path}/edges")
    base_buckets = spark.read.parquet(f"{index_path}/buckets")
    base_ex = spark.read.parquet(f"{index_path}/shingles")
    base_sizes = spark.read.parquet(f"{index_path}/sizes")
    all_buckets = base_buckets.unionByName(dbuckets)
    a, b = dbuckets.alias("a"), all_buckets.hint("shuffle_hash").alias("b")
    # delta side × everything; normalize the pair orientation (a delta id
    # may be smaller OR larger than its base partner)
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id1"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    ex_all = base_ex.unionByName(dex.select("id", "g"))
    sizes_all = base_sizes.unionByName(dsig.select("id", "n_sh"))
    new_edges = _verify_jaccard(cand, ex_all, sizes_all, threshold)
    # disjoint by construction: every new edge touches a delta id, every
    # stored edge is base×base
    return base_edges.unionByName(new_edges)


def minhash_index_write(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> None:
    """Materialize the persisted near-dup edge index of a corpus slice:
    ``edges/`` (verified pairs within the slice), ``buckets/``,
    ``shingles/``, ``sizes/`` — the artifact :func:`minhash_edges_extend`
    maintains incrementally. Pure parquet: atomic-publish/versioning is
    the caller's job (``cache.ensure_artifact``)."""
    ex, sig, buckets = minhash_index_frames(
        df, text_col, id_col, n, num_perm, bands, None, materialize=True
    )
    a, b = buckets.alias("a"), buckets.hint("shuffle_hash").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    edges = _verify_jaccard(cand, ex, sig.select("id", "n_sh"), threshold)
    edges.write.mode("overwrite").parquet(f"{path}/edges")
    buckets.write.mode("overwrite").parquet(f"{path}/buckets")
    ex.select("id", "g").write.mode("overwrite").parquet(f"{path}/shingles")
    sig.select("id", "n_sh").write.mode("overwrite").parquet(f"{path}/sizes")


def auto_simhash_blocks(
    n_rows: int,
    max_hamming: int,
    target_occupancy: int = 160,
    max_extra: int = 4,
) -> int:
    """Occupancy-targeting block count for :func:`simhash_pairs` banding.

    With the signature split into ``k`` blocks and candidate keys built
    from every ``(k - d)``-subset of blocks (``d = max_hamming``), the
    guaranteed key width is ``(k - d) * (64 // k)`` bits, so expected
    per-key bucket load is ``~ n / 2^width``. Pick the SMALLEST ``k`` in
    ``[d + 1, d + 1 + max_extra]`` whose width reaches
    ``log2(n / target_occupancy)`` — candidate volume then stays
    ``~ C(k, d) * n * target`` (linear in n) instead of the fixed-``k``
    ``C(k, d) * n^2 / 2^width`` quadratic. This is the probe-count /
    table-count trade of Manku, Jain & Das Sarma (WWW'07 §3) — the
    pigeonhole guarantee (zero false negatives at hamming <= d) holds at
    EVERY ``k``, so the knob moves cost, never recall.

    ``max_extra`` caps the combinatorial key count ``C(k, d)`` (k = d+5
    with d = 8 is already 715 keys); past the cap the sizing note in
    SCALING.md applies — raise ``target_occupancy`` or verify-partition
    the residual hot buckets."""
    import math

    d = max_hamming
    k = d + 1
    if n_rows > 0:
        need = math.log2(max(1.0, n_rows / target_occupancy))
        while (k - d) * (64 // k) < need and k < d + 1 + max_extra and 64 // (k + 1) >= 1:
            k += 1
    return k


def _simhash_band_geometry(k: int, max_hamming: int):
    """Shared banding geometry: per-block bit widths (64 split into ``k``
    contiguous blocks, remainder spread over the first blocks) and the
    ``(k - d)``-subsets used as candidate keys."""
    import itertools

    widths = [64 // k + (1 if i < 64 % k else 0) for i in range(k)]
    offsets = [sum(widths[:i]) for i in range(k)]
    combos = list(itertools.combinations(range(k), k - max_hamming))
    return widths, offsets, combos


def simhash_clustered_probe(
    sample_sigs: DataFrame,
    max_hamming: int,
    n_blocks: int,
) -> tuple[int, float]:
    """Measure banding collision mass on a SAMPLE of signatures vs the
    uniform-hash model's prediction — the clustered-regime detector behind
    :func:`simhash_pairs`'s auto default (r14 verdict item 2).

    ``sample_sigs`` is a small ``(id, blk, sig)`` frame (~2k rows). Returns
    ``(measured, predicted)`` where ``measured`` is the banded collision
    mass Σ over (blk, band, key) buckets of C(occupancy, 2), and
    ``predicted`` is what uniformly-random 64-bit signatures would put in
    the same buckets: Σ over bands of (same-blk pair count) / 2^band_width.
    Both are PAIR counts over the sample, so their RATIO is invariant to
    the sample fraction (both scale ~f²) and to the corpus size (with the
    occupancy rule holding 2^width ≈ N/target, chance mass per sampled
    pair is ~target/2N while clustered mass per sampled pair is the
    corpus's per-doc duplicate density — both N-normalized the same way).
    Calibration (SCALING.md band-width appendix, measured round 14, N=50k,
    d=8, k=10): clustered fixture 152.9M measured vs 8.7M uniform ≈ 17.6×;
    uniform control ≈ 1×.

    Cost: one tiny two-stage aggregation over sample-size × C(k, d) rows —
    no corpus pass; the caller samples before signature computation.
    """
    k = max(max_hamming + 1, min(n_blocks, 64))
    widths, _, combos = _simhash_band_geometry(k, max_hamming)
    buckets = simhash_buckets(sample_sigs, max_hamming, k)
    occ = buckets.groupBy("blk", "bidx", "bval").agg(
        F.count(F.lit(1)).alias("c")
    )
    measured_row = occ.agg(
        F.sum(F.expr("c * (c - 1)") / 2).cast("bigint").alias("m")
    ).first()
    measured = int(measured_row.m or 0)
    # chance model: same-blk sample pairs spread uniformly over each band's
    # 2^width key space (block widths differ when 64 % k != 0 — use each
    # combo's exact guaranteed width)
    blk_counts = [
        r.c
        for r in sample_sigs.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    same_blk_pairs = sum(c * (c - 1) / 2 for c in blk_counts)
    predicted = sum(
        same_blk_pairs / float(2 ** sum(widths[b] for b in combo))
        for combo in combos
    )
    return measured, predicted


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
) -> DataFrame:
    """64-bit SimHash sketch per row: ``(id, blk, sig)``.

    Computed via explode + 64 codegen'd SUM aggregates (per-bit majority
    votes) — same rationale as the MinHash path: interpreted array lambdas
    are ~100x slower than whole-stage-codegen hash aggregation. The 64
    token-hash bits are md5-derived (two 8-hex-char halves -> two 32-bit
    ints, composed hi<<32 | lo) instead of xxhash64: md5 is bit-identical
    in DuckDB, so the whole sketch — votes, signature, banding, hamming
    distances — has an exact SQL oracle (the repo's hash-determinism
    policy, operators/sampling.py)."""
    hi = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("bigint")
    # Rebalance by id WHEN the corpus arrives as one fat scan task: without
    # it the 64-accumulator partial aggregation runs inside the single scan
    # task of a one-file corpus slice (measured 0.79s on one core at
    # sf0.1). At scale the scan fans out on its own and no exchange is
    # added (`partitioning.rebalance_narrow_input`).
    src = rebalance_narrow_input(
        df.select(
            F.col(id_col).alias("id"),
            *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
            F.col(text_col).alias("__text"),
        ),
        "id",
    )
    ex = src.select(
        "id", "blk", F.explode(T.words("__text")).alias("tok")
    ).select("id", "blk", F.shiftleft(hi, 32).bitwiseOR(lo).alias("h"))
    # The 64 majority-vote aggregates and the 64-term signature assembly
    # are built as F.expr() SQL strings: ONE py4j round trip per
    # expression instead of ~8 nested Column-API calls each — the Column
    # form spent ~1.7s PER QUERY BUILD in driver-side py4j chatter
    # (measured r15; the plan and values are identical).
    votes = ex.groupBy("id", "blk").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {bit}) & 1) = 1"
                " THEN 1 ELSE -1 END)"
            ).alias(f"v{bit}")
            for bit in range(64)
        ]
    )
    sig_sql = " + ".join(
        f"(CASE WHEN v{bit} > 0 THEN shiftleft(CAST(1 AS BIGINT), {bit})"
        " ELSE CAST(0 AS BIGINT) END)"
        for bit in range(64)
    )
    # Both self-join sides read this one aggregate; its exchange is reused
    # (AQE), so no checkpoint barrier is needed for a 1-row-per-doc frame.
    return votes.select("id", "blk", F.expr(sig_sql).alias("sig"))


def simhash_buckets(
    base: DataFrame, max_hamming: int, n_blocks: int
) -> DataFrame:
    """Explode a ``(id, blk, sig)`` signature frame into candidate keys:
    one ``(id, blk, sig, bidx, bval)`` row per ``(n_blocks - max_hamming)``
    -subset of contiguous bit-blocks (Manku/Jain/Das Sarma block
    combinations; ``n_blocks = max_hamming + 1`` is classic single-block
    banding as the special case). Exposed separately so the scaling audit
    can measure bucket occupancy / candidate volume per ``n_blocks``."""
    k = max(max_hamming + 1, min(n_blocks, 64))
    widths, offsets, combos = _simhash_band_geometry(k, max_hamming)

    def block_val(sig, i):
        return F.shiftright(sig, offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))

    def key_val(sig, combo):
        acc = block_val(sig, combo[0])
        for b in combo[1:]:
            acc = F.shiftleft(acc, widths[b]).bitwiseOR(block_val(sig, b))
        return acc

    bands = F.array(
        *[
            F.struct(
                F.lit(ci).alias("bidx"), key_val(F.col("sig"), combo).alias("bval")
            )
            for ci, combo in enumerate(combos)
        ]
    )
    return base.select(
        "id", "blk", "sig", F.explode(bands).alias("band")
    ).select("id", "blk", "sig", F.col("band.bidx").alias("bidx"), F.col("band.bval").alias("bval"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    max_hamming: int = 12,
    n_blocks: int | None = None,
    target_occupancy: int = 160,
    clustered_guard_ratio: float = 4.0,
    probe_sample_target: int = 2000,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit sketch, hamming <= t, within a block.

    Candidate generation splits the 64 signature bits into ``n_blocks``
    bit-blocks and keys candidates on every ``(n_blocks - max_hamming)``
    -subset of blocks (concatenated block values): by pigeonhole, a pair
    within ``max_hamming`` differing bits leaves at least that many blocks
    untouched, so it agrees on at least one whole key — ZERO false
    negatives at any ``n_blocks``, and candidates shuffle on key values
    instead of exploding quadratically per block. ``n_blocks =
    max_hamming + 1`` is classic contiguous banding (keys are single
    blocks); larger values WIDEN the keys (more, sharper tables — the
    Manku-style probe/table trade), which is what keeps candidate volume
    linear as the corpus grows. The DEFAULT (``n_blocks=None``) spends one
    cheap count to pick the occupancy-targeting value
    (:func:`auto_simhash_blocks`); the measured sweep is in SCALING.md's
    simhash band-width appendix. Because the final hamming verify is
    exact and the guarantee is exact, the OUTPUT is banding-independent —
    ``n_blocks`` moves cost, never values.

    **Clustered-regime guard (r15):** the occupancy rule's win
    (`C(k,d)·N·target` linear candidates) assumes signatures spread like
    uniform hashes. On a near-dup-DENSE corpus the collider mass is
    correlated pairs that share every band regardless of key width, so
    wider keys only multiply key-row volume — measured 17.8s/123 MB at
    the auto k=10 vs 13.1s/52 MB at classic k=9 on the round-14 sf1.0
    fixture. When the auto rule picks a non-classic ``k``, one sampled
    occupancy probe (~``probe_sample_target`` docs, no corpus pass —
    :func:`simhash_clustered_probe`) compares measured banding collision
    mass to the uniform model's prediction; measured >
    ``clustered_guard_ratio`` × predicted falls back to classic
    ``k = d + 1`` (decision logged at INFO). The sampled ratio is
    corpus-size and sample-fraction invariant (see the probe docstring);
    the calibration points are ≈17.6× (clustered fixture) vs ≈1×
    (uniform control).
    """
    if n_blocks is None:
        n_rows = df.count()
        n_blocks = auto_simhash_blocks(
            n_rows, max_hamming, target_occupancy=target_occupancy
        )
        if n_blocks > max_hamming + 1 and probe_sample_target > 0:
            # deterministic ~probe_sample_target-doc sample: md5-derived
            # residue on the id, no rand() (same run -> same decision)
            stride = max(1, n_rows // probe_sample_target)
            samp = df.where(
                F.conv(
                    F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % stride
                == 0
            )
            sigs = simhash_signatures(
                samp, text_col=text_col, id_col=id_col, block_col=block_col
            )
            measured, predicted = simhash_clustered_probe(
                sigs, max_hamming, n_blocks
            )
            # floor keeps a near-empty sample from flapping the decision
            if measured > clustered_guard_ratio * max(predicted, 32.0):
                import logging

                logging.getLogger(__name__).info(
                    "simhash auto-banding: clustered regime detected "
                    "(sampled collision mass %d > %.0fx uniform prediction "
                    "%.1f at k=%d); falling back to classic k=%d",
                    measured, clustered_guard_ratio, predicted, n_blocks,
                    max_hamming + 1,
                )
                n_blocks = max_hamming + 1
    base = simhash_signatures(df, text_col=text_col, id_col=id_col, block_col=block_col)
    buckets = simhash_buckets(base, max_hamming, n_blocks)
    # shuffle_hash keeps the self-join symmetric: a broadcast build side
    # would re-run the whole 64-aggregate votes pipeline to materialize the
    # broadcast (no exchange sharing with the probe side) — measured 1.4x
    # slower warm and 2x cold than the two-sided hash join at sf0.1.
    a, b = buckets.alias("a"), buckets.hint("shuffle_hash").alias("b")
    # Predicate ordering matters more than avoiding the dedup exchange: a
    # pair sharing k bands surfaces k times, but the cheap, highly selective
    # hamming test (xor + popcount — 2 codegen instructions) runs FIRST on
    # the full collision stream, and the dropDuplicates exchange then only
    # shuffles true near-dup pairs — a stream bounded by the operator's own
    # output size, which any consumer pays for anyway. (The previous
    # keep-at-first-agreeing-band filter avoided that exchange but evaluated
    # a 2×n_bands-term band-extraction predicate on every raw collision —
    # measured 1.6× slower on the dense-duplicate fixture.)
    return (
        a.join(
            b,
            (F.col("a.bidx") == F.col("b.bidx"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            H.hamming64(F.col("a.sig"), F.col("b.sig")).cast("bigint").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )


def auto_bits_per_table(
    n_rows: int, target_occupancy: int = 160, floor_bits: int = 4
) -> int:
    """Occupancy-targeting LSH signature width:
    ``max(floor_bits, ceil(log2(n_rows / target_occupancy)))``.

    Keeps expected bucket load roughly constant as the corpus grows — the
    un-floored result lands occupancy in ``(target/2, target]``, so
    candidate volume stays ~``L * N * target / 2`` (linear in N) instead
    of the fixed-bits ``L * N² / 2^b`` quadratic. The default target (160)
    reproduces the round-12 SCALING appendix's measured sweet spot: bits 7
    at the 20k-vector sf1.0 decade (8.7s -> 3.0s vs fixed bits 4, recall
    ≈ 1 for true near-dups) while leaving the ≤2k fixtures at the pinned
    floor of 4 — so the DuckDB oracle for `dedup_embedding_cosine`
    (hardwired to 4 bits) stays bit-exact at every driver scale factor."""
    import math

    if n_rows <= 0:
        return floor_bits
    return max(floor_bits, math.ceil(math.log2(max(1.0, n_rows / target_occupancy))))


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.4,
    bits_per_table: int | None = None,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs (id1 < id2, sim >= t) via hyperplane-LSH blocking.

    Candidate generation is multi-table random-hyperplane LSH: ``n_tables``
    independent ``bits_per_table``-bit sign signatures per vector; two
    vectors are candidates if they share ANY table's bucket (and the
    optional ``block_col``, kept as a secondary key). Candidates shuffle on
    the bucket value — never an all-pairs join within a block, so a huge or
    skewed block stays linear, not quadratic. Survivors are verified with
    the exact rounded cosine.

    Recall is the standard (b, L) S-curve ``1 - (1 - p^b)^L`` with
    ``p = 1 - θ/π``: ≈1.0 for true near-dups (cosine ≥ 0.9) at the
    (4, 16) default; borderline-threshold pairs are probabilistically
    pruned, which is the documented LSH trade.

    **Scale the bits with the corpus.** At FIXED ``bits_per_table`` the
    bucket count (``2^b`` per table) is constant, so expected bucket
    occupancy grows with N and candidate volume grows ~``L * N^2 / 2^b``
    — the same structural quadratic the SemDeDup cap guards against.
    The DEFAULT (``bits_per_table=None``, round 13) therefore
    auto-scales: one cheap count feeds :func:`auto_bits_per_table`, which
    keeps expected occupancy roughly constant (each +1 bit halves
    per-bucket load and sharpens the S-curve; recall for true near-dups
    stays ≈1 while borderline pairs prune harder). Measured at the local
    sf1.0 (20k isotropic vectors): bits 4→7 cuts wall-clock 8.7s→3.0s
    (SCALING.md appendix). The registered `dedup_embedding_cosine`
    fixture deliberately pins ``bits_per_table=4`` so its static SQL
    oracle stays deterministic.
    """
    n_rows = None  # known only on the auto-bits path; gates the gathered verify
    if bits_per_table is None:
        n_rows = df.count()
        bits_per_table = auto_bits_per_table(n_rows)
    planes = V.seeded_planes(bits_per_table * n_tables, dim, seed)
    # Rebalance by id WHEN the corpus arrives as too few scan tasks: the
    # Arrow matmul signature pass otherwise inherits the scan's split
    # layout and a one-file corpus slice runs it on 1-2 tasks (measured
    # 0.88s of the sf0.1 edge stage serialized on 2 cores). At scale the
    # scan fans out on its own and no exchange is added
    # (`partitioning.rebalance_narrow_input`).
    base = rebalance_narrow_input(
        df.select(
            F.col(id_col).alias("id"),
            *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
            F.col(vec_col).alias("v"),
        ),
        "id",
    )
    # Per-table bucket keys come out of the Arrow matmul pass as packed
    # longs (one numpy reshape-matmul — no bit-string materialization, no
    # per-row substring slicing in the plan); posexplode yields one
    # (table, bucket) row per table. Bucket partitions are bijective with
    # the bit-string form, so the candidate set — and the SQL oracle that
    # mirrors it — is unchanged.
    keys = V.hyperplane_table_keys(
        base, "v", "id", planes, bits_per_table, extra_cols=("blk",)
    )
    tb = keys.select("id", "blk", F.posexplode("tkeys").alias("tidx", "bucket"))
    # shuffle_hash: broadcasting one side would re-run the Arrow signature
    # pass (a Python stage!) to build the broadcast relation; the symmetric
    # hash join shuffles the slim (id, blk, tidx, bucket) rows instead.
    a, b = tb.alias("a"), tb.hint("shuffle_hash").alias("b")
    # A pair sharing k tables surfaces k times; dedup the candidate stream
    # before verification. The exchange only carries (id1, id2) pairs, and
    # shrinking the stream *before* the vector-fetch joins + Arrow cosine
    # is what matters — the exact verification is the expensive stage.
    cand = (
        a.join(
            b,
            (F.col("a.tidx") == F.col("b.tidx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    # Exact-cosine verification. Two value-identical forms (same float64
    # einsum, same round-6), chosen by the broadcast-join budget:
    #
    # - GATHERED (r15, guide §8 "decide with small rows"): when the corpus
    #   vector table fits the broadcast budget the verify ships ONLY the
    #   (id1, id2) pairs into the Arrow pass and gathers operand rows from
    #   one closure-shipped matrix — the join-attach form duplicated both
    #   64-dim vectors per candidate pair, ~1.3 GB across the Python
    #   boundary for the 1.28M-pair sf0.1 verify vs ~15 MB of id pairs.
    #   The driver-side footprint is the SAME bound a broadcast-join build
    #   side already puts on the driver (n_rows is already known here from
    #   the auto-bits count — no extra job).
    # - JOIN-ATTACH above the budget (or when n_rows is unknown, i.e.
    #   pinned-bits callers): vectors attach by id join and cross as raw
    #   Arrow list buffers (`V.pairwise_cosine_arrow`).
    gather_budget = 64 * 1024 * 1024  # == session autoBroadcastJoinThreshold
    if n_rows is not None and n_rows * dim * 8 <= gather_budget:
        vec_rows = base.select("id", "v").collect()  # bounded: <= budget
        return V.pairwise_cosine_gather(
            cand, vec_rows, "id1", "id2", out_col="cosine"
        ).where(F.col("cosine") >= threshold)
    v1 = base.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    v2 = base.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    return (
        V.pairwise_cosine_arrow(
            cand.join(v1, "id1").join(v2, "id2").select("id1", "id2", "v1", "v2"),
            "v1",
            "v2",
            out_col="cosine",
        )
        .where(F.col("cosine") >= threshold)
    )


def incremental_dedup(
    new_df: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Dedup a NEW batch against an already-ingested corpus — the shape a
    production pipeline actually runs (the full corpus is never re-deduped;
    each increment lands against the accumulated fingerprint store).

    Two stages, both single-shuffle:

    1. intra-batch: keep the min-id row per fingerprint within the batch;
    2. cross-corpus: anti-join the batch fingerprints against
       ``seen_fingerprints`` (a 1-column frame — at 100 TB a bucketed table
       partitioned by fingerprint, making this a zero-shuffle bucket join;
       small increments broadcast instead).

    Returns the surviving new rows with their fingerprint attached — the
    caller appends these rows AND their fingerprints to the respective
    stores (both appends are idempotent under replay because survivors are
    keyed by fingerprint).
    """
    fp = T.fingerprint_md5(T.normalized(text_col) if normalize else F.col(text_col))
    batch = new_df.withColumn("fingerprint", fp)
    w = W.partitionBy("fingerprint").orderBy(F.col(id_col))
    intra = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    seen = seen_fingerprints.select(
        F.col(seen_fingerprints.columns[0]).alias("fingerprint")
    )
    return intra.join(seen, "fingerprint", "left_anti")


def survivors(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop the higher id of every near-dup pair (greedy, deterministic)."""
    losers = pairs.select(F.col("id2").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def connected_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate clusters: ``(id, component, component_size)`` where
    ``component`` is the minimum id reachable through the near-dup pair
    graph (singletons are their own component).

    Iterative min-label propagation: each round every node takes the
    minimum of its own label and its neighbors' labels; converges in
    graph-diameter rounds (near-dup clusters are shallow — dup chains,
    not long paths). Each round is one join + one aggregate, both shuffling
    on node id, and lineage truncates per round (checkpoint) so the plan
    doesn't snowball — the standard Spark shape for bounded iterative
    graph algorithms (at extreme scale swap in large-star/small-star,
    which is the same join-agg loop with two rules).

    The greedy `survivors` policy (drop id2 of every pair) equals keeping
    exactly ``component == id`` rows of this output.
    """
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = df.select(F.col(id_col).alias("node")).withColumn(
        "comp", F.col("node")
    ).localCheckpoint()
    for _ in range(max_iter):
        nb = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("comp").alias("dst_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nb_min"))
        )
        new_labels = (
            labels.join(nb, labels["node"] == nb["src"], "left")
            .select(
                labels["node"],
                F.least(
                    labels["comp"], F.coalesce(nb["nb_min"], labels["comp"])
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("component_size"))
    return labels.join(sizes, "comp").select(
        F.col("node").alias(id_col),
        F.col("comp").alias("component"),
        "component_size",
    )


def best_survivors(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivorship: one row per near-dup component —
    ``(component, survivor_id, <score_col>, component_size)`` — keeping the
    HIGHEST-scoring member (tie-break lowest id). Singletons survive as
    their own component.

    The upgrade over the greedy :func:`survivors` (drop the higher id of
    every pair): when duplicates differ in cleanliness, the pipeline keeps
    the best copy, not the first-crawled one. Cost on top of
    :func:`connected_components` is one broadcast-sized score join and a
    per-component rank — both shuffle on keys already clustered by the
    component aggregation.
    """
    comp = connected_components(df, pairs, id_col)
    w = W.partitionBy("component").orderBy(F.col(score_col).desc(), F.col(id_col))
    return (
        comp.join(df.select(id_col, score_col), id_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "component",
            F.col(id_col).alias("survivor_id"),
            score_col,
            "component_size",
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 16,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-duplication spans per document — the signal behind
    "exact substring deduplication" (Lee et al. 2022, *Deduplicating
    Training Data Makes Language Models Better*): any ``gram``-token window
    whose exact text occurs ``min_count``+ times anywhere in the corpus
    (other documents OR elsewhere in the same one) marks its tokens as
    duplicated; overlapping/adjacent duplicated windows merge into maximal
    spans.

    Returns one row per document:
    ``(id_col, n_tokens, n_dup_spans, dup_tokens, dup_ratio)`` —
    ``dup_ratio`` is the fraction of tokens inside duplicated spans, the
    number a curation run thresholds on (or uses to cut the spans out).

    Scale shape (100 TB): unlike pair-generating dedup, this NEVER joins
    occurrences against occurrences — the corpus-wide step is ONE hash
    aggregation on the gram fingerprint (map-side partial agg; a
    boilerplate gram occurring 10^9 times is still one count row) followed
    by ONE semi join back, so there is no quadratic regime and no hot-key
    cap needed. Window steps are partitioned by document id — bounded by
    document length, never by corpus size. Shingling reuses the codegen
    explode + slice + concat_ws shape of `_exploded_shingles` (the
    interpreted `transform` lambda measured ~8µs/element in round 1).

    The md5 gram fingerprint keeps the operator value-exact against a
    DuckDB oracle, same hash-determinism policy as MinHash/SimHash.

    Null/empty contract: NULL or whitespace-only text reads as the empty
    token array — ``n_tokens = 0``, zero spans, ``dup_ratio = 0.0`` — a
    fully-defined row (a NULL ``n_tokens`` would break downstream
    thresholds like the flagship pipeline's ``dup_ratio < 0.5`` gate).
    """
    # Rebalance ships the RAW text and tokenizes ABOVE the exchange (r15,
    # same restructure as _exploded_shingles): below it, the trim+split
    # ran inside the one-task scan stage of a one-file corpus. No-op (no
    # exchange, tokenize stays in the scan) at scale.
    src = rebalance_narrow_input(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")), "id"
    )
    t = F.trim(F.coalesce(F.col("__t"), F.lit("")))
    arr = F.when(
        F.length(t) == F.lit(0), F.array().cast("array<string>")
    ).otherwise(F.split(t, " +"))
    w = src.select("id", arr.alias("w")).withColumn("n", F.size("w"))
    occ = w.where(F.col("n") >= gram).select(
        "id",
        F.explode(F.sequence(F.lit(0), F.col("n") - F.lit(gram))).alias("pos"),
        "w",
    ).select(
        "id", "pos", F.md5(F.concat_ws(" ", F.slice("w", F.col("pos") + 1, gram))).alias("gh")
    )
    dup_grams = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("gh")
    )
    dup_occ = occ.join(dup_grams, "gh", "left_semi").select(
        "id", "pos", (F.col("pos") + F.lit(gram - 1)).alias("end")
    )
    # Gaps-and-islands merge: a window starts a new span iff it begins more
    # than one token past everything covered so far (overlap OR adjacency
    # merges). Running-max end over (id, pos) — per-document window state.
    w_prev = (
        W.partitionBy("id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = W.partitionBy("id").orderBy("pos")
    spans = (
        dup_occ.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("pos") > F.col("prev_end") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("span_id", F.sum("new_span").over(w_run))
        .groupBy("id", "span_id")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
    )
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
    )
    return (
        w.select("id", F.col("n").cast("bigint").alias("n_tokens"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.5,
    n_clusters: int = 16,
    train_iters: int = 1,
    max_cluster_size: int | None = None,
    target_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup: ``(id1, id2, cosine, cluster)``
    pairs with ``cosine >= threshold``, compared ONLY within k-means clusters.

    The composition a 100 TB curation run actually executes (Abbas et al.
    2023, "SemDeDup"): spherical k-means clusters the embedding space
    (`similarity.kmeans_codebook` — distributed Lloyd updates, the driver
    holds k x dim floats), every vector routes to its nearest centroid in
    one Arrow matmul pass, and near-duplicate candidates are intra-cluster
    ONLY — cross-cluster pairs are never generated, so the pair stage is a
    plain equi-join on the cluster id, not an all-pairs product.

    Scale note: per-cluster work is quadratic in CLUSTER size, which is the
    knob — SemDeDup scales ``n_clusters`` with the corpus so the expected
    cluster stays bounded (the paper uses ~100k clusters for LAION-scale);
    with bounded clusters the equi-join's per-key fan-out is bounded too.
    Compose with :func:`connected_components` / :func:`best_survivors` for
    survivorship, exactly like the other pair generators in this module.

    Hot-cluster guard (``max_cluster_size``): k-means gives no WORST-CASE
    cluster bound — one degenerate mega-cluster (e.g. a constant-embedding
    failure mode upstream) turns the equi-join quadratic, the analog of the
    hot-shingle key ``max_shingle_df`` kills for Jaccard. When set, clusters
    larger than the cap are sub-split by a secondary content hash of the id
    into ``ceil(size / max_cluster_size)`` buckets and candidates are
    generated intra-(cluster, bucket) only, so expected per-key fan-out
    stays ~``max_cluster_size`` regardless of skew. Tradeoff, stated
    plainly: pairs straddling sub-buckets of a HOT cluster are not
    generated (expected recall inside an oversized cluster ~1/n_sub);
    normal-sized clusters are untouched. The primary scale knob remains
    ``n_clusters`` — the cap is the structural backstop that keeps one bad
    cluster from stalling the whole job. Sub-assignment is content-derived
    (first 8 hex digits of ``md5(id)`` mod the per-cluster sub count —
    the repo's engine-portable md5 convention, so a DuckDB oracle
    reproduces every sub-bucket bit-for-bit) with deterministic sizes, so
    output is partitioning-invariant like every other pair generator here.

    Differences vs :func:`embedding_near_dup_pairs` (LSH blocking): LSH
    targets high-cosine NEAR-DUPS with per-table recall guarantees;
    SemDeDup prunes at lower thresholds ("semantically redundant", not
    "almost identical") where hyperplane-LSH recall decays — clustering
    keeps moderate-similarity neighbors co-located.
    k ∝ N (``target_cluster_size``): the paper's actual scale recipe —
    SemDeDup holds the EXPECTED cluster size fixed and grows the cluster
    COUNT with the corpus (~100k clusters at LAION scale). When set,
    ``n_clusters`` becomes a floor and the effective k is
    ``max(n_clusters, ceil(N / target_cluster_size))`` from one cheap
    count, so the intra-cluster pair term is linear in N by construction
    (expected pairs/cluster stays ~``target_cluster_size²/2`` while
    clusters multiply). This is the production default; the fixed-k form
    is the oracle fixture whose round-12 decade measured alpha 1.52.
    """
    from .similarity import ivf_train_or_init

    if target_cluster_size is not None:
        # one count job (columnar metadata scan on parquet sources) sizes
        # the codebook; driver holds k x dim floats either way
        n_rows = df.count()
        n_clusters = max(n_clusters, -(-n_rows // target_cluster_size))
    codebook = ivf_train_or_init(df, vec_col, id_col, n_clusters, train_iters)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # materialize the routing pass ONCE (r15): downstream it has three
    # readers (both candidate self-join sides + the hot-cluster sizes agg
    # when capped), and without the checkpoint each reader re-ran the
    # Arrow matmul over the corpus — 3 MapInPandas nodes in the final
    # executed plan, measured. Doc-cardinality, two narrow columns.
    assigned = (
        V.matrix_dots(base, "v", "id", codebook, out_id="id")
        .select(
            "id",
            F.expr("array_position(dots, array_max(dots))").cast("int").alias("cluster"),
        )
        .localCheckpoint()
    )
    if max_cluster_size is not None:
        sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__n"))
        n_sub = F.greatest(
            F.ceil(F.col("__n") / F.lit(float(max_cluster_size))).cast("bigint"),
            F.lit(1).cast("bigint"),
        )
        # sizes is n_clusters rows — broadcast; sub is 0 for normal clusters.
        # md5-derived bucket (not xxhash64): first 8 hex digits are a
        # uniform non-negative 32-bit value both engines compute identically.
        id_h = F.conv(
            F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        assigned = assigned.join(F.broadcast(sizes), "cluster").select(
            "id",
            "cluster",
            F.pmod(id_h, n_sub).cast("int").alias("sub"),
        )
    else:
        assigned = assigned.withColumn("sub", F.lit(0))
    a, b = assigned.alias("a"), assigned.alias("b")
    cand = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id1"), F.col("b.id").alias("id2"), F.col("a.cluster").alias("cluster")
    )
    # Exact verification: vectors join back by id (they never ride the
    # cluster shuffle); one zero-copy Arrow cosine pass over the candidate
    # pairs (r15 — see `embedding_near_dup_pairs`; values identical).
    v1 = base.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    v2 = base.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    return (
        V.pairwise_cosine_arrow(
            cand.join(v1, "id1")
            .join(v2, "id2")
            .select("id1", "id2", "cluster", "v1", "v2"),
            "v1",
            "v2",
            out_col="cosine",
        )
        .select("id1", "id2", "cosine", "cluster")
        .where(F.col("cosine") >= threshold)
    )


def _bloom_positions(value: F.Column, m_bits: int, k: int) -> F.Column:
    """Array of ``k`` bit positions for one key: position_j = first 8 hex
    digits of ``md5(j || '|' || value)`` as an integer, mod ``m_bits``.
    Content-derived and engine-portable (the repo's md5 determinism
    policy), so a DuckDB oracle reproduces every bit."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.lit(str(j)), value)), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % m_bits
            )
            for j in range(k)
        ]
    )


def bloom_params(n_keys: int, fp_rate: float = 1e-3) -> tuple[int, int]:
    """Textbook Bloom sizing: the smallest ``(m_bits, k)`` hitting
    ``fp_rate`` for ``n_keys`` distinct keys —
    ``m = ceil(-n * ln(p) / ln(2)^2)`` and ``k = round(m/n * ln 2)``.

    The m-vs-n contract, stated plainly: the FP rate is a function of
    BITS PER KEY (~9.6 bits/key → 1%, ~14.4 → 0.1%, ~19.2 → 0.01%), so a
    fixed ``m_bits`` silently saturates as the reference set grows — at
    ``n = m`` the filter answers true for nearly everything (degradation
    is always precision, never recall; pinned in tests). Size from the
    reference cardinality, not a constant. Memory reality check at the
    large end: a billion keys at 0.1% need ~14.4 Gbit ≈ 1.8 GB riding a
    broadcast — at that point shard the reference into several filters
    (`bloom_merge` keeps them composable) or accept a higher fp_rate;
    the probe cost is unchanged either way."""
    import math

    n = max(int(n_keys), 1)
    m = max(64, math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_build(
    ref: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int | None = None,
    fp_rate: float = 1e-3,
) -> DataFrame:
    """Build a Bloom filter over a reference key set as a ONE-ROW DataFrame
    ``(bloom: map<bigint, bigint>, m_bits: bigint, k: int)`` — set 64-bit
    words keyed by word index (sparse: absent word == all-zero), plus the
    sizing parameters so the filter is SELF-DESCRIBING: `bloom_probe` and
    `bloom_merge` read/validate them instead of trusting callers to
    repeat the right constants. The build is one explode + one hash
    aggregate of the reference side; nothing data-sized touches the
    driver.

    Sizing (round 9): when ``m_bits`` is None it is derived from the
    reference's DISTINCT key count via :func:`bloom_params` at
    ``fp_rate`` (default 0.1% — ~14.4 bits/key); ``k`` defaults to the
    matching optimum. Pass both explicitly to pin a cross-engine oracle
    or to share parameters across separately-built mergeable snapshots
    (auto-sizing two snapshots of different cardinality would yield
    incompatible filters — `bloom_merge` raises on that).

    This is the scale path for membership screens against a reference set
    (benchmark decontamination, "seen in a previous snapshot" dedup): the
    filter is O(m_bits) regardless of corpus size, rides a broadcast, and
    turns the probe into map-side-only work — the corpus being screened
    never shuffles at all, unlike an anti-join which shuffles both sides.
    """
    if m_bits is None:
        # bounded-collect: one scalar — the distinct reference cardinality
        n_keys = ref.select(key_col).distinct().count()
        auto_m, auto_k = bloom_params(n_keys, fp_rate)
        m_bits = auto_m
        if k is None:
            k = auto_k
    elif k is None:
        k = 4
    pos = ref.select(
        F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    words = pos.groupBy(F.expr("CAST(pos DIV 64 AS BIGINT)").alias("w")).agg(
        # bit_or of per-position masks; shiftleft on 1L is exact for 0..63
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")).alias(
            "bits"
        )
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom"),
        F.lit(int(m_bits)).cast("bigint").alias("m_bits"),
        F.lit(int(k)).cast("int").alias("k"),
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int | None = None,
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Probe a `bloom_build` filter: adds ``flag_col`` (true = probably in
    the reference set, false = DEFINITELY not). The 1-row filter crosses
    in as a broadcast (scalar-subquery shape, documented in
    tests/test_plans.py NO_CARTESIAN_EXEMPT); the probe itself is pure
    map-side expression work — zero shuffle of the probed corpus.

    ``m_bits``/``k`` default to the filter's OWN recorded parameters
    (self-describing build — reading them costs one 1-row job on the
    static filter side; pass both explicitly on hot paths to skip it or
    when pinning a cross-engine oracle). A mismatch between explicit
    params and the filter's recorded ones would silently break the
    zero-false-negative guarantee, which is exactly why the recorded
    values are the default.

    Standard Bloom semantics: false positives at ``(1 - e^(-k*n/m))^k``
    — sized by `bloom_params` at build time (see its m-vs-n contract) —
    and zero false negatives. Production screens confirm hits exactly
    (the hit subset is tiny, so the confirm join is cheap) — see the
    `dedup_bloom_prefilter` query for the composed shape."""
    if m_bits is None or k is None:
        # bounded-collect: the filter's single metadata row
        meta = bloom.select("m_bits", "k").first()
        m_bits = int(meta["m_bits"]) if m_bits is None else m_bits
        k = int(meta["k"]) if k is None else k
    probed = df.crossJoin(F.broadcast(bloom.select("bloom")))
    pos_cols = []
    for j in range(k):
        pc = f"__bpos{j}"
        probed = probed.withColumn(
            pc,
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(str(j)), F.col(key_col))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits,
        )
        pos_cols.append(pc)
    checks = [
        F.expr(
            f"(coalesce(element_at(bloom, CAST({pc} DIV 64 AS BIGINT)), "
            f"CAST(0 AS BIGINT)) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({pc} % 64 AS INT))) != 0"
        )
        for pc in pos_cols
    ]
    hit = checks[0]
    for c in checks[1:]:
        hit = hit & c
    return probed.withColumn(flag_col, hit).drop("bloom", *pos_cols)


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union `bloom_build` filters built with the SAME ``m_bits``/``k``:
    OR the sparse word maps. Bloom filters are exactly mergeable —
    probe(merge(A, B)) ≡ probe(build(A ∪ B)) bit-for-bit — which is what
    makes the membership screen incremental at 100 TB: each new crawl
    snapshot builds its own filter from only its own keys, and the
    accumulated "everything previously ingested" filter is a constant-size
    merge, never a re-scan of history. One explode + one hash aggregate of
    O(m_bits/64) rows per input.

    Raises ``ValueError`` when the inputs' recorded ``(m_bits, k)``
    disagree: ORing differently-sized filters produces garbage that still
    LOOKS like a filter (hits and misses both plausible), so the mismatch
    must fail loudly at merge time — the practical footgun of the
    incremental pattern is auto-sizing each snapshot independently; pin
    explicit params across snapshots instead (see `bloom_build`).
    The check reads each input's 1-row metadata (bounded, filter-sized)."""
    u = blooms[0].select("bloom", "m_bits", "k")
    for b in blooms[1:]:
        u = u.unionByName(b.select("bloom", "m_bits", "k"))
    # bounded-collect: one (m_bits, k) row per input filter
    params = {(r["m_bits"], r["k"]) for r in u.select("m_bits", "k").collect()}
    if len(params) > 1:
        raise ValueError(
            f"bloom_merge: incompatible filters {sorted(params)} — rebuild "
            "with shared explicit (m_bits, k)"
        )
    ((m_bits, k),) = params
    words = u.select(F.explode("bloom").alias("w", "bits")).groupBy("w").agg(
        F.bit_or("bits").alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom"),
        F.lit(int(m_bits)).cast("bigint").alias("m_bits"),
        F.lit(int(k)).cast("int").alias("k"),
    )


def group_disjoint_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
) -> DataFrame:
    """Leakage-free train/val assignment: split by near-duplicate CLUSTER,
    not by document — ``(id, component, split)`` where every member of a
    connected component inherits the split of the component's min-id label.

    A per-document hash split (`functions.text.train_val_split`) puts ~10%
    of each near-dup cluster's members in val — the classic evaluation
    leak, where val examples have train twins (Lee et al. 2022 measure
    exactly this in C4/RealNews). Deriving the split from the component
    label makes straddling impossible by construction, while keeping the
    same md5-bucket determinism (stable across engines, reruns and
    repartitions).

    Scale: `connected_components` (iterative min-label propagation,
    lineage-checkpointed) plus one string-cast md5 per row — no new
    shuffle beyond the components computation itself.
    """
    comp = connected_components(df, pairs, id_col=id_col)
    return comp.select(
        id_col,
        "component",
        T.train_val_split(F.col("component").cast("string"), train_pct).alias(
            "split"
        ),
    )
