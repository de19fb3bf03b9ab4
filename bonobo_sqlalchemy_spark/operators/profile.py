"""Corpus profiling: per-column statistics in one distributed pass.

The first step of every large-scale data-pipeline engagement — before
dedup/filter/sample decisions, you profile: row counts, null rates,
cardinalities, value ranges. The reference has no analog (its pipelines are
row streams with no statistics surface); this is the engine-native
equivalent of ``ANALYZE``/``SUMMARIZE`` exposed as a composable operator.

Plan shape: ONE aggregation over the table computes every statistic for
every requested column (null counts, exact distinct counts, min/max), then
a ``stack`` unpivot reshapes the single result row into one output row per
column — all codegen, no Python, no per-column scans. The multi-column
``COUNT(DISTINCT ...)`` expands the input k ways before the agg (Spark's
Expand operator); at 100 TB swap ``exact=False`` to HLL sketches
(``approx_count_distinct``) for a single no-expand pass with ~2% error —
the flag is the only change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str], exact: bool = True, rsd: float = 0.02
) -> DataFrame:
    """One row per requested column: ``col_name, n_rows, n_null,
    n_distinct, min_value, max_value`` (min/max as strings — type-uniform
    across profiled columns).

    ``exact=False`` switches distinct counts to ``approx_count_distinct``
    (HLL++, relative error ``rsd``) — the 100 TB default.
    """
    for c in columns:
        if "`" in c:
            raise ValueError(f"column name {c!r} contains a backtick; rename before profiling")
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}_nulls"),
            nd(c).alias(f"__{c}_nd"),
            F.min(c).cast("string").alias(f"__{c}_min"),
            F.max(c).cast("string").alias(f"__{c}_max"),
        ]
    row = df.agg(*aggs)
    # escape single quotes in the label literal; aliases are backtick-
    # quoted (backticks rejected above), so arbitrary other characters in
    # column names are safe
    labels = {c: c.replace("'", "\\'") for c in columns}
    stacked = ", ".join(
        f"'{labels[c]}', `__{c}_nulls`, `__{c}_nd`, `__{c}_min`, `__{c}_max`"
        for c in columns
    )
    return row.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {stacked}) "
            "AS (col_name, n_null, n_distinct, min_value, max_value)"
        ),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint_col: str = "text",
) -> DataFrame:
    """Snapshot diff for incremental pipelines: one row per document with
    ``(id, status)`` where status is ``added`` / ``removed`` / ``changed``
    / ``unchanged``, judged by a content fingerprint (md5 of
    ``fingerprint_col``).

    The step a recurring 100 TB crawl refresh runs FIRST: everything
    downstream (dedup, scoring, export) only needs to touch ``added`` +
    ``changed`` — the incremental counterpart of the full-corpus pass,
    same pattern as ``incremental_dedup``'s batch-vs-corpus split. One
    full outer equi-join on the id, fingerprints computed inline on each
    side (no precompute pass); both sides shuffle once on the id they are
    usually already clustered by.

    Presence is carried by an explicit per-side flag, NOT by fingerprint
    nullness: a present document whose ``fingerprint_col`` is NULL keeps
    a NULL fingerprint but still counts as present, and changed-ness is
    judged null-safely (NULL vs non-NULL = changed, NULL vs NULL =
    unchanged) — so NULL-text rows are never misclassified added/removed.
    """
    fp = lambda df, alias, flag: df.select(  # noqa: E731
        F.col(id_col).alias("__id"),
        F.md5(F.col(fingerprint_col).cast("binary")).alias(alias),
        F.lit(True).alias(flag),
    )
    j = fp(old, "__fp_old", "__in_old").join(
        fp(new, "__fp_new", "__in_new"), "__id", "full_outer"
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("__fp_old").eqNullSafe(F.col("__fp_new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("__id").alias(id_col), status.alias("status"))


def source_overlap_kmv(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
) -> DataFrame:
    """Pairwise content-overlap estimate between corpus groups (crawl
    snapshots, sources, shards) via K-Minimum-Values sketches — "how much
    of snapshot B have I already got in snapshot A?" answered WITHOUT a
    cross-group join of the corpora (Beyer et al. 2007, KMV synopses).

    Per group: the k smallest md5 fingerprints of its distinct documents.
    Per ordered pair (a < b): the k smallest of the union of both
    sketches; the fraction of those present in both sides estimates the
    Jaccard overlap of the two groups' distinct-document sets. Exactly
    reproducible cross-engine: md5 order is total (ties impossible for
    distinct fingerprints) so sketch membership is deterministic, and the
    estimate is one IEEE division rounded to 1e-6.

    Output: ``(group_a, group_b, k_used, n_shared, jaccard_est)`` for each
    unordered pair, group_a < group_b. ``k_used`` is min(k, |union
    sketch|) — the exact denominator used.

    Scale: the per-group bottom-k runs as a rank-limit window — Spark
    plans ``row_number() <= k`` as Partial WindowGroupLimit BELOW the
    exchange (asserted in tests/test_plans.py), so each input partition
    forwards at most k rows per group and no task ever sorts a whole
    group. Everything after the sketch stage is sketch-sized
    (groups² × k rows). The pair expansion is two equi-joins (no
    nested-loop shape): pairs ⋈ sketch on group_a plus pairs ⋈ sketch on
    group_b, unioned.
    """
    from pyspark.sql import Window as W

    fp = (
        df.select(
            F.col(group_col).alias("g"),
            F.md5(F.col(text_col)).alias("h"),
        )
        .dropDuplicates(["g", "h"])
    )
    rn = F.row_number().over(W.partitionBy("g").orderBy("h"))
    sketch = fp.withColumn("rn", rn).where(F.col("rn") <= k).drop("rn")

    groups = fp.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("group_a"))
        .join(groups.select(F.col("g").alias("group_b")))
        .where(F.col("group_a") < F.col("group_b"))
    )
    side_a = pairs.join(
        sketch.select(F.col("g").alias("group_a"), "h"), "group_a"
    ).select("group_a", "group_b", "h", F.lit("a").alias("side"))
    side_b = pairs.join(
        sketch.select(F.col("g").alias("group_b"), "h"), "group_b"
    ).select("group_a", "group_b", "h", F.lit("b").alias("side"))
    union = (
        side_a.unionByName(side_b)
        .groupBy("group_a", "group_b", "h")
        .agg((F.countDistinct("side") == 2).alias("in_both"))
    )
    w_pair = W.partitionBy("group_a", "group_b").orderBy("h")
    kmin = union.withColumn("rn", F.row_number().over(w_pair)).where(
        F.col("rn") <= k
    )
    return kmin.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.sum(F.when(F.col("in_both"), 1).otherwise(0)).cast("bigint").alias("n_shared"),
        F.round(
            F.sum(F.when(F.col("in_both"), 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("jaccard_est"),
    )


def distribution_psi(
    a: DataFrame,
    b: DataFrame,
    group_col: str = "source",
    weight_col: str | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots' group
    distributions — the standard drift monitor a recurring ingest runs
    before retraining: ``(group, share_a, share_b, psi_term)`` with

        psi_term = (p - q) * ln(p' / q'),   p' = max(p, eps)

    summed over groups to the headline PSI (rule of thumb: < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate). ``weight_col`` weights
    shares by e.g. token counts instead of document counts; groups present
    in only one snapshot get the ``eps`` floor on the missing side (the
    standard smoothing — a vanished or brand-new source contributes a
    large, finite term instead of ±inf).

    Scale: two map-side-combined aggregates (group-cardinality rows), one
    tiny full-outer join, per-row IEEE arithmetic. Shares are exact
    bigint/bigint divisions; psi_term rounds to 6dp, far above the
    sub-ulp ``ln`` divergence between engines (same margin policy as the
    LM logprob scorers). Output is group-cardinality — never data-sized.
    """
    wexpr = F.col(weight_col) if weight_col else F.lit(1)

    def shares(df: DataFrame, out: str) -> DataFrame:
        from .scale import single_partition_key
        from pyspark.sql import Window as W

        g = df.groupBy(F.col(group_col).alias("group")).agg(
            F.sum(wexpr).cast("bigint").alias("__w")
        )
        wz = W.partitionBy(single_partition_key())
        return g.withColumn(out, F.col("__w") / F.sum("__w").over(wz)).select(
            "group", out
        )

    pa = shares(a, "__p")
    qb = shares(b, "__q")
    p = F.coalesce("__p", F.lit(0.0))
    q = F.coalesce("__q", F.lit(0.0))
    p_ = F.greatest(p, F.lit(float(eps)))
    q_ = F.greatest(q, F.lit(float(eps)))
    return (
        pa.join(qb, "group", "full_outer")
        .select(
            "group",
            F.round(p, 6).alias("share_a"),
            F.round(q, 6).alias("share_b"),
            F.round((p - q) * F.log(p_ / q_), 6).alias("psi_term"),
        )
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Who duplicates whom: fold any pair-generator's output (MinHash-LSH,
    SimHash, SemDeDup, ...) into a source-level duplication matrix —
    ``(source_a, source_b, n_pairs, pct)`` with the pair's two sources
    ordered lexically (``source_a <= source_b``, so mirror-imaged crawls
    land on one row) and ``pct`` the share of all duplicate pairs.

    The profiling step that turns a dedup run into a DECISION: a heavy
    diagonal (intra-source) points at boilerplate within one crawl; a hot
    off-diagonal cell identifies a mirror/re-crawl pair whose ingestion
    should be deduplicated at the source list, not per-document — at
    100 TB, dropping a mirrored source upstream is free compared to
    pair-generating against it every snapshot.

    Scale: two id-equi-joins to attach sources to pair endpoints (the
    pair table is the blocked generator's bounded output, never all-pairs)
    and one aggregate to a sources^2-bounded matrix; the pct normalizer is
    a single-partition window over that bounded matrix.
    """
    from .scale import single_partition_key
    from pyspark.sql import Window as W

    src = docs.select(F.col(id_col).alias("__pid"), F.col(source_col).alias("__s"))
    cols = pairs.columns
    j = (
        pairs.join(src.withColumnRenamed("__s", "__s1"), pairs[cols[0]] == src["__pid"])
        .drop("__pid")
        .join(
            src.withColumnRenamed("__s", "__s2").withColumnRenamed("__pid", "__pid2"),
            F.col(cols[1]) == F.col("__pid2"),
        )
        .drop("__pid2")
    )
    m = j.groupBy(
        F.least("__s1", "__s2").alias("source_a"),
        F.greatest("__s1", "__s2").alias("source_b"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    wz = W.partitionBy(single_partition_key())
    return m.select(
        "source_a",
        "source_b",
        "n_pairs",
        F.round(F.col("n_pairs") / F.sum("n_pairs").over(wz), 6).alias("pct"),
    )
