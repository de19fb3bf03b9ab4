"""Data-selection operators: DSIR importance weighting, BM25 retrieval,
and filter-threshold sweeps.

Curation pipelines don't just FILTER a corpus — they choose what to keep
relative to a target distribution (DSIR), find what a query needs (BM25),
and pick the operating point for every heuristic filter (threshold
sweep). All three are pure DataFrame compositions — hash-aggregates,
broadcast joins on bucket/term tables, and windows — with no Python in
the hot path, so each has a value-exact DuckDB oracle.

Reference scope note: the reference engine (bonobo-sqlalchemy) has none
of these; this module belongs to the driver-mandated training-data
extension surface (SURVEY §2.4).

- **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): estimate hashed-n-gram bucket distributions
  for a small TARGET corpus and the RAW pool, score every raw document
  with the log importance ratio sum over its token buckets, and keep the
  top-weighted documents. The bucket tables are ``n_buckets`` rows —
  driver/broadcast-sized regardless of corpus scale — so the whole
  operator is one token shuffle + one broadcast join + one per-doc sum.
- **BM25**: classic Robertson/Sparck-Jones ranking over the corpus for a
  driver-supplied term list. df/idf and avgdl are term-table- and
  scalar-sized; tf and dl both derive from ONE doc-cardinality token
  aggregation (query terms keep their own group, everything else folds
  into a NULL group), so the corpus is scanned and shuffled exactly once.
- **Threshold sweep**: for a scored + weak-labeled corpus, emit the full
  precision/recall operating table — one row per distinct score with
  cumulative TP/FP via a window over the (distinct-score-sized) ordered
  aggregate, never a per-threshold rescan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok): lowercased whitespace tokens, empties dropped.

    The explode is CPU-dense; a narrow one-file corpus is rebalanced
    first so it fans out instead of running inside the single scan task
    (no-op, no exchange, at scale — `partitioning.rebalance_narrow_input`).
    """
    from ..partitioning import rebalance_narrow_input

    src = rebalance_narrow_input(
        docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")),
        "__id",
    )
    return src.select(
        "__id",
        F.explode(F.split(F.lower(F.trim(F.col("__t"))), " +")).alias("tok"),
    ).where(F.col("tok") != "")


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 0.5,
) -> DataFrame:
    """``(id, dsir_logw)``: per-document DSIR log importance weight.

    ``target_pred`` is a boolean Column over ``docs`` selecting the target
    subset (e.g. ``F.col("lang") == "en"`` or a quality flag). Tokens hash
    into ``n_buckets`` md5 buckets (`functions.text.split_bucket` — the
    engine-portable hash, so the oracle reproduces assignments exactly);
    bucket unigram distributions are add-``smoothing`` estimated for
    target and raw, and a document's weight is the sum over its token
    occurrences of ``ln(p_target[b] / p_raw[b])``, rounded to 6dp (repo
    float-determinism policy).

    Scale shape: ONE corpus token shuffle builds the bucket counts (raw
    and target in the same aggregation via a conditional sum); the ratio
    table is ``n_buckets`` rows and broadcasts into the per-doc sum. The
    driver never sees anything data-sized. At 100 TB, raise ``n_buckets``
    (DSIR uses 10k) — the broadcast stays KB-sized.
    """
    toks = _tokens(docs, text_col, id_col)
    tb = docs.select(
        F.col(id_col).alias("__id"), target_pred.alias("__is_t")
    ).join(toks, "__id").select(
        "__id", "__is_t", T.split_bucket(F.col("tok"), n_buckets).alias("b")
    )
    counts = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.col("__is_t").cast("int")).cast("bigint").alias("c_tgt"),
    )
    s = float(smoothing)
    # corpus totals via a window over the BUCKET table (n_buckets rows by
    # construction) — no scalar-subquery join, no single-partition pass
    # over anything data-sized
    from pyspark.sql import Window as W

    from .scale import single_partition_key

    wfull = W.partitionBy(single_partition_key())
    ratio = counts.select(
        "b",
        (
            F.log(
                (F.col("c_tgt") + s)
                / (F.sum("c_tgt").over(wfull) + s * n_buckets)
            )
            - F.log(
                (F.col("c_raw") + s)
                / (F.sum("c_raw").over(wfull) + s * n_buckets)
            )
        ).alias("lr"),
    )
    return (
        tb.join(F.broadcast(ratio), "b")
        .groupBy("__id")
        .agg(F.round(F.sum("lr"), 6).alias("dsir_logw"))
        .select(F.col("__id").alias(id_col), "dsir_logw")
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 0.5,
) -> DataFrame:
    """Top-``k`` documents by DSIR weight (held-out deterministic variant:
    rank by weight, ties broken by id — the paper's Gumbel-noise resample
    becomes this under a fixed seed of zero noise; a content-derived
    md5-Gumbel can be layered on by adding noise to ``dsir_logw`` before
    the sort). One global TakeOrdered over the doc-sized weight table."""
    w = dsir_log_weights(docs, target_pred, text_col, id_col, n_buckets, smoothing)
    return w.orderBy(F.col("dsir_logw").desc(), id_col).limit(k)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, bm25)``: top-``k`` documents for a bag-of-terms query under
    BM25 (Robertson et al.; the Lucene-default ``k1``/``b``).

    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Plan shape (r15): ONE corpus pass. The token stream aggregates once
    per ``(doc, query-term-or-NULL)`` — every non-query token falls into
    the NULL group, so the aggregate stays doc-cardinality — and is
    localCheckpoint'd; ``dl`` (= sum of the group counts per doc), ``tf``
    (= the non-NULL rows, no further aggregation) and ``df`` all derive
    from that one materialization. The previous shape re-ran the corpus
    token aggregation up to 4x: once per broadcast-build job (the 1-row
    corpus stats, the term-df table) and once per final-plan leg, because
    exchange reuse does not span jobs. ``n_docs``/``avgdl`` fold in as
    driver literals from a 1-row bounded aggregate over the checkpoint
    (the pagerank scalar-anchor pattern — not a data collect). Scores
    round to 6dp and ties break on id — deterministic against the
    oracle, and bit-identical to the old shape (same IEEE expression over
    the same values)."""
    tl = [t.lower() for t in terms]
    toks = _tokens(docs, text_col, id_col)
    per = (
        toks.groupBy(
            "__id", F.when(F.col("tok").isin(tl), F.col("tok")).alias("qtok")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    dl = per.groupBy("__id").agg(F.sum("c").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs = F.lit(stats.n_docs).cast("bigint")
    avgdl = F.lit(stats.avgdl).cast("double")
    tf = per.where(F.col("qtok").isNotNull()).select(
        "__id", F.col("qtok").alias("tok"), F.col("c").alias("tf")
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_t), "tok").join(dl, "__id")
    idf = F.log(
        F.lit(1.0)
        + (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    return (
        scored.select("__id", (idf * F.col("tf") * (k1 + 1) / denom).alias("part"))
        .groupBy("__id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "__id")
        .limit(k)
        .select(F.col("__id").alias(id_col), "bm25")
    )


def grouped_decile(
    df: DataFrame,
    score_col: str,
    group_col: str,
    n_buckets: int = 10,
    out_col: str = "decile",
) -> DataFrame:
    """Per-group quality buckets WITHOUT a data-sized window partition.

    Replaces ``ntile(n) OVER (PARTITION BY group ORDER BY score DESC)``,
    whose physical plan sorts EVERY row of a group inside one task — on a
    language-skewed corpus (one language is routinely >50% of a crawl)
    that is one task sorting tens of TB at 100 TB scale. Instead:

    1. one exact ``percentile`` aggregate per group over the score column
       — the boundary table is ``n_buckets - 1`` doubles per group row
       (KB-sized regardless of corpus size);
    2. broadcast-join the boundary row back on the group key;
    3. bucket = 1 + COUNT of boundaries strictly above the score — a flat
       codegen comparison over the broadcast array; no window, no sort.

    Bucket 1 holds the highest scores. Semantics differ from NTILE only
    at ties: equal scores always share a bucket (deterministic under ANY
    row order, where NTILE must split ties by rank and needs a total
    order to be stable), so bucket populations are approximately — not
    exactly — equal. Cross-engine exactness: boundaries interpolate
    between 6dp-rounded scores, so a score only ever EQUALS a boundary
    when the boundary lands on a data point, and then both engines return
    that exact double (verified bit-exact against DuckDB
    ``quantile_cont`` at sf0.01; interpolated boundaries sit strictly
    inside a >=1e-6 gap no score occupies, so the < comparison is immune
    to last-ulp drift). At 100 TB swap ``percentile`` for
    ``percentile_approx`` — same plan shape, bounded executor memory, a
    documented epsilon on bucket edges only.

    DuckDB oracle equivalent::

        b AS (SELECT g, quantile_cont(s, [0.1, ..., 0.9]) AS qs ... GROUP BY g)
        SELECT 1 + len(list_filter(b.qs, q -> t.s < q)) AS decile
        FROM t JOIN b USING (g)

    Null contract (round 9): a NULL group is a real group — the join back
    is null-safe, so rows with e.g. an undetected language keep their row
    and bucket against their own NULL-group boundaries (the ntile window
    this replaces kept NULL partitions too; a plain inner join silently
    dropped them). A NULL score lands in the WORST bucket (``n_buckets``),
    never bucket 1 — an unscored document must not outrank every scored
    one. Both behaviors pinned in tests/test_selection.py.
    """
    return grouped_deciles(df, [(score_col, out_col)], group_col, n_buckets)


def grouped_deciles(
    df: DataFrame,
    scores: list[tuple[str, str]],
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Multi-score :func:`grouped_decile`: assign one bucket column per
    ``(score_col, out_col)`` pair with a SINGLE per-group percentile
    aggregation (all boundary arrays in one agg row) and a SINGLE
    broadcast join back — a pipeline deciling k signals pays one boundary
    pass, not k (z_pipeline_curate ranks fluency and DSIR together)."""
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    b = df.groupBy(F.col(group_col).alias("__decile_g")).agg(
        *[
            F.percentile(s, probs).alias(f"__qs_{out}")
            for s, out in scores
        ]
    )
    def above(score_col: str):
        # closure factory: F.filter inspects the lambda's arity, so the
        # score column must be captured by closure, not a default arg
        return lambda q: F.col(score_col) < q

    # null-safe join: a NULL group aggregates to its own boundary row and
    # must rejoin it — a plain inner join would drop those rows entirely
    out_df = df.join(
        F.broadcast(b), F.col(group_col).eqNullSafe(F.col("__decile_g"))
    ).drop("__decile_g")
    for s, out in scores:
        out_df = out_df.withColumn(
            out,
            # NULL score: no boundary comparison is meaningful — assign
            # the WORST bucket, not bucket 1 (unscored never outranks)
            F.when(F.col(s).isNull(), F.lit(n_buckets))
            .otherwise(F.lit(1) + F.size(F.filter(f"__qs_{out}", above(s))))
            .cast("int"),
        )
    return out_df.drop(*[f"__qs_{out}" for _, out in scores])


def threshold_sweep(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    score_decimals: int = 6,
) -> DataFrame:
    """Precision/recall operating table for a score used as a keep-filter
    against a (weak) boolean label: one row per DISTINCT score value with
    ``(threshold, n_kept, tp, precision, recall)`` for the filter
    ``score >= threshold``. With ``group_col``, one independent curve per
    group (CCNet picks thresholds per language, never globally).

    The real curation step this serves: every heuristic filter needs an
    operating point, and sweeping thresholds by rescanning per candidate
    threshold is O(T·N). This computes the whole curve in one aggregation
    + one window over the DISTINCT-SCORE table, with cumulative sums
    ordered by score descending. Precision/recall round to 6dp.

    Stated bound: candidate thresholds are the scores ROUNDED to
    ``score_decimals`` places (enforced here, not assumed of the caller),
    so the window input is at most ``score_range * 10^score_decimals + 1``
    rows — for the normal [0, 1]-ish quality scores at the default 6dp
    that is <= ~1e6 tiny rows, safe for the ungrouped sweep's single
    intentional partition at any corpus size. A caller sweeping a score
    with a LARGE numeric range must lower ``score_decimals`` (coarser
    grid) or pass ``group_col`` (the window partitions per group); the
    rounding is toward the filter's operating resolution, not a loss —
    nobody deploys a keep-filter thresholded at the 7th decimal."""
    gcols = [group_col] if group_col else []
    per_score = (
        scored.select(
            *gcols,
            F.round(F.col(score_col), score_decimals).alias("threshold"),
            F.col(label_col).cast("int").alias("pos"),
        )
        .groupBy(*gcols, "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_at"),
            F.sum("pos").cast("bigint").alias("tp_at"),
        )
    )
    from pyspark.sql import Window as W

    from .scale import single_partition_key

    # both frames share one partitioning+ordering, so Spark evaluates them
    # in a single WindowExec pass over the distinct-score table (bounded
    # by the score_decimals grid — never data-sized); grouped sweeps
    # partition the window, so no single-partition bottleneck either
    base = W.partitionBy(*gcols) if gcols else W.partitionBy(single_partition_key())
    w = base.orderBy(F.col("threshold").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = base.orderBy(F.col("threshold").desc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return per_score.select(
        *gcols,
        "threshold",
        F.sum("n_at").over(w).alias("n_kept"),
        F.sum("tp_at").over(w).alias("tp"),
        F.round(
            F.sum("tp_at").over(w) / F.sum("n_at").over(w), 6
        ).alias("precision"),
        # try_divide: a group with ZERO positives has undefined recall —
        # NULL (never a row the auto-threshold can pick), not an ANSI
        # divide-by-zero error
        F.round(
            F.try_divide(F.sum("tp_at").over(w), F.sum("tp_at").over(wall)), 6
        ).alias("recall"),
    )


def auto_threshold(
    sweep: DataFrame,
    min_precision: float,
    group_col: str | None = None,
) -> DataFrame:
    """Pick each group's operating point FROM its sweep curve: the most
    permissive threshold (highest recall) whose precision still meets
    ``min_precision``. Returns one row per group —
    ``(group, threshold, n_kept, tp, precision, recall)`` — or no row for
    groups that can't reach the precision floor at any threshold (the
    honest answer; a caller falls back to a global default).

    This is the composition the sweep exists for: threshold selection as
    a QUERY over the curve, not a driver-side loop."""
    from pyspark.sql import Window as W

    from .scale import single_partition_key

    gcols = [group_col] if group_col else []
    ok = sweep.where(F.col("precision") >= min_precision)
    base = W.partitionBy(*gcols) if gcols else W.partitionBy(single_partition_key())
    w = base.orderBy(F.col("recall").desc(), F.col("threshold").asc())
    return (
        ok.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of BOUNDED
    candidate lists from heterogeneous retrievers — the standard hybrid
    lexical+vector search combiner:

        rrf(d) = Σ_lists 1 / (k0 + rank_list(d)),   absent list → 0.

    ``rankings`` maps a retriever name to its candidate list
    ``(id_col, rank_col)`` with 1-based ranks; each input MUST already be
    top-N-bounded by its retriever (that is the contract that keeps fusion
    scale-free: this function only ever touches Σ N rows regardless of
    corpus size, so every join below broadcasts). Output:
    ``(id_col, rrf_score, <name>_rank …)`` — the fused top-``k``, score
    rounded 1e-6 (two fixed-order IEEE divisions + adds: bit-identical
    cross-engine), ties broken on id.
    """
    sides = [
        r.select(
            F.col(id_col),
            F.col(rank_col).cast("bigint").alias(f"{name}_rank"),
        )
        for name, r in rankings.items()
    ]
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, id_col, "full_outer")
    contrib = None
    for name in rankings:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"{name}_rank")),
            F.lit(0.0),
        )
        contrib = term if contrib is None else contrib + term
    return (
        joined.select(
            id_col,
            F.round(contrib, 6).alias("rrf_score"),
            *[f"{name}_rank" for name in rankings],
        )
        .orderBy(F.col("rrf_score").desc(), id_col)
        .limit(k)
    )
