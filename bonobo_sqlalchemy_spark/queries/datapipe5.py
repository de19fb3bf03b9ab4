"""Round-5 training-data pipeline extensions: containment dedup, corpus
profiling, skew diagnostics, mixture sampling.

All four are first-class large-corpus operations the earlier rounds'
inventory didn't cover:

- containment (asymmetric) near-dup — catches short-doc-inside-long-doc
  duplication that Jaccard structurally misses;
- one-pass per-column profiling — the ANALYZE/SUMMARIZE step that fronts
  every pipeline engagement;
- join-key skew reports — the measurement that decides between plain,
  salted, and broadcast join plans (operators/scale.py);
- domain re-weighting mixture sampling — exact per-source quotas for
  training-mix construction.

Named ``z_*`` so the driver's 50-name correctness window stays frozen on
the long-standing queries (COVERAGE.md "Correctness-signal mechanics");
value-exact verification happens in the full-registry local parity sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as D
from ..operators import sampling as SA
from ..operators.profile import profile_columns
from ..operators.scale import skew_report
from ..sources.files import load_table
from .base import query, run_to_completion
from .datapipe4 import _md5_key_sql


@query(
    "z_dedup_containment",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w FROM documents
    ), s AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(w) - 1),
                                          i -> array_to_string(w[i:i+2], ' '))) AS sh
      FROM d
    ), x AS (
      SELECT doc_id, lang, unnest(sh) AS g FROM s
    ), pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
      FROM x a JOIN x b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, len(sh) AS n FROM s)
    SELECT id1, id2,
           round(common / least(s1.n, s2.n), 6) AS containment
    FROM pairs JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
    WHERE round(common / least(s1.n, s2.n), 6) >= 0.6
    """,
    tags=("dedup",),
    bench=True,
)
def z_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (|A∩B| / min(|A|,|B|) >= 0.6),
    word-trigram shingles, language-blocked — the doc-inside-doc modality
    Jaccard misses. Same inverted-index plan as `dedup_ngram_jaccard`
    (operators/dedup.py::containment_pairs)."""
    return D.containment_pairs(
        load_table(spark, sf_dir, "documents"), block_col="lang", n=3, threshold=0.6
    )


@query(
    "z_profile_corpus",
    oracle="""
    SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(doc_id) AS n_null,
           COUNT(DISTINCT doc_id) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_value,
           CAST(MAX(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
           MIN(lang), MAX(lang) FROM documents
    UNION ALL
    SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
           MIN(source), MAX(source) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
    tags=("profiling",),
)
def z_profile_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column corpus profile (nulls / exact distincts / min / max) in
    ONE distributed aggregation pass + stack unpivot — the ANALYZE step of
    a pipeline engagement (operators/profile.py; `exact=False` swaps the
    distinct counts to HLL for the 100 TB single-pass form)."""
    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "lang", "source", "n_chars"])


@query(
    "z_skew_report",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
    ), t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS nkeys FROM c)
    SELECT user_id, n_rows,
           round(n_rows / total, 6) AS share,
           round(n_rows / (total / nkeys), 6) AS x_mean
    FROM c, t
    ORDER BY n_rows DESC, user_id LIMIT 20
    """,
    tags=("scale", "profiling"),
)
def z_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heavy-hitter join keys for events.user_id with share-of-table
    and ratio-to-mean — the measurement that decides between plain, salted
    (operators/scale.py::salted_join), and broadcast join plans. One
    map-side-partial agg + TakeOrderedAndProject; output is 20 rows
    regardless of table size."""
    ev = load_table(spark, sf_dir, "events")
    return skew_report(ev, ["user_id"], top_k=20)


#: Exact per-source quotas for the mixture query — src7 is oversized on
#: purpose (larger than the group at small SF) to pin the cap-at-population
#: behavior in the oracle comparison.
_MIX_TARGETS = {"src1": 5, "src3": 8, "src7": 200}


@query(
    "z_sample_mixture",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_md5_key_sql(11, "doc_id")}, doc_id
             ) AS rk
      FROM documents WHERE source IN ('src1', 'src3', 'src7')
    )
    SELECT doc_id, source FROM r
    WHERE rk <= CASE source WHEN 'src1' THEN 5 WHEN 'src3' THEN 8 ELSE 200 END
    """,
    tags=("sampling",),
)
def z_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: exact hash-deterministic per-source
    quotas (domain re-weighting), quotas above a group's population yield
    the whole group (operators/sampling.py::mixture_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.mixture_sample(docs, "source", _MIX_TARGETS, "doc_id", seed=11).select(
        "doc_id", "source"
    )


@query(
    "z_text_unigram_logprob",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents
    ), c AS (
      SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
    ), n AS (SELECT SUM(c) AS total FROM c)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(SUM(LOG2(c / total)) / COUNT(*), 6) AS avg_log2p
    FROM t JOIN c USING (tok), n
    GROUP BY doc_id
    """,
    tags=("text", "quality"),
    bench=True,
)
def z_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency score per document: mean log2 probability of its
    tokens under the corpus unigram distribution — the classic
    perplexity-style quality-filtering signal (low = rare-token/garbage
    text). Two shuffles (vocab count, per-doc agg); the token->count join
    rides the shared hot/cold zipf-key guard
    (operators/quality.py::hot_cold_count_join) — hot vocab rows
    broadcast, the tail's per-key shuffle volume is threshold-bounded.
    Rounded per the determinism policy (float sum reorder error ~1e-12 vs
    1e-6 rounding).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..operators.quality import hot_cold_count_join

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    # zipf-key guard shared with segment_quality_outliers: hot vocab rows
    # broadcast, tail shuffles with bounded per-key volume
    scored = hot_cold_count_join(toks, counts, "tok", "c", 100_000).join(
        F.broadcast(total)
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.log2(F.col("c") / F.col("total"))) / F.count(F.lit(1)), 6
        ).alias("avg_log2p"),
    )


@query(
    "z_sample_top_p",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS tot
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM r
    WHERE cum - n_chars < 0.7 * tot
    """,
    tags=("sampling", "quality"),
)
def z_sample_top_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) selection per source: keep the highest-value docs
    (by n_chars here; any quality score in production) until they cover 70%
    of each source's total mass — quality-weighted data selection with a
    per-domain budget. Cumulative sums are exact integer arithmetic, so
    the boundary row is engine-deterministic.

    Scale shape: the naive spelling (`SUM OVER (PARTITION BY source ORDER
    BY n_chars DESC)`) runs the cumulative sum over EVERY document of a
    source in one task — the same low-cardinality-partition straggler as
    the retired decile ntile. Instead the run-length decomposition: (1)
    one aggregation to the DISTINCT (source, value) table (bounded by the
    value domain, not the corpus) carries per-run counts and mass; (2) the
    cumulative/total windows run over THAT table and broadcast back; (3) a
    document's keep decision is its position within its equal-value run
    (`row_number` partitioned by (source, value) — data-sized KEY
    cardinality, a hot task only if one source has millions of docs with
    the identical value) plugged into ``cum_before_run + (pos-1)*value <
    p * total`` — algebraically identical to the naive cumulative rule,
    so the oracle keeps the window spelling and the result is value-exact.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    per_v = docs.groupBy("source", "n_chars").agg(
        (F.count(F.lit(1)) * F.col("n_chars")).alias("__mass")
    )
    wv = W.partitionBy("source").orderBy(F.desc("n_chars"))
    runs = per_v.select(
        "source",
        "n_chars",
        F.coalesce(
            F.sum("__mass").over(wv.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__cb"),
        F.sum("__mass")
        .over(wv.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("__tot"),
    )
    pos = F.row_number().over(W.partitionBy("source", "n_chars").orderBy("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", pos.alias("__pos"))
        .join(F.broadcast(runs), ["source", "n_chars"])
        .where(
            F.col("__cb") + (F.col("__pos") - 1) * F.col("n_chars")
            < 0.7 * F.col("__tot")
        )
        .select("doc_id", "source", "n_chars")
    )


@query(
    "z_text_dup_chunk_ratio",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
    ), c AS (
      SELECT doc_id,
             md5(array_to_string(w[chunk_id*16+1 : chunk_id*16+16], ' ')) AS g
      FROM (
        SELECT doc_id, w,
               unnest(range(0, CAST(ceil(len(w) / 16.0) AS BIGINT))) AS chunk_id
        FROM d
      )
    ), df AS (
      SELECT g, COUNT(*) AS n_docs FROM (SELECT DISTINCT doc_id, g FROM c) GROUP BY g
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_ratio
    FROM c JOIN df USING (g)
    GROUP BY doc_id
    """,
    tags=("text", "dedup", "quality"),
)
def z_text_dup_chunk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document duplication signal (RefinedWeb-style line/passage
    dedup, adapted to the corpus's flat word streams): split each doc into
    disjoint 16-token chunks, count how many of a doc's chunks also appear
    in OTHER documents, and report the shared-chunk ratio — the filter
    signal for boilerplate/templated content that document-level dedup
    can't see. Chunking is narrow codegen (same shape as `text_chunks`);
    the chunk document-frequency is one hash agg on the chunk md5; one
    more shuffle for the per-doc fold.
    """
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " +").alias("w")
    )
    c = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.size("w") / F.lit(16.0)).cast("bigint") - 1)
        ).alias("chunk_id"),
        "w",
    ).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.expr("slice(w, chunk_id*16+1, 16)")).cast("binary")).alias("g"),
    )
    df_counts = (
        c.dropDuplicates(["doc_id", "g"])
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        c.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
            F.round(
                F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)) / F.count(F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


def _pq_oracle() -> str:
    from .pqsql import pq_topk_oracle

    return pq_topk_oracle(iters=1)


@query("sim_pq_topk", oracle=_pq_oracle(), tags=("similarity", "sketch"), bench=True)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ADC): vectors compress to m byte codes
    (32x for d=64/m=8), the scan is m lookup-table adds per vector emitting
    per-partition local top-R, and only the global top-R candidates fetch
    real vectors for the exact cosine re-rank — the memory-scale path
    beyond IVF (operators/similarity.py::pq_topk).

    VALUE-EXACT (round 8, was rows-only): deterministic first-16 codebook
    init + one L2 k-means round in SQL (queries/pqsql.py), and the scan's
    partitioning-invariant (adc DESC, id) candidate emission makes the
    global top-R reproducible — so the DuckDB oracle rebuilds codebooks,
    codes, ADC scores and the re-ranked top-5 end-to-end. Recall vs brute
    force additionally asserted in tests."""
    from pyspark.sql import functions as F

    from ..operators.similarity import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    return pq_topk(e, e.where(F.col("vec_id") < 8), k=5, m=8, ksub=16, train_iters=1)


@query(
    "z_events_funnel",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1.ts1
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS ts3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2.ts2
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, COUNT(*) AS n_users FROM t1
    UNION ALL SELECT 'view>click', COUNT(*) FROM t2
    UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM t3
    """,
    tags=("relational", "temporal"),
)
def z_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users whose first view precedes a click
    precedes a purchase (strict event-order matching, the MATCH_RECOGNIZE
    shape re-expressed as staged conditional MIN aggregations). All three
    stages aggregate on user_id, so one exchange serves the chain; each
    stage's output is user-cardinality (small) and the stage joins
    broadcast at scale.
    """
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view").alias("stage"), "n_users")
        .unionByName(t2.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view>click").alias("stage"), "n_users"))
        .unionByName(t3.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view>click>purchase").alias("stage"), "n_users"))
    )


@query(
    "z_events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS TIMESTAMP)) AS active_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('week', f.cohort_week, a.active_week) AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("relational", "temporal"),
)
def z_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in each later week they were active — THE product-analytics
    rollup. Two aggs on user_id (cohort assignment, distinct active weeks)
    sharing one exchange, then a user-keyed join and a small (cohort x
    offset) agg."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).dropDuplicates(["user_id", "active_week"])
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("bigint").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "z_stream_join_left",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'error'
    ),
    wm AS (
      -- Spark's global watermark under the default 'min' multiple-watermark
      -- policy: each side's watermark node sees only its filtered rows, so
      -- W = least(max purchase ts, max error ts) - delay, at millisecond
      -- precision (Spark tracks watermarks in ms)
      SELECT LEAST((SELECT date_trunc('milliseconds', MAX(CAST(ts AS TIMESTAMP))) FROM p),
                   (SELECT date_trunc('milliseconds', MAX(CAST(ts AS TIMESTAMP))) FROM e))
             - INTERVAL 2 HOUR AS w
    )
    SELECT p.user_id,
           p.event_id AS purchase_id,
           e.event_id AS error_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts
    FROM p JOIN e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT p.user_id, p.event_id, NULL, strftime(p.ts, '%Y-%m-%d %H:%M:%S'), NULL
    FROM p, wm
    WHERE NOT EXISTS (
            SELECT 1 FROM e
            WHERE e.user_id = p.user_id
              AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
          )
      AND p.ts + INTERVAL 1 HOUR < wm.w
    """,
    tags=("streaming", "join"),
)
def z_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream LEFT OUTER interval join: every purchase, with
    its errors in the following hour or null-padded once the watermark
    proves no match can still arrive. The oracle encodes Spark's
    null-emission rule exactly: with an availableNow replay the final
    watermark is max(event time) - 2h, and an unmatched purchase emits iff
    its match window (ts + 1h) closed strictly before that watermark —
    purchases near the stream's end stay withheld, exactly as a live
    deployment would withhold them. State eviction bounds are the same as
    the inner join (`streaming/joins.py`)."""
    from pyspark.sql import functions as F

    from ..streaming.joins import stream_interval_join
    from ..streaming.windows import read_events_stream

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    joined = stream_interval_join(
        purchases, errors, on=["user_id"], max_delay="1 hour",
        watermark="2 hours", how="left_outer",
    )
    out = joined.select(
        "user_id",
        F.col("event_id_l").alias("purchase_id"),
        F.col("event_id_r").alias("error_id"),
        F.date_format("ts_l", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
    )
    name = "z_stream_join_left_tbl"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


@query(
    "z_window_rank_suite",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           NTILE(4) OVER w AS quartile,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST() OVER w, 6) AS cume,
           CAST(o_totalprice AS DOUBLE) AS total
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey)
    """,
    tags=("relational", "window"),
)
def z_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family windows in one query: NTILE quartiles,
    PERCENT_RANK, CUME_DIST per customer over order value (deterministic
    tie-break on the key). One shuffle on the partition key serves all
    three — same window spec, zero extra exchanges."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("double").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.col("o_totalprice").cast("double").alias("total"),
    )


@query(
    "z_events_resample_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id,
             date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
      FROM events WHERE user_id < 20 GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM b
    ), obs AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events WHERE user_id < 20
    )
    SELECT g.user_id,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
           o.event_id AS last_event_id,
           CAST(o.value AS DOUBLE) AS last_value
    FROM grid g ASOF LEFT JOIN obs o
      ON g.user_id = o.user_id AND o.ts <= g.h + INTERVAL 1 HOUR - INTERVAL 1 MICROSECOND
    """,
    tags=("relational", "temporal"),
)
def z_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill: an hourly grid per user
    (codegen `sequence` + explode — no driver loop) carrying the LAST
    observation at or before each grid hour's end, via the engine's as-of
    join (`operators/asof.py`). The oracle is DuckDB's native ASOF LEFT
    JOIN — two independent as-of implementations agreeing value-exactly.
    Ties inside an hour resolve to the latest event (backward as-of on the
    hour-end instant)."""
    from pyspark.sql import functions as F

    from ..operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    ).withColumn(
        # backward as-of against the END of the hour (inclusive of events
        # inside the hour itself): probe instant = next hour - 1µs
        "probe_ts",
        F.col("h") + F.expr("INTERVAL 1 HOUR") - F.expr("INTERVAL 1 MICROSECOND"),
    )
    obs = ev.select("user_id", "ts", "event_id", F.col("value").cast("double").alias("value"))
    joined = as_of_join(
        grid.select("user_id", "h", F.col("probe_ts").alias("ts")),
        obs,
        on=["user_id"],
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("r_event_id").alias("last_event_id"),
        F.col("r_value").alias("last_value"),
    )


@query(
    "z_stats_moments",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           round(stddev_samp(CAST(l_quantity AS DOUBLE)), 6) AS sd_qty,
           round(var_samp(CAST(l_quantity AS DOUBLE)), 6) AS var_qty,
           round(corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 6) AS corr_qty_price,
           round(covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 6) AS covar_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "statistics"),
)
def z_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates per group: sample stddev /
    variance, correlation, covariance — all single-pass codegen aggregates
    (Welford-style merge states shuffle, not rows). Rounded per the
    determinism policy: merge-order float error (~1e-10 relative) vs 1e-6
    rounding."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    d = F.col("l_discount").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp(q), 6).alias("sd_qty"),
        F.round(F.var_samp(q), 6).alias("var_qty"),
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(q, d), 6).alias("covar_qty_disc"),
    )


@query(
    "z_array_ops",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_distinct,
           array_to_string(list_sort(list_distinct(w))[1:3], ',') AS first3,
           list_sort(list_distinct(w))[len(list_distinct(w))] AS last_token,
           CAST(len(list_filter(w, t -> len(t) > 4)) AS BIGINT) AS n_long
    FROM d
    """,
    tags=("relational", "complex-types"),
)
def z_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type (array) surface in one query: distinct/sort/slice/
    join/filter/element_at over the token array — all codegen array
    expressions, no explode, no shuffle (verifies the engine's array-
    function semantics track ANSI/DuckDB list semantics value-exactly,
    including end-inclusive slice vs ``slice(start, length)`` mapping)."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " +").alias("w")
    )
    dist = F.array_sort(F.array_distinct("w"))
    return d.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.array_join(F.slice(dist, 1, 3), ",").alias("first3"),
        F.element_at(dist, F.size(dist)).alias("last_token"),
        F.size(F.filter("w", lambda t: F.length(t) > 4)).cast("bigint").alias("n_long"),
    )
