"""Streaming + sessionization queries.

``stream_tumbling_counts`` runs a REAL Structured Streaming job (file
source -> watermark -> window agg -> memory sink, availableNow trigger) and
returns the materialized result — its oracle is the batch SQL definition,
so the driver's gate checks streaming semantics against batch semantics.

``q_events_sessionize`` is the batch gaps-and-islands sessionization the
streaming ``session_window`` operator must agree with (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.files import load_table
from ..streaming.windows import read_events_stream, tumbling_counts
from .base import dsum, query, run_to_completion


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming micro-batch run; result must equal the batch
    tumbling aggregate (the oracle)."""
    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = tumbling_counts(ev, "1 hour", "2 hours")
    name = "stream_tumbling_counts_tbl"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


@query(
    "stream_user_running_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT event_type) AS n_event_types,
           strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`): the
    per-user running state after a full bounded replay must equal the batch
    per-user aggregate (the oracle). Update-mode emissions are collapsed to
    the final row per user."""
    from ..streaming.stateful import final_rows, running_user_stats

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = running_user_stats(ev)
    name = "stream_user_running_stats_tbl"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return final_rows(spark.table(name))


@query(
    "q_events_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("streaming", "window"),
    bench=True,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap) via gaps-and-islands windows.

    One shuffle on user_id serves both window passes; at scale this is the
    standard sessionize plan (sort within user partitions, no driver state).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    numbered = e.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        dsum("value", "total_value"),
    )


@query(
    "q_events_session_attach",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ), lagged AS (
      SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM e
    ), flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_session
      FROM lagged
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM numbered GROUP BY 1, 2
    ), errors AS (
      SELECT event_id, user_id, ts FROM e WHERE event_type = 'error'
    )
    SELECT er.event_id, er.user_id, s.session_id,
           strftime(er.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(s.s_start, '%Y-%m-%d %H:%M:%S') AS session_start
    FROM errors er JOIN sessions s
      ON er.user_id = s.user_id AND er.ts BETWEEN s.s_start AND s.s_end
    """,
    tags=("relational", "temporal"),
)
def q_events_session_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: error events attached to the session
    interval containing them (`operators/rangejoin.py::interval_join` —
    binned equi-join, no per-key nested loop; oracle is DuckDB's IEJoin on
    the BETWEEN predicate)."""
    from ..operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    numbered = e.withColumn(
        "session_id",
        F.sum(new_sess)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint"),
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    errors = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    out = interval_join(
        errors,
        sessions,
        on=["user_id"],
        ts_col="ts",
        start_col="s_start",
        end_col="s_end",
        bin_width="1 hour",
    )
    return out.select(
        "event_id",
        "user_id",
        "session_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("s_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@query(
    "stream_sliding_avg",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
    ), k AS (SELECT unnest([0, 1, 2, 3]) AS k),
    w AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS ws,
             event_type, value
      FROM e CROSS JOIN k
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
           COUNT(*) AS n_events
    FROM w GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1h width / 15min slide) streaming averages; every
    event lands in exactly 4 epoch-aligned windows, so the batch oracle
    replicates the window set with a 4-offset cross join. Real streaming
    run (availableNow replay, complete mode)."""
    from ..streaming.windows import sliding_avg

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = sliding_avg(ev, "1 hour", "15 minutes", "2 hours")
    name = "stream_sliding_avg_tbl"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


@query(
    "z_stream_dedup",
    oracle="""
    SELECT event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts,
           user_id, event_type, value
    FROM events
    """,
    tags=("streaming", "dedup"),
)
def z_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest under at-least-once redelivery: the events
    stream unioned with a full replay of itself (every event delivered
    twice) flows through ``dropDuplicatesWithinWatermark`` keyed on
    ``event_id`` — the streaming-state analog of the incremental batch
    dedup. Output must equal the events table exactly (the oracle), since
    surviving and dropped copies are identical rows.

    100 TB posture: dedup state is bounded by the watermark horizon (24h
    here) — keys older than the watermark are evicted, so state size tracks
    the redelivery window, not the corpus. Real streaming run (availableNow
    replay, append mode).
    """
    path = f"{sf_dir}/events.parquet"
    s1 = read_events_stream(spark, path)
    s2 = read_events_stream(spark, path)
    deduped = (
        s1.unionByName(s2)
        .withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )
    name = "z_stream_dedup_tbl"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


@query(
    "z_stream_session",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("streaming", "window"),
)
def z_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming ``session_window`` (REAL streaming run: state-merge
    sessionization, watermark-evicted) proven value-exact against the batch
    gaps-and-islands definition: session start = min ts, end = last ts +
    gap, exact decimal sums. The strongest equivalence row for the
    streaming surface — the session operator's merge semantics, not just
    its row coverage, match the declarative batch form."""
    from ..streaming.windows import session_aggregate

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = session_aggregate(ev, gap="30 minutes", watermark="24 hours")
    name = "z_stream_session_tbl"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


@query(
    "z_stream_static_enrich",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    tags=("streaming", "join"),
)
def z_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-STATIC join — the dimension-enrichment shape Structured
    Streaming re-plans per micro-batch: the event stream joins the static
    customer->nation dim (broadcast; the dim is re-read each batch, so
    slowly-changing dims pick up updates between batches), then aggregates
    per nation with the decimal-exact value-sum policy. Completes the join
    matrix alongside the stream-stream inner/left/right/full suite: the
    static side needs no watermark and holds NO join state — only the
    aggregation keeps state, bounded by nation cardinality."""
    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
        .join(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("c_nationkey"), "n_name"
            ),
            "c_nationkey",
        )
        .select("user_id", "n_name")
    )
    agg = (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )
    name = "z_stream_static_tbl"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


@query(
    "z_stream_bloom_screen",
    oracle="""
    WITH j AS (SELECT unnest(['0','1','2','3']) AS jj),
    refs AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
             FROM customer WHERE c_mktsegment = 'BUILDING'),
    bpos AS (SELECT DISTINCT
               CAST(('0x' || substr(md5(j.jj || '|' || refs.k), 1, 8)) AS BIGINT)
                 % 65536 AS pos
             FROM refs, j),
    probe AS (SELECT event_id, event_type, CAST(user_id AS VARCHAR) AS k
              FROM events),
    pp AS (SELECT event_id, event_type,
                  bool_and(
                    CAST(('0x' || substr(md5(j.jj || '|' || probe.k), 1, 8))
                         AS BIGINT) % 65536 IN (SELECT pos FROM bpos)
                  ) AS hit
           FROM probe, j GROUP BY 1, 2)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_known
    FROM pp GROUP BY 1
    """,
    tags=("streaming", "membership"),
)
def z_stream_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming membership screen: every event's user key is probed
    map-side against a 2^16-bit Bloom filter of the 'BUILDING'-segment
    customer set (`operators/dedup.py::bloom_build/bloom_probe`), counting
    known-vs-total per event type — the ingest-time "have we seen this
    key before" gate (dedup at the door, decontamination of a live feed)
    without keeping any per-key state.

    The filter is a STATIC 1-row build side re-read per micro-batch
    (stream-static broadcast; the stream itself never shuffles for the
    probe — only the tiny per-type aggregate keeps state). At 100 TB/day
    the same program holds: the filter stays O(m_bits) however large
    history grows, and `bloom_merge` folds each new snapshot's filter in
    without re-scanning history. Value-exact: bit positions are md5
    arithmetic, so DuckDB reproduces every probe (false positives
    included) from the raw tables."""
    from ..operators import dedup as D

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    ref = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("k"))
        .distinct()
    )
    # explicit (m_bits, k): the DuckDB oracle reproduces the probe with
    # these constants baked into its SQL, so auto-sizing must not move them
    bloom = D.bloom_build(ref, "k", m_bits=1 << 16, k=4)
    keyed = ev.select("event_type", F.col("user_id").cast("string").alias("k"))
    probed = D.bloom_probe(keyed, bloom, "k", m_bits=1 << 16, k=4)
    agg = probed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_known"),
    )
    name = "z_stream_bloom_screen_tbl"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name)


_SCMS_POS = "CAST(('0x' || substr(md5({r} || '|' || {k}), 1, 8)) AS BIGINT) % 1024"


def _user_stream_slices(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table as SIX mtime-ordered single-column parquet
    slices (one micro-batch per file under maxFilesPerTrigger=1) — the
    shared replay harness for the streaming sketch folds. Cached via the
    code-version-aware artifact cache keyed on the source file identity."""
    import os
    import shutil

    from ..cache import artifact_path, ensure_artifact

    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)

    def _stage(stage_dir: str) -> None:
        os.makedirs(stage_dir, exist_ok=True)
        ev = load_table(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("user_key"),
            (F.col("event_id") % 6).alias("sl"),
        )
        for i in range(6):
            tmp = os.path.join(stage_dir, f"_tmp{i}")
            (
                ev.where(F.col("sl") == i)
                .select("user_key")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
            dst = os.path.join(stage_dir, f"b{i:02d}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            t_ns = st.st_mtime_ns + i * 10**9
            os.utime(dst, ns=(t_ns, t_ns))
            shutil.rmtree(tmp)

    return ensure_artifact(
        artifact_path("scms", f"{src}:{st.st_size}:{st.st_mtime_ns}:slices6"),
        _stage,
    )


@query(
    "z_stream_cms_users",
    oracle=f"""
    WITH rws AS (SELECT unnest(['0','1','2','3']) AS rr),
    keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    sk AS (
      SELECT rr, {_SCMS_POS.format(r='rr', k='k')} AS pos,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM keys, rws GROUP BY 1, 2
    ),
    counts AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS freq FROM keys GROUP BY 1),
    top AS (
      SELECT k, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, k) AS rn
      FROM counts QUALIFY rn <= 20
    ),
    est AS (
      SELECT t.k, t.freq, t.rn, MIN(COALESCE(sk.cnt, 0)) AS est
      FROM top t CROSS JOIN rws
      LEFT JOIN sk ON sk.rr = rws.rr
                  AND sk.pos = {_SCMS_POS.format(r='rws.rr', k='t.k')}
      GROUP BY 1, 2, 3
    )
    SELECT k AS user_key, freq, est, est - freq AS overcount,
           CAST(rn AS BIGINT) AS pos
    FROM est ORDER BY pos
    """,
    tags=("streaming", "sketch"),
)
def z_stream_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-batch streaming Count-Min fold: events replay as SIX
    mtime-ordered micro-batches (one file per trigger); each batch builds
    its own 4x1024 CMS distributed and `foreachBatch` integer-adds the
    bounded counter cells into the running sketch
    (`streaming/sketches.py::cms_stream_fold`) — the mergeable-summaries
    property exercised ACROSS micro-batch boundaries, with per-trigger
    driver transfer bounded by the sketch geometry, never the feed.

    The final sketch estimates the 20 most-active users; VALUE-EXACT
    because counter linearity makes the six-batch fold identical to one
    batch build over all events, which the oracle replays (md5-derived
    positions, integer counters, one-sided overcount included)."""
    from ..operators.sketch import cms_estimate
    from ..streaming.sketches import cms_from_cells, cms_stream_fold

    watch = _user_stream_slices(spark, sf_dir)
    stream = (
        spark.readStream.schema("user_key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    sink, cells, batches = cms_stream_fold(stream, "user_key", depth=4, width=1024)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    run_to_completion(q)
    assert len(batches) >= 6, f"expected >= 6 micro-batches, got {len(batches)}"
    sketch = cms_from_cells(spark, cells, depth=4, width=1024)

    counts = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("user_key"))
        .groupBy("user_key")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = (
        counts.orderBy(F.col("freq").desc(), "user_key")
        .limit(20)
        .withColumn(
            "pos",
            F.row_number()
            .over(W.orderBy(F.col("freq").desc(), "user_key"))
            .cast("bigint"),
        )
    )
    est = cms_estimate(sketch, top, "user_key")
    return est.select(
        "user_key",
        "freq",
        "est",
        (F.col("est") - F.col("freq")).alias("overcount"),
        "pos",
    ).orderBy("pos")


@query(
    "z_stream_kmv_distinct",
    oracle=f"""
    WITH fp AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT) AS hv
      FROM events
    ),
    sk AS (
      SELECT hv FROM (
        SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM fp
      ) WHERE rn <= 64
    ),
    tr AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
           FROM events)
    -- no GROUP BY + scalar subquery: exactly ONE output row even when
    -- events is empty (k_used=0, est=0, true_distinct=0), matching the
    -- Spark side's degenerate-input contract (ADVICE r14)
    SELECT CAST(COUNT(hv) AS BIGINT) AS k_used,
           CAST(CASE WHEN COUNT(hv) < 64 THEN COUNT(hv)
                     ELSE (63 * {1 << 40}) // MAX(hv) END AS BIGINT) AS est_distinct,
           (SELECT true_distinct FROM tr) AS true_distinct
    FROM sk
    """,
    tags=("streaming", "sketch"),
)
def z_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-batch streaming KMV fold: the same six mtime-ordered
    micro-batch replay as `z_stream_cms_users` (shared staged slices),
    folded into ONE bottom-64 theta sketch via `foreachBatch`
    (`streaming/sketches.py::kmv_stream_fold`) — each trigger computes
    its batch's bottom-k DISTRIBUTED (TakeOrderedAndProject) and moves
    at most k integers to the driver; bottom-k mergeability makes the
    six-batch fold EXACTLY equal to one bottom-k over all events, which
    the oracle replays. Output: one row ``(k_used, est_distinct,
    true_distinct)`` — the distinct-user estimate with its ground truth
    beside it (exact when unfull; the BIGINT floor estimator engages at
    sf0.01+, where users > k)."""
    from ..streaming.sketches import kmv_distinct_estimate, kmv_stream_fold

    watch = _user_stream_slices(spark, sf_dir)
    stream = (
        spark.readStream.schema("user_key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    sink, state, batches = kmv_stream_fold(stream, "user_key", k=64)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    run_to_completion(q)
    assert len(batches) >= 6, f"expected >= 6 micro-batches, got {len(batches)}"
    k_used, est = kmv_distinct_estimate(state["vals"], k=64)
    truth = load_table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("bigint").alias("true_distinct")
    )
    return truth.select(
        F.lit(int(k_used)).cast("bigint").alias("k_used"),
        F.lit(int(est)).cast("bigint").alias("est_distinct"),
        "true_distinct",
    )
