"""Structured Streaming over the events table (SURVEY §2.3 'Streaming'
row: the reference is batch-only; this is the engine's extension surface).

Event-time semantics: watermarked tumbling / sliding / session windows, and
a ``foreachBatch`` bridge that reuses the M3 upsert sink so a stream can
land in any upsert target exactly like a batch pipeline (idempotent per
discriminant — safe under micro-batch retries).

The events fixture's ``ts`` physical type has varied across driver testdata
regenerations (TIMESTAMP(NANOS) in early rounds, TZ-naive timestamp[us]
since). Streaming reads need a declared schema, so the reader sniffs the
parquet footer (pyarrow, driver-side, metadata only) and declares the
matching type, then normalizes to TimestampType in the plan — mirroring the
batch loader (``sources/files.py:_normalize_event_ts``) so batch == stream.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import ServiceRegistry

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _sniff_ts_type(path: str) -> T.DataType:
    """Inspect the parquet footer to pick the declared type for ``ts``.

    Metadata-only read of one footer on the driver — no data moves. Returns
    LongType for the legacy TIMESTAMP(NANOS) layout (read via nanosAsLong),
    TimestampNTZType for TZ-naive timestamp[us]/[ms], TimestampType otherwise.
    """
    sample = path
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
        )
        if not files:
            return T.TimestampNTZType()
        sample = os.path.join(path, files[0])
    try:
        import pyarrow.parquet as pq

        field = pq.read_schema(sample).field("ts")
    except Exception:
        return T.TimestampNTZType()
    t = field.type
    if str(t) in ("timestamp[ns]", "int64"):
        return T.LongType()
    tz = getattr(t, "tz", None)
    return T.TimestampType() if tz else T.TimestampNTZType()


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory (or single file).

    On a cluster this is the same code against a landing prefix (S3/HDFS);
    new files become micro-batches. ``maxFilesPerTrigger`` paces replays.
    Spark's file source requires a *directory*; a bare file (the testdata
    layout) is staged via hardlink into a derived directory once.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if os.path.isfile(path):
        import hashlib
        import tempfile

        # Key the stage dir on path + size + mtime so a regenerated source
        # file (same path, new content — the copy-fallback case) gets a
        # fresh stage instead of silently serving stale data.
        st = os.stat(path)
        stamp = f"{path}:{st.st_size}:{st.st_mtime_ns}"
        stage = os.path.join(
            tempfile.gettempdir(),
            "bss_stream_" + hashlib.md5(stamp.encode()).hexdigest()[:12],
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, os.path.basename(path))
        if not os.path.exists(link):
            try:
                os.link(path, link)
            except OSError:
                import shutil

                shutil.copy(path, link)
        path = stage
    ts_type = _sniff_ts_type(path)
    raw = (
        spark.readStream.schema(_events_schema(ts_type))
        .format("parquet")
        .load(path)
    )
    if isinstance(ts_type, T.LongType):
        # legacy raw nanos -> microsecond timestamps, exact long arithmetic
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        # exact under the UTC session TZ (session.py)
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type.

    Late rows beyond the watermark are dropped; state for closed windows is
    evicted — bounded memory at any scale. The batch twin is
    ``q_events_hourly`` (its oracle defines correctness).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window average value per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based) with event counts and value sums.

    Uses the native ``session_window`` operator — state merges adjacent
    events within ``gap``; the watermark closes sessions and evicts state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_to_upsert(
    stream_df: DataFrame,
    sink,
    spark: SparkSession,
    services: ServiceRegistry | dict,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Land a streaming DataFrame through the M3 upsert sink.

    ``foreachBatch`` hands each micro-batch to ``InsertOrUpdate.write`` —
    the MERGE keyed on the sink's discriminant makes redelivered batches
    idempotent (exactly-once *effect* on top of at-least-once delivery).
    Returns the StreamingQuery.
    """

    def land(batch_df: DataFrame, batch_id: int) -> None:
        sink.write(batch_df, spark, services)

    # update mode: every changed window lands each micro-batch — including
    # not-yet-final ones. The upsert MERGE overwrites them as they refine,
    # so the target converges without waiting out the watermark (append
    # mode would hold back tail windows forever on a bounded replay).
    writer = (
        stream_df.writeStream.foreachBatch(land)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
