"""Streaming rate-anomaly detection: per-key EWMA control charts over
micro-batch counts.

The monitoring op a streaming ingest pipeline runs next to its sketches:
"did this event type's rate just spike/collapse?" asked per micro-batch
with O(1) state per key — an exponentially-weighted mean and variance
(West 1979 incremental form), never a window buffer. Keys here are
LOW-cardinality stream dimensions (event types, sources, pipeline
stages); high-cardinality keys belong to the Misra-Gries sketch instead
(`streaming/sketches.py`), which bounds state by construction.

Detection rule: a batch count is anomalous when it deviates from the
EWMA mean by more than ``z`` EWMA standard deviations AFTER a warm-up of
``min_batches`` batches (the chart needs a baseline before it can
reject). The state update always folds the observation in — a spike
shifts the baseline gradually (alpha-weighted) rather than being
discarded, the standard EWMA control-chart behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANOMALY_OUTPUT_SCHEMA = (
    "key string, batch_seq bigint, n_events bigint, "
    "ewma_mean double, ewma_std double, is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "mean double, var double, n bigint"


def rate_anomaly_stream(
    events: DataFrame,
    key_col: str = "event_type",
    alpha: float = 0.3,
    z: float = 3.0,
    min_batches: int = 3,
) -> DataFrame:
    """Per-key EWMA control chart over micro-batch event counts.

    Emits one row per (key, batch): the batch's count, the verdict, and
    the chart state AFTER folding the batch in (``ewma_mean`` /
    ``ewma_std`` are the updated baseline the NEXT batch will be judged
    against; the verdict itself is computed against the pre-fold state).
    State per key is three numbers.

    Detection scope: with ``GroupStateTimeout.NoTimeout`` the fold runs
    only for keys PRESENT in a micro-batch, so a key whose rate collapses
    to exactly zero emits no row and is not flagged — this chart detects
    spikes and partial collapses (count drops below ``mean - z*std`` with
    at least one event), not total silence. Silence detection needs a
    processing-time timeout so zero-count batches are observable; wire
    ``timeoutConf=ProcessingTimeTimeout`` + ``state.setTimeoutDuration``
    if that matters for the deployment — kept out of the default because
    it makes emission wall-clock-dependent and untestable against a
    deterministic oracle.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        n_events = 0
        for pdf in pdfs:
            n_events += len(pdf)
        if n_events == 0 and not state.exists:
            return
        if state.exists:
            mean, var, n = state.get
        else:
            mean, var, n = float(n_events), 0.0, 0
        warm = n >= min_batches
        std = var**0.5
        is_anomaly = bool(warm and abs(n_events - mean) > z * std)
        # EWMA fold (always — spikes shift the baseline alpha-weighted)
        delta = n_events - mean
        mean = mean + alpha * delta
        var = (1 - alpha) * (var + alpha * delta * delta)
        state.update((float(mean), float(var), n + 1))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "batch_seq": n + 1,
                    "n_events": n_events,
                    "ewma_mean": round(mean, 6),
                    "ewma_std": round(var**0.5, 6),
                    "is_anomaly": is_anomaly,
                }
            ]
        )

    keyed = events.select(F.col(key_col).cast("string").alias("key")).withColumnRenamed(
        "key", "__key"
    )
    return keyed.groupBy("__key").applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
