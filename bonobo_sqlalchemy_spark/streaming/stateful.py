"""Custom stateful streaming operator via ``applyInPandasWithState``.

Windowed aggregates (``windows.py``) cover time-bucketed state; this module
is the *arbitrary* per-key state pattern — running totals and a distinct-set
that survive across micro-batches, which no built-in windowed agg expresses.
At cluster scale state lives in the state store (RocksDB/HDFS-backed),
partitioned by the group key; each executor touches only its keys' state.

Determinism policy (``queries/base.py``): the running money total
accumulates in integer cents (the 2-decimal inputs are exact there), and
only the final emission divides by 100 — one IEEE division, equal to the
oracle's ``CAST(SUM(DECIMAL(18,2)) AS DOUBLE)`` regardless of batch order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: emitted row per key per micro-batch (update mode): the current running state.
#: last_ts makes event-time visible in the output so the oracle catches any
#: timestamp corruption in the ingest path (r2's NTZ episode passed this
#: query's oracle because no timestamp reached the comparison).
OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, n_event_types bigint,"
    " last_ts string"
)
#: persisted per-key state between micro-batches
STATE_SCHEMA = "n bigint, cents bigint, types array<string>, max_us bigint"


def _fold_chunks(n, cents, types, max_us, pdfs):
    """Pure per-key fold over a micro-batch's pandas chunks (unit-testable).

    Skips empty chunks: ``pd.Timestamp(NaT).value`` is the int64 sentinel
    ``-2**63``, so an empty chunk's ``ts.max()`` would poison
    ``max_us``/``last_ts`` (the n/cents/types folds happen to be no-ops on
    empty frames; the timestamp fold is not).
    """
    import pandas as pd

    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        # exact integer-cent accumulation of the 2-decimal doubles
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        types |= set(pdf["event_type"].astype(str))
        # .value is nanos regardless of the frame's datetime64 unit
        batch_max_us = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
        max_us = batch_max_us if max_us is None else max(max_us, batch_max_us)
    return n, cents, types, max_us


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, money total, distinct event types) stream.

    Every micro-batch folds its rows into the user's state and emits the
    updated running row. The distinct-type set is genuinely cross-batch
    state: a type seen in batch 1 must not re-count in batch 5 — that is
    what windowed aggregation cannot do without unbounded windows.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            n, cents, types_list, max_us = state.get
            types = set(types_list)
        else:
            n, cents, types, max_us = 0, 0, set(), None
        n, cents, types, max_us = _fold_chunks(n, cents, types, max_us, pdfs)
        if max_us is None:
            # nothing ever arrived for this key (all chunks empty, no prior
            # state) — nothing to persist or emit
            return
        state.update((n, cents, sorted(types), max_us))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "total_value": cents / 100.0,
                    "n_event_types": len(types),
                    "last_ts": pd.Timestamp(max_us, unit="us").strftime(
                        "%Y-%m-%d %H:%M:%S"
                    ),
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_rows(update_log: DataFrame) -> DataFrame:
    """Collapse an update-mode emission log to the final row per user.

    ``n_events`` grows monotonically, so the final state is the max-count
    row (ties impossible: counts strictly increase per emission)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        update_log.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
