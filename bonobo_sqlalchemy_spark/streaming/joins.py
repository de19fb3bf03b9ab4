"""Stream-stream joins with watermark-bounded state.

The last piece of the streaming surface (windows, sessions, stateful ops,
sinks are in the sibling modules): joining two live streams. Spark keeps
both sides' unmatched rows in state; the join is only scale-safe when

- BOTH sides are watermarked, and
- the join condition bounds event-time distance (a time-range predicate),

so state for rows older than (watermark + interval) is evicted instead of
growing forever. This module packages that contract: it refuses unbounded
conditions instead of silently building infinite state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys + a bounded event-time interval:
    ``left.ts <= right.ts <= left.ts + max_delay``.

    Both inputs are watermarked here (idempotent if the caller already
    did); the interval bound makes state eviction possible — per-key state
    holds at most ``watermark + max_delay`` of history on either side.
    Columns are suffixed ``_l``/``_r`` apart from the join keys.
    """
    l = left.withWatermark(left_ts, watermark).select(
        *on, *[F.col(c).alias(f"{c}_l") for c in left.columns if c not in on]
    )
    r = right.withWatermark(right_ts, watermark).select(
        *[F.col(k).alias(f"{k}_r") for k in on],
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in on],
    )
    lts, rts = f"{left_ts}_l", f"{right_ts}_r"
    # The time bound must live INSIDE the join condition (not a post-hoc
    # filter) — that is what lets the engine derive state-eviction
    # thresholds for both sides.
    cond = (F.col(rts) >= F.col(lts)) & (
        F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {max_delay}")
    )
    for k in on:
        cond = cond & (F.col(k) == F.col(f"{k}_r"))
    joined = l.join(r, on=cond, how=how)
    # Outer joins null-pad one whole side; the key columns must survive for
    # unmatched rows of EITHER side, so coalesce the two sides' copies
    # (no-op for inner/left_outer, where the left copy is always present).
    return joined.select(
        *[F.coalesce(F.col(k), F.col(f"{k}_r")).alias(k) for k in on],
        *[c for c in joined.columns if c not in set(on) | {f"{k}_r" for k in on}],
    )
