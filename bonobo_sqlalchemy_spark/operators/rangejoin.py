"""Point-in-interval (range) join, binned for scale.

``points.ts BETWEEN intervals.start AND intervals.end`` (plus key equality)
is an inequality join: engines without a dedicated range-join strategy fall
back to a per-key nested loop, which is quadratic inside hot keys and a
cartesian product without the key. The scalable shape is temporal binning:

1. choose a bin width; a point belongs to exactly one bin,
2. each interval explodes into every bin it overlaps,
3. equi-join on ``(key, bin)`` — hash shuffle, Catalyst-native,
4. keep pairs passing the exact ``BETWEEN`` predicate.

Each qualifying (point, interval) pair meets in exactly one bin (the
point's), so no post-join dedup is needed. Pick ``bin_width`` near the
typical interval length: too small multiplies the exploded interval rows,
too large grows the per-bin candidate lists. DuckDB plans the same query
with its IEJoin — the oracle uses that directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | tuple[str, ...],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width: str = "1 hour",
) -> DataFrame:
    """Inner join: every point row + every interval row containing it
    (inclusive bounds), key-equal on ``on``. Interval columns keep their
    names; callers project/rename around collisions."""
    keys = list(on)
    n, unit = bin_width.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit]
    width_us = int(n) * mult * 1_000_000

    # Exact long division (`div`), not double `/`: float rounding near a bin
    # boundary could misbin a row and silently lose a matching pair.
    # (Epochs are assumed non-negative: `div` truncates toward zero.)
    # .cast("timestamp") first: a no-op for TIMESTAMP inputs, and the
    # value-preserving (UTC session) bridge for TIMESTAMP_NTZ ones, which
    # unix_micros alone rejects (FIXTURES.md data-contract note).
    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("__us", _us(ts_col)).withColumn(
        "__bin", F.expr(f"__us div {width_us}")
    ).drop("__us")
    i = (
        intervals.withColumn("__s_us", _us(start_col))
        .withColumn("__e_us", _us(end_col))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.expr(f"__s_us div {width_us}"), F.expr(f"__e_us div {width_us}")
                )
            ),
        )
        .drop("__s_us", "__e_us")
    )
    joined = p.join(i, keys + ["__bin"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bin")
