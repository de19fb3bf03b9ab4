"""As-of (temporal) join: each left row matched to the most recent right
row at-or-before its timestamp, per key — the standard enrichment join for
event streams against slowly-changing snapshots (prices, configs, latest
purchase...). The reference delegates temporal SQL to its RDBMS; engines
like DuckDB expose this as ``ASOF JOIN`` (the oracle uses exactly that).

Spark-first plan: no per-row subquery and no range cross-join. Left and
right union into one stream with a side marker, one shuffle+sort per key on
``(ts, marker)``, and a running ``last(non-null struct)`` window carries the
latest right payload forward onto every left row. At 100 TB that is a
single exchange on the join key — the same cost as an ordinary sort-merge
join — and the window state is one struct per partition row, not a buffer.

The right payload rides in ONE struct so all its columns come from the same
matched row (per-column ``last(ignorenulls)`` could mix rows when some
right columns are legitimately null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | tuple[str, ...],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of left join (``right_ts <= left_ts``, ties match).

    Returns every left row plus ``right_prefix + col`` for each non-key
    right column and ``right_prefix + right_ts`` (the matched timestamp),
    null when no prior right row exists. ``tolerance`` (an INTERVAL string,
    e.g. ``'24 hours'``) additionally requires
    ``left_ts - right_ts <= tolerance``.
    """
    keys = list(on)
    rcols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__m"),
        payload.alias("__p"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__m"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    lcols = left.columns
    u = l.select(*keys, "__t", "__m", "__p", *[c for c in lcols if c not in keys]).unionByName(
        r, allowMissingColumns=True
    )
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__m").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.withColumn("__match", F.last("__p", ignorenulls=True).over(w))
    out = filled.where(F.col("__m") == 1)
    match = F.col("__match")
    if tolerance is not None:
        in_tol = match["__ts"] >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        match = F.when(in_tol, F.col("__match"))
    return out.select(
        *lcols,
        match["__ts"].alias(f"{right_prefix}{right_ts}"),
        *[match[c].alias(f"{right_prefix}{c}") for c in rcols],
    )
