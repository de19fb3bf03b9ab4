"""Z-order (Morton) clustering for multi-column data skipping.

A 100 TB table filtered on two independent columns can only be clustered
for one of them by a plain sort. Interleaving the bits of both columns into
one Morton key and range-partitioning on it clusters the data for BOTH:
every output file covers a small hyper-rectangle of the (x, y) space, so
parquet row-group min/max stats prune scans for predicates on either
column (the technique behind Delta/Databricks OPTIMIZE ZORDER BY).

Everything is codegen bit arithmetic — no UDFs, no driver state. The
write path is ``repartitionByRange(zkey)`` (sampled range boundaries, no
global sort barrier) + ``sortWithinPartitions`` so row groups inside each
file are tight too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _balanced_sum(terms: list[Column]) -> Column:
    """Sum a list of columns as a BALANCED tree (depth log2 N, not N).

    Left-folded ``a + b + c + ...`` builds an N-deep expression chain;
    Catalyst's column-node conversion and analyzer recurse over it and a
    few hundred chained Adds can overflow the JVM thread stack (observed
    flakily when the driver thread's remaining stack varies). The balanced
    shape computes the identical value with logarithmic depth."""
    assert terms
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def interleave_bits(x: str | Column, y: str | Column, bits: int = 16) -> Column:
    """Morton key: bit *i* of ``x`` lands at position 2*i*, of ``y`` at
    2*i*+1. Inputs are masked to ``bits`` low bits (callers normalize
    first — see :func:`rank_bucket` for data-dependent domains)."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    terms = [F.lit(0).cast("bigint")]
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return _balanced_sum(terms)


def interleave_bits_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton key as portable SQL (DuckDB oracle builder)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def rank_bucket(col: str | Column, buckets: int = 1 << 16) -> Column:
    """Rank-normalize an arbitrary (skewed, negative, non-integer) column
    into [0, buckets): percent_rank scaled to the bucket range (tie-stable:
    equal values get equal buckets). Normalization is ESSENTIAL before
    interleaving — raw columns of different magnitudes put one column's
    high bits above the other's entire range and the Morton key degenerates
    to a plain sort on the wide column. One window pass here; at extreme
    scale swap for approxQuantile boundaries applied as a broadcast range
    lookup."""
    from pyspark.sql import Window as W

    c = F.col(col) if isinstance(col, str) else col
    return F.floor(
        F.percent_rank().over(W.orderBy(c)) * F.lit(float(buckets - 1))
    ).cast("bigint")


def quantile_bucket(
    df: DataFrame, col: str, buckets: int = 256, out_range: int | None = None
) -> Column:
    """Distributed rank-bucketization via approxQuantile boundaries.

    One distributed sketch pass (Greenwald-Khanna — the boundary list on
    the driver is ``buckets`` floats, not data), then the bucket of a row
    is the COUNT of boundaries below its value — a flat codegen sum of
    comparisons, no nested CASE, no window, and — unlike the tempting
    ``repartitionByRange + spark_partition_id`` trick — immune to AQE
    partition coalescing (which rewrites partition ids and silently
    degenerates id-derived buckets). Duplicate boundaries from skewed or
    low-cardinality values are collapsed, so heavy values occupy one
    bucket instead of smearing — and when ``out_range`` is given the
    result is rescaled over the SURVIVING boundary count, so the output
    always spans [0, out_range) regardless of how many collapsed (vital
    for bit interleaving: an unscaled narrow domain would concede the top
    Morton bits to the other column)."""
    probs = [i / buckets for i in range(1, buckets)]
    qs = df.stat.approxQuantile(col, probs, 1.0 / (4 * buckets))
    uniq: list[float] = []
    for q in qs:
        if not uniq or q > uniq[-1]:
            uniq.append(q)
    c = F.col(col).cast("double")
    out = _balanced_sum(
        [F.lit(0).cast("bigint")] + [(c > F.lit(q)).cast("bigint") for q in uniq]
    )
    if out_range is not None and uniq:
        if len(uniq) >= out_range:
            # stride would floor to 0 and collapse every bucket to 0,
            # silently degenerating the Morton key to a single-column sort;
            # unreachable via zorder_write's defaults (<=256 boundaries vs
            # 2^16 range) but a public-API caller can hit it — error loudly.
            raise ValueError(
                f"quantile_bucket: {len(uniq)} surviving boundaries do not "
                f"fit out_range={out_range}; lower `buckets` or raise "
                "`out_range` so each bucket keeps a distinct code"
            )
        # len(uniq) < out_range is guaranteed by the guard above, so the
        # stride is always >= 1.
        out = out * F.lit((out_range - 1) // len(uniq))
    return out


def zorder_write(
    df: DataFrame,
    x: str,
    y: str,
    path: str,
    num_files: int = 16,
    bits: int = 16,
    normalize: str | None = "range",
) -> None:
    """Write ``df`` z-ordered on columns (x, y) as parquet.

    Files are range-partitioned on the Morton key and sorted within, so
    each file (and each row group) covers a compact (x, y) rectangle —
    min/max stats prune on either column. Both columns are first
    normalized to the full ``bits`` range (see :func:`rank_bucket` for why
    skipping this degenerates the key):

    - ``normalize="range"`` (default): :func:`quantile_bucket` boundaries —
      one distributed sketch pass per column, flat codegen comparison sum,
      AQE-safe; the 100 TB path.
    - ``normalize="rank"``: exact percent_rank — a single-partition window,
      only for small/medium frames.
    - ``normalize=None``: inputs already bucketed to [0, 2^bits).
    """
    if normalize == "range":
        nb = 1 << min(bits, 8)  # boundary-list resolution
        # Bucketize into NAMED columns first: inlining the ~nb-term bucket
        # expression into interleave_bits would copy it once per Morton bit
        # (2*bits copies) — a plan-size/stack blowup for zero benefit.
        keyed = (
            df.withColumn("__bx", quantile_bucket(df, x, nb, out_range=1 << bits))
            .withColumn("__by", quantile_bucket(df, y, nb, out_range=1 << bits))
            .withColumn("__z", interleave_bits(F.col("__bx"), F.col("__by"), bits))
            .drop("__bx", "__by")
        )
    elif normalize == "rank":
        keyed = df.withColumn(
            "__z",
            interleave_bits(rank_bucket(x, 1 << bits), rank_bucket(y, 1 << bits), bits),
        )
    else:
        mask = F.lit((1 << bits) - 1)
        keyed = df.withColumn(
            "__z",
            interleave_bits(
                F.col(x).bitwiseAND(mask), F.col(y).bitwiseAND(mask), bits
            ),
        )
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
