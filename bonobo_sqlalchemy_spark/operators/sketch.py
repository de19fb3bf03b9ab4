"""Count-Min sketch: mergeable frequency estimation over key streams.

Completes the sketch family (Bloom = membership, KMV = set overlap, HLL =
cardinality, Misra-Gries = heavy hitters) with POINT-FREQUENCY estimates:
"roughly how often does this token / URL / key occur?" at O(depth*width)
state regardless of corpus size — the structure a 100 TB vocab-pruning or
rate-limiting pass keeps per source instead of a full count table.
Cormode & Muthukrishnan 2005 (public algorithm).

Spark-first shape: the BUILD is one explode (depth rows per key) + one
map-side-combinable ``groupBy(row, pos)`` count; the sketch itself is a
tiny (≤ depth·width rows) DataFrame that rides a broadcast into probes;
MERGE of independently-built sketches is a union + sum (counters are
linear). Everything is BIGINT on md5-derived positions (the repo's
engine-portable hash policy), so estimates — including the one-sided
OVERcount error that makes CMS a sketch rather than a count table — are
value-exact cross-engine.

Reference scope note: the reference engine has no sketch operators; this
module belongs to the driver-mandated training-data extension surface
(SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_pos(value: F.Column, row: int, width: int) -> F.Column:
    """Counter position for one hash row: first 8 hex digits of
    ``md5(row || '|' || value)`` as an integer, mod ``width`` — the same
    content-derived recipe as ``dedup._bloom_positions``, so a DuckDB
    oracle reproduces every counter."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(row)), value)), 1, 8), 16, 10
        ).cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over ``df[key_col]`` occurrences (or
    integer ``weight_col`` sums) as a DataFrame ``(row, pos, cnt, depth,
    width)`` — at most ``depth * width`` rows, sparse (absent cell ==
    zero). Self-describing like ``bloom_build``: probes and merges
    validate the attached parameters instead of trusting callers."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_pos(F.col(key_col), r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("w"),
    )
    return (
        cells.groupBy("c.row", "c.pos")
        .agg(F.sum("w").alias("cnt"))
        .select(
            "row",
            "pos",
            "cnt",
            F.lit(int(depth)).cast("int").alias("depth"),
            F.lit(int(width)).cast("bigint").alias("width"),
        )
    )


def _cms_params(sketch: DataFrame) -> tuple[int, int]:
    row = sketch.select("depth", "width").first()
    if row is None:
        raise ValueError("empty Count-Min sketch: parameters unrecoverable")
    return int(row.depth), int(row.width)


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (depth, width): counters are
    linear, so the merged sketch is bit-identical to building over the
    concatenated input. Raises on parameter mismatch (merging
    incompatible geometries would silently corrupt estimates)."""
    pa, pb = _cms_params(a), _cms_params(b)
    if pa != pb:
        raise ValueError(f"incompatible Count-Min sketches: {pa} vs {pb}")
    return (
        a.unionByName(b)
        .groupBy("row", "pos", "depth", "width")
        .agg(F.sum("cnt").alias("cnt"))
        .select("row", "pos", "cnt", "depth", "width")
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, out_col: str = "est"
) -> DataFrame:
    """Point-frequency estimates: ``keys`` + ``out_col`` = min over the
    sketch's depth rows of the addressed counter (0 if absent). The
    sketch broadcasts (≤ depth·width rows); the probe side contributes
    one explode + one min-agg — it shuffles only at key cardinality,
    never at corpus cardinality, and the estimate is ≥ the true count by
    construction (one-sided error)."""
    depth, width = _cms_params(sketch)
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_pos(F.col(key_col), r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    )
    joined = probes.join(
        F.broadcast(
            sketch.select(
                F.col("row").alias("_sk_row"),
                F.col("pos").alias("_sk_pos"),
                "cnt",
            )
        ),
        (F.col("p.row") == F.col("_sk_row")) & (F.col("p.pos") == F.col("_sk_pos")),
        "left",
    )
    others = [c for c in keys.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(out_col))
    )
