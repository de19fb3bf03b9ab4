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


#: KMV hash space: 40-bit md5-derived values. 40 bits keeps every
#: ``count * M`` product far inside BIGINT (counts here are <= 2k), while
#: collision mass over realistic group cardinalities (~1e4 distinct keys
#: -> ~1e8/2^41 ~ 5e-5 expected colliding pairs) stays well under the
#: sketch's own standard error — and determinism makes it irrelevant to
#: the oracle, which replays the identical hashes.
_KMV_M = 1 << 40


def _kmv_hash(col: F.Column) -> F.Column:
    """40-bit integer fingerprint: first 10 hex digits of md5 — totally
    ordered, engine-portable (DuckDB: ``('0x' || substr(md5(x), 1, 10))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 10), 16, 10).cast(
        "bigint"
    )


def kmv_set_cardinalities(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch set-operation CARDINALITIES between key sets: for each
    unordered group pair ``(a < b)``, integer estimates of |A|, |B|,
    |A ∪ B| and |A ∩ B| from bottom-``k`` (KMV) sketches — absolute
    distinct counts, where :func:`~..profile.source_overlap_kmv` gives
    only the Jaccard fraction. Beyer et al. 2007 (KMV estimator) +
    the Dasgupta et al. theta-sketch pair rule (public algorithms).

    Estimators, all BIGINT floor arithmetic so a DuckDB twin
    (:func:`kmv_set_cardinalities_sql`) is bit-identical:

    - per group: exact ``n`` when the sketch is not full (``n < k``),
      else the classical KMV ``((k-1) * M) div theta`` with ``theta`` the
      k-th smallest 40-bit hash;
    - per pair: ``theta_ab = min(theta_a, theta_b)``; among sketch rows
      with ``hv < theta_ab``, ``c_u`` distinct hashes / ``c_i`` hashes on
      both sides give ``est = (c * M) div theta_ab`` (exact counts when
      both sketches are unfull, since then ``theta_ab = M``).

    Scale: the only corpus-sized stage is the distinct ``(group, hash)``
    projection; the bottom-k window plans with a Partial
    WindowGroupLimit BELOW the exchange (each input partition forwards
    at most k rows per group — the `source_overlap_kmv` plan shape,
    asserted in tests/test_plans.py), and every stage after the sketch
    is sketch-sized (groups² · k rows riding broadcasts). Sketches are
    MERGEABLE: bottom-k of a union == bottom-k of the concatenated
    bottom-k's, so per-shard sketches fold without revisiting shards
    (asserted in tests).
    """
    from pyspark.sql import Window as W

    kk = int(k)
    fp = df.select(
        F.col(group_col).alias("g"), _kmv_hash(F.col(key_col)).alias("hv")
    ).dropDuplicates(["g", "hv"])
    rn = F.row_number().over(W.partitionBy("g").orderBy("hv"))
    sk = fp.withColumn("rn", rn).where(F.col("rn") <= kk).drop("rn")
    st = sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.max("hv").alias("kth")
    )
    th = st.select(
        "g",
        F.when(F.col("n") < kk, F.lit(_KMV_M).cast("bigint"))
        .otherwise(F.col("kth"))
        .alias("theta"),
        F.when(F.col("n") < kk, F.col("n").cast("bigint"))
        .otherwise(F.expr(f"CAST(({kk} - 1) * {_KMV_M} AS BIGINT) div kth"))
        .alias("est_g"),
    )
    a = th.select(
        F.col("g").alias("group_a"),
        F.col("theta").alias("theta_a"),
        F.col("est_g").alias("est_a"),
    )
    b = th.select(
        F.col("g").alias("group_b"),
        F.col("theta").alias("theta_b"),
        F.col("est_g").alias("est_b"),
    )
    # group-pair expansion: groups-cardinality frames, broadcast
    # nested-loop on the ordering predicate (the source_overlap_kmv shape)
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b")).select(
        "group_a",
        "group_b",
        "est_a",
        "est_b",
        F.least("theta_a", "theta_b").alias("tab"),
    )
    # pair expansion as two equi-joins (the source_overlap_kmv shape);
    # both sides are sketch-sized, so these broadcast.
    side_a = pairs.join(
        sk.select(F.col("g").alias("group_a"), "hv"), "group_a"
    ).where(F.col("hv") < F.col("tab")).select(
        "group_a", "group_b", "hv", F.lit("a").alias("side")
    )
    side_b = pairs.join(
        sk.select(F.col("g").alias("group_b"), "hv"), "group_b"
    ).where(F.col("hv") < F.col("tab")).select(
        "group_a", "group_b", "hv", F.lit("b").alias("side")
    )
    agg = (
        side_a.unionByName(side_b)
        .groupBy("group_a", "group_b", "hv")
        .agg((F.countDistinct("side") == 2).alias("in_both"))
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("cu"),
            F.sum(F.when(F.col("in_both"), 1).otherwise(0)).alias("ci"),
        )
    )
    def _est(c: str) -> F.Column:
        return (
            F.when(F.col("tab") == _KMV_M, F.col(c))
            .otherwise(F.expr(f"CAST({c} * {_KMV_M} AS BIGINT) div tab"))
            .cast("bigint")
        )

    return (
        pairs.join(agg, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.col("est_a").cast("bigint").alias("est_a"),
            F.col("est_b").cast("bigint").alias("est_b"),
            "tab",
            F.coalesce("cu", F.lit(0)).cast("bigint").alias("cu"),
            F.coalesce("ci", F.lit(0)).cast("bigint").alias("ci"),
        )
        .select(
            "group_a",
            "group_b",
            "est_a",
            "est_b",
            _est("cu").alias("est_union"),
            _est("ci").alias("est_inter"),
        )
    )


def kmv_set_cardinalities_sql(keys_sql: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_set_cardinalities` — ``keys_sql`` must
    yield ``(g, key)``; the same 40-bit md5 fingerprints, bottom-k
    windows, theta rule, and BIGINT floor estimators, so the result is
    bit-identical."""
    kk, m = int(k), _KMV_M
    return f"""
    WITH fp AS (
      SELECT DISTINCT g,
             CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 10)) AS BIGINT) AS hv
      FROM ({keys_sql})
    ),
    sk AS MATERIALIZED (
      SELECT g, hv FROM (
        SELECT g, hv, ROW_NUMBER() OVER (PARTITION BY g ORDER BY hv) AS rn FROM fp
      ) WHERE rn <= {kk}
    ),
    st AS (SELECT g, COUNT(*) AS n, MAX(hv) AS kth FROM sk GROUP BY g),
    th AS MATERIALIZED (
      SELECT g,
             CASE WHEN n < {kk} THEN CAST({m} AS BIGINT) ELSE kth END AS theta,
             CASE WHEN n < {kk} THEN CAST(n AS BIGINT)
                  ELSE CAST(({kk} - 1) * {m} AS BIGINT) // kth END AS est_g
      FROM st
    ),
    pr AS MATERIALIZED (
      SELECT a.g AS group_a, b.g AS group_b,
             a.est_g AS est_a, b.est_g AS est_b,
             LEAST(a.theta, b.theta) AS tab
      FROM th a JOIN th b ON a.g < b.g
    ),
    ua AS (
      SELECT pr.group_a, pr.group_b, sk.hv, 'a' AS side
      FROM pr JOIN sk ON sk.g = pr.group_a WHERE sk.hv < pr.tab
      UNION ALL
      SELECT pr.group_a, pr.group_b, sk.hv, 'b'
      FROM pr JOIN sk ON sk.g = pr.group_b WHERE sk.hv < pr.tab
    ),
    ag AS (
      SELECT group_a, group_b, hv, COUNT(DISTINCT side) = 2 AS in_both
      FROM ua GROUP BY 1, 2, 3
    ),
    cc AS (
      SELECT group_a, group_b,
             CAST(COUNT(*) AS BIGINT) AS cu,
             CAST(SUM(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS ci
      FROM ag GROUP BY 1, 2
    )
    SELECT pr.group_a, pr.group_b,
           CAST(pr.est_a AS BIGINT) AS est_a,
           CAST(pr.est_b AS BIGINT) AS est_b,
           CAST(CASE WHEN pr.tab = {m} THEN COALESCE(cc.cu, 0)
                     ELSE (COALESCE(cc.cu, 0) * {m}) // pr.tab END AS BIGINT) AS est_union,
           CAST(CASE WHEN pr.tab = {m} THEN COALESCE(cc.ci, 0)
                     ELSE (COALESCE(cc.ci, 0) * {m}) // pr.tab END AS BIGINT) AS est_inter
    FROM pr LEFT JOIN cc USING (group_a, group_b)
    """
