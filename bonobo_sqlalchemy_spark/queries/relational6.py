"""Sixth relational batch: the four TPC-H shapes that need a part-supplier
relation (Q2/Q11/Q16/Q20). The driver schema ships no ``partsupp`` table, so
each query derives the relation from ``lineitem`` (distinct
``(l_partkey, l_suppkey)`` pairs with per-pair cost/quantity aggregates) —
the *operator shapes* are the point, not the TPC-H literal text:

- Q2  min-cost supplier per part  (correlated MIN subquery -> agg + equi-join
      back on the aggregate, dimension joins, top-k)
- Q11 value concentration          (group sum vs a scalar-subquery threshold
      -> HAVING against a broadcast 1-row total)
- Q16 supplier counts              (COUNT DISTINCT + NOT IN -> anti join)
- Q20 heavy suppliers              (nested IN subqueries -> semi joins over a
      HAVING-filtered agg)

Reference parity: the reference delegates arbitrary SQL of exactly these
shapes to the RDBMS through ``Select`` (``bonobo_sqlalchemy/readers.py:45-67``);
here they are evaluated natively by Catalyst.

100 TB posture: lineitem is the only large input; each query shuffles it once
on ``(l_partkey, l_suppkey)`` for the partial-agg derivation, every
dimension join (part / supplier / nation / region) broadcasts, the Q11 total
is a 1-row broadcast cross join (exempt-listed scalar pattern), and top-k
goes through TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table
from .base import dec2, query

#: Derived part-supplier relation, shared by all four queries (SQL side).
_PS = """
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_qty
    FROM lineitem
    GROUP BY 1, 2
"""


def _partsupp(
    spark: SparkSession, sf_dir: str, partition_by_partkey: bool = False
) -> DataFrame:
    """lineitem -> part-supplier pairs with unit-cost MIN and quantity sum.

    MIN over identical IEEE divisions is bit-deterministic in both engines;
    the quantity sum uses the exact-decimal policy from ``base.py``.

    ``partition_by_partkey=True`` establishes HashPartitioning(l_partkey)
    BEFORE the aggregation (guide §2.4: two operations keyed the same way
    share one exchange). Partitioning by the group-key SUBSET satisfies the
    aggregation's clustered distribution, and a downstream window
    partitioned by ``ps_partkey`` then needs no second exchange — one
    shuffle of raw pair rows instead of [agg exchange on (pk, sk)] + [window
    exchange on pk]. In TPC-H each (part, supp) pair carries only ~1-2
    lineitems, so the partial aggregation the plain form gets before its
    exchange saves almost nothing — two nearly-identically-sized shuffles
    collapse to one at any scale. Values are unchanged (same groups, same
    MIN/decimal-SUM inputs)."""
    li = load_table(spark, sf_dir, "lineitem")
    if partition_by_partkey:
        li = li.repartition(F.col("l_partkey"))
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(dec2("l_quantity")).cast("double").alias("ps_qty"),
    )


@query(
    "z_q02_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS}),
    ranked AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost,
             MIN(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
      FROM ps
    )
    SELECT s_acctbal, s_name, n_name, CAST(p_partkey AS BIGINT) AS p_partkey,
           ps_supplycost AS supplycost
    FROM ranked
      JOIN part ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
    WHERE ps_supplycost = min_cost
      AND p_size <= 5 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("relational", "subquery", "join"),
    bench=True,
)
def z_q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: supplier(s) offering each part at its minimum cost.

    The correlated ``MIN`` subquery becomes a window MIN over the
    already-aggregated pair relation — NOT a second aggregate joined back:
    the groupBy+self-join formulation re-scans lineitem (column pruning
    makes the two pair-agg subtrees differ, so exchange reuse can't kick
    in), while the window form scans the fact table exactly once and adds
    one shuffle on ``ps_partkey``. Equality on the double cost is safe:
    both sides are the same MIN over the same IEEE divisions.
    """
    from pyspark.sql import Window as W

    # partition_by_partkey: the window below is keyed on ps_partkey — with
    # the partitioning established before the aggregation, agg AND window
    # ride ONE exchange (plan: 2 hash exchanges -> 1; see _partsupp).
    ps = _partsupp(spark, sf_dir, partition_by_partkey=True)
    ranked = ps.withColumn(
        "min_cost", F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 5) & (F.col("p_type") == "ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        ranked.where(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p["p_partkey"])
        .join(F.broadcast(s), F.col("ps_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "z_q11_value_concentration",
    oracle=f"""
    WITH ps AS ({_PS}),
    val AS (
      SELECT ps_partkey,
             SUM(CAST(FLOOR(ps_supplycost * ps_qty * 100) AS BIGINT)) AS cents
      FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      GROUP BY 1
    )
    SELECT CAST(ps_partkey AS BIGINT) AS partkey, cents / 100.0 AS part_value
    FROM val
    WHERE cents > (SELECT SUM(cents) * 0.0015 FROM val)
    ORDER BY part_value DESC, partkey
    """,
    tags=("relational", "subquery", "agg"),
)
def z_q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value exceeds a global threshold.

    The scalar subquery (``SUM(...) * fraction``) is a 1-row aggregate cross
    joined (broadcast) against the grouped values — the exempt-listed scalar
    pattern; no second scan of lineitem because the pair relation feeds both
    branches. Values are quantized to integer cents with FLOOR (bit-identical
    on the same IEEE product in both engines) so every sum is exact.
    """
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    val = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.floor(F.col("ps_supplycost") * F.col("ps_qty") * 100).cast("bigint")
            ).alias("cents")
        )
        # Two consumers (threshold aggregate + the filtered output) and
        # column pruning defeats static exchange reuse, so without this the
        # whole lineitem pair-agg subtree runs twice. One slim row per part
        # — cheap to materialize, same pattern as the minhash shingle stage.
        .localCheckpoint()
    )
    total = val.agg((F.sum("cents") * F.lit(0.0015)).alias("__threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("cents") > F.col("__threshold"))
        .select(
            F.col("ps_partkey").cast("bigint").alias("partkey"),
            (F.col("cents") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@query(
    "z_q16_supplier_counts",
    oracle=f"""
    WITH ps AS ({_PS})
    SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
      JOIN part ON p_partkey = ps_partkey
    WHERE p_size IN (1, 7, 14, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_type, p_size
    """,
    tags=("relational", "subquery", "agg"),
)
def z_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts with a NOT IN exclusion.

    ``NOT IN`` over a non-nullable key is a left-anti join against the
    (broadcast) excluded-supplier set; COUNT DISTINCT expands to Spark's
    two-phase distinct aggregate. All outputs integral -> hash-exact.
    """
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(F.broadcast(bad), "ps_suppkey", "left_anti")
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .groupBy("p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_type", "p_size")
    )


@query(
    "z_q20_heavy_suppliers",
    oracle=f"""
    WITH ps AS ({_PS})
    SELECT s_name, s_acctbal
    FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9')
      AND s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
          AND ps_qty > 90
      )
    ORDER BY s_name
    """,
    tags=("relational", "subquery", "join"),
)
def z_q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped heavy volumes of chosen parts.

    Nested ``IN`` subqueries become two stacked left-semi joins: pair
    relation semi-joined on the part filter, supplier semi-joined on the
    surviving supplier keys. Quantity threshold applies to the exact-decimal
    pair quantity, so the cut is engine-identical.
    """
    ps = _partsupp(spark, sf_dir)
    bolts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select(F.col("p_partkey").alias("ps_partkey"))
    )
    heavy = (
        ps.where(F.col("ps_qty") > 90)
        .join(F.broadcast(bolts), "ps_partkey", "left_semi")
        .select(F.col("ps_suppkey").alias("s_suppkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_5", "NATION_9")
    )
    return (
        s.join(heavy, "s_suppkey", "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
