"""Third relational batch: correlated-EXISTS aggregation (TPC-H Q4 shape),
GROUPING SETS, approximate distinct counts, and a profitability rollup
(TPC-H Q9 shape adapted to this schema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table, register_views
from .base import dsum, query


@query(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "subquery"),
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS -> semi-join -> grouped count."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("relational", "agg"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): three chosen groupings."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@query(
    "q_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           (abs(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
              <= 0.1 * COUNT(DISTINCT l_orderkey)) AS orders_within_bounds,
           (abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
              <= 0.1 * COUNT(DISTINCT l_partkey)) AS parts_within_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "agg", "sketch"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts — the at-scale cardinality
    path (no shuffle of distinct values). The raw sketch estimate is
    engine-specific, so the driver-visible contract is the *bounds check*:
    each engine asserts its own estimate lands within 10% (5 sigma at
    rsd=0.02) of its exact count, which hash-compares deterministically.
    The tighter relative-error property is asserted in tests."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.02)
                - F.countDistinct("l_orderkey")
            )
            <= 0.1 * F.countDistinct("l_orderkey")
        ).alias("orders_within_bounds"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.countDistinct("l_partkey")
            )
            <= 0.1 * F.countDistinct("l_partkey")
        ).alias("parts_within_bounds"),
    )


@query(
    "q_approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.45), 6) AS exact_p45,
           round(quantile_cont(l_extendedprice, 0.55), 6) AS exact_p55,
           (approx_quantile(l_extendedprice, 0.5)
              BETWEEN quantile_cont(l_extendedprice, 0.45)
                  AND quantile_cont(l_extendedprice, 0.55)) AS median_within_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "agg", "sketch"),
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (the at-scale percentile path: mergeable per-partition
    sketches, no global sort). Like `q_approx_distinct`, the raw sketch
    estimate is engine-specific (Spark GK vs DuckDB t-digest), so the
    driver-comparable contract is a rank-bounds check: each engine's approx
    median must land between its own exact p45 and p55 — ~5000x looser than
    either sketch's rank-error guarantee, and deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    p45 = F.percentile("l_extendedprice", F.lit(0.45))
    p55 = F.percentile("l_extendedprice", F.lit(0.55))
    approx = F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    return l.groupBy("l_returnflag").agg(
        F.round(p45, 6).alias("exact_p45"),
        F.round(p55, 6).alias("exact_p55"),
        ((approx >= p45) & (approx <= p55)).alias("median_within_bounds"),
    )


@query(
    "q9_profit_rollup",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
                    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) * 0.6) AS DOUBLE) AS profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
    """,
    tags=("relational", "join"),
)
def q9_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (profit by supplier nation and year) adapted to this
    schema: revenue minus a retail-price-derived cost proxy; exact decimal
    arithmetic end to end."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    dec2 = lambda c: c.cast("decimal(18,2)")
    revenue = (dec2(F.col("l_extendedprice")) * dec2(F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    cost = (dec2(F.col("p_retailprice")) * dec2(F.col("l_quantity"))).cast(
        "decimal(18,4)"
    ) * F.lit(0.6).cast("decimal(2,1)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(revenue - cost).cast("double").alias("profit"))
    )
