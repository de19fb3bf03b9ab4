"""Second relational batch: pivot, percentiles, regexp, conditional
aggregation, HAVING, multi-distinct, nation-pair trade flows — rounding out
the SURVEY §2.3 surface with oracle-checked coverage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table
from .base import dsum, query


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: status values become columns (two-phase agg —
    no extra shuffle beyond the groupBy)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
           round(quantile_cont(c_acctbal, 0.5), 6) AS median,
           round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
           round(quantile_cont(c_acctbal, 0.95), 6) AS p95
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("relational", "agg"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per segment (both engines use
    the same interpolation; rounded to absorb last-ulp arithmetic order)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 6).alias("median"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile("c_acctbal", F.lit(0.95)), 6).alias("p95"),
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS high_prio_value,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS low_prio_value,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled
    FROM orders GROUP BY 1
    """,
    tags=("relational", "agg"),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-gated aggregation (TPC-H Q8/Q12/Q14 pattern)."""
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return o.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year")).agg(
        F.sum(F.when(high, dec).otherwise(zero)).cast("double").alias("high_prio_value"),
        F.sum(F.when(~high, dec).otherwise(zero)).cast("double").alias("low_prio_value"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
    )


@query(
    "q_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    tags=("relational", "agg"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — TPC-H Q13-adjacent."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total"))
        .where(F.col("n_orders") >= 15)
    )


@query(
    "q_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def q_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several exact COUNT(DISTINCT)s in one aggregate (expand strategy)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(CASE WHEN regexp_matches(p_type, '^(PROMO|ECONOMY)') THEN 1 ELSE 0 END AS BIGINT) AS is_cheap_type,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words
    FROM part
    """,
    tags=("relational", "scalar"),
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract, global replace, match test, match count."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_type").rlike(r"^(PROMO|ECONOMY)"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_cheap_type"),
        F.regexp_count(F.col("p_name"), F.lit(r"[a-z]+")).cast("bigint").alias("n_words"),
    )


@query(
    "q7_nation_trade",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) GROUP BY 1, 2, 3
    """,
    tags=("relational", "join"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume: 5-way join with a
    disjunctive cross-nation predicate; dims broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue")
    )


@query(
    "q_distinct_rows",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    tags=("relational", "agg"),
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DISTINCT (dropDuplicates across the projection)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()
