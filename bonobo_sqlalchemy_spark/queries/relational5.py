"""Fifth relational batch: the remaining classic TPC-H query shapes that the
reduced test schema expresses directly (Q12/Q19/Q21/Q22, adapted to the
columns that exist; the partsupp-dependent Q2/Q11/Q16/Q20 shapes live in
``relational6.py``, which derives the pair relation from lineitem).

Shapes covered here:

- Q8  market share (two-level nation join, conditional share ratio)
- Q12 late-shipment priority split (derived delay buckets, CASE aggregates)
- Q13 customer order-count distribution (left join + histogram-of-counts)
- Q14 promo revenue ratio (conditional decimal sums, one IEEE division)
- Q15 top supplier by revenue (agg + equality with unpartitioned max)
- Q17 small-quantity revenue (correlated per-part average)
- Q18 large-volume customers (HAVING on a decimal quantity sum)
- Q19 disjunctive multi-range predicate pushdown
- Q21 suppliers solely responsible for late multi-supplier orders
  (EXISTS + NOT EXISTS -> semi/anti joins)
- Q22 dormant high-balance customers (scalar subquery + anti join)

All dimension joins are broadcast (nation/region/part/supplier are tiny next
to lineitem at any scale factor); the fact table shuffles at most once per
query. Money math follows the determinism policy in `base.py`: exact
DECIMAL(18,2) sums surfaced as doubles, ratios as a single IEEE division.

Reference parity: the reference (bonobo-sqlalchemy) delegates arbitrary SQL
to the RDBMS via ``Select`` (reference ``bonobo_sqlalchemy/readers.py``); these
queries demonstrate the same surface natively on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.files import load_table, register_views
from .base import dec2, dsum, fmt_date, query

_REV = "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)))"


def _rev_col() -> F.Column:
    """Per-row discounted revenue as an exact decimal."""
    return dec2("l_extendedprice") * dec2(F.lit(1.0) - F.col("l_discount"))


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS vol,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
    )
    GROUP BY o_year
    """,
    tags=("relational", "join"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: NATION_3's share of ASIA promo-part revenue by year.

    The seven-way join keeps lineitem as the only big side: part filters
    first (selective, broadcast), orders/customer chain restricts to the
    ASIA market, and both nation hops plus region broadcast. One fact
    shuffle (the orders join); the share ratio is two exact decimal sums
    and one IEEE division.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    cust_asia = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                      F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_col().cast("decimal(18,4)").alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(zero)).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q12_late_shipments",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120 THEN 'very_late'
                WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'late'
                ELSE 'on_time' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY delay_bucket
    """,
    tags=("relational", "agg"),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (no l_shipmode/commitdate in this schema): bucket
    1998 shipments by order-to-ship delay and split line counts by order
    priority. Ship-date filter pushes to the lineitem scan; one join shuffle
    on orderkey, map-side partial aggregation after."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(delay > 120, "very_late")
            .when(delay > 60, "late")
            .otherwise("on_time")
            .alias("delay_bucket"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("relational", "join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: histogram of per-customer order counts (customers
    with zero orders included via the left join; the 'P'-status exclusion
    stands in for the reference's comment filter). Two shuffles minimum:
    custkey join+agg, then the tiny count-histogram agg."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST({_REV} AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    tags=("relational", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: % of one month's revenue from PROMO parts. Part
    broadcasts; the month filter pushes to the lineitem scan; the ratio is
    two exact decimal sums and IEEE (100*a)/b."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(
        F.col("p_type") == "PROMO", _rev_col().cast("decimal(18,4)")
    ).otherwise(zero)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(_rev_col()).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST({_REV} AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("relational", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: supplier(s) with max quarterly revenue. The revenue
    CTE aggregates lineitem once (per-supplier cardinality is tiny after
    the agg), so the equality-with-max runs as an unpartitioned window over
    the agg output, not a second lineitem pass. Exact decimal sums make the
    max-equality engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).cast("double").alias("total_revenue")
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(W.partitionBy())
    ).where(F.col("total_revenue") == F.col("max_rev"))
    return (
        supp.join(F.broadcast(top), supp.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS agg_partkey,
             0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON pa.agg_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < avg_qty
    """,
    tags=("relational", "subquery"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: revenue lost to small-quantity orders for one brand
    (0.5x threshold lifted to 0.5 of avg so the reduced data keeps rows).
    The correlated per-part average de-correlates to a groupBy + join on
    partkey; the brand filter broadcasts through part. avg_qty is the
    repo-standard exact-sum/count double, halved by one IEEE multiply."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            F.lit(0.5)
            * (F.sum(dec2("l_quantity")).cast("double") / F.count("l_quantity"))
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("agg_partkey"))
        .where(F.col("l_quantity") < F.col("avg_qty"))
        .agg((F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 280
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("relational", "agg", "subquery"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: orders whose total quantity exceeds 280 (threshold
    sized to this data's 13-lineitem orders), with their customers. The
    HAVING subquery is one lineitem agg; its survivors (tiny) broadcast
    into a semi join, so lineitem shuffles once on orderkey and the
    customer join sees only qualifying orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .where(F.col("q") > 280)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")), F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            fmt_date("o_orderdate", "o_orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity", "total_qty"))
    )


@query(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT CAST({_REV} AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("relational", "filter"),
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: disjunction of brand/size/quantity ranges. Catalyst
    extracts the common implied predicates (p_size >= 1, the quantity hull)
    to push toward both scans; part broadcasts; the OR evaluates post-join
    in codegen. One scalar revenue out."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND date_diff('day', o_orderdate, l1.l_shipdate) > 90
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND date_diff('day', o3.o_orderdate, l3.l_shipdate) > 90)
    GROUP BY s_name
    """,
    tags=("relational", "subquery", "join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape (lateness = shipped >90 days after order, standing in
    for the missing commit/receipt dates): suppliers in NATION_3 who were
    the ONLY late supplier on a finished multi-supplier order. EXISTS /
    NOT-EXISTS lower to left-semi / left-anti joins on orderkey — Catalyst
    plans all three lineitem passes on the same shuffle key, and the
    nation filter broadcasts through supplier."""
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
          AND datediff(l1.l_shipdate, o_orderdate) > 90
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND datediff(l3.l_shipdate, o3.o_orderdate) > 90)
        GROUP BY s_name
        """
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
      AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
                       FROM customer
                       WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("relational", "subquery", "agg"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (nation-key set stands in for phone prefixes):
    never-ordered customers with above-average positive balances, grouped
    by nation. The scalar average is one tiny agg broadcast into the
    filter; NOT EXISTS lowers to a left-anti join against only the
    o_custkey column of orders (column pruning keeps the anti side thin).
    avg = exact decimal sum / count, one IEEE division."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nations = [0, 1, 2, 3, 4, 5, 6]
    pool = cust.where(F.col("c_nationkey").isin(nations))
    avg_bal = pool.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("ab")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders.select(F.col("o_custkey")), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
