"""Fourth relational batch: analytic window functions (first/last/nth value,
cume_dist, percent_rank), string distance, and date arithmetic — closing out
the scalar/window function surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.files import load_table
from .base import fmt_date, query


@query(
    "q_window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order,
           round(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 6) AS price_cume_dist,
           round(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 6) AS price_pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("relational", "window"),
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window surface: FIRST/LAST/NTH_VALUE over full frames,
    CUME_DIST and PERCENT_RANK (value-ordered, so double ties rank equal
    in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wp = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(wo).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
        F.round(F.cume_dist().over(wp), 6).alias("price_cume_dist"),
        F.round(F.percent_rank().over(wp), 6).alias("price_pct_rank"),
    )


@query(
    "q_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT) AS lev_to_reverse,
           CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS lev_to_brand1,
           reverse(p_name) AS name_reversed
    FROM part
    """,
    tags=("relational", "scalar"),
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance surface (fuzzy-matching primitive for entity
    resolution); levenshtein has one definition in both engines."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", F.reverse("p_name")).cast("bigint").alias("lev_to_reverse"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("bigint").alias("lev_to_brand1"),
        F.reverse("p_name").alias("name_reversed"),
    )


@query(
    "q_date_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_delay_days,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
           CAST(dayofmonth(l_shipdate) AS BIGINT) AS ship_dom
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey % 100 = 0
    """,
    tags=("relational", "scalar"),
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: day diffs, interval addition, month truncation —
    over a keyed sample of the join (deterministic, no TABLESAMPLE)."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    o = load_table(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("ship_delay_days"),
        fmt_date(F.date_add(F.col("o_orderdate"), 30), "due_date"),
        fmt_date(F.date_trunc("month", F.col("l_shipdate")), "ship_month"),
        F.dayofmonth("l_shipdate").cast("bigint").alias("ship_dom"),
    )


@query(
    "q_events_asof_purchase",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      FROM events
    ), l AS (
      SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'click'
    ), r AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS prior_purchase_ts,
           r.purchase_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("relational", "temporal"),
)
def q_events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click enriched with the user's most recent prior
    purchase (engine operator `operators/asof.py::as_of_join` — union +
    running last-struct window, one exchange on the key; the oracle is
    DuckDB's native ASOF LEFT JOIN). Same-timestamp purchases collapse to
    MAX(value) first so the match is deterministic in both engines."""
    from ..operators.asof import as_of_join

    e = load_table(spark, sf_dir, "events")
    l = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    r = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = as_of_join(l, r, on=["user_id"], left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("prior_purchase_ts"),
        F.col("r_purchase_value").alias("purchase_value"),
    )
