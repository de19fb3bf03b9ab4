"""Scale-toolkit tests: salted joins match plain joins exactly; bucketed
tables join without exchanges; JDBC option construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from bonobo_sqlalchemy_spark.registry import JdbcService
from bonobo_sqlalchemy_spark.sources.files import load_table
from bonobo_sqlalchemy_spark.sources.jdbc import jdbc_read_options


def _norm(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_inner(spark, sf_small):
    o = load_table(spark, sf_small, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load_table(spark, sf_small, "customer")
    plain = o.join(c, "c_custkey")
    salted = salted_join(o, c, "c_custkey", salt_buckets=8)
    cols = ["o_orderkey", "c_custkey", "c_name"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_join_matches_plain_left(spark, sf_small):
    c = load_table(spark, sf_small, "customer")
    o = (
        load_table(spark, sf_small, "orders")
        .withColumnRenamed("o_custkey", "c_custkey")
        .where(F.col("o_totalprice") > 400000)
    )
    # left join preserving customers with no qualifying orders
    plain = c.join(o, "c_custkey", "left")
    salted = salted_join(c, o, "c_custkey", how="left", salt_buckets=4)
    cols = ["c_custkey", "o_orderkey"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_join_rejects_outer_on_replicated_side():
    with pytest.raises(ValueError):
        salted_join(None, None, "k", how="full_outer")


def test_bucketed_join_has_no_exchange(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(o, "b_orders", "o_custkey", n_buckets=4, sort_col="o_custkey")
    write_bucketed(c, "b_customer", "o_custkey", n_buckets=4, sort_col="o_custkey")
    # force sort-merge (tiny test tables would otherwise broadcast, which
    # hides the property under test: co-located buckets need no shuffle)
    joined = bucketed_join(
        spark, "b_orders", "b_customer", "o_custkey", force_sort_merge=True
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert joined.count() == o.count()


def test_jdbc_options_table_and_query_forms():
    svc = JdbcService("jdbc:postgresql://h:5432/db", {"user": "u"})
    t = jdbc_read_options(svc, "lineitem", fetchsize=500)
    assert t["dbtable"] == "lineitem" and t["fetchsize"] == "500" and t["user"] == "u"
    q = jdbc_read_options(
        svc,
        "SELECT a, b FROM t WHERE a > 0;",
        partition_column="a",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=16,
    )
    assert q["dbtable"] == "(SELECT a, b FROM t WHERE a > 0) AS __src"
    assert q["partitionColumn"] == "a" and q["numPartitions"] == "16"


def test_jdbc_partition_requires_bounds():
    svc = JdbcService("jdbc:postgresql://h/db")
    with pytest.raises(ValueError):
        jdbc_read_options(svc, "t", partition_column="a")
