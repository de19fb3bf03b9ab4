"""Pipeline-composition API tests (SURVEY §3.1 round-trip style).

Mirrors the reference's integration pattern
(`tests/test_integration.py:173-207`): generator source -> sink -> select
back -> exact golden rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark import Graph, Select, run
from bonobo_sqlalchemy_spark.sources.files import register_views


def _extract():
    # Parity with the reference's golden generator
    # (`tests/test_integration.py:130-134`): 10 rows (i, 'value for {i}').
    for i in range(10):
        yield i, f"value for {i}"


def test_generator_source_golden_rows(spark):
    [df] = run(Graph(_extract), spark)
    rows = sorted((r[0], r[1]) for r in df.collect())
    assert rows == [(i, f"value for {i}") for i in range(10)]


def test_chain_source_transform(spark, sf_small):
    register_views(spark, sf_small, ("nation",))
    g = Graph(
        Select("SELECT n_nationkey, n_name FROM nation"),
        lambda df: df.where(F.col("n_nationkey") < 5),
        lambda df: df.select("n_name"),
    )
    [df] = run(g, spark)
    assert df.count() == 5
    assert df.columns == ["n_name"]


def test_multiple_chains(spark, sf_small):
    register_views(spark, sf_small, ("region", "nation"))
    g = Graph()
    g.add_chain(Select("SELECT * FROM region"))
    g.add_chain(Select("SELECT * FROM nation"), lambda df: df.limit(3))
    [r1, r2] = run(g, spark)
    assert r1.count() == 5
    assert r2.count() == 3


def test_select_limit_and_semicolon_strip(spark, sf_small):
    register_views(spark, sf_small, ("customer",))
    node = Select("SELECT c_custkey FROM customer ORDER BY c_custkey ;\n", limit=7)
    [df] = run(Graph(node), spark)
    assert df.count() == 7


def test_dataframe_as_source(spark):
    src = spark.range(5).withColumn("v", F.col("id") * 2)
    [df] = run(Graph(src, lambda d: d.where(F.col("id") > 1)), spark)
    assert df.count() == 3


def test_select_offset_page(spark, sf_small):
    # Reference pagination parity (readers.py:60-65): LIMIT n OFFSET m.
    register_views(spark, sf_small, ("nation",))
    node = Select(
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey", limit=5, offset=10
    )
    [df] = run(Graph(node), spark)
    assert [r[0] for r in df.collect()] == [10, 11, 12, 13, 14]
