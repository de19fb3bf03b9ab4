"""Partitioned-write sinks: round-trip fidelity + partition pruning proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.sources.files import load_table
from bonobo_sqlalchemy_spark.sources.sinks import read_partitioned, write_partitioned


def test_partitioned_write_roundtrip_and_pruning(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned(orders, out, ["order_year"])

    back = read_partitioned(spark, out)
    assert back.count() == orders.count()
    # partition column survives with its values
    years = {r.order_year for r in back.select("order_year").distinct().collect()}
    assert years == {r.order_year for r in orders.select("order_year").distinct().collect()}

    # a filter on the partition column prunes directories, not rows:
    pruned = back.where(F.col("order_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan
    expected = orders.where(F.col("order_year") == 1997).count()
    assert pruned.count() == expected


def test_partitioned_append_mode(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_append")
    first = orders.where(F.col("order_year") <= 1997)
    second = orders.where(F.col("order_year") > 1997)
    write_partitioned(first, out, ["order_year"])
    write_partitioned(second, out, ["order_year"], mode="append")
    assert read_partitioned(spark, out).count() == orders.count()


def test_csv_json_round_trip_with_schema(spark, sf_small, tmp_path):
    """Text formats round-trip exactly when the caller supplies the schema
    (csv writes headers by default; json preserves names natively)."""
    from pyspark.sql import functions as F

    orders = (
        load_table(spark, sf_small, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderpriority",
            F.year(F.col("o_orderdate")).alias("order_year"),
        )
    )
    ddl = "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING, order_year INT"
    expected = {tuple(r) for r in orders.collect()}
    for fmt in ("csv", "json"):
        out = str(tmp_path / f"orders_{fmt}")
        write_partitioned(orders, out, ["order_year"], fmt=fmt)
        back = read_partitioned(spark, out, fmt=fmt, schema=ddl)
        assert back.schema == orders.select(*back.columns).schema or set(
            back.columns
        ) == set(orders.columns)
        got = {
            tuple(r)
            for r in back.select(*orders.columns).collect()
        }
        assert got == expected, f"{fmt} round trip mismatch"


def test_orc_round_trip_with_pruning(spark, sf_small, tmp_path):
    """ORC is the second self-describing columnar format the catalog
    supports (typed, no schema needed on read); partition pruning works the
    same as parquet (PartitionFilters on the directory layout)."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year(F.col("o_orderdate")).alias("order_year"),
    )
    out = str(tmp_path / "orders_orc")
    write_partitioned(orders, out, ["order_year"], fmt="orc")
    back = read_partitioned(spark, out, fmt="orc")
    assert {tuple(r) for r in back.select(*orders.columns).collect()} == {
        tuple(r) for r in orders.collect()
    }
    one_year = back.where(F.col("order_year") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one_year.count() == orders.where(F.col("order_year") == 1996).count()
