"""Volume capture: shuffle deltas around a block are isolated and sane."""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.metrics import measure_volumes, volume_totals


def test_measure_volumes_captures_shuffle(spark):
    df = spark.range(0, 100_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    with measure_volumes(spark) as m:
        df.groupBy("k").agg(F.sum("v")).collect()
    assert m.delta.stages >= 2  # map + reduce at minimum
    assert m.delta.shuffle_write_bytes > 0
    assert m.delta.shuffle_read_bytes > 0


def test_measure_volumes_zero_for_scan_only(spark):
    df = spark.range(0, 10_000)
    df.count()  # warm anything lazy
    with measure_volumes(spark) as m:
        df.select((F.col("id") * 2).alias("x")).where(F.col("x") < 100).collect()
    assert m.delta.shuffle_write_bytes == 0


def test_measure_volumes_deltas_are_isolated(spark):
    """Work done BEFORE the context does not leak into the delta."""
    df = spark.range(0, 50_000).select((F.col("id") % 13).alias("k"))
    df.groupBy("k").count().collect()  # outside
    before = volume_totals(spark)
    with measure_volumes(spark) as m:
        pass
    assert m.delta.shuffle_write_bytes == 0
    assert volume_totals(spark).shuffle_write_bytes == before.shuffle_write_bytes
