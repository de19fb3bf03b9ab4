"""File-backed catalog: load testdata parquet tables and register SQL views.

The driver's corpus (``/root/testdata/sf*/``) is the engine's standing test
catalog (schemas in ``FIXTURES.md §B``). At 100 TB these would be
partitioned/bucketed parquet or Iceberg tables; the read path is identical —
``spark.read.parquet`` gives Catalyst full predicate pushdown, column
pruning, and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The full driver corpus (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-eligible in joins. At TPC-H
#: scale these stay tiny (region=5, nation=25) or grow slowly relative to
#: the fact tables; Spark's broadcast threshold handles them automatically,
#: and query code may also hint `F.broadcast` explicitly.
DIMENSIONS = ("region", "nation", "supplier", "customer", "part")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
        # outright; read it as raw nanos and rebuild a (microsecond-precision)
        # TimestampType column. `div` keeps the arithmetic in exact longs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(
    spark: SparkSession, sf_dir: str | None = None, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each corpus table as a temp view; returns name -> DataFrame.

    Idempotent: re-registering against a different sf_dir replaces the views.
    """
    sf_dir = sf_dir or default_sf_dir()
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)  # handles events' nanos timestamps
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
