"""File sinks: append/overwrite writes with hive-style partitioning.

The insert-only half of the reference's load path (``InsertOrUpdate`` with
``allowed_operations=(INSERT,)``) maps to plain appends; at warehouse scale
the table layout IS the index — partition columns (typically dates) turn
time-range predicates into directory pruning, verified by plan inspection
in tests (``PartitionFilters`` on the scan, not post-scan filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | tuple[str, ...],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned files: one directory per partition value.

    Size partitions for ~100MB-1GB files at scale (repartition on the
    partition columns first if the input would fan out tiny files)."""
    (
        df.repartition(*partition_by)
        .write.mode(mode)
        .format(fmt)
        .partitionBy(*partition_by)
        .save(path)
    )


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned layout; partition columns come back typed and
    filters on them prune directories before any file IO."""
    return spark.read.format(fmt).load(path)
