"""File sinks: append/overwrite writes with hive-style partitioning.

The insert-only half of the reference's load path (``InsertOrUpdate`` with
``allowed_operations=(INSERT,)``) maps to plain appends; at warehouse scale
the table layout IS the index — partition columns (typically dates) turn
time-range predicates into directory pruning, verified by plan inspection
in tests (``PartitionFilters`` on the scan, not post-scan filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


#: Per-format defaults so csv round-trips keep names and types.
_WRITE_DEFAULTS: dict[str, dict[str, str]] = {"csv": {"header": "true"}}
_READ_DEFAULTS: dict[str, dict[str, str]] = {"csv": {"header": "true"}}


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | tuple[str, ...],
    fmt: str = "parquet",
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """Write hive-partitioned files: one directory per partition value.

    ``fmt`` is any DataSource V2 format (parquet/csv/json/orc...); csv gets
    a header by default so names survive the round trip. Size partitions
    for ~100MB-1GB files at scale (repartition on the partition columns
    first if the input would fan out tiny files)."""
    (
        df.repartition(*partition_by)
        .write.mode(mode)
        .format(fmt)
        .options(**{**_WRITE_DEFAULTS.get(fmt, {}), **(options or {})})
        .partitionBy(*partition_by)
        .save(path)
    )


def read_partitioned(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a partitioned layout; partition columns come back typed and
    filters on them prune directories before any file IO.

    Text formats (csv/json) carry no types — pass ``schema`` (DDL string)
    for exact round-trips; with no schema, csv/json readers infer (an extra
    listing+sampling pass, fine for exploration, not for production)."""
    reader = spark.read.format(fmt).options(
        **{**_READ_DEFAULTS.get(fmt, {}), **(options or {})}
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    return reader.load(path)
