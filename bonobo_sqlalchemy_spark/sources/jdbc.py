"""Partitioned JDBC reads — the scale path for O1 (``Select``) against an
RDBMS.

The reference pages with LIMIT/OFFSET (``readers.py:59-67``), which is both
slow (server re-sorts per page) and inconsistent under concurrent writes
(its own docstring says so, ``readers.py:17-28``). Spark's JDBC source
replaces the page loop with N concurrent range-partitioned queries
(``WHERE $col >= lo AND $col < hi``), each a single snapshot-consistent
statement; ``fetchsize`` (the reference's ``pack_size``) only controls
driver-level row batching inside each partition.

No live database ships in this build, so these helpers are exercised at the
options-construction level in tests and by the JDBC branch of ``Select``;
the code path is the standard production surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import JdbcService


def jdbc_read_options(
    service: JdbcService,
    table_or_query: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int = 8,
    fetchsize: int = 1000,
) -> dict[str, str]:
    """Build the full option dict for a (optionally partitioned) JDBC read.

    ``table_or_query``: a table name, or a SELECT statement (wrapped as a
    derived table, the documented ``dbtable`` subquery form).
    """
    target = table_or_query.strip().rstrip(";")
    if target.lower().startswith("select"):
        target = f"({target}) AS __src"
    opts: dict[str, str] = {
        "url": service.url,
        "dbtable": target,
        "fetchsize": str(fetchsize),
        **service.properties,
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(
    spark: SparkSession,
    service: JdbcService,
    table_or_query: str,
    **kwargs,
) -> DataFrame:
    """Partitioned JDBC read (see :func:`jdbc_read_options` for knobs)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(service, table_or_query, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
