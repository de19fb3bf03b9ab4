"""Partitioned JDBC reads — the scale path for O1 (``Select``) against an
RDBMS.

The reference pages with LIMIT/OFFSET (``readers.py:59-67``), which is both
slow (server re-sorts per page) and inconsistent under concurrent writes
(its own docstring says so, ``readers.py:17-28``). Spark's JDBC source
replaces the page loop with N concurrent range-partitioned queries
(``WHERE $col >= lo AND $col < hi``), each a single snapshot-consistent
statement; ``fetchsize`` (the reference's ``pack_size``) only controls
driver-level row batching inside each partition.

Live coverage: no RDBMS *server* ships in this build, but a DuckDB JDBC
driver jar is discoverable in the local jar caches
(:func:`find_jdbc_driver_jar`), so the whole read path — driver class
loading, partitioned range predicates, fetchsize, Select's query push —
runs end-to-end against a real database file in ``tests/test_jdbc_live.py``.
:func:`duckdb_jdbc_service` builds the service; ``session.get_spark`` puts
any discovered driver jars on the session classpath automatically.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession

from ..registry import JdbcService

#: Jar-cache roots probed for JDBC driver jars, in order. All are standard
#: local caches (coursier, maven, ivy); nothing is downloaded.
_JAR_SEARCH_ROOTS = ("~/.cache", "~/.m2", "~/.ivy2")


@functools.lru_cache(maxsize=None)
def find_jdbc_driver_jar(artifact: str = "duckdb_jdbc") -> str | None:
    """Locate a JDBC driver jar named ``<artifact>*.jar`` in local caches.

    Returns the first match (or None). Cached: the scan walks cache trees.
    """
    for root in _JAR_SEARCH_ROOTS:
        hits = glob.glob(
            os.path.join(os.path.expanduser(root), "**", f"{artifact}*.jar"),
            recursive=True,
        )
        if hits:
            return sorted(hits)[0]
    return None


def duckdb_jdbc_service(db_path: str, *, read_only: bool = True) -> JdbcService:
    """JDBC service for a DuckDB database file.

    ``read_only=True`` lets Spark's N concurrent partition connections share
    the in-process database instance safely; writes must use a single
    partition (DuckDB files are single-writer — same rule as the sqlite
    DBAPI backend, ``operators/upsert.py``).
    """
    props = {"driver": "org.duckdb.DuckDBDriver"}
    if read_only:
        props["duckdb.read_only"] = "true"
    return JdbcService(url=f"jdbc:duckdb:{db_path}", properties=props)


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
