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
import re

from pyspark.sql import DataFrame, SparkSession

from ..registry import JdbcService

#: Jar-cache roots probed for JDBC driver jars, in order — bounded to the
#: actual JAR caches (coursier/maven/ivy), NOT all of ~/.cache: a recursive
#: walk of a general cache dir (pip/huggingface/...) can cost tens of
#: seconds and this probe runs at session startup. All are standard local
#: caches; nothing is downloaded.
_JAR_SEARCH_ROOTS = ("~/.cache/coursier", "~/.m2/repository", "~/.ivy2")


def _jar_version_key(path: str) -> tuple:
    """Numeric version tuple from a jar filename (1.0.0 > 0.9.2, and
    10.x > 9.x — plain lexicographic path sort gets both wrong)."""
    m = re.search(r"(\d+(?:\.\d+)*)[^/]*\.jar$", os.path.basename(path))
    return tuple(int(x) for x in m.group(1).split(".")) if m else ()


@functools.lru_cache(maxsize=None)
def find_jdbc_driver_jar(artifact: str = "duckdb_jdbc") -> str | None:
    """Locate a JDBC driver jar named ``<artifact>*.jar``.

    ``SPARK_GRAFT_JDBC_JAR`` overrides the scan entirely (and also serves
    as the opt-out: set it to an empty-but-present value pointing at the
    desired jar on hosts where even the bounded scan is unwanted). Multiple
    cached versions resolve to the HIGHEST version, not the first path in
    sort order. Cached per process.
    """
    override = os.environ.get("SPARK_GRAFT_JDBC_JAR")
    if override is not None:
        return override or None
    hits: list[str] = []
    for root in _JAR_SEARCH_ROOTS:
        hits.extend(
            glob.glob(
                os.path.join(os.path.expanduser(root), "**", f"{artifact}*.jar"),
                recursive=True,
            )
        )
    if not hits:
        return None
    return max(sorted(hits), key=_jar_version_key)


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
