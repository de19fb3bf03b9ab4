"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H-Q1-style pricing summary) on
  sf0.001 — smoke check.
- ``queries()``: every implemented operator from SURVEY.md §2, one callable
  ``(spark, sf_dir) -> DataFrame`` per name.
- ``oracle_sql()``: the DuckDB-equivalent SQL for each query that is
  SQL-expressible — which as of round 13 is every registered query except
  ``text_compression_ratio`` (no oracle engine ships zlib; the DEFLATE
  byte stream is not SQL-expressible). Everything else, including the
  LSH/minhash/simhash families, streaming-stateful replays, BPE training,
  and the PCA eigenbasis, carries a full value-level oracle.

Implementation lives in ``bonobo_sqlalchemy_spark.queries``; this module is
a thin adapter over its registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bonobo_sqlalchemy_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
