"""The engine's main correctness gate, mirrored locally.

Every registered query with an oracle must match DuckDB bit-exactly at
sf0.001 (fast path for CI; the driver runs sf0.01 — run with
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size check).
Rows-only queries must at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from bonobo_sqlalchemy_spark.oracle import compare_query
from bonobo_sqlalchemy_spark.queries import REGISTRY

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_small, name):
    result = compare_query(spark, name, sf_small)
    assert result.ok, str(result)


def test_every_query_has_entry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert q, "no queries registered"
