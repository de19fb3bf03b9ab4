"""Property-based tests (hypothesis): upsert final-state semantics against a
pure-Python model, and sketch error bounds. Few, fat examples — each example
pays Spark job latency, so the strategies favor breadth per example."""

from __future__ import annotations

import sqlite3
from functools import partial

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bonobo_sqlalchemy_spark import DbapiService, Graph, InsertOrUpdate, run
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.text(min_size=0, max_size=8)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(first=rows_strategy, second=rows_strategy)
def test_upsert_final_state_matches_model(spark, tmp_path_factory, first, second):
    """Two sequential upsert batches must leave the table equal to the
    dict-model: apply batch1 keep-last-per-key, then batch2 keep-last-per-key
    overwriting batch1."""
    db = str(tmp_path_factory.mktemp("prop") / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, value VARCHAR)")
    con.commit(); con.close()
    services = {"sqlalchemy.engine": DbapiService(partial(sqlite3.connect, db))}

    model: dict[int, str] = {}
    for batch in (first, second):
        if batch:
            # keep-last within a batch (documented set-based semantics)
            for k, v in batch:
                model[k] = v
            df = spark.createDataFrame(batch, "id int, value string").coalesce(1)
            run(Graph(df, InsertOrUpdate("t")), spark, services=services)

    con = sqlite3.connect(db)
    got = dict(con.execute("SELECT id, value FROM t").fetchall())
    con.close()
    assert got == model


def test_approx_distinct_error_bound(spark, sf_small):
    from bonobo_sqlalchemy_spark.queries import REGISTRY

    rows = REGISTRY["q_approx_distinct"].spark(spark, sf_small).collect()
    assert rows
    for r in rows:
        # the query exposes the bound check itself (driver-comparable);
        # both flags must hold on every group
        assert r.orders_within_bounds and r.parts_within_bounds
        assert r.exact_orders > 0 and r.exact_parts > 0
