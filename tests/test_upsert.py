"""Upsert sink tests — mirrors the reference's integration round-trips
(`tests/test_integration.py:173-207`, FIXTURES.md A1/A2) against SQLite
(single-writer DBAPI backend) and a parquet-directory target (lakehouse
MERGE emulation)."""

from __future__ import annotations

import datetime
import sqlite3
from functools import partial

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark import (
    DbapiService,
    Graph,
    InsertOrUpdate,
    PathService,
    run,
)
from bonobo_sqlalchemy_spark.constants import INSERT, UPDATE


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "t.db")
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE table_1 (id INTEGER PRIMARY KEY, value VARCHAR(255));
        CREATE TABLE table_2 (id INTEGER PRIMARY KEY, value VARCHAR(255));
        CREATE TABLE audited (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            ext_key VARCHAR, value VARCHAR, src VARCHAR,
            created_at TIMESTAMP, updated_at TIMESTAMP);
        """
    )
    con.commit()
    con.close()
    return path


def _svc(path: str) -> dict:
    return {"sqlalchemy.engine": DbapiService(partial(sqlite3.connect, path))}


def _golden(spark):
    # Reference golden input: 10 rows (i, 'value for {i}').
    return spark.createDataFrame(
        [(i, f"value for {i}") for i in range(10)], "id int, value string"
    )


def _read(path, sql):
    con = sqlite3.connect(path)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_roundtrip_golden_rows(spark, db):
    sink = InsertOrUpdate("table_1", discriminant=("id",))
    [out] = run(Graph(_golden(spark), sink), spark, services=_svc(db))
    assert out.count() == 10  # written rows re-emitted downstream (O2c)
    rows = _read(db, "SELECT id, value FROM table_1 ORDER BY id")
    assert rows == [(i, f"value for {i}") for i in range(10)]
    assert sink.last_stats == {"insert": 10, "update": 0}
    assert sink.last_errors == []


def test_copy_table_preserves_content(spark, db):
    run(Graph(_golden(spark), InsertOrUpdate("table_1")), spark, services=_svc(db))
    src = spark.createDataFrame(
        _read(db, "SELECT id, value FROM table_1"), "id int, value string"
    )
    run(Graph(src, InsertOrUpdate("table_2")), spark, services=_svc(db))
    assert _read(db, "SELECT id, value FROM table_2 ORDER BY id") == [
        (i, f"value for {i}") for i in range(10)
    ]


def test_update_existing_rows(spark, db):
    run(Graph(_golden(spark), InsertOrUpdate("table_1")), spark, services=_svc(db))
    updated = _golden(spark).withColumn("value", F.concat(F.lit("v2 "), "value"))
    sink = InsertOrUpdate("table_1")
    run(Graph(updated, sink), spark, services=_svc(db))
    assert sink.last_stats == {"insert": 0, "update": 10}
    rows = _read(db, "SELECT id, value FROM table_1 ORDER BY id")
    assert rows == [(i, f"v2 value for {i}") for i in range(10)]


def test_mixed_insert_update(spark, db):
    run(Graph(_golden(spark), InsertOrUpdate("table_1")), spark, services=_svc(db))
    mixed = spark.createDataFrame(
        [(5, "changed"), (20, "new row")], "id int, value string"
    )
    sink = InsertOrUpdate("table_1")
    run(Graph(mixed, sink), spark, services=_svc(db))
    assert sink.last_stats == {"insert": 1, "update": 1}
    assert _read(db, "SELECT value FROM table_1 WHERE id = 5") == [("changed",)]
    assert _read(db, "SELECT value FROM table_1 WHERE id = 20") == [("new row",)]
    assert _read(db, "SELECT count(*) FROM table_1") == [(11,)]


def test_operation_gating_insert_only(spark, db):
    """O2h: UPDATE prohibited -> existing-key rows land in the dead-letter
    channel (reference raises ProhibitedOperationError per row and yields
    it downstream, writers.py:92-95,113-126)."""
    run(Graph(_golden(spark), InsertOrUpdate("table_1")), spark, services=_svc(db))
    sink = InsertOrUpdate("table_1", allowed_operations=(INSERT,))
    mixed = spark.createDataFrame(
        [(5, "should not update"), (30, "new")], "id int, value string"
    )
    run(Graph(mixed, sink), spark, services=_svc(db))
    assert sink.last_stats == {"insert": 1, "update": 0}
    assert len(sink.last_errors) == 1 and sink.last_errors[0]["op"] == "UPDATE"
    assert _read(db, "SELECT value FROM table_1 WHERE id = 5") == [("value for 5",)]
    assert _read(db, "SELECT value FROM table_1 WHERE id = 30") == [("new",)]


def test_operation_gating_update_only(spark, db):
    run(Graph(_golden(spark), InsertOrUpdate("table_1")), spark, services=_svc(db))
    sink = InsertOrUpdate("table_1", allowed_operations=(UPDATE,))
    mixed = spark.createDataFrame(
        [(5, "updated"), (40, "rejected insert")], "id int, value string"
    )
    run(Graph(mixed, sink), spark, services=_svc(db))
    assert sink.last_stats == {"insert": 0, "update": 1}
    assert len(sink.last_errors) == 1 and sink.last_errors[0]["op"] == "INSERT"
    assert _read(db, "SELECT count(*) FROM table_1 WHERE id = 40") == [(0,)]


def test_audit_timestamps_and_insert_only_fields(spark, db):
    """O2f: created_at only on INSERT, updated_at on every write;
    insert_only_fields never change on UPDATE (writers.py:105-132,171-172)."""
    first = spark.createDataFrame(
        [("k1", "v1", "origin-a")], "ext_key string, value string, src string"
    )
    sink = InsertOrUpdate(
        "audited", discriminant=("ext_key",), insert_only_fields=("src",)
    )
    run(Graph(first, sink), spark, services=_svc(db))
    [(created1, updated1, src1)] = _read(
        db, "SELECT created_at, updated_at, src FROM audited WHERE ext_key='k1'"
    )
    assert created1 is not None and updated1 is not None and src1 == "origin-a"

    second = spark.createDataFrame(
        [("k1", "v2", "origin-b")], "ext_key string, value string, src string"
    )
    run(Graph(second, sink), spark, services=_svc(db))
    [(created2, updated2, src2, value2)] = _read(
        db,
        "SELECT created_at, updated_at, src, value FROM audited WHERE ext_key='k1'",
    )
    assert value2 == "v2"
    assert src2 == "origin-a"  # insert-only field preserved
    assert created2 == created1  # created_at preserved on update
    assert updated2 >= updated1


def test_fetch_columns_generated_id(spark, db):
    """O2i: DB-generated id fetched back into the outgoing stream."""
    rows = spark.createDataFrame(
        [("a", "v-a", "s"), ("b", "v-b", "s")], "ext_key string, value string, src string"
    )
    sink = InsertOrUpdate(
        "audited", discriminant=("ext_key",), fetch_columns=("id",)
    )
    [out] = run(Graph(rows, sink), spark, services=_svc(db))
    got = {(r.ext_key, r.id is not None) for r in out.collect()}
    assert got == {("a", True), ("b", True)}
    db_ids = dict(_read(db, "SELECT ext_key, id FROM audited"))
    out_ids = {r.ext_key: r.id for r in out.collect()}
    assert out_ids == db_ids


def test_fetch_back_is_keyed_not_full_table(spark, db, monkeypatch):
    """O2i at scale: fetch-back must issue keyed SELECTs for only the
    written keys — never materialize the whole target on the driver. The
    target here holds 5k pre-existing rows; a full-table read path
    (pandas.read_sql_query) is poisoned to fail, and the driver-side probe
    is the only permitted unkeyed statement (LIMIT-bounded)."""
    import pandas as pd

    con = sqlite3.connect(db)
    con.executemany(
        "INSERT INTO audited (ext_key, value, src) VALUES (?, ?, ?)",
        [(f"pre-{i}", f"v{i}", "seed") for i in range(5000)],
    )
    con.commit()
    con.close()

    def _boom(*a, **k):
        raise AssertionError("full-table pandas.read_sql_query on the driver")

    monkeypatch.setattr(pd, "read_sql_query", _boom)

    rows = spark.createDataFrame(
        [("a", "v-a", "s"), ("b", "v-b", "s")], "ext_key string, value string, src string"
    )
    sink = InsertOrUpdate("audited", discriminant=("ext_key",), fetch_columns=("id",))
    [out] = run(Graph(rows, sink), spark, services=_svc(db))
    got = {r.ext_key: r.id for r in out.collect()}
    db_ids = dict(_read(db, "SELECT ext_key, id FROM audited WHERE ext_key IN ('a','b')"))
    assert got == db_ids and all(v is not None for v in got.values())


def test_duplicate_keys_in_one_batch_keep_last(spark, db):
    """Set-based divergence (§4.2.3): same key twice in one batch ->
    exactly one final row; last occurrence wins."""
    dup = spark.createDataFrame(
        [(1, "first"), (1, "second"), (1, "third")], "id int, value string"
    ).coalesce(1)
    sink = InsertOrUpdate("table_1")
    run(Graph(dup, sink), spark, services=_svc(db))
    assert _read(db, "SELECT value FROM table_1 WHERE id = 1") == [("third",)]


def test_postgres_paramstyle_branch_round_trip(spark, db):
    """The postgresql dialect branches ('%s' paramstyle, information_schema
    reflection, postgres-flavored find/insert/update SQL) executed end-to-end
    against the in-process shim (`bonobo_sqlalchemy_spark.testing`) — the
    documented stand-in while no server database ships in this build."""
    from bonobo_sqlalchemy_spark.testing import postgres_shim_connect

    svc = {
        "sqlalchemy.engine": DbapiService(
            partial(postgres_shim_connect, db), paramstyle="format", dialect="postgresql"
        )
    }
    sink = InsertOrUpdate("audited", discriminant=("ext_key",), fetch_columns=("id",))
    rows = spark.createDataFrame(
        [("pg-a", "v1", "s"), ("pg-b", "v2", "s")],
        "ext_key string, value string, src string",
    )
    [out] = run(Graph(rows, sink), spark, services=svc)
    assert {r.ext_key for r in out.collect()} == {"pg-a", "pg-b"}
    assert sink.last_stats == {"insert": 2, "update": 0}
    # second pass updates through the %s-parameterized UPDATE branch
    rows2 = spark.createDataFrame(
        [("pg-a", "v1-updated", "s")], "ext_key string, value string, src string"
    )
    [out2] = run(Graph(rows2, sink), spark, services=svc)
    assert sink.last_stats == {"insert": 0, "update": 1}
    assert _read(db, "SELECT value FROM audited WHERE ext_key = 'pg-a'") == [
        ("v1-updated",)
    ]
    assert all(r.id is not None for r in out2.collect())


def test_update_noop_when_all_columns_insert_only_is_channelled(spark, db):
    """When every non-key column is insert-only there is nothing to SET:
    matched rows must surface in the dead-letter channel (reference
    behavior: the per-row UPDATE error is yielded downstream), not vanish
    silently from both stats and errors."""
    sink = InsertOrUpdate(
        "table_1", discriminant=("id",), insert_only_fields=("value",)
    )
    run(Graph(_golden(spark), sink), spark, services=_svc(db))
    assert sink.last_stats == {"insert": 10, "update": 0}
    sink2 = InsertOrUpdate(
        "table_1", discriminant=("id",), insert_only_fields=("value",)
    )
    run(Graph(_golden(spark), sink2), spark, services=_svc(db))
    assert sink2.last_stats == {"insert": 0, "update": 0}
    assert sum(e["n"] for e in sink2.last_errors if e["op"] == "UPDATE-noop") == 10


def test_missing_table_is_fatal(spark, db):
    from bonobo_sqlalchemy_spark.errors import UnrecoverableOperationalError

    sink = InsertOrUpdate("nonexistent_table")
    with pytest.raises(UnrecoverableOperationalError):
        run(Graph(_golden(spark), sink), spark, services=_svc(db))


# ---------------------------------------------------------------------------
# Parquet-directory target (lakehouse MERGE emulation)
# ---------------------------------------------------------------------------

def test_path_target_create_then_merge(spark, tmp_path):
    svc = {"sqlalchemy.engine": PathService(str(tmp_path))}
    sink = InsertOrUpdate("t", discriminant=("id",))
    run(Graph(_golden(spark), sink), spark, services=svc)
    assert sink.last_stats["insert"] == 10

    mixed = spark.createDataFrame(
        [(5, "changed"), (20, "new row")], "id int, value string"
    )
    sink2 = InsertOrUpdate("t", discriminant=("id",))
    run(Graph(mixed, sink2), spark, services=svc)
    assert sink2.last_stats == {"insert": 1, "update": 1}
    final = spark.read.parquet(str(tmp_path / "t.parquet"))
    assert final.count() == 11
    assert final.where("id = 5").collect()[0].value == "changed"
    assert final.where("id = 20").collect()[0].value == "new row"


def test_path_target_update_only_gating(spark, tmp_path):
    svc = {"sqlalchemy.engine": PathService(str(tmp_path))}
    run(Graph(_golden(spark), InsertOrUpdate("t")), spark, services=svc)
    sink = InsertOrUpdate("t", allowed_operations=(UPDATE,))
    mixed = spark.createDataFrame(
        [(3, "upd"), (99, "rejected")], "id int, value string"
    )
    run(Graph(mixed, sink), spark, services=svc)
    assert sink.last_errors and sink.last_errors[0]["op"] == "INSERT"
    final = spark.read.parquet(str(tmp_path / "t.parquet"))
    assert final.count() == 10
    assert final.where("id = 3").collect()[0].value == "upd"


def test_order_col_keep_last_is_shuffle_invariant(spark, tmp_path):
    """With order_col, 'last row wins' is defined by the declared column —
    identical results regardless of input partitioning (the default
    monotonic-id tie-break is only source-order within a partition)."""
    import sqlite3
    from functools import partial

    from bonobo_sqlalchemy_spark import DbapiService, InsertOrUpdate

    rows = [
        (1, "old", 10),
        (1, "mid", 20),
        (1, "new", 30),
        (2, "only", 5),
    ]
    df = spark.createDataFrame(rows, "id int, val string, version int")
    for reshuffle in (lambda d: d, lambda d: d.repartition(7, "val")):
        dbfile = str(tmp_path / f"oc_{reshuffle.__code__.co_consts}.db".replace("(", "").replace(")", "").replace(",", "").replace(" ", ""))
        with sqlite3.connect(dbfile) as con:
            con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, val TEXT, version INTEGER)")
        sink = InsertOrUpdate("t", discriminant=("id",), order_col="version", engine="db")
        sink.write(reshuffle(df), spark, {"db": DbapiService(partial(sqlite3.connect, dbfile))})
        with sqlite3.connect(dbfile) as con:
            got = sorted(con.execute("SELECT id, val, version FROM t").fetchall())
        assert got == [(1, "new", 30), (2, "only", 5)]


def test_order_col_missing_raises(spark):
    from bonobo_sqlalchemy_spark import InsertOrUpdate

    df = spark.createDataFrame([(1, "a")], "id int, val string")
    sink = InsertOrUpdate("t", discriminant=("id",), order_col="nope")
    import pytest

    with pytest.raises(ValueError, match="order_col"):
        sink._prepare(df, ["id", "val"])


def test_order_col_may_be_input_only_and_ties_are_stable(spark, tmp_path):
    """order_col need not be a target column (version/timestamp often is
    not persisted), and rows with EQUAL order_col values resolve
    deterministically (monotonic-id tiebreak), not by partition luck."""
    import sqlite3
    from functools import partial

    from bonobo_sqlalchemy_spark import DbapiService, InsertOrUpdate

    dbfile = str(tmp_path / "oc_inputonly.db")
    with sqlite3.connect(dbfile) as con:
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, val TEXT)")  # no version col
    df = spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (1, "c", 9), (2, "x", 1)],
        "id int, val string, version int",
    ).coalesce(1)
    sink = InsertOrUpdate("t", discriminant=("id",), order_col="version", engine="db")
    out = sink.write(df, spark, {"db": DbapiService(partial(sqlite3.connect, dbfile))})
    assert "version" not in out.columns  # projected to target schema
    with sqlite3.connect(dbfile) as con:
        got = sorted(con.execute("SELECT id, val FROM t").fetchall())
    # tie at version=9: later source row ('c') wins via the monotonic-id
    # tiebreak — deterministic on the single-partition input
    assert got == [(1, "c"), (2, "x")]


def test_path_target_snapshot_create_then_merge(spark, tmp_path):
    """snapshot=True: the same MERGE semantics land as atomic snapshot
    commits (operators/snapshot.py) — round-13 first-class sink wiring.
    The pre-merge state stays time-travelable and each write is one
    version."""
    from bonobo_sqlalchemy_spark.operators.snapshot import (
        snapshot_read,
        snapshot_versions,
    )

    svc = {"sqlalchemy.engine": PathService(str(tmp_path))}
    sink = InsertOrUpdate("t", discriminant=("id",), snapshot=True)
    run(Graph(_golden(spark), sink), spark, services=svc)
    assert sink.last_stats["insert"] == 10

    mixed = spark.createDataFrame(
        [(5, "changed"), (20, "new row")], "id int, value string"
    )
    sink2 = InsertOrUpdate("t", discriminant=("id",), snapshot=True)
    run(Graph(mixed, sink2), spark, services=svc)
    assert sink2.last_stats == {"insert": 1, "update": 1}

    root = str(tmp_path / "t.parquet")
    final = snapshot_read(spark, root)
    assert final.count() == 11
    assert final.where("id = 5").collect()[0].value == "changed"
    assert final.where("id = 20").collect()[0].value == "new row"
    # one snapshot per write; the pre-merge table is still readable
    names = snapshot_versions(root)
    assert len(names) == 2
    v1 = snapshot_read(spark, root, names[0])
    assert v1.count() == 10
    assert v1.where("id = 5").collect()[0].value != "changed"


def test_path_target_snapshot_update_only_gating(spark, tmp_path):
    from bonobo_sqlalchemy_spark.operators.snapshot import snapshot_read

    svc = {"sqlalchemy.engine": PathService(str(tmp_path))}
    run(
        Graph(_golden(spark), InsertOrUpdate("t", snapshot=True)),
        spark,
        services=svc,
    )
    sink = InsertOrUpdate("t", allowed_operations=(UPDATE,), snapshot=True)
    mixed = spark.createDataFrame(
        [(3, "upd"), (99, "rejected")], "id int, value string"
    )
    run(Graph(mixed, sink), spark, services=svc)
    assert sink.last_errors and sink.last_errors[0]["op"] == "INSERT"
    final = snapshot_read(spark, str(tmp_path / "t.parquet"))
    assert final.count() == 10
    assert final.where("id = 3").collect()[0].value == "upd"
