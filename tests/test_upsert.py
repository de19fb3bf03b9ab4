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


def test_duplicate_keys_in_one_batch_keep_last(spark, db):
    """Set-based divergence (§4.2.3): same key twice in one batch ->
    exactly one final row; last occurrence wins."""
    dup = spark.createDataFrame(
        [(1, "first"), (1, "second"), (1, "third")], "id int, value string"
    ).coalesce(1)
    sink = InsertOrUpdate("table_1")
    run(Graph(dup, sink), spark, services=_svc(db))
    assert _read(db, "SELECT value FROM table_1 WHERE id = 1") == [("third",)]


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
