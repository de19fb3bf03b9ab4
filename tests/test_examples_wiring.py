"""Example-project wiring parity (reference ``examples/{settings,models,
services,commands}.py`` — CLI-driven create/drop DDL flow + named-service
factory). These tests run the wiring without a database server via the
path-catalog fallback; the live-Postgres flow is exercised in
``test_pgwire_live.py``.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

EXAMPLES = str(Path(__file__).resolve().parent.parent / "examples")


def _fresh(mod_name: str):
    if EXAMPLES not in sys.path:
        sys.path.insert(0, EXAMPLES)
    mod = importlib.import_module(mod_name)
    return importlib.reload(mod)


def test_services_path_fallback(monkeypatch, tmp_path):
    monkeypatch.setenv("EXAMPLE_DATABASE_TYPE", "path")
    monkeypatch.setenv("EXAMPLE_PATH_CATALOG", str(tmp_path))
    _fresh("settings")
    services = _fresh("services")
    from bonobo_sqlalchemy_spark.registry import DEFAULT_ENGINE_SERVICE, PathService

    svc = services.get_services()
    assert set(svc) == {DEFAULT_ENGINE_SERVICE}
    assert isinstance(svc[DEFAULT_ENGINE_SERVICE], PathService)
    assert svc[DEFAULT_ENGINE_SERVICE].root == str(tmp_path)


def test_services_unknown_type_raises(monkeypatch):
    monkeypatch.setenv("EXAMPLE_DATABASE_TYPE", "oracle9i")
    _fresh("settings")
    services = _fresh("services")
    import pytest

    with pytest.raises(NotImplementedError):
        services.create_service()


def test_commands_parse_args_no_flags(monkeypatch, tmp_path):
    monkeypatch.setenv("EXAMPLE_DATABASE_TYPE", "path")
    monkeypatch.setenv("EXAMPLE_PATH_CATALOG", str(tmp_path))
    _fresh("settings")
    commands = _fresh("commands")
    with commands.parse_args(argv=[]) as options:
        assert options == {"drop": False, "create": False, "echo": False}


def test_commands_create_flag_is_noop_for_path_backend(monkeypatch, tmp_path):
    # --create only drives DDL on the postgres backend; the path catalog
    # needs none (tables appear on first write), so the flow must be a
    # clean no-op rather than an error.
    monkeypatch.setenv("EXAMPLE_DATABASE_TYPE", "path")
    monkeypatch.setenv("EXAMPLE_PATH_CATALOG", str(tmp_path))
    _fresh("settings")
    commands = _fresh("commands")
    with commands.parse_args(argv=["--create", "--drop"]) as options:
        assert options["create"] and options["drop"]


def test_models_ddl_and_schema_agree():
    models = _fresh("models")
    assert set(models.TABLES) == set(models.SCHEMAS)
    for ddls in models.TABLES.values():
        assert {"postgresql", "sqlite"} <= set(ddls)


def test_models_create_all_sqlite():
    import sqlite3

    models = _fresh("models")
    conn = sqlite3.connect(":memory:")
    models.create_all(conn, dialect="sqlite")
    rows = conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'"
    ).fetchall()
    assert ("example",) in rows
    conn.close()


def test_jdbc_select_example_lands_rows(spark, tmp_path):
    """examples/jdbc_select.py shape: Select over a LIVE database via JDBC
    -> parquet-warehouse upsert, run inline against this session."""
    import pytest

    from bonobo_sqlalchemy_spark.sources.jdbc import (
        duckdb_jdbc_service,
        find_jdbc_driver_jar,
    )

    if find_jdbc_driver_jar() is None:
        pytest.skip("no JDBC driver jar cached")
    import duckdb

    import bonobo_sqlalchemy_spark as bss

    db = str(tmp_path / "ex.db")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE sales AS SELECT range AS id, range % 7 AS region, "
        "range * 2.5 AS amount FROM range(1000)"
    )
    con.close()
    out = str(tmp_path / "wh")
    g = bss.Graph(
        bss.Select(
            "SELECT region, COUNT(*) AS n, SUM(amount) AS total "
            "FROM sales GROUP BY region",
            engine="jdbc",
        ),
        bss.InsertOrUpdate("region_totals", discriminant=("region",)),
    )
    [landed] = bss.run(
        g,
        spark,
        services={
            "jdbc": duckdb_jdbc_service(db),
            "sqlalchemy.engine": bss.PathService(out),
        },
    )
    assert landed.count() == 7
    back = spark.read.parquet(f"{out}/region_totals.parquet")
    assert int(back.agg({"n": "sum"}).collect()[0][0]) == 1000
