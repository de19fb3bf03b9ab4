"""Example table models (reference ``examples/models.py`` parity).

The reference declares a SQLAlchemy ``Table`` with Integer PK + String(255)
value and a shared ``metadata`` whose ``create_all`` issues the DDL. Spark
has no client-side table metadata object — the upsert sink reflects the
live table instead (SURVEY §1.1) — so the model here is what the engine
actually needs: the DDL string per backend plus the Spark schema for frames
headed at the table.
"""

from __future__ import annotations

#: name -> per-dialect CREATE TABLE DDL (reference schema: id int PK,
#: value varchar(255)).
TABLES: dict[str, dict[str, str]] = {
    "example": {
        "postgresql": (
            "CREATE TABLE IF NOT EXISTS example ("
            " id integer PRIMARY KEY, value varchar(255))"
        ),
        "sqlite": (
            "CREATE TABLE IF NOT EXISTS example ("
            " id INTEGER PRIMARY KEY, value TEXT)"
        ),
    }
}

#: Spark-side schemas (DDL strings accepted by spark.createDataFrame).
SCHEMAS: dict[str, str] = {"example": "id int, value string"}


def create_all(conn, dialect: str = "postgresql") -> None:
    """Issue every table's DDL on an open DBAPI connection — the engine
    analog of ``models.metadata.create_all(engine)``."""
    cur = conn.cursor()
    for ddls in TABLES.values():
        cur.execute(ddls[dialect])
    conn.commit()
