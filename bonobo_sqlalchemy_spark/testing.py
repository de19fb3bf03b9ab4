"""Test doubles for server-database backends.

No server database ships in this build (see ``sources/jdbc.py``), so the
PostgreSQL-specific upsert branches — ``format`` ('%s') paramstyle and the
``information_schema.columns`` reflection path (``operators/upsert.py``)
— would otherwise never execute. :func:`postgres_shim_connect` is an
in-process stand-in: a minimal DBAPI adapter that speaks those PostgreSQL
conventions over an embedded sqlite store, so the exact SQL strings the
postgres dialect emits are parsed, bound, and executed for real.

Documented limitation (COVERAGE.md): this validates SQL/paramstyle
construction and the reflection flow, not live-server behaviors
(concurrency, types like ``timestamptz``, network errors).
"""

from __future__ import annotations

import datetime
import sqlite3
from typing import Any, Iterable, Sequence


def _adapt(v: Any) -> Any:
    # Python 3.12 sqlite3 dropped the implicit datetime adapter; a real
    # psycopg2 adapts datetimes natively, so the shim does it here.
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    return v


class PgShimCursor:
    """Translates '%s' placeholders and information_schema reflection."""

    def __init__(self, cur: sqlite3.Cursor) -> None:
        self._cur = cur
        self._rows: list[tuple] | None = None

    def execute(self, sql: str, params: Sequence = ()) -> "PgShimCursor":
        if "information_schema.columns" in sql:
            table = str(params[0]).replace('"', '""')
            info = self._cur.execute(f'PRAGMA table_info("{table}")').fetchall()
            self._rows = [(r[1],) for r in info]  # ordinal order
            return self
        self._rows = None
        self._cur.execute(sql.replace("%s", "?"), [_adapt(v) for v in params])
        return self

    def executemany(self, sql: str, rows: Iterable[Sequence]) -> "PgShimCursor":
        self._rows = None
        self._cur.executemany(
            sql.replace("%s", "?"), [[_adapt(v) for v in r] for r in rows]
        )
        return self

    def fetchall(self) -> list[tuple]:
        if self._rows is not None:
            rows, self._rows = self._rows, None
            return rows
        return self._cur.fetchall()


class PgShimConnection:
    def __init__(self, conn: sqlite3.Connection) -> None:
        self._conn = conn

    def cursor(self) -> PgShimCursor:
        return PgShimCursor(self._conn.cursor())

    def commit(self) -> None:
        self._conn.commit()

    def rollback(self) -> None:
        self._conn.rollback()

    def close(self) -> None:
        self._conn.close()


def postgres_shim_connect(path: str) -> PgShimConnection:
    """Zero-arg-able (via ``functools.partial``) connection factory for a
    ``DbapiService(paramstyle='format', dialect='postgresql')``."""
    return PgShimConnection(sqlite3.connect(path))
