"""Named-service registry: connections and catalogs resolved by name.

Reference parity: bonobo-sqlalchemy resolves database engines from a service
dict at run time — ``engine = Service('sqlalchemy.engine')``
(``readers.py:49``, ``writers.py:37``), supplied as
``bonobo.run(graph, services={'sqlalchemy.engine': engine})``
(``tests/test_integration.py:171-175``). The Spark engine keeps the same
indirection: operators name a service; the registry maps the name to either

- a :class:`JdbcService` (url + properties) for ``spark.read/write.jdbc``,
- a :class:`DbapiService` (a zero-arg connection factory, e.g. ``sqlite3``
  or ``psycopg2``) used by the per-partition upsert sink,
- a :class:`PathService` (directory of parquet/csv/json tables) for
  file-backed catalogs like the driver's testdata.

``create_postgresql_engine`` parity (``bonobo_sqlalchemy/util.py:20-35``):
:func:`create_postgresql_jdbc` builds a JDBC service from kwargs overriding
``POSTGRES_*`` env vars overriding defaults, with the same precedence.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable

from .errors import MissingServiceError

DEFAULT_ENGINE_SERVICE = "sqlalchemy.engine"


@dataclass
class JdbcService:
    """JDBC url + connection properties for Spark's JDBC source/sink."""

    url: str
    properties: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        return {"url": self.url, **self.properties}


@dataclass
class DbapiService:
    """DBAPI connection factory for per-partition sinks (upsert).

    ``connect`` must be picklable (module-level function / functools.partial
    over picklable args) because it is shipped to executors.
    ``paramstyle`` is the DBAPI paramstyle ('qmark' for sqlite, 'format' for
    psycopg2). ``dialect`` selects upsert SQL flavor ('sqlite', 'postgresql',
    'duckdb').
    """

    connect: Callable[[], Any]
    paramstyle: str = "qmark"
    dialect: str = "sqlite"


@dataclass
class PathService:
    """A directory holding one file-based table per name (e.g. testdata)."""

    root: str
    fmt: str = "parquet"

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.{self.fmt}")


class ServiceRegistry:
    """name -> service dict with reference-style default naming."""

    def __init__(self, services: dict[str, Any] | None = None) -> None:
        self._services: dict[str, Any] = dict(services or {})

    def register(self, name: str, service: Any) -> "ServiceRegistry":
        self._services[name] = service
        return self

    def resolve(self, name: str) -> Any:
        try:
            return self._services[name]
        except KeyError:
            raise MissingServiceError(
                f"service {name!r} is not registered; known: {sorted(self._services)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._services


def create_postgresql_jdbc(
    *, options: str = "client_encoding=utf8", env: str = "POSTGRES", **kwargs: str
) -> JdbcService:
    """Build a Postgres JDBC service: kwargs > env vars > defaults.

    Mirrors the precedence of the reference DSN builder
    (``bonobo_sqlalchemy/util.py:20-35``) with a JDBC URL instead of a
    SQLAlchemy DSN.
    """

    def pick(key: str, default: str) -> str:
        return str(kwargs.get(key) or os.environ.get(f"{env}_{key.upper()}") or default)

    host = pick("host", "localhost")
    port = pick("port", "5432")
    name = pick("name", "postgres")
    user = pick("user", "postgres")
    password = pick("pass", "")
    url = f"jdbc:postgresql://{host}:{port}/{name}"
    if options:
        url += "?" + options
    return JdbcService(
        url=url,
        properties={
            "user": user,
            "password": password,
            "driver": "org.postgresql.Driver",
        },
    )


def create_postgresql_dbapi(
    *, env: str = "POSTGRES", **kwargs: str
) -> DbapiService:
    """Build a Postgres DBAPI service on the in-repo pure-Python wire client
    (``pgwire.py`` — no external driver needed), with the same
    kwargs > env > defaults precedence as :func:`create_postgresql_jdbc`.

    Extra keys beyond the reference DSN fields: ``socket_dir`` (connect
    over a unix socket instead of TCP — how the live-server test reaches
    its private instance).
    """
    import functools

    from . import pgwire

    def pick(key: str, default: str) -> str:
        return str(kwargs.get(key) or os.environ.get(f"{env}_{key.upper()}") or default)

    params = dict(
        host=pick("host", "localhost"),
        port=int(pick("port", "5432")),
        dbname=pick("name", "postgres"),
        user=pick("user", "postgres"),
        password=pick("pass", "") or None,
        unix_socket_dir=pick("socket_dir", "") or None,
    )
    return DbapiService(
        connect=functools.partial(pgwire.connect, **params),
        paramstyle="format",
        dialect="postgresql",
    )


#: Drop-in name parity with the reference public helper
#: (``bonobo_sqlalchemy.create_postgresql_engine``); returns the engine's
#: JDBC service instead of a SQLAlchemy engine.
create_postgresql_engine = create_postgresql_jdbc
