"""Example service wiring (reference ``examples/services.py`` parity).

The reference builds a SQLAlchemy engine from settings (superuser variant
for DDL) and exposes ``get_services() -> {'sqlalchemy.engine': engine}``.
The engine version builds the equivalent named services: a DBAPI service
(the pure-Python wire client) for Postgres, or a path catalog when no
server is configured — same ``get_services`` contract either way
(``run(graph, services=get_services())``).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import settings  # noqa: E402

from bonobo_sqlalchemy_spark.registry import (  # noqa: E402
    DEFAULT_ENGINE_SERVICE,
    PathService,
    create_postgresql_dbapi,
)


def create_service(superuser: bool = False):
    """DBAPI service from settings; ``superuser=True`` omits the example
    credentials so DDL runs as the server's default role (the reference's
    root-engine pattern)."""
    if settings.DATABASE_TYPE == "postgres":
        if superuser:
            return create_postgresql_dbapi()
        return create_postgresql_dbapi(
            name=settings.DATABASE_NAME,
            user=settings.DATABASE_USERNAME,
            **{"pass": settings.DATABASE_PASSWORD},
        )
    if settings.DATABASE_TYPE == "path":
        return PathService(settings.PATH_CATALOG_ROOT)
    raise NotImplementedError(
        f"Example not implemented for database type {settings.DATABASE_TYPE}."
    )


def get_services() -> dict:
    return {DEFAULT_ENGINE_SERVICE: create_service()}
