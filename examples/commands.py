"""Example CLI wiring (reference ``examples/commands.py`` parity).

The reference wraps bonobo's argument parser in a context manager adding
``--drop`` / ``--create`` / ``--echo``: drop/create the example database
and role with a superuser engine, then ``models.metadata.create_all`` in
userland. The engine version keeps the exact flag surface and flow over
the DBAPI service (warnings instead of hard failures on DDL races, as in
the reference's ``_execute_sql``).

Usage from an example script::

    with parse_args() as options:
        run(graph, spark, services=get_services())
"""

from __future__ import annotations

import argparse
import logging
import warnings
from contextlib import contextmanager


def _execute_sql(service, sql: str) -> None:
    """Autocommit one DDL statement; surface failures as warnings (the
    reference tolerates drop-before-create and already-exists races)."""
    try:
        conn = service.connect()
    except Exception as exc:  # no server — the example degrades, not dies
        warnings.warn(str(exc))
        return
    try:
        # DDL like CREATE/DROP DATABASE refuses to run inside a transaction
        # block — run autocommit (the reference's `conn.execute("COMMIT")`
        # trick, reference commands.py:12).
        if hasattr(conn, "autocommit"):
            conn.autocommit = True
        cur = conn.cursor()
        cur.execute(sql)
        conn.commit()
    except Exception as exc:
        warnings.warn(str(exc))
    finally:
        conn.close()


@contextmanager
def parse_args(parser: argparse.ArgumentParser | None = None, argv=None):
    parser = parser or argparse.ArgumentParser()
    parser.add_argument("--drop", "-D", action="store_true")
    parser.add_argument("--create", "-C", action="store_true")
    parser.add_argument("--echo", action="store_true")
    options = vars(parser.parse_args(argv))

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))

    import models
    import services
    import settings

    if options["echo"]:
        logging.getLogger("bonobo_sqlalchemy_spark").setLevel(logging.INFO)

    if (options["drop"] or options["create"]) and settings.DATABASE_TYPE == "postgres":
        # Identifiers can't be parameterized — validate them; the password
        # is a string literal — escape it ('' doubling, as the wire client's
        # own literal quoting does).
        import re

        for ident in (settings.DATABASE_NAME, settings.DATABASE_USERNAME):
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", ident):
                raise ValueError(
                    f"unsafe database identifier {ident!r}: only "
                    "[A-Za-z_][A-Za-z0-9_]* is accepted for DDL"
                )
        password_lit = settings.DATABASE_PASSWORD.replace("'", "''")
        root = services.create_service(superuser=True)
        if options["drop"]:
            _execute_sql(root, f"DROP DATABASE {settings.DATABASE_NAME}")
            _execute_sql(root, f"DROP ROLE {settings.DATABASE_USERNAME}")
        if options["create"]:
            _execute_sql(
                root,
                f"CREATE ROLE {settings.DATABASE_USERNAME} WITH LOGIN"
                f" PASSWORD '{password_lit}'",
            )
            _execute_sql(
                root,
                f"CREATE DATABASE {settings.DATABASE_NAME} WITH"
                f" OWNER={settings.DATABASE_USERNAME} TEMPLATE=template0"
                f' ENCODING="utf-8"',
            )
            user = services.create_service()
            try:
                conn = user.connect()
            except Exception as exc:
                warnings.warn(str(exc))
            else:
                try:
                    models.create_all(conn, dialect="postgresql")
                finally:
                    conn.close()

    yield options
