"""Package logger (reference parity: ``bonobo_sqlalchemy/logging.py:1-8``).

The reference wires a mondrian-formatted root handler and exposes a
package-scoped ``logger``. The engine keeps the same public surface —
``from bonobo_sqlalchemy_spark.logging import logger`` — but leaves handler
installation to the caller by default (library best practice); ``setup()``
opts in to a formatted stderr handler, standing in for ``mondrian.setup``
(not packaged in this environment, and Spark's log4j owns the JVM side).
"""

from __future__ import annotations

import logging as _logging

logger = _logging.getLogger("bonobo_sqlalchemy_spark")


def setup(level: int = _logging.INFO, excepthook: bool = False) -> None:
    """Install a formatted stderr handler for the package logger.

    ``excepthook=True`` mirrors the reference's mondrian option: uncaught
    exceptions are routed through the logger before the default hook.
    """
    if not any(isinstance(h, _logging.StreamHandler) for h in logger.handlers):
        handler = _logging.StreamHandler()
        handler.setFormatter(
            _logging.Formatter("%(asctime)s %(levelname)7s (%(name)s) %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    if excepthook:
        import sys

        previous = sys.excepthook

        def _hook(exc_type, exc, tb):
            logger.critical("uncaught exception", exc_info=(exc_type, exc, tb))
            previous(exc_type, exc, tb)

        sys.excepthook = _hook
