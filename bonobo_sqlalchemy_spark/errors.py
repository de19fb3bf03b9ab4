"""Engine exception hierarchy.

Reference parity: ``bonobo_sqlalchemy/errors.py:6-11`` defines
``ProhibitedOperationError`` (raised when a gated operation is disallowed,
``writers.py:116,126``) and ``UnrecoverableOperationalError`` (connection
failure is fatal, ``writers.py:49-51``). The Spark engine keeps the same
fatal-vs-per-row classification: fatal errors abort the job; per-row errors
are channeled to a dead-letter stream (see ``operators/upsert.py``).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class ProhibitedOperationError(EngineError):
    """An operation (INSERT/UPDATE) was required but not allowed."""


class UnrecoverableError(EngineError):
    """Fatal error: abort the whole job (e.g. cannot connect to the sink)."""


class UnrecoverableOperationalError(UnrecoverableError):
    """Fatal operational error from the underlying database."""


class MissingServiceError(EngineError, KeyError):
    """A named service was requested but not registered."""


class FetchBackError(EngineError, ValueError):
    """Could not find matching row after load (``writers.py:156-157``)."""
