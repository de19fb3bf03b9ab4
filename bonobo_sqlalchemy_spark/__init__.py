"""bonobo-sqlalchemy-spark: a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of python-bonobo/bonobo-sqlalchemy.

Public API parity (``bonobo_sqlalchemy/_api.py:1-11`` exposes exactly
``Select`` and ``InsertOrUpdate``); this engine exposes those plus its
Spark-first pipeline surface.
"""

from ._version import __version__
from .constants import INSERT, SELECT, UPDATE, Operation
from .errors import (
    EngineError,
    FetchBackError,
    MissingServiceError,
    ProhibitedOperationError,
    UnrecoverableError,
    UnrecoverableOperationalError,
)
from .plans.graph import Graph, Producer, producer, run, run_observed
from .registry import (
    DbapiService,
    JdbcService,
    PathService,
    ServiceRegistry,
    create_postgresql_dbapi,
    create_postgresql_engine,
    create_postgresql_jdbc,
)
from .session import get_spark
from .sources.files import load_table, register_views
from .sources.select import Select

__all__ = [
    # reference public API (bonobo_sqlalchemy._api)
    "Select",
    "InsertOrUpdate",
    # engine surface
    "Graph",
    "Producer",
    "producer",
    "run",
    "run_observed",
    "get_spark",
    "load_table",
    "register_views",
    "ServiceRegistry",
    "JdbcService",
    "DbapiService",
    "PathService",
    "create_postgresql_jdbc",
    "create_postgresql_dbapi",
    "create_postgresql_engine",
    "Operation",
    "SELECT",
    "INSERT",
    "UPDATE",
    "EngineError",
    "ProhibitedOperationError",
    "UnrecoverableError",
    "UnrecoverableOperationalError",
    "MissingServiceError",
    "FetchBackError",
    "__version__",
]


def __getattr__(name: str):
    # Lazy import: the upsert sink pulls in more machinery than most callers need.
    if name == "InsertOrUpdate":
        from .operators.upsert import InsertOrUpdate

        return InsertOrUpdate
    raise AttributeError(name)
