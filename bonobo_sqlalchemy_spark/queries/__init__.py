"""Query registry: every operator from SURVEY.md §2 as a named query.

Each submodule registers :class:`QuerySpec` entries (Spark callable +
optional DuckDB oracle SQL). ``__spark_entry__.py`` exposes this registry to
the driver's correctness gate.
"""

from .base import REGISTRY, QuerySpec, query

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import relational4  # noqa: E402,F401
from . import relational5  # noqa: E402,F401
from . import relational6  # noqa: E402,F401
from . import pipelineq  # noqa: E402,F401
from . import datapipe  # noqa: E402,F401
from . import datapipe2  # noqa: E402,F401
from . import datapipe3  # noqa: E402,F401
from . import datapipe4  # noqa: E402,F401
from . import datapipe5  # noqa: E402,F401
from . import datapipe6  # noqa: E402,F401
from . import datapipe7  # noqa: E402,F401
from . import streamq  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
