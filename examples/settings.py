"""Example project settings (reference ``examples/settings.py`` parity).

The reference hardcodes database name/user/password module constants; the
engine version reads the same knobs from the environment with the same
defaults, since env-driven config is how the DSN builder already works
(``registry.create_postgresql_jdbc``, reference ``util.py:20-35`` parity).
"""

from __future__ import annotations

import os

DATABASE_TYPE = os.environ.get("EXAMPLE_DATABASE_TYPE", "postgres")

DATABASE_NAME = os.environ.get("EXAMPLE_DATABASE_NAME", "example")
DATABASE_USERNAME = os.environ.get("EXAMPLE_DATABASE_USERNAME", "example")
DATABASE_PASSWORD = os.environ.get("EXAMPLE_DATABASE_PASSWORD", "example")

#: Engine extension: a file-catalog fallback so the example wiring runs in
#: environments without a database server (set EXAMPLE_DATABASE_TYPE=path).
PATH_CATALOG_ROOT = os.environ.get("EXAMPLE_PATH_CATALOG", "/tmp/example_warehouse")
