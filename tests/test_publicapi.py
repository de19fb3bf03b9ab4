"""API-surface conformance — analog of the reference's wildcard-import test
(`tests/test_publicapi.py:4-16`): every public non-module attribute must be
exported via ``__all__``, and the reference's two public operators must be
present."""

from __future__ import annotations

import inspect

import bonobo_sqlalchemy_spark as pkg


def test_reference_public_api_present():
    # bonobo_sqlalchemy._api exposes exactly Select and InsertOrUpdate.
    assert "Select" in pkg.__all__
    assert "InsertOrUpdate" in pkg.__all__
    assert callable(pkg.Select)
    assert callable(pkg.InsertOrUpdate)


def test_all_exports_resolve():
    for name in pkg.__all__:
        obj = getattr(pkg, name)
        assert obj is not None
        assert not inspect.ismodule(obj), f"{name} is a module, not an API symbol"


def test_no_private_leaks():
    assert all(not n.startswith("_") or n == "__version__" for n in pkg.__all__)


def test_package_logger_surface():
    """Reference parity (`bonobo_sqlalchemy/logging.py:1-8`): a package-
    scoped logger importable as `<pkg>.logging.logger`, plus the opt-in
    setup() hook (handler + optional excepthook) standing in for
    mondrian.setup."""
    import logging as stdlib_logging

    from bonobo_sqlalchemy_spark.logging import logger, setup

    assert logger.name == "bonobo_sqlalchemy_spark"
    setup(level=stdlib_logging.DEBUG)
    assert logger.level == stdlib_logging.DEBUG
    assert any(
        isinstance(h, stdlib_logging.StreamHandler) for h in logger.handlers
    )
    n = len(logger.handlers)
    setup()  # idempotent: no duplicate handlers
    assert len(logger.handlers) == n
