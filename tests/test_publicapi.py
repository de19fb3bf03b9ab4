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
