"""Server-free pgwire unit tests: parameter mogrification semantics."""

from __future__ import annotations

import pytest

from bonobo_sqlalchemy_spark.pgwire import InterfaceError, mogrify


def test_mogrify_basic_substitution():
    assert (
        mogrify("INSERT INTO t VALUES (%s, %s)", (1, "a'b"))
        == "INSERT INTO t VALUES (1, 'a''b')"
    )


def test_mogrify_percent_escape_like_pattern():
    # psycopg2-compatible: %% renders a literal % and is never a placeholder.
    out = mogrify("SELECT * FROM t WHERE name LIKE '%%smith%%' AND id = %s", (5,))
    assert out == "SELECT * FROM t WHERE name LIKE '%smith%' AND id = 5"


def test_mogrify_param_count_mismatch():
    with pytest.raises(InterfaceError):
        mogrify("SELECT %s", ())
    with pytest.raises(InterfaceError):
        mogrify("SELECT %s", (1, 2))


def test_mogrify_none_params_passthrough():
    # params=None: verbatim SQL, % needs no escaping (psycopg2 semantics).
    sql = "SELECT * FROM t WHERE name LIKE '%smith%'"
    assert mogrify(sql, None) == sql
