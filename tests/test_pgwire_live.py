"""Live PostgreSQL server round-trip — the reference's flagship test shape
(``/root/reference/tests/test_integration.py:155-207``: dockerized-Postgres
end-to-end insert/update with audit columns and fetch-back).

The container has the server binaries but no client driver, so these tests
run a REAL postgres 15 instance (initdb'd per test module, trust auth on a
private unix socket, torn down after) and drive it through the engine's
pure-Python wire client (``pgwire.py``). This exercises the upsert sink's
``%s`` paramstyle + information_schema reflection branches — previously
only reachable through the in-process DBAPI shim — against an actual
server, executor-side (mapInPandas workers each open their own wire
connection).

Skipped cleanly when the sandbox lacks the binaries, the postgres user, or
root (the server refuses to run as root; we drop to the postgres user via
runuser).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from bonobo_sqlalchemy_spark import pgwire
from bonobo_sqlalchemy_spark.operators.upsert import InsertOrUpdate, _table_columns
from bonobo_sqlalchemy_spark.registry import ServiceRegistry, create_postgresql_dbapi

PG_PORT = 55432


def _pg_available() -> str | None:
    for b in ("initdb", "pg_ctl", "postgres"):
        if not shutil.which(b):
            return f"{b} not on PATH"
    if not shutil.which("runuser"):
        return "runuser not available"
    if os.geteuid() != 0:
        return "need root to drop to the postgres user"
    try:
        import pwd

        pwd.getpwnam("postgres")
    except KeyError:
        return "no postgres system user"
    return None


def _as_pg(args: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["runuser", "-u", "postgres", "--", *args],
        capture_output=True,
        text=True,
        **kw,
    )


@pytest.fixture(scope="module")
def pg_server():
    reason = _pg_available()
    if reason:
        pytest.skip(f"live postgres unavailable: {reason}")
    import pwd

    pg = pwd.getpwnam("postgres")
    base = tempfile.mkdtemp(prefix="pgwire_live_")
    os.chmod(base, 0o755)
    data = os.path.join(base, "data")
    sock = os.path.join(base, "sock")
    log = os.path.join(base, "server.log")
    os.mkdir(sock)
    os.chown(base, pg.pw_uid, pg.pw_gid)
    os.chown(sock, pg.pw_uid, pg.pw_gid)

    r = _as_pg(
        ["initdb", "-D", data, "--auth=trust", "--no-sync", "--no-locale", "-E", "UTF8"]
    )
    assert r.returncode == 0, r.stderr
    with open(os.path.join(data, "postgresql.conf"), "a") as f:
        f.write(
            f"\nlisten_addresses = ''\nport = {PG_PORT}\n"
            f"unix_socket_directories = '{sock}'\nfsync = off\n"
        )
    r = _as_pg(["pg_ctl", "-D", data, "-l", log, "-w", "start"])
    assert r.returncode == 0, r.stderr + open(log).read()
    try:
        yield {"socket_dir": sock, "port": str(PG_PORT), "user": "postgres", "name": "postgres", "log": log}
    finally:
        _as_pg(["pg_ctl", "-D", data, "-m", "immediate", "stop"])
        shutil.rmtree(base, ignore_errors=True)


@pytest.fixture()
def pg_conn(pg_server):
    conn = pgwire.connect(
        unix_socket_dir=pg_server["socket_dir"],
        port=int(pg_server["port"]),
        user=pg_server["user"],
        dbname=pg_server["name"],
    )
    yield conn
    conn.close()


def _service(pg_server):
    return create_postgresql_dbapi(
        socket_dir=pg_server["socket_dir"],
        port=pg_server["port"],
        user=pg_server["user"],
        name=pg_server["name"],
    )


# ---------------------------------------------------------------------------
# Wire-client basics against the live server
# ---------------------------------------------------------------------------

def test_wire_type_roundtrip(pg_conn):
    import datetime as dt

    cur = pg_conn.cursor()
    cur.execute(
        "SELECT %s::bigint, %s::float8, %s::text, %s::boolean, %s::text, "
        "%s::bytea, %s::timestamp",
        (
            42,
            2.5,
            "O'Brien \\ «naïve»",
            True,
            None,
            b"\x00\xffbin",
            dt.datetime(2024, 3, 1, 12, 30, 15, 250000),
        ),
    )
    row = cur.fetchall()[0]
    assert row == (
        42,
        2.5,
        "O'Brien \\ «naïve»",
        True,
        None,
        b"\x00\xffbin",
        dt.datetime(2024, 3, 1, 12, 30, 15, 250000),
    )


def test_wire_transactions(pg_conn):
    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE tx_t (v int)")
    pg_conn.commit()
    cur.execute("INSERT INTO tx_t VALUES (%s)", (1,))
    pg_conn.rollback()
    cur.execute("SELECT COUNT(*) FROM tx_t")
    assert cur.fetchone() == (0,)
    cur.executemany("INSERT INTO tx_t VALUES (%s)", [(i,) for i in range(250)])
    pg_conn.commit()
    cur.execute("SELECT COUNT(*), MIN(v), MAX(v) FROM tx_t")
    assert cur.fetchone() == (250, 0, 249)
    pg_conn.commit()


def test_wire_error_surfaces_and_recovers(pg_conn):
    cur = pg_conn.cursor()
    with pytest.raises(pgwire.PgError, match="42P01"):
        cur.execute("SELECT * FROM no_such_table_anywhere")
    pg_conn.rollback()
    cur.execute("SELECT 7")
    assert cur.fetchone() == (7,)
    pg_conn.commit()


def test_information_schema_reflection(pg_server, pg_conn):
    """The upsert sink's postgresql dialect branch: %s-parameterized
    information_schema.columns query in ordinal order (O2b)."""
    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE refl_t (id serial, email text, score float8)")
    pg_conn.commit()
    conn = _service(pg_server).connect()
    try:
        assert _table_columns(conn, "postgresql", "refl_t") == [
            "id",
            "email",
            "score",
        ]
    finally:
        conn.close()


# ---------------------------------------------------------------------------
# The reference's end-to-end shape: Spark upsert into the live server
# ---------------------------------------------------------------------------

def test_upsert_live_roundtrip(spark, pg_server, pg_conn):
    """Insert-then-update with audit columns + serial fetch-back, against a
    real server — the Spark rendition of the reference's dockerized test
    (find-by-discriminant, buffered flush, audit timestamps, fetch-back)."""
    cur = pg_conn.cursor()
    cur.execute(
        "CREATE TABLE users (id serial PRIMARY KEY, email text, name text,"
        " created_at timestamp, updated_at timestamp)"
    )
    pg_conn.commit()

    services = ServiceRegistry({"sqlalchemy.engine": _service(pg_server)})
    sink = InsertOrUpdate(
        "users", discriminant=("email",), fetch_columns={"user_id": "id"}
    )

    df1 = spark.createDataFrame(
        [("a@x.io", "Ada"), ("b@x.io", "Bo"), ("c@x.io", "Cy")],
        "email string, name string",
    )
    out1 = sink.write(df1, spark, services)
    assert sink.last_stats == {"insert": 3, "update": 0}
    assert sink.last_errors == []
    ids1 = {r.email: r.user_id for r in out1.collect()}
    assert sorted(ids1) == ["a@x.io", "b@x.io", "c@x.io"]
    assert all(isinstance(v, int) for v in ids1.values())
    assert len(set(ids1.values())) == 3

    cur.execute("SELECT email, name, created_at, updated_at FROM users ORDER BY email")
    rows = cur.fetchall()
    pg_conn.commit()
    assert [r[1] for r in rows] == ["Ada", "Bo", "Cy"]
    created0 = {r[0]: r[2] for r in rows}
    assert all(r[2] is not None and r[3] is not None for r in rows)

    # second wave: one change, one new key -> UPDATE x2 (found keys), INSERT x1
    df2 = spark.createDataFrame(
        [("a@x.io", "Ada Lovelace"), ("b@x.io", "Bo"), ("d@x.io", "Dee")],
        "email string, name string",
    )
    out2 = sink.write(df2, spark, services)
    assert sink.last_stats == {"insert": 1, "update": 2}
    ids2 = {r.email: r.user_id for r in out2.collect()}
    assert ids2["a@x.io"] == ids1["a@x.io"]  # stable serial across update

    cur.execute("SELECT email, name, created_at, updated_at FROM users ORDER BY email")
    rows = {r[0]: r for r in cur.fetchall()}
    pg_conn.commit()
    assert rows["a@x.io"][1] == "Ada Lovelace"
    assert len(rows) == 4
    # O2f: created_at untouched on update, updated_at refreshed
    assert rows["a@x.io"][2] == created0["a@x.io"]
    assert rows["a@x.io"][3] >= rows["a@x.io"][2]


def test_upsert_live_error_channel(spark, pg_server, pg_conn):
    """O2d against a real server: a NOT NULL violation inside a chunk rolls
    the chunk back and the per-row fallback channels exactly the bad row."""
    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE strict_t (k text, v text NOT NULL)")
    pg_conn.commit()

    services = ServiceRegistry({"sqlalchemy.engine": _service(pg_server)})
    sink = InsertOrUpdate("strict_t", discriminant=("k",))
    df = spark.createDataFrame(
        [("k1", "ok"), ("k2", None), ("k3", "fine")], "k string, v string"
    ).coalesce(1)
    sink.write(df, spark, services)
    assert sink.last_stats["insert"] == 2
    assert len(sink.last_errors) == 1
    assert "null value" in sink.last_errors[0]["key"]

    cur.execute("SELECT k FROM strict_t ORDER BY k")
    assert [r[0] for r in cur.fetchall()] == ["k1", "k3"]
    pg_conn.commit()


def test_upsert_live_prohibited_insert(spark, pg_server, pg_conn):
    """O2h: allowed_operations=(UPDATE,) sends new keys to the dead-letter
    channel instead of the table."""
    from bonobo_sqlalchemy_spark.constants import UPDATE

    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE upd_only (k text, v text)")
    cur.execute("INSERT INTO upd_only VALUES ('seen', 'old')")
    pg_conn.commit()

    services = ServiceRegistry({"sqlalchemy.engine": _service(pg_server)})
    sink = InsertOrUpdate(
        "upd_only", discriminant=("k",), allowed_operations=(UPDATE,)
    )
    df = spark.createDataFrame(
        [("seen", "new"), ("unseen", "x")], "k string, v string"
    )
    sink.write(df, spark, services)
    assert sink.last_stats == {"insert": 0, "update": 1}
    assert any(e["op"] == "INSERT" for e in sink.last_errors)

    cur.execute("SELECT v FROM upd_only WHERE k = 'seen'")
    assert cur.fetchone() == ("new",)
    cur.execute("SELECT COUNT(*) FROM upd_only")
    assert cur.fetchone() == (1,)
    pg_conn.commit()


def test_streaming_foreachbatch_lands_in_live_postgres(spark, pg_server, pg_conn):
    """Streaming landing into a real RDBMS: events stream -> foreachBatch ->
    InsertOrUpdate upsert over the wire client, keyed on event_id. A full
    second replay of the stream must leave the table unchanged (idempotent
    exactly-once landing — the streaming twin of the reference's
    insert-or-update semantics)."""
    from bonobo_sqlalchemy_spark.streaming.windows import read_events_stream

    cur = pg_conn.cursor()
    cur.execute(
        "CREATE TABLE event_log (event_id bigint PRIMARY KEY,"
        " user_id bigint, value float8)"
    )
    pg_conn.commit()

    services = ServiceRegistry({"sqlalchemy.engine": _service(pg_server)})
    sink = InsertOrUpdate("event_log", discriminant=("event_id",))

    def land(bdf, _bid):
        sink.write(bdf.select("event_id", "user_id", "value"), spark, services)

    def run_once():
        ev = read_events_stream(spark, "/root/testdata/sf0.001/events.parquet")
        q = (
            ev.writeStream.foreachBatch(land)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    cur.execute("SELECT COUNT(*), COUNT(DISTINCT event_id) FROM event_log")
    n1, d1 = cur.fetchone()
    pg_conn.commit()
    assert n1 == d1 == 1000

    run_once()  # full redelivery: every row re-upserts as an UPDATE
    cur.execute("SELECT COUNT(*) FROM event_log")
    assert cur.fetchone() == (1000,)
    cur.execute("SELECT COUNT(*) FROM event_log WHERE value IS NULL")
    assert cur.fetchone() == (0,)
    pg_conn.commit()


def test_example_commands_create_flow_live(pg_server, monkeypatch):
    """The reference's CLI-driven DDL flow (examples/commands.py:20-31 —
    --create makes role + database as superuser, then create_all in
    userland) against the real server through the example wiring."""
    import importlib
    import sys
    from pathlib import Path

    monkeypatch.setenv("POSTGRES_SOCKET_DIR", pg_server["socket_dir"])
    monkeypatch.setenv("POSTGRES_PORT", str(pg_server["port"]))
    monkeypatch.setenv("POSTGRES_USER", pg_server["user"])
    monkeypatch.setenv("POSTGRES_NAME", pg_server["name"])
    monkeypatch.setenv("EXAMPLE_DATABASE_TYPE", "postgres")
    monkeypatch.setenv("EXAMPLE_DATABASE_NAME", "cmdflow")
    monkeypatch.setenv("EXAMPLE_DATABASE_USERNAME", "cmduser")

    examples = str(Path(__file__).resolve().parent.parent / "examples")
    if examples not in sys.path:
        sys.path.insert(0, examples)
    importlib.reload(importlib.import_module("settings"))
    importlib.reload(importlib.import_module("services"))
    commands = importlib.reload(importlib.import_module("commands"))

    with commands.parse_args(argv=["--create"]) as options:
        assert options["create"]

    # userland database + table exist; the example user can read its table
    conn = pgwire.connect(
        unix_socket_dir=pg_server["socket_dir"],
        port=int(pg_server["port"]),
        user="cmduser",
        dbname="cmdflow",
    )
    cur = conn.cursor()
    cur.execute("SELECT COUNT(*) FROM example")
    assert cur.fetchone() == (0,)
    conn.close()

    # --drop tears the role/database back down (fresh connection as super)
    with commands.parse_args(argv=["--drop"]) as options:
        assert options["drop"]
    super_conn = pgwire.connect(
        unix_socket_dir=pg_server["socket_dir"],
        port=int(pg_server["port"]),
        user=pg_server["user"],
        dbname=pg_server["name"],
    )
    cur = super_conn.cursor()
    cur.execute("SELECT COUNT(*) FROM pg_database WHERE datname = 'cmdflow'")
    assert cur.fetchone() == (0,)
    super_conn.close()


def test_wire_rowcount_dml(pg_conn):
    """DBAPI rowcount: DML statements report CommandComplete counts."""
    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE rc (k int)")
    cur.executemany("INSERT INTO rc VALUES (%s)", [(i,) for i in range(7)])
    assert cur.rowcount == 7
    cur.execute("UPDATE rc SET k = k + 1 WHERE k < 3")
    assert cur.rowcount == 3
    cur.execute("DELETE FROM rc WHERE k > 100")
    assert cur.rowcount == 0
    cur.execute("SELECT * FROM rc")
    assert cur.rowcount == 7
    pg_conn.commit()


# ---------------------------------------------------------------------------
# COPY ... FROM STDIN (bulk insert path)
# ---------------------------------------------------------------------------


def test_copy_rows_values_and_rowcount(pg_conn):
    cur = pg_conn.cursor()
    cur.execute(
        "CREATE TABLE copy_vals (id INT, txt TEXT, val DOUBLE PRECISION, "
        "flag BOOLEAN, ts TIMESTAMP, blob BYTEA)"
    )
    import datetime as dt

    rows = [
        (1, "plain", 1.5, True, dt.datetime(2024, 1, 2, 3, 4, 5), b"\x01\xfe"),
        (2, "tab\there\nand newline \\ backslash 'quote'", None, False, None, None),
        (3, None, float("nan"), None, dt.datetime(1999, 12, 31, 23, 59, 59), b""),
    ]
    n = pg_conn.copy_rows("copy_vals", ["id", "txt", "val", "flag", "ts", "blob"], rows)
    pg_conn.commit()
    assert n == 3
    got = cur.execute("SELECT * FROM copy_vals ORDER BY id").fetchall()
    assert got[0] == rows[0]
    assert got[1] == rows[1]
    assert got[2][1] is None and got[2][4] == rows[2][4] and got[2][5] == b""
    import math

    assert math.isnan(got[2][2])


def test_copy_rows_bulk_faster_than_inserts(pg_conn):
    """The 10k-row fixture: COPY must land identical rows and beat the
    batched-INSERT path on wall-clock (it is one round trip per chunk and
    no per-row SQL parse)."""
    import time

    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE copy_bulk (id INT, txt TEXT, val DOUBLE PRECISION)")
    cur.execute("CREATE TABLE ins_bulk (id INT, txt TEXT, val DOUBLE PRECISION)")
    pg_conn.commit()
    rows = [(i, f"value for {i}", i * 0.5) for i in range(10_000)]

    t0 = time.perf_counter()
    cur.executemany("INSERT INTO ins_bulk VALUES (%s, %s, %s)", rows)
    pg_conn.commit()
    t_insert = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = pg_conn.copy_rows("copy_bulk", ["id", "txt", "val"], rows)
    pg_conn.commit()
    t_copy = time.perf_counter() - t0

    assert n == 10_000
    a = cur.execute("SELECT * FROM copy_bulk ORDER BY id").fetchall()
    b = cur.execute("SELECT * FROM ins_bulk ORDER BY id").fetchall()
    assert a == b
    assert t_copy < t_insert, f"COPY {t_copy:.3f}s not faster than INSERT {t_insert:.3f}s"


def test_copy_fail_mid_stream_recovers(pg_conn):
    """A client-side encoding error mid-COPY sends CopyFail; the server
    aborts that statement and the connection stays usable."""
    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE copy_fail (id INT)")
    pg_conn.commit()
    with pytest.raises(pgwire.InterfaceError):
        pg_conn.copy_rows("copy_fail", ["id"], [(1,), (object(),)])
    pg_conn.rollback()
    assert cur.execute("SELECT COUNT(*) FROM copy_fail").fetchone()[0] == 0
    # server-side failure (bad type) surfaces as PgError, also recoverable
    with pytest.raises(pgwire.PgError):
        pg_conn.copy_rows("copy_fail", ["id"], [("not-an-int",)])
    pg_conn.rollback()
    n = pg_conn.copy_rows("copy_fail", ["id"], [(7,)])
    pg_conn.commit()
    assert n == 1
    assert cur.execute("SELECT id FROM copy_fail").fetchone() == (7,)


def test_upsert_insert_branch_goes_through_copy(spark, pg_server, pg_conn):
    """The sink's insert branch must route through copy_rows for the
    postgresql dialect (VERDICT r4 item 8): spy via a wrapper and assert
    identical landed rows."""
    cur = pg_conn.cursor()
    cur.execute("CREATE TABLE copy_sink (id INT PRIMARY KEY, txt TEXT)")
    pg_conn.commit()

    # the sink's connections live in executor worker processes, so a
    # monkeypatch spy can't see them — verify through the server's own
    # statement log instead
    pg_conn.commit()
    pg_conn.autocommit = True
    cur.execute("ALTER SYSTEM SET log_statement = 'all'")
    cur.execute("SELECT pg_reload_conf()")
    pg_conn.autocommit = False
    try:
        df = spark.createDataFrame(
            [(i, f"value for {i}") for i in range(50)], "id int, txt string"
        )
        sink = InsertOrUpdate("copy_sink", discriminant=("id",), engine="db")
        out = sink.write(df, spark, ServiceRegistry({"db": _service(pg_server)}))
        assert out.count() == 50
        log_txt = open(pg_server["log"]).read()
        assert 'COPY "copy_sink"' in log_txt, "insert branch did not use COPY"
        assert 'INSERT INTO "copy_sink"' not in log_txt
        assert cur.execute("SELECT COUNT(*) FROM copy_sink").fetchone()[0] == 50
    finally:
        pg_conn.commit()
        pg_conn.autocommit = True
        cur.execute("ALTER SYSTEM RESET log_statement")
        cur.execute("SELECT pg_reload_conf()")
        pg_conn.autocommit = False
