"""Minimal pure-Python PostgreSQL v3 wire-protocol client (DBAPI-shaped).

The reference's flagship test is a live-Postgres end-to-end round-trip
(``/root/reference/tests/test_integration.py:155-207``). This container
ships the Postgres *server* binaries but no client driver (no psycopg2 /
pg8000 / JDBC jar), so the engine implements the public, stable v3
frontend/backend message protocol (PostgreSQL documentation, "Frontend/
Backend Protocol") directly: startup + trust/cleartext/md5 auth, the
simple-query cycle, text-format result decoding.

Scope — exactly the DBAPI surface the per-partition upsert sink uses
(``operators/upsert.py``): ``cursor()``, ``execute``/``executemany`` with
client-side ``%s`` mogrification, ``fetchall``/``fetchone``,
``description``, ``commit``/``rollback``/``close`` with an implicit
``BEGIN`` per DBAPI transaction semantics — plus copy-in
(``Connection.copy_rows``): ``COPY ... FROM STDIN`` with text-format
CopyData framing, the canonical Postgres bulk-insert path (the upsert
sink's insert branch uses it when the target connection exposes it).
Deliberately NOT a general driver: no extended protocol, no copy-out, no
SSL, no SCRAM (test servers run trust/md5 auth on a private unix socket).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import math
import socket
import struct


class PgError(Exception):
    """Server ErrorResponse, re-raised after the query cycle completes."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        code = fields.get("C", "?????")
        msg = fields.get("M", "unknown error")
        super().__init__(f"[{code}] {msg}")


class InterfaceError(Exception):
    """Client-side protocol/usage error."""


# ---------------------------------------------------------------------------
# Literal quoting (client-side mogrification for the %s paramstyle).
# Relies on standard_conforming_strings = on (the server default since 9.1):
# backslashes in '...' literals are literal characters.
# ---------------------------------------------------------------------------

def _literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "'NaN'::float8"
        if math.isinf(v):
            return ("'Infinity'" if v > 0 else "'-Infinity'") + "::float8"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "'\\x" + bytes(v).hex() + "'::bytea"
    if isinstance(v, _dt.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, (_dt.date, _dt.time)):
        return "'" + v.isoformat() + "'"
    if isinstance(v, str):
        if "\x00" in v:
            raise InterfaceError("NUL byte in string literal is not representable")
        return "'" + v.replace("'", "''") + "'"
    raise InterfaceError(f"cannot adapt parameter of type {type(v).__name__}")


def mogrify(sql: str, params) -> str:
    """Substitute ``%s`` placeholders with safely quoted literals.

    psycopg2-compatible escaping: ``%%`` renders a literal ``%`` (the only
    way to put ``%`` in a parameterized query — e.g. LIKE patterns), and is
    never counted as a placeholder. With ``params is None`` the SQL passes
    through verbatim, also as in psycopg2.
    """
    if params is None:
        return sql
    out = []
    n_used = 0
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "%":
            nxt = sql[i + 1] if i + 1 < len(sql) else None
            if nxt == "%":
                out.append("%")
                i += 2
                continue
            if nxt == "s":
                if n_used >= len(params):
                    raise InterfaceError(
                        f"query expects more than the {len(params)} parameters given"
                    )
                out.append(_literal(params[n_used]))
                n_used += 1
                i += 2
                continue
            # psycopg2 parity: any other character after % (or a trailing
            # %) is an error, not silent literal SQL — a typo'd %d would
            # otherwise surface later as a confusing count mismatch.
            raise InterfaceError(
                "unsupported format character "
                f"{nxt!r} at index {i + 1} (only %s and %% are recognized)"
            )
        out.append(ch)
        i += 1
    if n_used != len(params):
        raise InterfaceError(
            f"query expects {n_used} parameters, got {len(params)}"
        )
    return "".join(out)


# ---------------------------------------------------------------------------
# COPY text-format field encoding (documented "Text Format" of the COPY
# command: tab-separated fields, \N for NULL, backslash escapes for the
# delimiter/newline/backslash characters themselves).
# ---------------------------------------------------------------------------

_COPY_ESCAPES = str.maketrans(
    {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
)


def _copy_field(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (int, decimal.Decimal)):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "\\\\x" + bytes(v).hex()  # literal backslash-x, hex bytea
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (_dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, str):
        if "\x00" in v:
            raise InterfaceError("NUL byte in string is not representable")
        return v.translate(_COPY_ESCAPES)
    raise InterfaceError(f"cannot adapt parameter of type {type(v).__name__}")


# ---------------------------------------------------------------------------
# Text-format result decoding by type OID (pg_type.dat — public catalog).
# ---------------------------------------------------------------------------

def _dec_bool(b: bytes):
    return b == b"t"


def _dec_bytea(b: bytes):
    s = b.decode()
    if s.startswith("\\x"):
        return bytes.fromhex(s[2:])
    return b  # legacy escape format not produced by modern servers


def _dec_numeric(b: bytes):
    return decimal.Decimal(b.decode())


def _dec_timestamp(b: bytes):
    return _dt.datetime.fromisoformat(b.decode())


def _dec_date(b: bytes):
    return _dt.date.fromisoformat(b.decode())


def _dec_time(b: bytes):
    return _dt.time.fromisoformat(b.decode())


_DECODERS = {
    16: _dec_bool,
    17: _dec_bytea,
    20: int,
    21: int,
    23: int,
    26: int,
    700: float,
    701: float,
    1700: _dec_numeric,
    1114: _dec_timestamp,  # timestamp
    1184: _dec_timestamp,  # timestamptz (offset preserved by fromisoformat)
    1082: _dec_date,
    1083: _dec_time,
}


def _decode(oid: int, b: bytes):
    dec = _DECODERS.get(oid)
    return dec(b) if dec else b.decode()


# ---------------------------------------------------------------------------
# Wire framing
# ---------------------------------------------------------------------------

def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise InterfaceError("server closed connection unexpectedly")
        buf += chunk
    return bytes(buf)


def _read_message(sock: socket.socket) -> tuple[bytes, bytes]:
    head = _recv_exact(sock, 5)
    mtype = head[:1]
    (length,) = struct.unpack("!i", head[1:5])
    payload = _recv_exact(sock, length - 4) if length > 4 else b""
    return mtype, payload


def _send_message(sock: socket.socket, mtype: bytes, payload: bytes) -> None:
    sock.sendall(mtype + struct.pack("!i", len(payload) + 4) + payload)


def _parse_error_fields(payload: bytes) -> dict[str, str]:
    fields: dict[str, str] = {}
    for part in payload.split(b"\x00"):
        if part:
            fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
    return fields


class Cursor:
    def __init__(self, conn: "Connection"):
        self.connection = conn
        self.description = None
        self._rows: list[tuple] = []
        self._idx = 0
        self.rowcount = -1

    # `conn.cursor().execute(...).fetchall()` chaining parity with sqlite3
    def execute(self, sql: str, params=None) -> "Cursor":
        self.connection._begin_if_needed()
        desc, rows, affected = self.connection._simple_query(mogrify(sql, params))
        self.description = desc
        self._rows = rows
        self._idx = 0
        # DBAPI rowcount: result-set size for SELECT-like statements,
        # CommandComplete affected-row count for DML, else -1.
        self.rowcount = len(rows) if desc else affected
        return self

    def executemany(self, sql: str, seq_of_params) -> "Cursor":
        self.connection._begin_if_needed()
        # Batched multi-statement Query messages: one round trip per 200
        # rows inside the surrounding explicit transaction. rowcount sums
        # each statement's CommandComplete count (DBAPI: total affected).
        stmts = [mogrify(sql, p) for p in seq_of_params]
        total = 0
        saw_count = False
        for i in range(0, len(stmts), 200):
            _d, _r, affected = self.connection._simple_query(
                "; ".join(stmts[i : i + 200])
            )
            if affected >= 0:
                total += affected
                saw_count = True
        self.description = None
        self._rows = []
        self._idx = 0
        self.rowcount = total if saw_count else -1
        return self

    def fetchall(self) -> list[tuple]:
        rows = self._rows[self._idx :]
        self._idx = len(self._rows)
        return rows

    def fetchone(self):
        if self._idx >= len(self._rows):
            return None
        row = self._rows[self._idx]
        self._idx += 1
        return row

    def close(self) -> None:
        self._rows = []


class Connection:
    """One backend session over TCP or a unix socket."""

    def __init__(
        self,
        *,
        host: str = "localhost",
        port: int = 5432,
        user: str = "postgres",
        dbname: str = "postgres",
        password: str | None = None,
        unix_socket_dir: str | None = None,
        connect_timeout: float = 15.0,
    ):
        if unix_socket_dir:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(connect_timeout)
            self._sock.connect(f"{unix_socket_dir}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port), connect_timeout)
        self._sock.settimeout(None)
        self._in_tx = False
        self._closed = False
        #: psycopg2-style autocommit: when True, no implicit BEGIN is
        #: issued, so statements that refuse to run in a transaction block
        #: (CREATE/DROP DATABASE, CREATE ROLE ...) work — the engine analog
        #: of the reference's `conn.execute("COMMIT")` DDL trick
        #: (examples/commands.py:12).
        self.autocommit = False
        self._auth(user, dbname, password)

    # -- session startup ---------------------------------------------------
    def _auth(self, user: str, dbname: str, password: str | None) -> None:
        params = f"user\x00{user}\x00database\x00{dbname}\x00\x00".encode()
        payload = struct.pack("!i", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack("!i", len(payload) + 4) + payload)
        while True:
            mtype, body = _read_message(self._sock)
            if mtype == b"R":
                (code,) = struct.unpack("!i", body[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext
                    if password is None:
                        raise InterfaceError("server requests a password")
                    _send_message(self._sock, b"p", password.encode() + b"\x00")
                elif code == 5:  # md5
                    if password is None:
                        raise InterfaceError("server requests a password")
                    salt = body[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    digest = (
                        "md5"
                        + hashlib.md5(inner.encode() + salt).hexdigest()
                    )
                    _send_message(self._sock, b"p", digest.encode() + b"\x00")
                else:
                    raise InterfaceError(
                        f"unsupported authentication method {code} "
                        "(client supports trust/cleartext/md5)"
                    )
            elif mtype in (b"S", b"K", b"N"):  # ParameterStatus/KeyData/Notice
                continue
            elif mtype == b"Z":  # ReadyForQuery
                return
            elif mtype == b"E":
                raise PgError(_parse_error_fields(body))
            else:
                raise InterfaceError(f"unexpected startup message {mtype!r}")

    # -- query cycle -------------------------------------------------------
    def _simple_query(self, sql: str):
        """One simple-query cycle; returns (description, rows, affected) of
        the LAST result set in the message (multi-statement strings return
        the last). ``affected`` sums every CommandComplete row count in the
        cycle (multi-statement DML sums all statements), or -1 if no
        statement reported one."""
        _send_message(self._sock, b"Q", sql.encode() + b"\x00")
        desc = None
        oids: list[int] = []
        rows: list[tuple] = []
        affected = -1
        error: dict[str, str] | None = None
        while True:
            mtype, body = _read_message(self._sock)
            if mtype == b"T":  # RowDescription
                (ncols,) = struct.unpack("!h", body[:2])
                off = 2
                desc, oids, rows = [], [], []
                for _ in range(ncols):
                    end = body.index(b"\x00", off)
                    name = body[off:end].decode()
                    off = end + 1
                    (_tbl, _att, oid, _len, _mod, _fmt) = struct.unpack(
                        "!ihihih", body[off : off + 18]
                    )
                    off += 18
                    desc.append((name, oid, None, None, None, None, None))
                    oids.append(oid)
            elif mtype == b"D":  # DataRow
                (ncols,) = struct.unpack("!h", body[:2])
                off = 2
                vals = []
                for i in range(ncols):
                    (vlen,) = struct.unpack("!i", body[off : off + 4])
                    off += 4
                    if vlen == -1:
                        vals.append(None)
                    else:
                        vals.append(_decode(oids[i], body[off : off + vlen]))
                        off += vlen
                rows.append(tuple(vals))
            elif mtype == b"C":  # CommandComplete: tag like 'UPDATE 3'
                tag = body.rstrip(b"\x00").decode()
                last = tag.rsplit(" ", 1)[-1]
                if last.isdigit():
                    affected = (affected if affected > 0 else 0) + int(last)
            elif mtype == b"I":  # EmptyQueryResponse
                continue
            elif mtype in (b"N", b"S", b"A"):  # Notice / ParameterStatus / Notify
                continue
            elif mtype == b"E":
                error = _parse_error_fields(body)
            elif mtype == b"Z":  # ReadyForQuery — cycle complete
                if error is not None:
                    raise PgError(error)
                return desc, rows, affected
            else:
                raise InterfaceError(f"unexpected message {mtype!r} in query cycle")

    def copy_rows(
        self, table: str, columns: list[str], rows, chunk_bytes: int = 256 * 1024
    ) -> int:
        """Bulk insert via ``COPY table (cols) FROM STDIN`` (text format).

        One round trip for the whole batch instead of one INSERT statement
        per row — the canonical Postgres bulk path. Runs inside the
        connection's current transaction (implicit BEGIN as usual), so a
        failed COPY rolls back with everything else. Returns the number of
        rows copied (CommandComplete ``COPY n`` tag).

        Protocol (public docs, "COPY Operations"): Query -> CopyInResponse
        ('G') -> CopyData ('d') frames -> CopyDone ('c') -> CommandComplete
        -> ReadyForQuery. On client-side encoding failure a CopyFail ('f')
        is sent so the server aborts cleanly instead of waiting for data.
        """
        self._begin_if_needed()
        collist = ", ".join(columns)
        _send_message(
            self._sock, b"Q", f"COPY {table} ({collist}) FROM STDIN".encode() + b"\x00"
        )
        error: dict[str, str] | None = None
        started = False
        while True:  # wait for CopyInResponse (or error)
            mtype, body = _read_message(self._sock)
            if mtype == b"G":
                started = True
                break
            if mtype == b"E":
                error = _parse_error_fields(body)
            elif mtype == b"Z":
                raise PgError(error or {"M": "COPY refused without error"})
            elif mtype in (b"N", b"S", b"A", b"C"):
                continue
            else:
                raise InterfaceError(f"unexpected message {mtype!r} awaiting CopyInResponse")
        try:
            buf = bytearray()
            for row in rows:
                buf += "\t".join(_copy_field(v) for v in row).encode() + b"\n"
                if len(buf) >= chunk_bytes:
                    _send_message(self._sock, b"d", bytes(buf))
                    buf.clear()
            if buf:
                _send_message(self._sock, b"d", bytes(buf))
        except Exception as exc:
            if started:
                _send_message(self._sock, b"f", str(exc).encode()[:200] + b"\x00")
                # drain the aborted cycle so the connection stays usable
                while True:
                    mtype, body = _read_message(self._sock)
                    if mtype == b"Z":
                        break
            raise
        _send_message(self._sock, b"c", b"")  # CopyDone
        affected = 0
        while True:
            mtype, body = _read_message(self._sock)
            if mtype == b"C":
                tag = body.rstrip(b"\x00").decode()
                last = tag.rsplit(" ", 1)[-1]
                if last.isdigit():
                    affected = int(last)
            elif mtype == b"E":
                error = _parse_error_fields(body)
            elif mtype in (b"N", b"S", b"A"):
                continue
            elif mtype == b"Z":
                if error is not None:
                    raise PgError(error)
                return affected
            else:
                raise InterfaceError(f"unexpected message {mtype!r} completing COPY")

    def _begin_if_needed(self) -> None:
        if not self._in_tx and not self.autocommit:
            self._simple_query("BEGIN")
            self._in_tx = True

    # -- DBAPI surface -----------------------------------------------------
    def cursor(self) -> Cursor:
        return Cursor(self)

    def commit(self) -> None:
        if self._in_tx:
            self._simple_query("COMMIT")
            self._in_tx = False

    def rollback(self) -> None:
        if self._in_tx:
            self._simple_query("ROLLBACK")
            self._in_tx = False

    def close(self) -> None:
        if not self._closed:
            try:
                self._sock.sendall(b"X" + struct.pack("!i", 4))  # Terminate
            except OSError:
                pass
            self._sock.close()
            self._closed = True


def connect(
    host: str = "localhost",
    port: int = 5432,
    user: str = "postgres",
    dbname: str = "postgres",
    password: str | None = None,
    unix_socket_dir: str | None = None,
) -> Connection:
    """Module-level factory (picklable via functools.partial for the
    executor-side DbapiService.connect contract, registry.py)."""
    return Connection(
        host=host,
        port=port,
        user=user,
        dbname=dbname,
        password=password,
        unix_socket_dir=unix_socket_dir,
    )
