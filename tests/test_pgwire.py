"""PostgreSQL wire-protocol server tests.

A minimal raw-socket pg client (protocol v3, simple + extended query)
exercises the server the way psql would — no client library needed.
Reference surface: ``server/server.py:38``, ``server/connection.py``,
catalog emulation ``core/catalog.py:69``.
"""

from __future__ import annotations

import socket
import struct

import pytest

from sidemantic_spark.models.tpch import build_layer
from sidemantic_spark.server import PgWireServer


class PgClient:
    """Tiny pg protocol-v3 client: startup, simple query, extended query."""

    def __init__(self, port: int, user: str = "alice", password: str | None = None):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        params = f"user\x00{user}\x00database\x00sidemantic\x00\x00".encode()
        payload = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        self.startup_messages = []
        while True:
            tag, body = self._read()
            self.startup_messages.append((tag, body))
            if tag == b"R" and struct.unpack("!I", body[:4])[0] == 3:
                assert password is not None, "server demanded a password"
                pw = password.encode() + b"\x00"
                self.sock.sendall(b"p" + struct.pack("!I", len(pw) + 4) + pw)
            if tag == b"Z":
                break
            if tag == b"E":
                self.error = self._parse_error(body)
                return

    def _read(self):
        tag = self._recv(1)
        (length,) = struct.unpack("!I", self._recv(4))
        return tag, self._recv(length - 4)

    def _recv(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionResetError("server closed connection")
            buf += chunk
        return buf

    @staticmethod
    def _parse_error(body: bytes) -> str:
        msg = ""
        for field in body.split(b"\x00"):
            if field[:1] == b"M":
                msg = field[1:].decode()
        return msg

    def _collect(self):
        cols, rows, errors, tags = [], [], [], []
        while True:
            tag, body = self._read()
            if tag == b"T":
                (n,) = struct.unpack("!H", body[:2])
                off = 2
                for _ in range(n):
                    end = body.index(b"\x00", off)
                    name = body[off:end].decode()
                    off = end + 1 + 18
                    cols.append(name)
            elif tag == b"D":
                (n,) = struct.unpack("!H", body[:2])
                off = 2
                row = []
                for _ in range(n):
                    (vlen,) = struct.unpack_from("!i", body, off)
                    off += 4
                    if vlen == -1:
                        row.append(None)
                    else:
                        row.append(body[off:off + vlen].decode())
                        off += vlen
                rows.append(tuple(row))
            elif tag == b"C":
                tags.append(body.rstrip(b"\x00").decode())
            elif tag == b"E":
                errors.append(self._parse_error(body))
            elif tag == b"Z":
                return cols, rows, errors, tags

    def query(self, sql: str):
        payload = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
        return self._collect()

    def extended_query(self, sql: str, params: list[str] | None = None):
        params = params or []

        def frame(tag: bytes, body: bytes) -> bytes:
            return tag + struct.pack("!I", len(body) + 4) + body

        out = frame(b"P", b"\x00" + sql.encode() + b"\x00" + struct.pack("!H", 0))
        bind = b"\x00\x00" + struct.pack("!H", 0) + struct.pack("!H", len(params))
        for p in params:
            enc = p.encode()
            bind += struct.pack("!i", len(enc)) + enc
        bind += struct.pack("!H", 0)
        out += frame(b"B", bind)
        out += frame(b"E", b"\x00" + struct.pack("!i", 0))
        out += frame(b"S", b"")
        self.sock.sendall(out)
        # drain ParseComplete/BindComplete then the result set
        cols, rows, errors, tags = [], [], [], []
        while True:
            tag, body = self._read()
            if tag in (b"1", b"2", b"3", b"n", b"t", b"I"):
                continue
            if tag == b"T":
                (n,) = struct.unpack("!H", body[:2])
                off = 2
                for _ in range(n):
                    end = body.index(b"\x00", off)
                    cols.append(body[off:end].decode())
                    off = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack("!H", body[:2])
                off = 2
                row = []
                for _ in range(n):
                    (vlen,) = struct.unpack_from("!i", body, off)
                    off += 4
                    if vlen == -1:
                        row.append(None)
                    else:
                        row.append(body[off:off + vlen].decode())
                        off += vlen
                rows.append(tuple(row))
            elif tag == b"C":
                tags.append(body.rstrip(b"\x00").decode())
            elif tag == b"E":
                errors.append(self._parse_error(body))
            elif tag == b"Z":
                return cols, rows, errors, tags

    def close(self) -> None:
        try:
            self.sock.sendall(b"X" + struct.pack("!I", 4))
        except OSError:
            pass
        self.sock.close()


@pytest.fixture(scope="module")
def pg_server(spark, sf_dir):
    layer = build_layer(spark, sf_dir)
    srv = PgWireServer(layer).start()
    yield srv
    srv.stop()


def test_startup_and_version(pg_server):
    c = PgClient(pg_server.port)
    cols, rows, errors, _ = c.query("SELECT version()")
    c.close()
    assert not errors
    assert cols == ["version"]
    assert "sidemantic-spark" in rows[0][0]


def test_semantic_sql_over_wire(pg_server):
    c = PgClient(pg_server.port)
    cols, rows, errors, tags = c.query(
        "SELECT orders.status, orders.revenue FROM orders ORDER BY orders.status"
    )
    c.close()
    assert not errors
    assert cols == ["status", "revenue"]
    assert [r[0] for r in rows] == ["F", "O", "P"]
    assert tags == [f"SELECT {len(rows)}"]


def test_information_schema_tables_lists_models(pg_server):
    c = PgClient(pg_server.port)
    cols, rows, errors, _ = c.query(
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = 'public' ORDER BY table_name"
    )
    c.close()
    assert not errors
    names = [r[0] for r in rows]
    assert "orders" in names and "customer" in names


def test_information_schema_columns_include_metrics(pg_server):
    c = PgClient(pg_server.port)
    cols, rows, errors, _ = c.query(
        "SELECT column_name, data_type, is_metric FROM information_schema.columns "
        "WHERE table_name = 'orders' ORDER BY ordinal_position"
    )
    c.close()
    assert not errors
    by_name = {r[0]: r for r in rows}
    assert by_name["status"][1] == "VARCHAR"
    assert by_name["revenue"][2] == "t"  # metrics appear as columns


def test_pg_tables_view(pg_server):
    c = PgClient(pg_server.port)
    _, rows, errors, _ = c.query(
        "SELECT tablename FROM pg_catalog.pg_tables ORDER BY tablename"
    )
    c.close()
    assert not errors
    assert "orders" in [r[0] for r in rows]


def test_show_and_set_statements(pg_server):
    c = PgClient(pg_server.port)
    _, rows, errors, _ = c.query("SHOW server_version")
    assert rows == [("15.0",)]
    _, _, errors2, tags = c.query("SET search_path TO public")
    c.close()
    assert not errors and not errors2
    assert tags == ["SET"]


def test_error_then_recovery(pg_server):
    c = PgClient(pg_server.port)
    _, _, errors, _ = c.query("SELECT nonsense_model.nope FROM nonsense_model")
    assert errors  # ErrorResponse delivered
    _, rows, errors2, _ = c.query("SELECT version()")  # session still usable
    c.close()
    assert not errors2 and rows


def test_extended_protocol_with_params(pg_server):
    c = PgClient(pg_server.port)
    cols, rows, errors, tags = c.extended_query(
        "SELECT orders.revenue FROM orders WHERE orders.status = $1", ["O"]
    )
    c.close()
    assert not errors
    assert cols == ["revenue"]
    assert len(rows) == 1 and float(rows[0][0]) > 0


def test_multi_statement_simple_query(pg_server):
    c = PgClient(pg_server.port)
    _, rows, errors, tags = c.query("SELECT version(); SHOW server_version")
    c.close()
    assert not errors
    assert len(tags) == 2


def test_auth_required_and_rejected(spark, sf_dir):
    layer = build_layer(spark, sf_dir)
    srv = PgWireServer(layer, username="admin", password="sekret").start()
    try:
        bad = PgClient(srv.port, user="admin", password="wrong")
        assert getattr(bad, "error", None) and "authentication failed" in bad.error
        good = PgClient(srv.port, user="admin", password="sekret")
        _, rows, errors, _ = good.query("SELECT version()")
        good.close()
        assert not errors and rows
    finally:
        srv.stop()


def test_user_attrs_require_auth(spark, sf_dir):
    layer = build_layer(spark, sf_dir)
    with pytest.raises(ValueError, match="requires authentication"):
        PgWireServer(layer, user_attrs_map={"admin": {"role": "admin"}})


def test_security_gate_enforced_per_user(spark, sf_dir):
    from sidemantic_spark.core.security import SecurityPolicy

    layer = build_layer(spark, sf_dir)
    layer.graph.get_model("orders").security = SecurityPolicy(
        access="{{ user.role == 'analyst' }}"
    )
    srv = PgWireServer(
        layer, username="bob", password="pw",
        user_attrs_map={"bob": {"role": "intern"}},
    ).start()
    try:
        c = PgClient(srv.port, user="bob", password="pw")
        _, _, errors, _ = c.query("SELECT orders.revenue FROM orders")
        c.close()
        assert errors and "access" in errors[0].lower()
    finally:
        srv.stop()


def test_pgwire_row_policy_scopes_rows(spark, sf_dir):
    """The session user feeds compilation, so row policies scope the
    result set (ref server/connection.py:80-83), not just the access
    gate."""
    from sidemantic_spark.core.security import SecurityPolicy

    layer = build_layer(spark, sf_dir)
    layer.graph.get_model("orders").security = SecurityPolicy(
        access="True",
        row_filters=["o_orderstatus = '{{ user.allowed_status }}'"],
    )
    srv = PgWireServer(
        layer, username="ana", password="pw",
        user_attrs_map={"ana": {"allowed_status": "F"}},
    ).start()
    try:
        c = PgClient(srv.port, user="ana", password="pw")
        _cols, rows, errors, _ = c.query(
            "SELECT orders.status, orders.order_count FROM orders"
        )
        c.close()
        assert not errors, errors
        assert {r[0] for r in rows} == {"F"}
    finally:
        layer.graph.get_model("orders").security = None
        srv.stop()


def test_partial_auth_config_fails_closed():
    """username without password (or vice versa) must be refused at
    construction — a half-configured server would accept any client
    (ref tests/server/test_connection.py
    test_handle_auth_partial_config_fails_closed)."""
    import pytest as _pytest

    from sidemantic_spark.server.pgwire import PgWireServer

    with _pytest.raises(ValueError, match="username and password"):
        PgWireServer(layer=None, username="user", password=None)
    with _pytest.raises(ValueError, match="username and password"):
        PgWireServer(layer=None, username=None, password="pw")
