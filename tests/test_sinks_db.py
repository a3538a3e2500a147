"""PostgreSQL sink against an in-process protocol-v3-faithful fake
backend: startup/auth handshakes (trust, cleartext, MD5), COPY framing,
text-format escaping, and the loader's `type: postgres` dispatch."""

from __future__ import annotations

import hashlib
import socketserver
import struct
import threading

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks_db import (
    PostgresClient,
    PostgresProtocolError,
    parse_postgres_endpoint,
    postgres_sink,
)


def _msg(t: bytes, payload: bytes = b"") -> bytes:
    return t + struct.pack(">I", len(payload) + 4) + payload


def _unescape(cell: str) -> str:
    return (cell.replace("\\t", "\t").replace("\\n", "\n")
            .replace("\\r", "\r").replace("\\\\", "\\"))


class _FakePostgres(socketserver.ThreadingTCPServer):
    """Backend half of protocol v3: startup, optional password check,
    simple query, COPY IN. Parsed COPY rows land in .copies as
    (table_sql, [row tuples]) with \\N → None and escapes undone."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, auth: str = "trust", password: str = ""):
        self.auth = auth
        self.password = password
        self.copies: list[tuple[str, list[tuple]]] = []
        self.queries: list[str] = []
        super().__init__(("127.0.0.1", 0), _PgHandler)


class _PgHandler(socketserver.BaseRequestHandler):
    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            d = self.request.recv(n - len(buf))
            if not d:
                raise ConnectionError("client gone")
            buf += d
        return buf

    def _read_typed(self) -> tuple[bytes, bytes]:
        t = self._read_exact(1)
        (n,) = struct.unpack(">I", self._read_exact(4))
        return t, self._read_exact(n - 4)

    def handle(self):
        srv: _FakePostgres = self.server  # type: ignore[assignment]
        (n,) = struct.unpack(">I", self._read_exact(4))
        startup = self._read_exact(n - 4)
        (proto,) = struct.unpack(">I", startup[:4])
        assert proto == 196608, hex(proto)
        kv = startup[4:].split(b"\x00")
        params = dict(zip(kv[0:-2:2], kv[1:-2:2]))
        user = params.get(b"user", b"").decode()
        if srv.auth == "cleartext":
            self.request.sendall(_msg(b"R", struct.pack(">I", 3)))
            t, payload = self._read_typed()
            assert t == b"p"
            if payload.rstrip(b"\x00").decode() != srv.password:
                self.request.sendall(_msg(
                    b"E", b"SFATAL\x00Mpassword authentication failed"
                    b"\x00\x00"))
                return
        elif srv.auth == "md5":
            salt = b"\x01\x02\x03\x04"
            self.request.sendall(
                _msg(b"R", struct.pack(">I", 5) + salt))
            t, payload = self._read_typed()
            assert t == b"p"
            inner = hashlib.md5(
                srv.password.encode() + user.encode()).hexdigest()
            want = "md5" + hashlib.md5(
                inner.encode() + salt).hexdigest()
            if payload.rstrip(b"\x00").decode() != want:
                self.request.sendall(_msg(
                    b"E", b"SFATAL\x00Mpassword authentication failed"
                    b"\x00\x00"))
                return
        self.request.sendall(
            _msg(b"R", struct.pack(">I", 0))
            + _msg(b"S", b"server_version\x00fake-16\x00")
            + _msg(b"K", struct.pack(">II", 7, 42))
            + _msg(b"Z", b"I")
        )
        while True:
            try:
                t, payload = self._read_typed()
            except ConnectionError:
                return
            if t == b"X":
                return
            if t != b"Q":
                continue
            sql = payload.rstrip(b"\x00").decode()
            srv.queries.append(sql)
            if sql.upper().startswith("COPY"):
                self.request.sendall(
                    _msg(b"G", b"\x00" + struct.pack(">H", 0)))
                buf = bytearray()
                while True:
                    t2, p2 = self._read_typed()
                    if t2 == b"d":
                        buf.extend(p2)
                    elif t2 == b"c":
                        break
                rows = []
                for line in bytes(buf).decode().splitlines():
                    rows.append(tuple(
                        None if c == "\\N" else _unescape(c)
                        for c in line.split("\t")
                    ))
                srv.copies.append((sql, rows))
                tag = f"COPY {len(rows)}".encode() + b"\x00"
                self.request.sendall(_msg(b"C", tag) + _msg(b"Z", b"I"))
            elif sql == "SELECT 1":
                rowdesc = (struct.pack(">H", 1) + b"one\x00"
                           + struct.pack(">IHIhih", 0, 0, 23, 4, -1, 0))
                datarow = struct.pack(">H", 1) + struct.pack(">i", 1) + b"1"
                self.request.sendall(
                    _msg(b"T", rowdesc) + _msg(b"D", datarow)
                    + _msg(b"C", b"SELECT 1\x00") + _msg(b"Z", b"I"))
            else:
                self.request.sendall(
                    _msg(b"E", b"SERROR\x00Munknown query\x00\x00")
                    + _msg(b"Z", b"I"))


@pytest.fixture()
def pg_server():
    srv = _FakePostgres()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


def _endpoint(srv, user="u", password="", db="db") -> str:
    cred = f"{user}:{password}@" if password else f"{user}@"
    return f"postgres://{cred}127.0.0.1:{srv.server_address[1]}/{db}"


def test_parse_endpoint():
    kw = parse_postgres_endpoint("postgres://bob:s%40x@h:5555/logs")
    assert kw == {"host": "h", "port": 5555, "user": "bob",
                  "password": "s@x", "database": "logs"}
    with pytest.raises(ValueError):
        parse_postgres_endpoint("mysql://h/d")


def test_client_simple_query_and_auth(pg_server):
    kw = parse_postgres_endpoint(_endpoint(pg_server))
    c = PostgresClient(timeout=5.0, **kw)
    assert c.simple_query("SELECT 1") == [("1",)]
    with pytest.raises(PostgresProtocolError, match="unknown query"):
        c.simple_query("SELECT nope")
    c.close()


def test_client_cleartext_and_md5_auth():
    for auth in ("cleartext", "md5"):
        srv = _FakePostgres(auth=auth, password="sekret")
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            kw = parse_postgres_endpoint(
                _endpoint(srv, password="sekret"))
            PostgresClient(timeout=5.0, **kw).close()
            bad = dict(kw, password="wrong")
            with pytest.raises(PostgresProtocolError,
                               match="authentication failed"):
                PostgresClient(timeout=5.0, **bad)
        finally:
            srv.shutdown()


def test_postgres_sink_copy_rows_and_escaping(spark, pg_server):
    df = spark.createDataFrame(
        [(1, "plain", 1.5),
         (2, "tab\there\nand newline \\ slash", None),
         (3, None, 0.0)],
        "id long, msg string, score double",
    ).coalesce(1)
    sent = postgres_sink(df, _endpoint(pg_server), "events_out")
    assert sent == 3
    assert len(pg_server.copies) == 1
    sql, rows = pg_server.copies[0]
    assert sql == 'COPY "events_out" ("id", "msg", "score") FROM STDIN'
    by_id = {r[0]: r for r in rows}
    assert by_id["2"][1] == "tab\there\nand newline \\ slash"
    assert by_id["2"][2] is None
    assert by_id["3"][1] is None
    assert by_id["1"] == ("1", "plain", "1.5")


def test_postgres_sink_complex_columns_as_json(spark, pg_server):
    df = spark.createDataFrame(
        [(1, {"k": "v"}, [1, 2])],
        "id long, tags map<string,string>, xs array<int>",
    ).coalesce(1)
    postgres_sink(df, _endpoint(pg_server), "t")
    _, rows = pg_server.copies[0]
    assert rows == [("1", '{"k":"v"}', "[1,2]")]


def test_postgres_sink_one_connection_per_partition(spark, pg_server):
    df = spark.range(10).select(
        F.col("id"), F.lit("x").alias("s")
    ).repartition(3)
    sent = postgres_sink(df, _endpoint(pg_server), "t")
    assert sent == 10
    # empty partitions open no connection; non-empty ones COPY once
    assert 1 <= len(pg_server.copies) <= 3
    assert sum(len(r) for _, r in pg_server.copies) == 10


def test_postgres_via_topology_loader(spark, pg_server, tmp_path):
    import json

    from vector_spark.config.loader import load_topology, run_sinks

    src = tmp_path / "rows.jsonl"
    src.write_text("\n".join(
        json.dumps({"id": i, "msg": f"m{i}"}) for i in range(4)))
    topo = load_topology(spark, f"""
sources:
  in:
    type: json
    path: "{src}"
    schema: "id long, msg string"
sinks:
  pg:
    type: postgres
    endpoint: "{_endpoint(pg_server)}"
    table: logs
    inputs: [in]
""")
    res = run_sinks(topo)
    assert res["pg"]["sent"] == 4
    assert sum(len(r) for _, r in pg_server.copies) == 4
