"""TLS on listener sources and raw-TCP sink connections.

Pins the reference's `tls:` surface (src/tls/settings.rs: enabled /
crt_file / key_file / key_pass / ca_file / verify_certificate /
verify_hostname) as re-expressed by vector_spark.tls.TlsSettings:
server-side wraps on the accept path (src/sources/util/tcp/mod.rs,
src/tls/incoming.rs), client-side wraps on outbound sink connections
(src/sinks/util/service/net; src/sinks/papertrail.rs in practice
requires TLS syslog). Self-signed certs are generated per-session with
the openssl CLI."""

from __future__ import annotations

import socket
import ssl
import subprocess
import threading
import time

import pytest

from vector_spark.sources import _ListenerState, _tcp_listener
from vector_spark.tls import TlsSettings


def _gen_cert(path, cn: str) -> tuple[str, str]:
    crt = str(path / f"{cn}.crt")
    key = str(path / f"{cn}.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", crt, "-days", "2",
         "-subj", f"/CN={cn}",
         "-addext", "subjectAltName=IP:127.0.0.1,DNS:localhost"],
        check=True, capture_output=True,
    )
    return crt, key


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    server_crt, server_key = _gen_cert(d, "server")
    client_crt, client_key = _gen_cert(d, "client")
    return {
        "server_crt": server_crt, "server_key": server_key,
        "client_crt": client_crt, "client_key": client_key,
    }


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _start_tls_tcp_listener(certs, **tls_extra):
    state = _ListenerState(None)
    port = _free_port()
    tls = TlsSettings(crt_file=certs["server_crt"],
                      key_file=certs["server_key"], **tls_extra)
    ready = threading.Event()
    threading.Thread(
        target=_tcp_listener,
        args=(state, "127.0.0.1", port, ready, tls),
        daemon=True,
    ).start()
    assert ready.wait(5)
    return state, port


def _wait_entries(state, n, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if state.latest() >= n - 1:
            return state.drain(-1)
        time.sleep(0.05)
    return state.drain(-1)


def test_tcp_listener_tls_roundtrip(certs):
    """Syslog/socket TCP listener over TLS: full chain + hostname
    verification client-side (IP SAN pinned in the test cert)."""
    state, port = _start_tls_tcp_listener(certs)
    client = TlsSettings(ca_file=certs["server_crt"])
    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    with client.wrap_client_connection(sock, "127.0.0.1") as tls_sock:
        tls_sock.sendall(b"5 hello")
        tls_sock.sendall(b"newline framed\n")
    entries = _wait_entries(state, 2)
    assert [e[3] for e in entries] == ["hello", "newline framed"]


def test_tcp_listener_tls_rejects_plaintext(certs):
    """A plaintext client against a TLS listener never lands a frame
    (the handshake fails in the per-connection handler thread; the
    accept loop keeps serving — a second, proper TLS client works)."""
    state, port = _start_tls_tcp_listener(certs)
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        s.sendall(b"12 not-encrypted")
        time.sleep(0.3)
    assert state.drain(-1) == []
    client = TlsSettings(ca_file=certs["server_crt"])
    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    with client.wrap_client_connection(sock, "127.0.0.1") as tls_sock:
        tls_sock.sendall(b"2 ok")
    assert [e[3] for e in _wait_entries(state, 1)] == ["ok"]


def test_tcp_listener_mtls_requires_client_cert(certs):
    """ca_file + verify_certificate on the SERVER demands a verified
    client certificate (settings.rs: SslVerifyMode::PEER |
    FAIL_IF_NO_PEER_CERT). No cert → rejected; with cert → accepted."""
    state, port = _start_tls_tcp_listener(
        certs, ca_file=certs["client_crt"], verify_certificate=True)
    bare = TlsSettings(ca_file=certs["server_crt"])
    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    try:
        with bare.wrap_client_connection(sock, "127.0.0.1") as t:
            t.sendall(b"6 nocert")
            # server tears the connection down at handshake depth;
            # the failure may only surface on read
            t.settimeout(2)
            assert t.recv(1) == b""
    except (ssl.SSLError, ConnectionError, TimeoutError):
        pass
    time.sleep(0.2)
    assert state.drain(-1) == []
    with_cert = TlsSettings(
        ca_file=certs["server_crt"],
        crt_file=certs["client_crt"], key_file=certs["client_key"])
    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    with with_cert.wrap_client_connection(sock, "127.0.0.1") as t:
        t.sendall(b"4 mtls")
    assert [e[3] for e in _wait_entries(state, 1)] == ["mtls"]


def test_http_listener_tls(certs):
    """http_server source over HTTPS: POST body lines land as events."""
    import urllib.request

    from vector_spark.sources import _http_listener

    state = _ListenerState(None)
    port = _free_port()
    tls = TlsSettings(crt_file=certs["server_crt"],
                      key_file=certs["server_key"])
    ready = threading.Event()
    threading.Thread(
        target=_http_listener,
        args=(state, "127.0.0.1", port, ready, tls),
        daemon=True,
    ).start()
    assert ready.wait(5)
    ctx = TlsSettings(ca_file=certs["server_crt"]).client_context()
    req = urllib.request.Request(
        f"https://127.0.0.1:{port}/push", data=b"one\ntwo\n")
    with urllib.request.urlopen(req, timeout=5, context=ctx) as resp:
        assert resp.status == 200
    entries = _wait_entries(state, 2)
    assert [e[4] for e in entries] == ["one", "two"]


def test_grpc_listener_tls_roundtrip(certs):
    """vector-native gRPC over TLS: server wraps accepted conns,
    grpc_unary_call wraps its client socket (scheme https)."""
    from vector_spark.functions.protowire import (
        VECTOR_REGISTRY,
        encode_message,
    )
    from vector_spark.sources_grpc import (
        grpc_frame,  # noqa: F401 — framing handled by grpc_unary_call
        grpc_unary_call,
        start_vector_grpc_listener,
    )

    state = _ListenerState(None)
    tls = TlsSettings(crt_file=certs["server_crt"],
                      key_file=certs["server_key"])
    listener = start_vector_grpc_listener(state, "127.0.0.1", 0,
                                          tls=tls)
    try:
        msg = encode_message(
            {"events": [{"log": {"fields": [
                {"key": "message",
                 "value": {"raw_bytes": b"tls-grpc"}},
            ]}}]},
            {1: ("events", "repeated msg:EventWrapper")},
            VECTOR_REGISTRY,
        )
        status, _body = grpc_unary_call(
            "127.0.0.1", listener.port, "/vector.Vector/PushEvents",
            [msg], tls=TlsSettings(ca_file=certs["server_crt"]))
        assert status == 0
        entries = _wait_entries(state, 1)
        assert entries and "tls-grpc" in entries[0][3]
    finally:
        listener.close()


def test_socket_sink_tls(spark, certs):
    """socket_sink with tls: per-partition outbound connections wrap;
    a TLS capture server receives the newline-framed lines."""
    from vector_spark.sinks import socket_sink

    received: list[bytes] = []
    srv_ctx = TlsSettings(
        crt_file=certs["server_crt"],
        key_file=certs["server_key"]).server_context()
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    done = threading.Event()

    def serve() -> None:
        while not done.is_set():
            try:
                srv.settimeout(10)
                conn, _ = srv.accept()
            except OSError:
                return
            try:
                with srv_ctx.wrap_socket(conn, server_side=True) as t:
                    while True:
                        data = t.recv(65536)
                        if not data:
                            break
                        received.append(data)
            except ssl.SSLError:
                conn.close()

    threading.Thread(target=serve, daemon=True).start()
    df = spark.createDataFrame(
        [("alpha",), ("beta",)], "message string").coalesce(1)
    n = socket_sink(df, "127.0.0.1", port,
                    tls=TlsSettings(ca_file=certs["server_crt"]))
    done.set()
    srv.close()
    assert n == 2
    lines = b"".join(received).decode().splitlines()
    assert sorted(lines) == ["alpha", "beta"]


def test_tls_settings_config_shapes():
    """from_config / from_options accept the reference's tls block and
    the DataSource dotted-option flattening; enabled/verify booleans
    parse from YAML bools and option strings alike."""
    assert TlsSettings.from_config(None) is None
    assert TlsSettings.from_config({"enabled": False}) is None
    t = TlsSettings.from_config({
        "crt_file": "/c.crt", "key_file": "/c.key",
        "ca_file": "/ca.crt", "verify_certificate": "false",
        "verify_hostname": False,
    })
    assert t.crt_file == "/c.crt" and t.key_file == "/c.key"
    assert t.ca_file == "/ca.crt"
    assert t.verify_certificate is False and t.verify_hostname is False
    o = TlsSettings.from_options({
        "host": "0.0.0.0", "port": "5140",
        "tls.crt_file": "/s.crt", "tls.key_file": "/s.key",
        "tls.verify_certificate": "true",
    })
    assert o.crt_file == "/s.crt" and o.verify_certificate is True
    assert TlsSettings.from_options({"port": "5140"}) is None


def test_udp_listener_rejects_tls():
    from vector_spark.sources import _SocketStreamReader

    with pytest.raises(ValueError, match="UDP"):
        _SocketStreamReader(
            {"port": "9999", "tls.crt_file": "/x"}, "udp")


def test_loader_tls_yaml_shape(spark, certs, tmp_path):
    """The reference's `tls:` YAML block on a listener source loads
    through the topology front end and the listener actually serves
    TLS: a syslog_tcp source with crt/key accepts a TLS client and the
    frames flow to a memory sink."""
    import time
    import uuid

    from vector_spark.config.loader import (
        load_topology,
        start_streaming_sinks,
    )

    port = _free_port()
    name = f"tls_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  syslog_in:
    type: syslog_tcp
    host: 127.0.0.1
    port: {port}
    tls:
      enabled: true
      crt_file: {certs['server_crt']}
      key_file: {certs['server_key']}
sinks:
  out:
    type: memory
    inputs: [syslog_in]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        client = TlsSettings(ca_file=certs["server_crt"])
        deadline = time.monotonic() + 30
        sent = False
        while time.monotonic() < deadline and not sent:
            try:
                sock = socket.create_connection(
                    ("127.0.0.1", port), timeout=2)
                with client.wrap_client_connection(
                        sock, "127.0.0.1") as t:
                    t.sendall(b"10 hello-yaml")
                sent = True
            except (ConnectionError, OSError, ssl.SSLError):
                time.sleep(0.5)
        assert sent
        got = []
        while time.monotonic() < deadline:
            got = [r.message for r in
                   spark.sql(f"SELECT * FROM {name}").collect()]
            if got:
                break
            time.sleep(0.5)
        assert got == ["hello-yaml"]
    finally:
        for q in queries.values():
            q.stop()
