"""gRPC HTTP/2 listener: full-loop calls over a real socket, with the
client side built from the same RFC-pinned HPACK codec plus hand-rolled
h2 frames (so a framing bug on either side fails loudly)."""

import json
import socket

import pytest

from vector_spark.functions.hpack_codec import HpackDecoder, HpackEncoder
from vector_spark.functions.protowire import (
    VECTOR_REGISTRY,
    _py_to_value,
    encode_message,
    encode_otlp_logs,
)
from vector_spark.sources import _ListenerState
from vector_spark.sources_grpc import (
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    H2_DATA,
    H2_HEADERS,
    H2_PREFACE,
    H2_SETTINGS,
    GrpcListener,
    grpc_frame,
    grpc_unframe,
    h2_decode_frames,
    h2_encode_frame,
    start_otlp_grpc_listener,
    start_vector_grpc_listener,
)


def _grpc_call(port: int, path: str, message: bytes,
               timeout: float = 10.0):
    """Flow-control-compliant h2/gRPC unary client: DATA is sent in
    ≤16 KiB frames and STOPS when the 65,535-byte initial connection/
    stream windows are exhausted, resuming only on server
    WINDOW_UPDATEs (RFC 7540 §6.9) — so any request bigger than the
    initial window proves the listener's receive-side replenishment.
    Returns (grpc_status, response)."""
    from vector_spark.sources_grpc import H2_WINDOW_UPDATE

    enc = HpackEncoder()
    dec = HpackDecoder()
    sock = socket.create_connection(("127.0.0.1", port), timeout=timeout)
    try:
        sock.sendall(
            H2_PREFACE
            + h2_encode_frame(H2_SETTINGS, 0, 0)
            + h2_encode_frame(
                H2_HEADERS, FLAG_END_HEADERS, 1,
                enc.encode([
                    (":method", "POST"), (":scheme", "http"),
                    (":path", path), (":authority", "localhost"),
                    ("content-type", "application/grpc"),
                    ("te", "trailers"),
                ]),
            )
        )
        framed = grpc_frame(message)
        conn_win = stream_win = 65535
        pos = 0
        buf = b""
        status = None
        body = b""

        def pump(data: bytes) -> None:
            nonlocal buf, status, body, conn_win, stream_win
            buf += data
            frames, buf = h2_decode_frames(buf)
            for ftype, _flags, sid, payload in frames:
                if ftype == H2_WINDOW_UPDATE:
                    inc = int.from_bytes(payload, "big") & 0x7FFFFFFF
                    if sid == 0:
                        conn_win += inc
                    else:
                        stream_win += inc
                elif ftype == H2_HEADERS and sid == 1:
                    for name, value in dec.decode(payload):
                        if name == "grpc-status":
                            status = value
                elif ftype == H2_DATA and sid == 1:
                    body += payload

        while pos < len(framed):
            can = min(16384, conn_win, stream_win, len(framed) - pos)
            if can <= 0:
                data = sock.recv(65536)
                if not data:
                    raise ConnectionError(
                        "server closed while client awaited "
                        "WINDOW_UPDATE"
                    )
                pump(data)
                continue
            chunk = framed[pos:pos + can]
            pos += can
            flags = FLAG_END_STREAM if pos == len(framed) else 0
            sock.sendall(h2_encode_frame(H2_DATA, flags, 1, chunk))
            conn_win -= can
            stream_win -= can
        while status is None:
            data = sock.recv(65536)
            if not data:
                break
            pump(data)
        messages = grpc_unframe(body)
        return status, (messages[0][1] if messages else b"")
    finally:
        sock.close()


def test_grpc_frame_roundtrip():
    framed = grpc_frame(b"abc") + grpc_frame(b"")
    assert framed[:5] == b"\x00\x00\x00\x00\x03"
    assert grpc_unframe(framed) == [(False, b"abc"), (False, b"")]


def test_grpc_unary_echo():
    srv = GrpcListener({"/test.Svc/Echo": lambda m: m.upper()})
    try:
        status, resp = _grpc_call(srv.port, "/test.Svc/Echo", b"hello")
        assert (status, resp) == ("0", b"HELLO")
    finally:
        srv.close()


def test_grpc_large_request_flows_past_initial_window():
    """A 200 KiB request (> 3× the 65,535-byte initial window) streams
    through: the compliant client stalls at window exhaustion and only
    the listener's connection+stream WINDOW_UPDATE replenishment lets
    it finish — the large-OTLP-export case."""
    big = bytes(range(256)) * 800  # 204,800 bytes
    got = {}

    def sink(m: bytes) -> bytes:
        got["msg"] = m
        return len(m).to_bytes(4, "big")

    srv = GrpcListener({"/test.Svc/Big": sink})
    try:
        status, resp = _grpc_call(srv.port, "/test.Svc/Big", big,
                                  timeout=30.0)
        assert status == "0"
        assert int.from_bytes(resp, "big") == len(big)
        assert got["msg"] == big  # byte-exact across the stall/resume
    finally:
        srv.close()


def test_grpc_unknown_path_unimplemented():
    srv = GrpcListener({})
    try:
        status, resp = _grpc_call(srv.port, "/nope/Nope", b"x")
        assert status == "12" and resp == b""
    finally:
        srv.close()


def test_grpc_handler_error_internal():
    def boom(_m):
        raise RuntimeError("nope")

    srv = GrpcListener({"/t/B": boom})
    try:
        status, _ = _grpc_call(srv.port, "/t/B", b"x")
        assert status == "13"
    finally:
        srv.close()


def test_otlp_grpc_export_end_to_end():
    state = _ListenerState(None)
    srv = start_otlp_grpc_listener(state)
    try:
        payload = encode_otlp_logs(
            [{"body": "grpc log line", "severity_text": "INFO"}],
            resource_attrs={"service.name": "svc-a"},
        )
        status, resp = _grpc_call(
            srv.port,
            "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
            payload,
        )
        assert status == "0" and resp == b""
        entries = state.drain(-1)
        assert len(entries) == 1
        record = json.loads(entries[0][3])
        assert record["body"] == "grpc log line"
        assert record["severity_text"] == "INFO"
    finally:
        srv.close()


def test_vector_grpc_push_events_end_to_end():
    state = _ListenerState(None)
    srv = start_vector_grpc_listener(state)
    try:
        req = encode_message(
            {"events": [
                {"log": {"value": _py_to_value(
                    {"message": "native one", "n": 1})}},
                {"log": {"value": _py_to_value(
                    {"message": "native two", "n": 2})}},
            ]},
            {1: ("events", "repeated msg:EventWrapper")},
            VECTOR_REGISTRY,
        )
        status, resp = _grpc_call(srv.port, "/vector.Vector/PushEvents",
                                  req)
        assert status == "0" and resp == b""
        msgs = [json.loads(e[3]) for e in state.drain(-1)]
        assert [m["message"] for m in msgs] == ["native one",
                                                "native two"]
        # health check answers SERVING (empty proto3 message)
        status, resp = _grpc_call(srv.port, "/vector.Vector/HealthCheck",
                                  b"")
        assert status == "0" and resp == b""
    finally:
        srv.close()


def test_grpc_compressed_frame_rejected():
    srv = GrpcListener({"/t/C": lambda m: m})
    try:
        # hand-build a compressed gRPC frame (flag byte 1)
        enc = HpackEncoder()
        sock = socket.create_connection(("127.0.0.1", srv.port),
                                        timeout=10)
        framed = b"\x01" + len(b"x").to_bytes(4, "big") + b"x"
        sock.sendall(
            H2_PREFACE + h2_encode_frame(H2_SETTINGS, 0, 0)
            + h2_encode_frame(H2_HEADERS, FLAG_END_HEADERS, 1,
                              enc.encode([(":method", "POST"),
                                          (":path", "/t/C")]))
            + h2_encode_frame(H2_DATA, FLAG_END_STREAM, 1, framed)
        )
        dec = HpackDecoder()
        buf = b""
        status = None
        while status is None:
            data = sock.recv(65536)
            if not data:
                break
            buf += data
            frames, buf = h2_decode_frames(buf)
            for ftype, _f, _sid, payload in frames:
                if ftype == H2_HEADERS:
                    for n, v in dec.decode(payload):
                        if n == "grpc-status":
                            status = v
        sock.close()
        assert status == "12"
    finally:
        srv.close()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_otlp_grpc_streaming_source(spark):
    """`otlp_grpc` as a streaming DataSource: the topology-facing form
    receives a live gRPC Export call; rows land in a memory sink."""
    import time

    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    df = (
        spark.readStream.format("otlp_grpc")
        .option("host", "127.0.0.1").option("port", port)
        .load()
    )
    q = (
        df.writeStream.format("memory").queryName("grpc_sink")
        .trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 40
        payload = encode_otlp_logs([{"body": "stream hello"}])
        sent = False
        rows = []
        while time.time() < deadline:
            if not sent:
                try:
                    status, _ = _grpc_call(
                        port,
                        "/opentelemetry.proto.collector.logs.v1."
                        "LogsService/Export",
                        payload, timeout=2,
                    )
                    sent = status == "0"
                except OSError:
                    time.sleep(0.5)
                    continue
            rows = spark.sql("SELECT * FROM grpc_sink").collect()
            if rows:
                break
            time.sleep(0.5)
        assert rows, "no rows arrived through the grpc stream"
        assert json.loads(rows[0]["message"])["body"] == "stream hello"
        assert rows[0]["peer"] == "grpc"
    finally:
        q.stop()


def test_otlp_grpc_trace_and_metrics_export():
    """The reference serves Logs, Trace, AND Metrics services on one
    OTLP gRPC server (grpc.rs:12-20) — so does the listener."""
    from vector_spark.functions.protowire import (
        encode_otlp_metrics_pb,
        encode_otlp_traces_pb,
    )

    state = _ListenerState(None)
    srv = start_otlp_grpc_listener(state)
    try:
        spans = encode_otlp_traces_pb(
            [{"trace_id": "ab" * 16, "span_id": "cd" * 8,
              "name": "GET /x", "kind": 2,
              "start_time_unix_nano": 100, "end_time_unix_nano": 250,
              "attributes": {"http.status": 200},
              "status_code": 1}],
            resource_attrs={"service.name": "svc-t"},
        )
        status, resp = _grpc_call(
            srv.port,
            "/opentelemetry.proto.collector.trace.v1"
            ".TraceService/Export",
            spans,
        )
        assert status == "0" and resp == b""
        metrics = encode_otlp_metrics_pb(
            [{"name": "requests", "type": "sum", "value": 7,
              "time_unix_nano": 300, "attributes": {"code": "200"},
              "is_monotonic": True},
             {"name": "temp_c", "type": "gauge", "value": 21.5,
              "time_unix_nano": 301}],
        )
        status, resp = _grpc_call(
            srv.port,
            "/opentelemetry.proto.collector.metrics.v1"
            ".MetricsService/Export",
            metrics,
        )
        assert status == "0" and resp == b""
        entries = [json.loads(e[3]) for e in state.drain(-1)]
        assert len(entries) == 3
        span = entries[0]
        assert span["trace_id"] == "ab" * 16
        assert span["name"] == "GET /x"
        assert span["attributes"]["http.status"] == 200
        assert span["resource"] == {"service.name": "svc-t"}
        counter, gauge = entries[1], entries[2]
        assert counter["name"] == "requests" and counter["value"] == 7
        assert counter["type"] == "sum" and counter["is_monotonic"]
        assert gauge["value"] == 21.5 and gauge["type"] == "gauge"
    finally:
        srv.close()


def test_vector_sink_v2_grpc_push(spark):
    """The v2 vector sink (src/sinks/vector/ config.rs V2) pushes
    PushEventsRequest batches over gRPC to the repo's own
    vector_grpc listener — sink and source pin each other."""
    import json as _json

    from vector_spark.sinks import vector_sink
    from vector_spark.sources import _ListenerState
    from vector_spark.sources_grpc import start_vector_grpc_listener

    state = _ListenerState(None)
    listener = start_vector_grpc_listener(state, "127.0.0.1", 0)
    try:
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "msg string, n long"
        ).coalesce(1)
        sent = vector_sink(df, "127.0.0.1", listener.port,
                           version=2, batch_max_events=2)
    finally:
        listener.close()
    assert sent == 3
    got = sorted(
        (_json.loads(e[3])["msg"], _json.loads(e[3])["n"])
        for e in state.drain(-1)
    )
    assert got == [("a", 1), ("b", 2), ("c", 3)]


def test_vector_sink_v2_failover_endpoints(spark):
    """Multi-endpoint routing (vector/config.rs:328-357): with the
    first endpoint DOWN, failover_primary walks the configured order
    and delivers everything to the live secondary."""
    import json as _json
    import socket as _socket

    from vector_spark.sinks import vector_sink
    from vector_spark.sources import _ListenerState
    from vector_spark.sources_grpc import start_vector_grpc_listener

    # a port that refuses connections (bound then closed)
    s = _socket.socket()
    s.bind(("127.0.0.1", 0))
    dead_port = s.getsockname()[1]
    s.close()

    state = _ListenerState(None)
    listener = start_vector_grpc_listener(state, "127.0.0.1", 0)
    try:
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "msg string, n long"
        ).coalesce(1)
        sent = vector_sink(
            df, "127.0.0.1", dead_port, version=2, batch_max_events=2,
            endpoints=[("127.0.0.1", dead_port),
                       ("127.0.0.1", listener.port)],
            strategy="failover_primary",
        )
    finally:
        listener.close()
    assert sent == 3
    got = sorted(_json.loads(e[3])["msg"] for e in state.drain(-1))
    assert got == ["a", "b", "c"]


def test_vector_sink_v2_load_balance_endpoints(spark):
    """load_balance spreads batches across healthy endpoints."""
    import json as _json

    from vector_spark.sinks import vector_sink
    from vector_spark.sources import _ListenerState
    from vector_spark.sources_grpc import start_vector_grpc_listener

    s1, s2 = _ListenerState(None), _ListenerState(None)
    l1 = start_vector_grpc_listener(s1, "127.0.0.1", 0)
    l2 = start_vector_grpc_listener(s2, "127.0.0.1", 0)
    try:
        df = spark.createDataFrame(
            [(f"m{i}",) for i in range(8)], "msg string").coalesce(1)
        sent = vector_sink(
            df, "127.0.0.1", l1.port, version=2, batch_max_events=2,
            endpoints=[("127.0.0.1", l1.port), ("127.0.0.1", l2.port)],
            strategy="load_balance",
        )
    finally:
        l1.close()
        l2.close()
    assert sent == 8
    a = [_json.loads(e[3])["msg"] for e in s1.drain(-1)]
    b = [_json.loads(e[3])["msg"] for e in s2.drain(-1)]
    assert sorted(a + b) == [f"m{i}" for i in range(8)]
    assert a and b  # both endpoints actually served batches


def test_vector_sink_unknown_strategy(spark):
    import pytest as _pytest

    from vector_spark.sinks import vector_sink

    df = spark.createDataFrame([("x",)], "msg string")
    with _pytest.raises(ValueError, match="unknown strategy"):
        vector_sink(df, "h", 1, version=2, strategy="bogus")


def test_grpc_max_connection_age_goaway():
    """grpc.max_connection_age: a connection past the age gets a
    graceful GOAWAY once quiescent; calls before the age succeed."""
    import socket as _socket
    import time as _time

    from vector_spark.sources_grpc import (
        H2_GOAWAY,
        H2_PREFACE,
        GrpcListener,
        grpc_unary_call,
        h2_decode_frames,
        h2_encode_frame,
    )

    lis = GrpcListener({"/t.S/Echo": lambda b: b},
                       max_connection_age_secs=0.3)
    try:
        # a fresh connection serves normally
        status, body = grpc_unary_call(
            "127.0.0.1", lis.port, "/t.S/Echo", [b"\x00" * 5])
        assert status == 0

        # raw connection held open past the age: expect GOAWAY
        s = _socket.create_connection(("127.0.0.1", lis.port), timeout=5)
        s.sendall(H2_PREFACE + h2_encode_frame(0x4, 0, 0))
        _time.sleep(0.5)
        # poke the server so its frame loop runs (PING)
        s.sendall(h2_encode_frame(0x6, 0, 0, b"\x00" * 8))
        s.settimeout(5)
        buf = b""
        saw_goaway = False
        try:
            while not saw_goaway:
                data = s.recv(65536)
                if not data:
                    break
                buf += data
                frames, buf = h2_decode_frames(buf)
                saw_goaway = any(f[0] == H2_GOAWAY for f in frames)
        except OSError:
            pass
        assert saw_goaway
        s.close()
    finally:
        lis.close()
