"""gRPC HTTP/2 listener — the last layer the round-3/4 codecs needed.

The reference exposes gRPC endpoints for OTLP (src/sources/
opentelemetry/grpc.rs:17) and vector-native v2 (src/sources/vector/,
proto/vector/vector.proto `service Vector`). Everything above HTTP/2
(OTLP protobuf, gRPC message framing, the native EventWrapper codec)
has been implemented since round 4; this module supplies the transport:
a minimal HTTP/2 server (RFC 7540 — preface, SETTINGS exchange, HEADERS
with HPACK from `functions/hpack_codec.py`, CONTINUATION, DATA, PING,
WINDOW_UPDATE) plus the gRPC wire conventions (5-byte message prefix,
`content-type: application/grpc`, `grpc-status` trailers).

Scope (documented): one in-flight request per stream; RECEIVE-side
flow control is real — every consumed DATA byte is replenished with
connection- and stream-level WINDOW_UPDATEs (RFC 7540 §6.9), so
requests larger than the 65,535-byte initial window (big OTLP
exports) stream through without stalling. SEND-side windows stay
untracked: unary gRPC responses here are small acks that fit any
initial window by construction. Identity compression only (compressed
gRPC frames are answered with grpc-status 12 UNIMPLEMENTED, matching
tonic's behavior for an unsupported encoding).

Scale stance: like the other socket listeners, one listener per host;
a cluster runs one per ingest node and the DataFrames union.
"""

from __future__ import annotations

import json
import socket
import threading
import time

from vector_spark.functions.hpack_codec import HpackDecoder, HpackEncoder

H2_PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
H2_DATA, H2_HEADERS, H2_RST = 0x0, 0x1, 0x3
H2_SETTINGS, H2_PING, H2_GOAWAY = 0x4, 0x6, 0x7
H2_WINDOW_UPDATE, H2_CONTINUATION = 0x8, 0x9
FLAG_END_STREAM, FLAG_END_HEADERS, FLAG_ACK = 0x1, 0x4, 0x1


def h2_encode_frame(ftype: int, flags: int, stream_id: int,
                    payload: bytes = b"") -> bytes:
    return (len(payload).to_bytes(3, "big") + bytes([ftype, flags])
            + stream_id.to_bytes(4, "big") + payload)


def h2_decode_frames(buf: bytes) -> tuple[list, bytes]:
    """[(type, flags, stream_id, payload)], unconsumed remainder."""
    frames = []
    pos = 0
    while pos + 9 <= len(buf):
        length = int.from_bytes(buf[pos:pos + 3], "big")
        if pos + 9 + length > len(buf):
            break
        ftype, flags = buf[pos + 3], buf[pos + 4]
        sid = int.from_bytes(buf[pos + 5:pos + 9], "big") & 0x7FFFFFFF
        frames.append((ftype, flags, sid, buf[pos + 9:pos + 9 + length]))
        pos += 9 + length
    return frames, buf[pos:]


def grpc_frame(message: bytes) -> bytes:
    """gRPC length-prefixed message: [compressed=0][len u32][bytes]."""
    return b"\x00" + len(message).to_bytes(4, "big") + message


def grpc_unframe(data: bytes) -> list[tuple[bool, bytes]]:
    out = []
    pos = 0
    while pos + 5 <= len(data):
        compressed = bool(data[pos])
        n = int.from_bytes(data[pos + 1:pos + 5], "big")
        out.append((compressed, data[pos + 5:pos + 5 + n]))
        pos += 5 + n
    return out


class GrpcListener:
    """Threaded HTTP/2 server dispatching unary gRPC calls.

    ``handlers`` maps the request :path (``/pkg.Service/Method``) to a
    callable(bytes) -> bytes returning the response message; unknown
    paths answer grpc-status 12 (UNIMPLEMENTED)."""

    def __init__(self, handlers: dict, host: str = "127.0.0.1",
                 port: int = 0, tls=None,
                 max_connection_age_secs: float | None = None):
        self.handlers = handlers
        self._tls = tls  # TlsSettings; accepted conns wrap per-thread
        # grpc.max_connection_age (the reference's 0.57-window gRPC
        # server option): connections past the age get a graceful
        # GOAWAY once quiescent, forcing clients to re-resolve — the
        # receiver half of endpoint-strategy rebalancing
        self.max_connection_age_secs = max_connection_age_secs
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _maybe_wrap(self, conn):
        """Server-side TLS handshake for one accepted connection (in
        its handler thread, so a stalled handshake can't block the
        accept loop) — gRPC-over-TLS, the reference's `tls:` block on
        the opentelemetry/vector sources."""
        if self._tls is None:
            return conn
        return self._tls.wrap_server_connection(conn)

    def _serve_conn(self, conn: socket.socket) -> None:
        import time as _time

        conn_born = _time.monotonic()
        try:
            conn = self._maybe_wrap(conn)
            buf = b""
            while len(buf) < len(H2_PREFACE):
                data = conn.recv(65536)
                if not data:
                    return
                buf += data
            if not buf.startswith(H2_PREFACE):
                return
            buf = buf[len(H2_PREFACE):]
            conn.sendall(h2_encode_frame(H2_SETTINGS, 0, 0))
            decoder = HpackDecoder()
            encoder = HpackEncoder()
            # one lock per connection: streaming responses run in their
            # own threads (r11 observability API), and both the socket
            # writes and the STATEFUL hpack encoder must serialize
            send_lock = threading.Lock()
            streams: dict = {}  # sid -> {"headers": [...], "data": b""}
            hdr_frag: dict = {}  # sid -> accumulated header block
            max_sid = 0  # highest client stream seen (GOAWAY last-id)
            while True:
                frames, buf = h2_decode_frames(buf)
                for ftype, flags, sid, payload in frames:
                    if sid > max_sid:
                        max_sid = sid
                    if ftype == H2_SETTINGS and not flags & FLAG_ACK:
                        conn.sendall(
                            h2_encode_frame(H2_SETTINGS, FLAG_ACK, 0)
                        )
                    elif ftype == H2_PING and not flags & FLAG_ACK:
                        conn.sendall(
                            h2_encode_frame(H2_PING, FLAG_ACK, 0,
                                            payload)
                        )
                    elif ftype in (H2_HEADERS, H2_CONTINUATION):
                        block = payload
                        if ftype == H2_HEADERS and flags & 0x8:
                            # PADDED: 1-byte pad length + trailing pad
                            pad = block[0]
                            block = block[1:len(block) - pad]
                        if ftype == H2_HEADERS and flags & 0x20:
                            block = block[5:]  # PRIORITY fields
                        hdr_frag[sid] = hdr_frag.get(sid, b"") + block
                        st = streams.setdefault(
                            sid, {"headers": None, "data": b"",
                                  "closed": False}
                        )
                        if flags & FLAG_END_HEADERS:
                            st["headers"] = decoder.decode(
                                hdr_frag.pop(sid)
                            )
                        if ftype == H2_HEADERS and flags & FLAG_END_STREAM:
                            st["closed"] = True
                    elif ftype == H2_DATA:
                        st = streams.setdefault(
                            sid, {"headers": None, "data": b"",
                                  "closed": False}
                        )
                        st["data"] += payload
                        if flags & FLAG_END_STREAM:
                            st["closed"] = True
                        # RFC 7540 §6.9 receive-side flow control:
                        # replenish the connection window (stream 0)
                        # and the stream window for every DATA byte
                        # consumed, so a compliant client can keep
                        # sending past the 65,535-byte initial window —
                        # large OTLP exports stall without this.
                        if payload:
                            inc = len(payload).to_bytes(4, "big")
                            upd = h2_encode_frame(
                                H2_WINDOW_UPDATE, 0, 0, inc
                            )
                            if not st["closed"]:
                                upd += h2_encode_frame(
                                    H2_WINDOW_UPDATE, 0, sid, inc
                                )
                            conn.sendall(upd)
                    elif ftype == H2_GOAWAY:
                        return
                    # WINDOW_UPDATE / RST / PRIORITY: no action needed
                    st = streams.get(sid)
                    if st and st["closed"] and st["headers"] is not None:
                        self._respond(conn, encoder, sid, st, send_lock)
                        del streams[sid]
                if (
                    self.max_connection_age_secs is not None
                    and _time.monotonic() - conn_born
                    >= self.max_connection_age_secs
                    and not streams
                ):
                    # graceful GOAWAY (RFC 7540 §6.8): last processed
                    # stream id + NO_ERROR, then close — in-flight
                    # streams already drained (streams is empty)
                    last_sid = max_sid
                    with send_lock:
                        conn.sendall(h2_encode_frame(
                            H2_GOAWAY, 0, 0,
                            last_sid.to_bytes(4, "big") + b"\x00" * 4))
                    return
                data = conn.recv(65536)
                if not data:
                    return
                buf += data
        except (OSError, ValueError):
            return
        finally:
            conn.close()

    def _respond(self, conn, encoder, sid, st,
                 send_lock: "threading.Lock | None" = None) -> None:
        lock = send_lock or threading.Lock()
        path = dict(st["headers"]).get(":path", "")
        handler = self.handlers.get(path)
        status = "0"
        body: "bytes | object" = b""
        if handler is None:
            status = "12"  # UNIMPLEMENTED
        else:
            try:
                messages = grpc_unframe(st["data"])
                if any(c for c, _m in messages):
                    status = "12"  # compressed frames unsupported
                else:
                    for _c, msg in messages:
                        body = handler(msg)
            except Exception:
                status = "13"  # INTERNAL
        if status == "0" and not isinstance(body, (bytes, bytearray)):
            # SERVER-STREAMING (r11, observability API): the handler
            # returned an iterator of messages. Send response headers
            # now, then stream DATA frames from a dedicated thread so
            # this connection's read loop keeps servicing PINGs and
            # new streams; trailers close the stream when the iterator
            # ends (or the client goes away — sendall raises and the
            # thread exits).
            with lock:
                conn.sendall(h2_encode_frame(
                    H2_HEADERS, FLAG_END_HEADERS, sid,
                    encoder.encode([(":status", "200"),
                                    ("content-type",
                                     "application/grpc")]),
                ))

            def pump(it=body):
                stat = "0"
                try:
                    for msg in it:
                        with lock:
                            conn.sendall(h2_encode_frame(
                                H2_DATA, 0, sid, grpc_frame(msg)))
                except (OSError, ValueError):
                    return  # client gone; nothing to finalize
                except Exception:
                    stat = "13"
                try:
                    with lock:
                        conn.sendall(h2_encode_frame(
                            H2_HEADERS,
                            FLAG_END_HEADERS | FLAG_END_STREAM, sid,
                            encoder.encode([("grpc-status", stat)]),
                        ))
                except OSError:
                    pass

            threading.Thread(target=pump, daemon=True).start()
            return
        with lock:
            conn.sendall(h2_encode_frame(
                H2_HEADERS, FLAG_END_HEADERS, sid,
                encoder.encode([(":status", "200"),
                                ("content-type", "application/grpc")]),
            ))
            if status == "0":
                conn.sendall(h2_encode_frame(H2_DATA, 0, sid,
                                             grpc_frame(body)))
            conn.sendall(h2_encode_frame(
                H2_HEADERS, FLAG_END_HEADERS | FLAG_END_STREAM, sid,
                encoder.encode([("grpc-status", status)]),
            ))

    def close(self) -> None:
        self._stop.set()
        self._srv.close()


def start_otlp_grpc_listener(state, host: str = "127.0.0.1",
                             port: int = 0, tls=None) -> GrpcListener:
    """OTLP/gRPC endpoint serving ALL THREE signals (reference
    src/sources/opentelemetry/grpc.rs implements LogsService,
    MetricsService, and TraceService on one server — grpc.rs:12-20):
    each Export request → one state entry per record/span/data-point
    (the same JSON rows the HTTP OTLP endpoint appends), empty
    Export*ServiceResponse back."""
    from vector_spark.functions.protowire import (
        decode_otlp_logs,
        decode_otlp_metrics_pb,
        decode_otlp_traces_pb,
    )

    def export(decoder):
        def handler(msg: bytes) -> bytes:
            for record in decoder(msg):
                state.append("grpc", json.dumps(record, default=str))
            return b""  # Export*ServiceResponse {}
        return handler

    return GrpcListener({
        "/opentelemetry.proto.collector.logs.v1.LogsService/Export":
            export(decode_otlp_logs),
        "/opentelemetry.proto.collector.trace.v1.TraceService/Export":
            export(decode_otlp_traces_pb),
        "/opentelemetry.proto.collector.metrics.v1.MetricsService"
        "/Export":
            export(decode_otlp_metrics_pb),
    }, host, port, tls=tls)


def start_vector_grpc_listener(state, host: str = "127.0.0.1",
                               port: int = 0,
                               tls=None) -> GrpcListener:
    """vector-native v2 endpoint (proto/vector/vector.proto `service
    Vector`): PushEventsRequest{repeated EventWrapper events=1} →
    one state entry per event; empty PushEventsResponse. HealthCheck
    answers SERVING (status 0 = proto3 default, empty message)."""
    from vector_spark.functions.protowire import (
        VECTOR_REGISTRY,
        _value_to_py,
        decode_message,
    )

    def push_events(msg: bytes) -> bytes:
        req = decode_message(
            msg,
            {1: ("events", "repeated msg:EventWrapper")},
            VECTOR_REGISTRY,
        )
        for wrapper in req.get("events", []):
            log = wrapper.get("log", {})
            if "value" in log:
                v = _value_to_py(log["value"])
                fields = v if isinstance(v, dict) else {"message": v}
            else:
                fields = {
                    e["key"]: _value_to_py(e.get("value", {}))
                    for e in log.get("fields", [])
                }
            state.append("grpc", json.dumps(fields, default=str))
        return b""  # PushEventsResponse {}

    return GrpcListener({
        "/vector.Vector/PushEvents": push_events,
        "/vector.Vector/HealthCheck": lambda _msg: b"",
    }, host, port, tls=tls)


def grpc_unary_call(
    host: str,
    port: int,
    path: str,
    messages: list[bytes],
    metadata: list[tuple[str, str]] | None = None,
    timeout: float = 10.0,
    tls=None,
) -> tuple[int, bytes]:
    """Client half of the transport above: a flow-control-compliant
    HTTP/2 gRPC call sending one or more length-prefixed messages on a
    single stream (client-streaming collapses to unary when
    ``messages`` has one element). DATA is sent in ≤16 KiB frames,
    stalling at the 65,535-byte initial connection/stream windows and
    resuming on server WINDOW_UPDATEs (RFC 7540 §6.9). Returns
    (grpc_status, concatenated response message bytes).

    Used by sinks that speak gRPC upstream (databricks_zerobus); the
    server side is `GrpcListener`, so both halves pin each other in
    tests."""
    enc = HpackEncoder()
    dec = HpackDecoder()
    headers = [
        (":method", "POST"),
        (":scheme", "https" if tls is not None else "http"),
        (":path", path),
        (":authority", f"{host}:{port}"),
        ("content-type", "application/grpc"), ("te", "trailers"),
    ] + [(k.lower(), v) for k, v in (metadata or [])]
    framed = b"".join(grpc_frame(m) for m in messages)
    sock = socket.create_connection((host, port), timeout=timeout)
    if tls is not None:
        sock = tls.wrap_client_connection(sock, host)
    try:
        sock.sendall(
            H2_PREFACE
            + h2_encode_frame(H2_SETTINGS, 0, 0)
            + h2_encode_frame(H2_HEADERS, FLAG_END_HEADERS, 1,
                              enc.encode(headers))
        )
        conn_win = stream_win = 65535
        initial_win = 65535  # server's current INITIAL_WINDOW_SIZE
        pos = 0
        buf = b""
        status: list[int] = []
        body = bytearray()
        done = threading.Event()

        def pump(data: bytes) -> None:
            nonlocal buf, conn_win, stream_win, initial_win
            buf += data
            frames, buf = h2_decode_frames(bytes(buf))
            for ftype, flags, sid, payload in frames:
                if ftype == H2_WINDOW_UPDATE:
                    inc = int.from_bytes(payload, "big") & 0x7FFFFFFF
                    if sid == 0:
                        conn_win += inc
                    else:
                        stream_win += inc
                elif ftype == H2_SETTINGS and not flags & FLAG_ACK:
                    # apply INITIAL_WINDOW_SIZE (id 4) as a DELTA to
                    # the open stream's send window (RFC 7540 §6.9.2)
                    # and ACK — real servers require the ack
                    for off in range(0, len(payload) - 5, 6):
                        sid_ = int.from_bytes(
                            payload[off:off + 2], "big")
                        val = int.from_bytes(
                            payload[off + 2:off + 6], "big")
                        if sid_ == 4:
                            stream_win += val - initial_win
                            initial_win = val
                    sock.sendall(
                        h2_encode_frame(H2_SETTINGS, FLAG_ACK, 0))
                elif ftype == H2_HEADERS and sid == 1:
                    for name, value in dec.decode(payload):
                        if name == "grpc-status":
                            status.append(int(value))
                    if flags & FLAG_END_STREAM:
                        done.set()
                elif ftype == H2_DATA and sid == 1:
                    body.extend(payload)
                    if flags & FLAG_END_STREAM:
                        done.set()
                elif ftype == H2_GOAWAY:
                    raise ConnectionError("server sent GOAWAY")

        while pos < len(framed):
            can = min(16384, conn_win, stream_win, len(framed) - pos)
            if can <= 0:
                data = sock.recv(65536)
                if not data:
                    raise ConnectionError(
                        "server closed while awaiting WINDOW_UPDATE")
                pump(data)
                continue
            end = pos + can >= len(framed)
            sock.sendall(h2_encode_frame(
                H2_DATA, FLAG_END_STREAM if end else 0, 1,
                framed[pos:pos + can]))
            conn_win -= can
            stream_win -= can
            pos += can
        if not framed:
            sock.sendall(h2_encode_frame(H2_DATA, FLAG_END_STREAM, 1))
        while not done.is_set() and not status:
            data = sock.recv(65536)
            if not data:
                break
            pump(data)
        st = status[-1] if status else -1
        msgs = grpc_unframe(bytes(body))
        return st, b"".join(m for _c, m in msgs)
    finally:
        sock.close()


def grpc_stream_call(
    host: str,
    port: int,
    path: str,
    message: bytes,
    max_messages: int = 1,
    timeout: float = 15.0,
) -> tuple[int | None, list[bytes]]:
    """Client for SERVER-STREAMING RPCs (r11 observability API): send
    one request message, collect up to ``max_messages`` response
    messages, then hang up (the server's pump thread sees the closed
    socket and stops). Returns (grpc_status or None if we hung up
    before trailers, [response message bytes])."""
    enc = HpackEncoder()
    dec = HpackDecoder()
    headers = [
        (":method", "POST"),
        (":scheme", "http"),
        (":path", path),
        (":authority", f"{host}:{port}"),
        ("content-type", "application/grpc"), ("te", "trailers"),
    ]
    sock = socket.create_connection((host, port), timeout=timeout)
    try:
        sock.sendall(
            H2_PREFACE
            + h2_encode_frame(H2_SETTINGS, 0, 0)
            + h2_encode_frame(H2_HEADERS, FLAG_END_HEADERS, 1,
                              enc.encode(headers))
            + h2_encode_frame(H2_DATA, FLAG_END_STREAM, 1,
                              grpc_frame(message))
        )
        buf = b""
        body = bytearray()
        out: list[bytes] = []
        status: int | None = None
        deadline = time.monotonic() + timeout
        while len(out) < max_messages and time.monotonic() < deadline:
            try:
                data = sock.recv(65536)
            except TimeoutError:
                break
            if not data:
                break
            buf += data
            frames, buf = h2_decode_frames(buf)
            done = False
            for ftype, flags, sid, payload in frames:
                if ftype == H2_SETTINGS and not flags & FLAG_ACK:
                    sock.sendall(
                        h2_encode_frame(H2_SETTINGS, FLAG_ACK, 0))
                elif ftype == H2_DATA and sid == 1:
                    body.extend(payload)
                    # lift complete length-prefixed messages off the
                    # front; partial tails wait for the next frame
                    while len(body) >= 5:
                        ln = int.from_bytes(body[1:5], "big")
                        if len(body) < 5 + ln:
                            break
                        out.append(bytes(body[5:5 + ln]))
                        del body[:5 + ln]
                elif ftype == H2_HEADERS and sid == 1:
                    for name, value in dec.decode(payload):
                        if name == "grpc-status":
                            status = int(value)
                    if flags & FLAG_END_STREAM:
                        done = True
            if done:
                break
        return status, out
    finally:
        sock.close()
