"""Wire-protocol server sources via the PySpark Python DataSource API.

Reference:
- syslog TCP listener: `src/sources/syslog.rs:45` (framing: RFC6587
  octet-counting OR newline non-transparent, auto-detected per message)
- statsd UDP listener: `src/sources/statsd/mod.rs` (one metric line per
  datagram, newline-separated lines allowed)
- socket source: `src/sources/socket/mod.rs:22`

Spark-first shape: a `SimpleDataSourceStreamReader` runs DRIVER-side — the
right place for a listener socket (one bind point, like the reference's
single listener task); decoded lines enter micro-batches through the
offset/commit contract, so downstream transforms stay fully distributed
DataFrame ops and the per-batch volume is the only driver constraint —
the same constraint the reference's single-socket listener has.

Delivery contract: every received frame is appended to a driver-local WAL
*before* it becomes readable, and batch offsets live in the query
checkpoint. On restart Spark hands us the last committed offset and we
replay the WAL tail — received-and-unprocessed frames survive restarts
(exactly-once into the sink, stronger than the reference's ack-less
socket source, which re-delivers nothing). Frames that never reached the
WAL (crash mid-append) are lost, as they are in any ack-less wire
protocol.

Usage:
    register_sources(spark)
    df = (spark.readStream.format("syslog_tcp")
          .option("host", "127.0.0.1").option("port", 5140)
          .option("wal_dir", "/tmp/syslog-wal").load())
Schema: seq BIGINT, ts TIMESTAMP, peer STRING, message STRING.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

SOCKET_SCHEMA = "seq bigint, ts timestamp, peer string, message string"


class OctetCountingFramer:
    """RFC6587 framing with auto-detect (syslog.rs behavior): a frame is
    either `<len> <bytes>` (octet counting) or newline-terminated."""

    def __init__(self) -> None:
        self.buf = b""

    def feed(self, data: bytes) -> list[str]:
        self.buf += data
        frames: list[str] = []
        while self.buf:
            # octet-counting: digits, space, payload
            i = 0
            while i < len(self.buf) and i < 10 and 0x30 <= self.buf[i] <= 0x39:
                i += 1
            if i > 0 and i < len(self.buf) and self.buf[i : i + 1] == b" ":
                n = int(self.buf[:i])
                start = i + 1
                if len(self.buf) < start + n:
                    break  # incomplete frame
                frames.append(self.buf[start : start + n].decode("utf-8", "replace"))
                self.buf = self.buf[start + n :]
                # an octet-counted frame may be followed by \n; eat it
                if self.buf.startswith(b"\n"):
                    self.buf = self.buf[1:]
                continue
            # newline non-transparent framing
            nl = self.buf.find(b"\n")
            if nl < 0:
                break
            frames.append(self.buf[:nl].rstrip(b"\r").decode("utf-8", "replace"))
            self.buf = self.buf[nl + 1 :]
        return frames


class _ListenerState:
    """Shared buffer between listener threads and the stream reader.
    Appends to the WAL before exposing an entry (delivery contract)."""

    def __init__(self, wal_dir: str | None) -> None:
        self.lock = threading.Lock()
        self.entries: list[tuple[int, datetime, str, str]] = []
        self.next_seq = 0
        self.wal_path = None
        if wal_dir:
            os.makedirs(wal_dir, exist_ok=True)
            self.wal_path = os.path.join(wal_dir, "wal.jsonl")
            self._recover()

    def _recover(self) -> None:
        if not self.wal_path or not os.path.exists(self.wal_path):
            return
        with open(self.wal_path) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail write from a crash
                ts = datetime.fromisoformat(e["ts"])
                self.entries.append((e["seq"], ts, *e["fields"]))
        if self.entries:
            self.next_seq = self.entries[-1][0] + 1

    def append(self, *fields: str) -> None:
        """Record one frame: (auto seq, now, *fields) — the fields after
        the envelope are source-specific (peer+message for sockets,
        peer+path+message for http)."""
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        with self.lock:
            seq = self.next_seq
            self.next_seq += 1
            if self.wal_path:
                with open(self.wal_path, "a") as f:
                    f.write(
                        json.dumps(
                            {"seq": seq, "ts": now.isoformat(),
                             "fields": list(fields)}
                        )
                        + "\n"
                    )
                    f.flush()
            self.entries.append((seq, now, *fields))

    def drain(self, after_seq: int, upto_seq: int | None = None) -> list[tuple]:
        with self.lock:
            return [
                e
                for e in self.entries
                if e[0] > after_seq and (upto_seq is None or e[0] <= upto_seq)
            ]

    def latest(self) -> int:
        with self.lock:
            return self.next_seq - 1

    def prune(self, upto_seq: int) -> None:
        with self.lock:
            self.entries = [e for e in self.entries if e[0] > upto_seq]
            if self.wal_path and os.path.exists(self.wal_path):
                # compact: rewrite the tail only (bounded by unprocessed data)
                tmp = self.wal_path + ".tmp"
                with open(tmp, "w") as f:
                    for seq, ts, *fields in self.entries:
                        f.write(
                            json.dumps(
                                {"seq": seq, "ts": ts.isoformat(),
                                 "fields": fields}
                            )
                            + "\n"
                        )
                os.replace(tmp, self.wal_path)


def _accept_forever(srv: socket.socket, handle, tls=None) -> None:
    """Shared accept loop for the stream listeners. When ``tls`` (a
    TlsSettings) is set, each ACCEPTED connection is wrapped
    server-side in its handler thread — a stalled or failed handshake
    never blocks the accept loop (the reference's MaybeTlsIncomingStream
    does the handshake per-connection too, src/tls/incoming.rs)."""
    while True:
        conn, addr = srv.accept()
        peer = f"{addr[0]}:{addr[1]}"

        def run(conn=conn, peer=peer) -> None:
            if tls is not None:
                try:
                    conn = tls.wrap_server_connection(conn)
                except (OSError, ValueError):
                    conn.close()
                    return
            handle(conn, peer)

        threading.Thread(target=run, daemon=True).start()


def _tcp_listener(state: _ListenerState, host: str, port: int,
                  ready: threading.Event, tls=None, options=None):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    ready.set()

    def handle(conn: socket.socket, peer: str) -> None:
        framer = OctetCountingFramer()
        with conn:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                for frame in framer.feed(data):
                    if frame:
                        state.append(peer, frame)

    _accept_forever(srv, handle, tls)


def _udp_listener(state: _ListenerState, host: str, port: int,
                  ready: threading.Event, tls=None, options=None):
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    ready.set()
    while True:
        data, addr = srv.recvfrom(65536)
        peer = f"{addr[0]}:{addr[1]}"
        # statsd: datagram may carry several newline-separated lines
        for line in data.decode("utf-8", "replace").splitlines():
            if line.strip():
                state.append(peer, line.strip())


def _http_listener(state: _ListenerState, host: str, port: int,
                   ready: threading.Event, tls=None, options=None):
    """HTTP push endpoint (vector `src/sources/http_server.rs`):
    one event per newline-delimited body line; a JSON-array body yields
    one event per element (the reference's json decoding + framing).

    The reference's request-surface config (http_server.rs
    SimpleHttpConfig) rides in ``options``:
    - ``auth.username``/``auth.password`` — HTTP Basic; mismatch → 401
      (auth should pair with ``tls`` — the reference's own warning);
    - ``headers`` / ``query_parameters`` — comma-separated names,
      fnmatch wildcards allowed (``X-*``, ``*``); captured values land
      in the ``meta`` JSON column (downstream merges them into events,
      the reference's add_headers/add_query_parameters);
    - ``method`` (default POST) — others answer 405;
    - ``path`` + ``strict_path`` (default true when ``path`` is set) —
      exact match, or prefix when strict_path=false; miss → 404.
      Without a ``path`` option every path is accepted (this repo's
      multi-endpoint routing default, `route_http_endpoints`);
    - ``response_code`` — success status (default 200)."""
    import base64 as _b64
    import fnmatch
    import http.server

    opts = options or {}
    auth_user = opts.get("auth.username")
    auth_pass = opts.get("auth.password")
    want_auth = None
    if auth_user is not None:
        want_auth = "Basic " + _b64.b64encode(
            f"{auth_user}:{auth_pass or ''}".encode()).decode()
    hdr_pats = [p.strip() for p in (opts.get("headers") or "").split(",")
                if p.strip()]
    qp_pats = [p.strip()
               for p in (opts.get("query_parameters") or "").split(",")
               if p.strip()]
    method = (opts.get("method") or "POST").upper()
    cfg_path = opts.get("path")
    strict = str(opts.get("strict_path", "true")).lower() != "false"
    ok_code = int(opts.get("response_code", 200))
    # Splunk HEC indexer acknowledgements (src/sources/splunk_hec/
    # acknowledgements.rs): when enabled, event posts to the collector
    # endpoints REQUIRE a channel (X-Splunk-Request-Channel header or
    # `channel` query param) and answer {"text":"Success","code":0,
    # "ackId":N}; clients then POST {"acks":[ids]} to
    # /services/collector/ack and get {"acks":{id:bool}} back. Under
    # this engine's delivery contract an event is durable once it is
    # in the WAL, so an ackId reports True as soon as its request has
    # been appended (the reference flips it on end-to-end delivery;
    # WAL + checkpoint is this engine's equivalent boundary).
    hec_ack = str(opts.get("hec.ack", "")).lower() in ("1", "true",
                                                       "yes", "on")
    # max_pending_acks_per_channel (acknowledgements.rs: the reference
    # bounds pending statuses and drops the OLDEST when full) — acked
    # ids are monotonic per channel, so the bound is a min-id watermark
    hec_max_pending = int(opts.get("hec.max_pending_acks_per_channel",
                                   100_000))
    hec_lock = threading.Lock()
    hec_channels: dict[str, dict] = {}

    def _capture(headers, query: str) -> str:
        import urllib.parse

        h: dict = {}
        for name, value in headers.items():
            if any(fnmatch.fnmatch(name.lower(), p.lower())
                   for p in hdr_pats):
                h[name] = value
        q: dict = {}
        if qp_pats and query:
            for k, v in urllib.parse.parse_qsl(query):
                if any(fnmatch.fnmatch(k, p) for p in qp_pats):
                    q[k] = v
        if not h and not q:
            return "{}"
        # kept separate so merge_http_meta can honor the reference's
        # precedence: body beats headers, query beats body
        return json.dumps({"headers": h, "query": q})

    class Handler(http.server.BaseHTTPRequestHandler):
        def _reject(self, code: int) -> None:
            self.send_response(code)
            self.end_headers()

        def _json_reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _hec_channel(self, query: str) -> str | None:
            import urllib.parse

            ch = self.headers.get("X-Splunk-Request-Channel")
            if ch:
                return ch
            for k, v in urllib.parse.parse_qsl(query):
                if k == "channel":
                    return v
            return None

        def do_POST(self):  # noqa: N802 (stdlib naming)
            self._serve("POST")

        def do_PUT(self):  # noqa: N802
            self._serve("PUT")

        def do_GET(self):  # noqa: N802
            self._serve("GET")

        def _serve(self, got_method: str) -> None:
            if got_method != method:
                return self._reject(405)
            if want_auth is not None and (
                    self.headers.get("Authorization") != want_auth):
                return self._reject(401)
            url_path, _, query = self.path.partition("?")
            if cfg_path is not None:
                hit = (url_path == cfg_path if strict
                       else url_path.startswith(cfg_path))
                if not hit:
                    return self._reject(404)
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            peer = f"{self.client_address[0]}:{self.client_address[1]}"
            meta = _capture(self.headers, query)
            hec_channel = None
            if hec_ack and url_path.startswith("/services/collector"):
                hec_channel = self._hec_channel(query)
                if hec_channel is None:
                    # mod.rs: ack-enabled collector posts without a
                    # channel are rejected (Splunk's own error shape)
                    return self._json_reply(
                        400, {"text": "Data channel is missing",
                              "code": 10})
                if url_path == "/services/collector/ack":
                    try:
                        want = json.loads(
                            raw.decode("utf-8", "replace"))["acks"]
                        want = [int(i) for i in want]
                    except (ValueError, KeyError, TypeError):
                        return self._reject(400)
                    with hec_lock:
                        acked = hec_channels.get(
                            hec_channel, {}).get("acked", set())
                        resp = {str(i): i in acked for i in want}
                    return self._json_reply(200, {"acks": resp})

            def hec_success() -> None:
                with hec_lock:
                    ch = hec_channels.setdefault(
                        hec_channel, {"next": 0, "acked": set()})
                    ack_id = ch["next"]
                    ch["next"] += 1
                    ch["acked"].add(ack_id)
                    # bound pending statuses: drop the oldest, the
                    # reference's max_pending_acks behavior
                    while len(ch["acked"]) > hec_max_pending:
                        ch["acked"].discard(min(ch["acked"]))
                self._json_reply(
                    ok_code,
                    {"text": "Success", "code": 0, "ackId": ack_id})

            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("application/x-protobuf"):
                # binary body (OTLP/HTTP protobuf, opentelemetry/http.rs):
                # one base64 message row carries the whole payload through
                # the text envelope; route_http_endpoints decodes it with
                # the pure-Python wire codec
                state.append(peer, url_path,
                             _b64.b64encode(raw).decode(), meta)
                if hec_channel is not None:
                    return hec_success()
                return self._reject(ok_code)
            body = raw.decode("utf-8", "replace")
            if ctype.startswith("application/json") and body.lstrip().startswith("["):
                try:
                    items = json.loads(body)
                    for item in items:
                        state.append(peer, url_path, json.dumps(item),
                                     meta)
                    if hec_channel is not None:
                        return hec_success()
                    return self._reject(ok_code)
                except json.JSONDecodeError:
                    return self._reject(400)
            for line in body.splitlines():
                if line.strip():
                    state.append(peer, url_path, line, meta)
            if hec_channel is not None:
                return hec_success()
            self._reject(ok_code)

        def log_message(self, *args):  # quiet
            pass

    if tls is None:
        srv = http.server.ThreadingHTTPServer((host, port), Handler)
    else:
        ctx = tls.server_context()

        class _TlsServer(http.server.ThreadingHTTPServer):
            """Wrap each ACCEPTED connection in its worker thread —
            wrapping the listening socket would run the handshake
            inside serve_forever's single accept loop, letting one
            stalled client block all ingest (the same reasoning as
            _accept_forever for the raw-TCP listeners)."""

            def process_request_thread(self, request, client_address):
                try:
                    request.settimeout(10)
                    request = ctx.wrap_socket(request, server_side=True)
                    request.settimeout(None)
                except (OSError, ValueError):
                    request.close()
                    return
                super().process_request_thread(request, client_address)

        srv = _TlsServer((host, port), Handler)
    ready.set()
    srv.serve_forever()


def _fluent_listener(state: _ListenerState, host: str, port: int,
                     ready: threading.Event, tls=None, options=None):
    """fluent forward protocol listener (`src/sources/fluent/mod.rs`):
    a TCP stream of self-delimiting msgpack items, each one of
      ["tag", time, record, options?]                      # Message mode
      ["tag", [[time, record], ...], options?]             # Forward mode
      ["tag", <bin: concatenated [time, record]>, options?]  # PackedForward
    Times are ints or fluentd EventTime ext values (the msgpack decoder in
    vrl_wave4 handles ext type 0). When options carry a "chunk" id the
    listener replies {"ack": id} (at-least-once client contract). Events
    surface as JSON `{"tag", "timestamp", "record"}` in the message column."""
    from vector_spark.functions.vrl_wave4 import _msgpack_decode_item

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    ready.set()

    def emit(peer: str, tag: str, t, record) -> None:
        state.append(
            peer,
            json.dumps(
                {"tag": tag, "timestamp": t, "record": record}, sort_keys=True
            ),
        )

    def entries_from(item, peer: str) -> dict | None:
        """Decode one top-level msgpack item; returns its options map.
        Dispatch is unambiguous: a Message-mode time is always numeric,
        so a list 2nd element means Forward, str/bytes means
        PackedForward (the msgpack reader surfaces bin as base64 str)."""
        if not isinstance(item, list) or len(item) < 2:
            return None
        tag, second = item[0], item[1]
        if isinstance(second, list):  # Forward mode
            opts = item[2] if len(item) > 2 and isinstance(item[2], dict) else None
            for pair in second:
                if isinstance(pair, list) and len(pair) >= 2:
                    emit(peer, tag, pair[0], pair[1])
            return opts
        if isinstance(second, (bytes, bytearray, str)):  # PackedForward
            import base64

            opts = item[2] if len(item) > 2 and isinstance(item[2], dict) else None
            blob = (
                bytes(second)
                if isinstance(second, (bytes, bytearray))
                else base64.b64decode(second)
            )
            pos = 0
            while pos < len(blob):
                entry, pos = _msgpack_decode_item(blob, pos)
                if isinstance(entry, list) and len(entry) >= 2:
                    emit(peer, tag, entry[0], entry[1])
            return opts
        if len(item) >= 3:  # Message mode: [tag, time, record, options?]
            emit(peer, tag, second, item[2])
            return item[3] if len(item) > 3 and isinstance(item[3], dict) else None
        return None

    def handle(conn: socket.socket, peer: str) -> None:
        buf = b""
        with conn:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                buf += data
                while buf:
                    try:
                        item, consumed = _msgpack_decode_item(buf, 0)
                    except (IndexError, ValueError, UnicodeDecodeError):
                        break  # incomplete item — wait for more bytes
                    buf = buf[consumed:]
                    opts = entries_from(item, peer)
                    if opts and "chunk" in opts:
                        # minimal msgpack encode of {"ack": <str>}
                        ack = opts["chunk"]
                        ab = ack.encode()
                        conn.sendall(
                            b"\x81\xa3ack" + bytes([0xA0 | len(ab)]) + ab
                            if len(ab) < 32
                            else b"\x81\xa3ack\xd9" + bytes([len(ab)]) + ab
                        )

    _accept_forever(srv, handle, tls)


def _vector_listener(state: _ListenerState, host: str, port: int,
                     ready: threading.Event, tls=None, options=None):
    """vector-to-vector native listener (`src/sources/vector/`): a TCP
    stream of 4-byte BE length-prefixed native EventWrapper protobuf
    frames (the v1 wire shape; v2 wraps the same EventArray payloads in
    gRPC — functions/framing.py frame_grpc covers that framing). Each
    frame decodes through the pure-Python event codec; log events
    surface as their fields' JSON."""
    import struct as _struct

    from vector_spark.functions.protowire import decode_vector_log

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    ready.set()

    def handle(conn: socket.socket, peer: str) -> None:
        buf = b""
        with conn:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                buf += data
                while len(buf) >= 4:
                    ln = _struct.unpack(">I", buf[:4])[0]
                    if len(buf) < 4 + ln:
                        break
                    frame = buf[4:4 + ln]
                    buf = buf[4 + ln:]
                    try:
                        ev = decode_vector_log(frame)
                        if ev is not None:
                            state.append(
                                peer, json.dumps(ev, sort_keys=True, default=str)
                            )
                    except Exception:
                        # malformed frame from the network must never
                        # kill the handler thread (struct.error is not a
                        # ValueError); skip, like the reference drops
                        pass

    _accept_forever(srv, handle, tls)


_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3


def _websocket_listener(state: _ListenerState, host: str, port: int,
                        ready: threading.Event, tls=None, options=None):
    """WebSocket server source (`src/sources/websocket/`): RFC 6455 —
    HTTP Upgrade handshake (Sec-WebSocket-Accept = b64(sha1(key+GUID))),
    then framed messages. Text/binary data frames become events (binary
    surfaces base64); ping is answered with pong; close is echoed. Pure
    stdlib — no websocket library."""
    import base64
    import hashlib
    import struct as _struct

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    ready.set()

    def recv_exact(conn: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def send_frame(conn: socket.socket, opcode: int, payload: bytes) -> None:
        hdr = bytes([0x80 | opcode])
        ln = len(payload)
        if ln < 126:
            hdr += bytes([ln])
        elif ln < 65536:
            hdr += bytes([126]) + _struct.pack(">H", ln)
        else:
            hdr += bytes([127]) + _struct.pack(">Q", ln)
        conn.sendall(hdr + payload)

    def handle(conn: socket.socket, peer: str) -> None:
        with conn:
            # HTTP Upgrade handshake
            req = b""
            while b"\r\n\r\n" not in req:
                chunk = conn.recv(4096)
                if not chunk:
                    return
                req += chunk
            key = None
            for line in req.split(b"\r\n"):
                if line.lower().startswith(b"sec-websocket-key:"):
                    key = line.split(b":", 1)[1].strip().decode()
            if key is None:
                conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                return
            accept = base64.b64encode(
                hashlib.sha1((key + _WS_GUID).encode()).digest()
            ).decode()
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
                ).encode()
            )
            # frame loop (client→server frames are always masked, §5.3).
            # Hardened like the vector/dnstap loops (ccf7817 contract): a
            # mid-header disconnect or oversized length closes this
            # connection cleanly instead of raising out of the thread.
            frags: list[bytes] = []
            frag_op = 0
            max_payload = 64 * 1024 * 1024  # reject absurd 64-bit lengths
            while True:
                try:
                    h = recv_exact(conn, 2)
                    if h is None:
                        return
                    fin, opcode = h[0] & 0x80, h[0] & 0x0F
                    masked, ln = h[1] & 0x80, h[1] & 0x7F
                    if ln == 126:
                        ext = recv_exact(conn, 2)
                        if ext is None:
                            return
                        ln = _struct.unpack(">H", ext)[0]
                    elif ln == 127:
                        ext = recv_exact(conn, 8)
                        if ext is None:
                            return
                        ln = _struct.unpack(">Q", ext)[0]
                    if ln > max_payload:
                        send_frame(conn, 0x8, _struct.pack(">H", 1009))
                        return
                    mask = recv_exact(conn, 4) if masked else b"\x00" * 4
                    if mask is None:
                        return
                    data = recv_exact(conn, ln)
                    if data is None:
                        return
                    if masked:
                        data = bytes(
                            b ^ mask[i % 4] for i, b in enumerate(data)
                        )
                    if opcode == 0x8:  # close: echo and stop
                        send_frame(conn, 0x8, data[:2])
                        return
                    if opcode == 0x9:  # ping → pong
                        send_frame(conn, 0xA, data)
                        continue
                    if opcode in (0x1, 0x2, 0x0):
                        if opcode != 0x0:
                            frag_op = opcode
                            frags = [data]
                        else:
                            frags.append(data)
                        if fin:
                            whole = b"".join(frags)
                            state.append(
                                peer,
                                whole.decode("utf-8", "replace")
                                if frag_op == 0x1
                                else base64.b64encode(whole).decode(),
                            )
                            frags = []
                except (OSError, ValueError, _struct.error, TypeError):
                    return  # malformed frame / dead socket: drop connection

    _accept_forever(srv, handle, tls)


def _dnstap_listener(state: _ListenerState, host: str, port: int,
                     ready: threading.Event, tls=None, options=None):
    """dnstap listener (`src/sources/dnstap/` TCP mode): Frame Streams
    over TCP with the bidirectional handshake (READY → ACCEPT, data
    frames, STOP → FINISH — fstrm control types 0x04/0x01/0x03/0x05);
    each data frame is a dnstap protobuf payload decoded with
    functions/dnstap.py. Events surface as the parsed JSON event in the
    message column (the reference's parse_dnstap field names)."""
    import struct as _struct

    from vector_spark.functions.dnstap import parse_dnstap

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    ready.set()

    def handle(conn: socket.socket, peer: str) -> None:
        buf = b""
        with conn:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                buf += data
                while len(buf) >= 4:
                    ln = _struct.unpack(">I", buf[:4])[0]
                    if ln == 0:  # control frame
                        if len(buf) < 8:
                            break
                        cln = _struct.unpack(">I", buf[4:8])[0]
                        if len(buf) < 8 + cln:
                            break
                        ctrl = buf[8:8 + cln]
                        buf = buf[8 + cln:]
                        ctype = (
                            _struct.unpack(">I", ctrl[:4])[0]
                            if len(ctrl) >= 4
                            else 0
                        )
                        if ctype == 4:  # READY → ACCEPT (echo fields)
                            reply = _struct.pack(">I", 1) + ctrl[4:]
                            conn.sendall(
                                b"\x00\x00\x00\x00"
                                + _struct.pack(">I", len(reply))
                                + reply
                            )
                        elif ctype == 3:  # STOP → FINISH
                            reply = _struct.pack(">I", 5)
                            conn.sendall(
                                b"\x00\x00\x00\x00"
                                + _struct.pack(">I", len(reply))
                                + reply
                            )
                        continue
                    if len(buf) < 4 + ln:
                        break
                    frame = buf[4:4 + ln]
                    buf = buf[4 + ln:]
                    try:
                        state.append(
                            peer, json.dumps(parse_dnstap(frame), sort_keys=True)
                        )
                    except Exception:
                        # malformed frame: skip (struct.error included —
                        # a network peer must never kill the handler)
                        pass

    _accept_forever(srv, handle, tls)


def _logstash_listener(state: _ListenerState, host: str, port: int,
                       ready: threading.Event, tls=None, options=None):
    """Lumberjack v2 (beats/logstash) listener (`src/sources/logstash.rs`):
    frames are (version, type) pairs — '2W' window size, '2J' JSON data
    (seq, payload), '2C' zlib-compressed nested frames, '2D' key/value
    data. The listener acks the highest sequence at each window boundary
    ('2A' + seq). Events surface as the JSON payload in message."""
    import struct
    import zlib

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    ready.set()

    def parse_frames(buf: bytes, peer: str, conn) -> tuple[bytes, int]:
        """Consume complete frames; returns (rest, highest_seq_seen)."""
        hi = -1
        while len(buf) >= 2:
            ver, ftype = buf[0:1], buf[1:2]
            if ver != b"2" and ver != b"1":
                raise ValueError(f"lumberjack: bad version byte {ver!r}")
            if ftype == b"W":
                if len(buf) < 6:
                    break
                buf = buf[6:]
            elif ftype == b"J":
                if len(buf) < 10:
                    break
                seq, plen = struct.unpack(">II", buf[2:10])
                if len(buf) < 10 + plen:
                    break
                state.append(peer, buf[10 : 10 + plen].decode("utf-8", "replace"))
                hi = max(hi, seq)
                buf = buf[10 + plen :]
            elif ftype == b"D":
                if len(buf) < 10:
                    break
                seq, npairs = struct.unpack(">II", buf[2:10])
                pos = 10
                pairs = {}
                ok = True
                for _ in range(npairs):
                    if len(buf) < pos + 4:
                        ok = False
                        break
                    (klen,) = struct.unpack(">I", buf[pos : pos + 4])
                    pos += 4
                    if len(buf) < pos + klen + 4:
                        ok = False
                        break
                    k = buf[pos : pos + klen].decode("utf-8", "replace")
                    pos += klen
                    (vlen,) = struct.unpack(">I", buf[pos : pos + 4])
                    pos += 4
                    if len(buf) < pos + vlen:
                        ok = False
                        break
                    pairs[k] = buf[pos : pos + vlen].decode("utf-8", "replace")
                    pos += vlen
                if not ok:
                    break
                state.append(peer, json.dumps(pairs, sort_keys=True))
                hi = max(hi, seq)
                buf = buf[pos:]
            elif ftype == b"C":
                if len(buf) < 6:
                    break
                (clen,) = struct.unpack(">I", buf[2:6])
                if len(buf) < 6 + clen:
                    break
                inner = zlib.decompress(buf[6 : 6 + clen])
                rest, ihi = parse_frames(inner, peer, conn)
                hi = max(hi, ihi)
                buf = buf[6 + clen :]
            else:
                raise ValueError(f"lumberjack: unknown frame type {ftype!r}")
        return buf, hi

    def handle(conn: socket.socket, peer: str) -> None:
        import struct

        buf = b""
        with conn:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                buf += data
                try:
                    buf, hi = parse_frames(buf, peer, conn)
                except ValueError:
                    break
                if hi >= 0:
                    conn.sendall(b"2A" + struct.pack(">I", hi))

    _accept_forever(srv, handle, tls)


def _otlp_grpc_listener(state: _ListenerState, host: str, port: int,
                        ready: threading.Event, tls=None, options=None):
    """OTLP/gRPC logs endpoint (src/sources/opentelemetry/grpc.rs:17):
    the HTTP/2+HPACK transport lives in sources_grpc; records land in
    the shared WAL-backed state like every other listener."""
    from vector_spark.sources_grpc import start_otlp_grpc_listener

    start_otlp_grpc_listener(state, host, port, tls=tls)  # own accept thread
    ready.set()


def _vector_grpc_listener(state: _ListenerState, host: str, port: int,
                          ready: threading.Event, tls=None, options=None):
    """vector-native v2 gRPC endpoint (proto/vector/vector.proto
    service Vector — PushEvents + HealthCheck)."""
    from vector_spark.sources_grpc import start_vector_grpc_listener

    start_vector_grpc_listener(state, host, port, tls=tls)
    ready.set()


class _SocketStreamReader(SimpleDataSourceStreamReader):
    """Spark may instantiate the reader more than once (planning vs the
    prefetch loop), but only ONE instance drives read() — so the listener
    socket binds lazily on the first read() call, never in __init__.
    Recovery instances only see readBetweenOffsets, served from the WAL."""

    def __init__(self, options: dict, proto: str) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 0) or 0)
        if not self.port:
            raise ValueError("option 'port' is required")
        self.proto = proto
        self.wal_dir = options.get("wal_dir")
        # plain-string dict; shipped to listener threads (the http
        # listener reads its request-surface config from it)
        self.options = dict(options)
        # reference `tls:` block, flattened to dotted options
        # (tls.crt_file, tls.key_file, tls.ca_file, ...) — settings
        # are picklable; contexts build in the listener thread
        from vector_spark.tls import TlsSettings

        self.tls = TlsSettings.from_options(options)
        if self.tls is not None and proto == "udp":
            # the reference's socket source only offers `tls:` for
            # mode=tcp (src/sources/socket/udp.rs has no TLS either)
            raise ValueError("tls is not supported for UDP listeners")
        self.state = _ListenerState(self.wal_dir)
        self._listener_lock = threading.Lock()
        self._listening = False

    # Spark cloudpickles the reader into the prefetch runner process —
    # locks/threads/sockets can't cross; ship only the config and rebuild
    # (the unpickled side re-runs WAL recovery, which is exactly what a
    # recovery instance needs).
    def __getstate__(self) -> dict:
        return {
            "host": self.host,
            "port": self.port,
            "proto": self.proto,
            "wal_dir": self.wal_dir,
            "tls": self.tls,
            "options": self.options,
        }

    def __setstate__(self, d: dict) -> None:
        self.__dict__.update(d)
        self.state = _ListenerState(self.wal_dir)
        self._listener_lock = threading.Lock()
        self._listening = False

    def _ensure_listener(self) -> None:
        with self._listener_lock:
            if self._listening:
                return
            ready = threading.Event()
            target = {
                "tcp": _tcp_listener,
                "udp": _udp_listener,
                "http": _http_listener,
                "fluent": _fluent_listener,
                "logstash": _logstash_listener,
                "dnstap": _dnstap_listener,
                "websocket": _websocket_listener,
                "vector": _vector_listener,
                "otlp_grpc": _otlp_grpc_listener,
                "vector_grpc": _vector_grpc_listener,
            }[self.proto]
            threading.Thread(
                target=target,
                args=(self.state, self.host, self.port, ready, self.tls,
                      self.options),
                daemon=True,
            ).start()
            if not ready.wait(timeout=10):
                raise RuntimeError(
                    f"listener failed to bind {self.host}:{self.port}"
                )
            self._listening = True

    def initialOffset(self) -> dict:
        # WAL recovery may have restored entries; expose them all
        return {"seq": -1}

    def _pad(self, entries: list[tuple]) -> list[tuple]:
        """Schema migration for recovered WAL rows: the http schema
        gained a 6th column (meta) — entries written by an older WAL
        replay with the proto3-style default ("{}") instead of failing
        the restart on row arity."""
        if self.proto != "http":
            return entries
        return [e if len(e) >= 6 else (*e, "{}") for e in entries]

    def read(self, start: dict) -> tuple:
        self._ensure_listener()
        entries = self._pad(self.state.drain(start["seq"]))
        end = entries[-1][0] if entries else start["seq"]
        return iter(entries), {"seq": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure-recovery path — may run on a FRESH instance that never
        # listened: its __init__ WAL recovery holds the needed tail
        return iter(self._pad(
            self.state.drain(start["seq"], end["seq"])))

    def commit(self, end: dict) -> None:
        self.state.prune(end["seq"])


class SyslogTCPDataSource(DataSource):
    """`syslog` source analog: TCP listener + RFC6587/newline framing.
    Decode the message column downstream with parse_syslog."""

    @classmethod
    def name(cls) -> str:
        return "syslog_tcp"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "tcp")


class StatsdUDPDataSource(DataSource):
    """`statsd` source analog: UDP datagram listener, one line per metric.
    Decode downstream with the statsd codec (functions/codecs.py)."""

    @classmethod
    def name(cls) -> str:
        return "statsd_udp"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "udp")


#: `meta` carries captured headers/query parameters as a JSON object
#: (http_server.rs add_headers/add_query_parameters) — "{}" when none
#: are configured.
HTTP_SCHEMA = ("seq bigint, ts timestamp, peer string, path string,"
               " message string, meta string")


class HTTPServerDataSource(DataSource):
    """`http_server` source analog: POST bodies → events (newline lines
    or JSON-array elements); the request path rides along for routing."""

    @classmethod
    def name(cls) -> str:
        return "http_server"

    def schema(self) -> str:
        return HTTP_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "http")


class FluentDataSource(DataSource):
    """`fluent` source analog (src/sources/fluent/mod.rs): fluent forward
    protocol over TCP — msgpack Message/Forward/PackedForward modes,
    EventTime ext timestamps, chunk acks. message column carries JSON
    {"tag","timestamp","record"}; parse downstream with from_json."""

    @classmethod
    def name(cls) -> str:
        return "fluent"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "fluent")


class LogstashDataSource(DataSource):
    """`logstash` source analog (src/sources/logstash.rs): lumberjack
    v2 beats protocol — window/json/data/compressed frames, sequence
    acks. message column carries the event JSON."""

    @classmethod
    def name(cls) -> str:
        return "logstash"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "logstash")


def merge_http_meta(df, message_col: str = "message",
                    meta_col: str = "meta"):
    """Merge captured headers/query parameters (the http_server
    source's ``meta`` column) into JSON-object events with the
    reference's precedence (http_server.rs add_headers /
    add_query_parameters): a header is NOT included when the body has
    a conflicting field; a query parameter OVERRIDES the body value.
    Non-JSON-object messages pass through untouched. Arrow-batched
    (one pandas UDF, no per-row Python) — and only needed when
    captures are configured; without them ``meta`` is ``{}`` and this
    is the identity."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _merge(msg: pd.Series, meta: pd.Series) -> pd.Series:
        import json as _json

        def one(m, mt):
            if m is None:
                return None
            try:
                meta_o = _json.loads(mt) if mt else {}
            except ValueError:
                meta_o = {}
            h = meta_o.get("headers") or {}
            q = meta_o.get("query") or {}
            if not h and not q:
                return m
            try:
                body = _json.loads(m)
            except ValueError:
                return m
            if not isinstance(body, dict):
                return m
            out = {k: v for k, v in h.items() if k not in body}
            out.update(body)
            out.update(q)
            return _json.dumps(out)

        return pd.Series(
            [one(m, mt) for m, mt in zip(msg, meta)])

    return df.withColumn(
        message_col, _merge(F.col(message_col), F.col(meta_col)))


def route_http_endpoints(df, endpoints: dict[str, str]):
    """Path-route an http_server stream to per-endpoint decoders — the
    modern push-ingest shapes the reference serves from dedicated
    sources: Splunk HEC (`src/sources/splunk_hec/mod.rs`, the
    /services/collector/event contract) and OTLP/HTTP JSON
    (`src/sources/opentelemetry/http.rs`, /v1/logs).

    endpoints: {path: codec} with codec ∈ {"splunk_hec", "otlp_logs",
    "json"}. Output unified as (seq, ts, peer, path, codec, event) where
    `event` is the decoded event's JSON text (one row per event — an
    OTLP request batching many logRecords explodes into that many rows).
    Unmatched paths pass through as codec='raw'."""
    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import decode_splunk_hec

    env = ["seq", "ts", "peer", "path"]
    outs = []
    matched = None
    for path, codec in endpoints.items():
        if codec == "prometheus_pushgateway":
            # grouping labels ride in the path, so the match is a
            # PREFIX (`/metrics/job/...`), not an exact path
            cond = F.col("path").startswith(path)
        else:
            cond = F.col("path") == path
        part = df.where(cond)
        matched = cond if matched is None else (matched | cond)
        if codec == "splunk_hec":
            outs.append(
                part.select(
                    *env,
                    F.lit("splunk_hec").alias("codec"),
                    F.to_json(decode_splunk_hec(F.col("message"))).alias("event"),
                )
            )
        elif codec == "otlp_logs":
            v = part.select(*env, F.parse_json("message").alias("v"))
            rl = v.select(
                *env,
                F.explode(
                    F.try_variant_get("v", "$.resourceLogs", "array<variant>")
                ).alias("rl"),
            )
            sl = rl.select(
                *env,
                F.explode(
                    F.try_variant_get("rl", "$.scopeLogs", "array<variant>")
                ).alias("sl"),
            )
            lr = sl.select(
                *env,
                F.explode(
                    F.try_variant_get("sl", "$.logRecords", "array<variant>")
                ).alias("r"),
            )
            outs.append(
                lr.select(
                    *env,
                    F.lit("otlp_logs").alias("codec"),
                    F.to_json(F.col("r")).alias("event"),
                )
            )
        elif codec == "otlp_logs_protobuf":
            # OTLP/HTTP protobuf (opentelemetry/http.rs with
            # content-type application/x-protobuf): the listener stored
            # the raw body base64'd in one message row; decode with the
            # pure-Python wire codec, one output row per logRecord.
            # Arrow-batched pandas UDF returns a JSON-ARRAY string →
            # from_json → explode keeps the fan-out in the plan.
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def dec_otlp(s: pd.Series) -> pd.Series:
                import base64
                import json as _json

                from vector_spark.functions.protowire import (
                    decode_otlp_logs,
                )

                def one(b64):
                    try:
                        return _json.dumps(
                            [
                                _json.dumps(r)
                                for r in decode_otlp_logs(
                                    base64.b64decode(b64)
                                )
                            ]
                        )
                    except Exception:
                        return "[]"

                return s.map(one)

            recs = part.select(
                *env,
                F.explode(
                    F.from_json(
                        dec_otlp(F.col("message")), "array<string>"
                    )
                ).alias("event"),
            )
            outs.append(
                recs.select(
                    *env,
                    F.lit("otlp_logs_protobuf").alias("codec"),
                    "event",
                )
            )
        elif codec in ("datadog_sketches", "datadog_series_v2"):
            # datadog-agent protobuf intake (src/sources/datadog_agent/
            # metrics.rs decode_ddsketch / the v2 MetricPayload;
            # proto/vector/dd_metric.proto): binary body base64'd by the
            # listener, decoded with the pure-Python wire codec — one
            # row per dogsketch / per series point.
            from pyspark.sql.functions import pandas_udf

            fn_name = (
                "decode_datadog_sketches"
                if codec == "datadog_sketches"
                else "decode_datadog_metric_payload"
            )

            @pandas_udf("string")
            def dec_dd(s: pd.Series) -> pd.Series:
                import base64
                import json as _json

                from vector_spark.functions import protowire

                decode = getattr(protowire, fn_name)

                def one(b64):
                    try:
                        return _json.dumps(
                            [_json.dumps(r)
                             for r in decode(base64.b64decode(b64))]
                        )
                    except Exception:
                        return "[]"

                return s.map(one)

            recs = part.select(
                *env,
                F.explode(
                    F.from_json(dec_dd(F.col("message")),
                                "array<string>")
                ).alias("event"),
            )
            outs.append(
                recs.select(
                    *env, F.lit(codec).alias("codec"), "event",
                )
            )
        elif codec == "heroku_logs":
            # Heroku Logplex drain (src/sources/heroku_logs.rs
            # line_to_events): body lines are octet-prefixed syslog-ish
            # frames `<len> <pri>ver ts host app proc msgid message`;
            # pure-Column split + regexp, one event per line.
            lines = part.select(
                *env,
                F.explode(
                    F.filter(
                        F.split(F.col("message"), r"\n"),
                        lambda x: x != "",
                    )
                ).alias("line"),
            )
            pat = r"^\d+ <\d+>\d* (\S+) (\S+) (\S+) (\S+) \S+ (.*)$"
            outs.append(
                lines.select(
                    *env,
                    F.lit("heroku_logs").alias("codec"),
                    F.to_json(
                        F.struct(
                            F.regexp_extract("line", pat, 1).alias("timestamp"),
                            F.regexp_extract("line", pat, 2).alias("host"),
                            F.regexp_extract("line", pat, 3).alias("app_name"),
                            F.regexp_extract("line", pat, 4).alias("proc_id"),
                            F.regexp_extract("line", pat, 5).alias("message"),
                        )
                    ).alias("event"),
                )
            )
        elif codec == "datadog_logs":
            # datadog-agent log intake (src/sources/datadog_agent/
            # logs.rs decode_log_body): the body is a JSON ARRAY of log
            # objects {message, status, timestamp, hostname, service,
            # ddsource, ddtags} — one event per object, fields passed
            # through (the reference copies them onto the event log).
            v = part.select(*env, F.parse_json("message").alias("v"))
            items = v.select(
                *env,
                F.explode(
                    F.try_variant_get("v", "$", "array<variant>")
                ).alias("r"),
            )
            outs.append(
                items.select(
                    *env,
                    F.lit("datadog_logs").alias("codec"),
                    F.to_json(F.col("r")).alias("event"),
                )
            )
        elif codec == "datadog_series":
            # datadog-agent v1 metrics intake (src/sources/
            # datadog_agent/metrics.rs decode_datadog_series_v1):
            # {"series": [{metric, type, interval?, host?, points:
            # [[ts, value], ...], tags?}]} — one metric event per POINT,
            # the series fields repeated (exactly the reference's
            # into_vector_metric fan-out).
            v = part.select(*env, F.parse_json("message").alias("v"))
            series = v.select(
                *env,
                F.explode(
                    F.try_variant_get("v", "$.series", "array<variant>")
                ).alias("s"),
            )
            points = series.select(
                *env,
                "s",
                F.explode(
                    F.try_variant_get(
                        "s", "$.points", "array<array<double>>"
                    )
                ).alias("p"),
            )
            outs.append(
                points.select(
                    *env,
                    F.lit("datadog_series").alias("codec"),
                    F.to_json(
                        F.struct(
                            F.try_variant_get(
                                "s", "$.metric", "string"
                            ).alias("metric"),
                            F.try_variant_get(
                                "s", "$.type", "string"
                            ).alias("type"),
                            F.try_variant_get(
                                "s", "$.host", "string"
                            ).alias("host"),
                            F.try_variant_get(
                                "s", "$.interval", "long"
                            ).alias("interval"),
                            F.try_variant_get(
                                "s", "$.tags", "array<string>"
                            ).alias("tags"),
                            F.col("p")[0].cast("long").alias("timestamp"),
                            F.col("p")[1].alias("value"),
                        )
                    ).alias("event"),
                )
            )
        elif codec == "aws_kinesis_firehose":
            # Kinesis Firehose HTTP destination (src/sources/
            # aws_kinesis_firehose/): JSON body {requestId, timestamp,
            # records: [{data: base64(, gzip'd) bytes}]}; each record's
            # decoded bytes split on newlines, one event per line (the
            # CloudWatch Logs subscription shape gunzips transparently).
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def dec_fh(s: pd.Series) -> pd.Series:
                import base64
                import gzip
                import json as _json

                def one(body):
                    try:
                        req = _json.loads(body)
                        events = []
                        for rec in req.get("records", []):
                            raw = base64.b64decode(rec.get("data", ""))
                            if raw[:2] == b"\x1f\x8b":
                                raw = gzip.decompress(raw)
                            for line in raw.decode("utf-8", "replace").splitlines():
                                if line.strip():
                                    events.append(
                                        _json.dumps(
                                            {
                                                "message": line,
                                                "request_id": req.get("requestId"),
                                            }
                                        )
                                    )
                        return _json.dumps(events)
                    except Exception:
                        return "[]"

                return s.map(one)

            outs.append(
                part.select(
                    *env,
                    F.explode(
                        F.from_json(dec_fh(F.col("message")), "array<string>")
                    ).alias("event"),
                ).select(
                    *env,
                    F.lit("aws_kinesis_firehose").alias("codec"),
                    "event",
                )
            )
        elif codec == "prometheus_pushgateway":
            # pushgateway intake (src/sources/prometheus/pushgateway.rs):
            # text-exposition lines POSTed under /metrics/job/...; the
            # path's grouping labels override same-named body labels.
            # POST-only and text-only like the reference; comment lines
            # and invalid grouping paths drop. aggregate_metrics stays
            # out of scope (needs per-family TYPE state the line codec
            # deliberately doesn't track); the reference defaults it
            # off, so default behavior matches.
            from vector_spark.functions.codecs import (
                decode_pushgateway_event,
            )

            ev = decode_pushgateway_event(F.col("path"),
                                          F.col("message"))
            outs.append(
                part.where(~F.col("message").startswith("#"))
                .select(*env, ev.alias("m"))
                .where(
                    F.col("m.name").isNotNull()
                    & (F.col("m.name") != "")
                    & F.col("m.labels").isNotNull()
                )
                .select(
                    *env,
                    F.lit("prometheus_pushgateway").alias("codec"),
                    F.to_json(F.col("m")).alias("event"),
                )
            )
        elif codec == "prometheus_remote_write":
            # prometheus remote_write (src/sources/prometheus/
            # remote_write.rs): snappy-compressed WriteRequest protobuf,
            # decoded with the pure-Python snappy + wire codecs — one
            # output row per sample, labels flattened into the event.
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def dec_rw(s: pd.Series) -> pd.Series:
                import base64
                import json as _json

                from vector_spark.functions.protowire import (
                    decode_prometheus_write_request,
                )
                from vector_spark.functions.snappy import decompress

                def one(b64):
                    try:
                        rows = decode_prometheus_write_request(
                            decompress(base64.b64decode(b64))
                        )
                        return _json.dumps(
                            [_json.dumps(r) for r in rows]
                        )
                    except Exception:
                        return "[]"

                return s.map(one)

            outs.append(
                part.select(
                    *env,
                    F.explode(
                        F.from_json(dec_rw(F.col("message")), "array<string>")
                    ).alias("event"),
                ).select(
                    *env,
                    F.lit("prometheus_remote_write").alias("codec"),
                    "event",
                )
            )
        elif codec == "json":
            outs.append(
                part.select(
                    *env, F.lit("json").alias("codec"),
                    F.col("message").alias("event"),
                )
            )
        else:
            raise ValueError(f"http_server endpoint codec {codec!r}")
    rest = df.where(~matched if matched is not None else F.lit(True)).select(
        *env, F.lit("raw").alias("codec"), F.col("message").alias("event")
    )
    out = rest
    for o in outs:
        out = out.unionByName(o)
    return out


class DnstapDataSource(DataSource):
    """`dnstap` source analog (src/sources/dnstap/ TCP mode): Frame
    Streams handshake + dnstap protobuf + DNS wire parse, all
    pure-Python (functions/dnstap.py). message column carries the parsed
    event JSON; parse downstream with from_json or the JSON bridge."""

    @classmethod
    def name(cls) -> str:
        return "dnstap"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "dnstap")


class WebsocketDataSource(DataSource):
    """`websocket` server source (src/sources/websocket/): RFC 6455
    handshake + frame decode, pure stdlib. Text frames surface verbatim
    in the message column, binary frames base64'd."""

    @classmethod
    def name(cls) -> str:
        return "websocket"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "websocket")


class VectorDataSource(DataSource):
    """`vector` source analog (src/sources/vector/): length-prefixed
    native EventWrapper protobuf frames over TCP. message column carries
    the decoded event's JSON."""

    @classmethod
    def name(cls) -> str:
        return "vector"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "vector")


class OtlpGrpcDataSource(DataSource):
    """`opentelemetry` gRPC mode analog: HTTP/2 listener decoding
    ExportLogsServiceRequest frames (one JSON record per message)."""

    @classmethod
    def name(cls) -> str:
        return "otlp_grpc"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "otlp_grpc")


class VectorGrpcDataSource(DataSource):
    """vector-native v2 gRPC listener (PushEvents)."""

    @classmethod
    def name(cls) -> str:
        return "vector_grpc"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "vector_grpc")


def register_sources(spark) -> None:
    """Register the wire-protocol sources on a session (idempotent)."""
    spark.dataSource.register(SyslogTCPDataSource)
    spark.dataSource.register(StatsdUDPDataSource)
    spark.dataSource.register(HTTPServerDataSource)
    spark.dataSource.register(FluentDataSource)
    spark.dataSource.register(LogstashDataSource)
    spark.dataSource.register(DnstapDataSource)
    spark.dataSource.register(WebsocketDataSource)
    spark.dataSource.register(VectorDataSource)
    spark.dataSource.register(OtlpGrpcDataSource)
    spark.dataSource.register(VectorGrpcDataSource)
