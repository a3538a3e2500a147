"""Framed wire-protocol source families (split out of sources.py in
r11): fluent (msgpack forward), logstash (beats/lumberjack v2), dnstap
(frame streams), websocket, vector-native (length-prefixed proto), and
the gRPC-backed OTLP/vector-v2 sources. Each listener shares the
accept/WAL machinery in sources_core.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import threading
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource
from pyspark.sql.types import StructType

from vector_spark.sources_core import (
    SOCKET_SCHEMA,
    _ListenerState,
    _SocketStreamReader,
    _accept_forever,
    _tcp_listener,
)

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


