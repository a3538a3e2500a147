"""Shared machinery for the wire-protocol server sources
(split out of sources.py in r11 — see that module's docstring for the
architecture: driver-side listeners behind the Python DataSource API,
WAL-backed delivery, TLS per connection).

Here: the RFC6587 framer, the listener WAL/state, the shared TCP/UDP
accept loops, the offset/commit stream reader, and the syslog/statsd
DataSources (src/sources/syslog.rs:45, src/sources/statsd/mod.rs).
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


def _unix_stream_listener(state: _ListenerState, host: str, port: int,
                          ready: threading.Event, tls=None,
                          options=None):
    """socket source `mode: unix` / `mode: unix_stream`
    (src/sources/socket/unix.rs): newline/octet-framed events over an
    AF_UNIX stream socket at `path` (the reference forwards syslog
    over /dev/log-style sockets this way). host/port are unused —
    the path rides in options."""
    import os as _os

    path = (options or {}).get("path")
    if not path:
        raise ValueError("unix mode needs a 'path' option")
    try:
        _os.unlink(path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
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
                        state.append(path, frame)

    while True:
        conn, _addr = srv.accept()
        threading.Thread(
            target=handle, args=(conn, path), daemon=True
        ).start()


def _unix_datagram_listener(state: _ListenerState, host: str, port: int,
                            ready: threading.Event, tls=None,
                            options=None):
    """socket source `mode: unix_datagram` (socket/unix.rs): one event
    per datagram (newline-split, the UDP shape) on an AF_UNIX dgram
    socket."""
    import os as _os

    path = (options or {}).get("path")
    if not path:
        raise ValueError("unix_datagram mode needs a 'path' option")
    try:
        _os.unlink(path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    srv.bind(path)
    ready.set()
    while True:
        data = srv.recv(65536)
        for line in data.decode("utf-8", "replace").splitlines():
            if line.strip():
                state.append(path, line.strip())


def _udp_listener(state: _ListenerState, host: str, port: int,
                  ready: threading.Event, tls=None, options=None):
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    # IPv4 multicast groups (socket/udp.rs:46-75 multicast_groups /
    # multicast_interface): join each group on bind; to receive
    # multicast the listening address should be 0.0.0.0 (the
    # reference's own note — a unicast bind filters group traffic out)
    groups = [g.strip() for g in str(
        (options or {}).get("multicast_groups", "")).split(",")
        if g.strip()]
    if groups:
        iface = (options or {}).get("multicast_interface", "0.0.0.0")
        for g in groups:
            mreq = socket.inet_aton(g) + socket.inet_aton(iface)
            srv.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP,
                           mreq)
    ready.set()
    while True:
        data, addr = srv.recvfrom(65536)
        peer = f"{addr[0]}:{addr[1]}"
        # statsd: datagram may carry several newline-separated lines
        for line in data.decode("utf-8", "replace").splitlines():
            if line.strip():
                state.append(peer, line.strip())



class _SocketStreamReader(SimpleDataSourceStreamReader):
    """Spark may instantiate the reader more than once (planning vs the
    prefetch loop), but only ONE instance drives read() — so the listener
    socket binds lazily on the first read() call, never in __init__.
    Recovery instances only see readBetweenOffsets, served from the WAL."""

    def __init__(self, options: dict, proto: str) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 0) or 0)
        if not self.port and proto not in ("unix_stream", "unix_datagram"):
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
            # lazy imports: the http/wire listener families live in
            # sibling modules that import THIS one (r11 split) — the
            # dispatch resolves at first use, not at module import
            if self.proto in ("tcp", "udp", "unix_stream",
                              "unix_datagram"):
                target = {
                    "tcp": _tcp_listener,
                    "udp": _udp_listener,
                    "unix_stream": _unix_stream_listener,
                    "unix_datagram": _unix_datagram_listener,
                }[self.proto]
            elif self.proto == "http":
                from vector_spark.sources_http import _http_listener
                target = _http_listener
            else:
                from vector_spark import sources_wire as _w
                target = {
                    "fluent": _w._fluent_listener,
                    "logstash": _w._logstash_listener,
                    "dnstap": _w._dnstap_listener,
                    "websocket": _w._websocket_listener,
                    "vector": _w._vector_listener,
                    "otlp_grpc": _w._otlp_grpc_listener,
                    "vector_grpc": _w._vector_grpc_listener,
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


class UnixSocketDataSource(DataSource):
    """socket source `mode: unix_stream` / `unix_datagram`
    (src/sources/socket/unix.rs): AF_UNIX listener at option `path`;
    stream mode frames like the TCP path (RFC6587/newline auto),
    datagram mode splits each datagram into lines like UDP."""

    @classmethod
    def name(cls) -> str:
        return "unix_socket"

    def schema(self) -> str:
        return SOCKET_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        mode = str(self.options.get("mode", "unix_stream"))
        if mode == "unix":
            mode = "unix_stream"
        if mode not in ("unix_stream", "unix_datagram"):
            raise ValueError(f"unix_socket: unknown mode {mode!r}")
        return _SocketStreamReader(self.options, mode)


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


