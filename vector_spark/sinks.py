"""Key-templated partitioned file sink.

Reference: vector's `KeyPartitioner` (`src/sinks/util/partitioner.rs:60-81`)
renders a template (`src/template/mod.rs`) per event and groups the batch
by the rendered key — one object per key per batch, e.g. the S3 sink's
`key_prefix: logs/{{ host }}/dt=%F/`. Events whose template fails to
render (missing field) are dropped with an error.

Spark-first execution — exact layout without per-key jobs:
1. the path template compiles to Columns (`functions/template.py`), so key
   rendering is JVM-side codegen, and
2. ONE ``partitionBy`` write produces all keys in a single job (Spark's
   dynamic partitioning IS the group-by-key), then
3. a driver-side rename pass strips the ``_kN=`` Hive prefixes to give the
   verbatim rendered layout. Renames are metadata ops, O(#distinct keys) —
   bounded by key cardinality, never by data size, so the pass stays cheap
   at 100 TB (a sink with millions of distinct keys is misconfigured in
   the reference too: one object per key per batch).
"""

from __future__ import annotations

import os
from urllib.parse import unquote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.functions.template import template_path_segments

_KEY_PREFIX = "_k"


def _strip_hive_prefixes(root: str, depth: int) -> None:
    """Rename ``_k0=a/_k1=b`` dirs to ``a/b`` (unescaping Hive %XX)."""
    if depth == 0:
        return
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        if not os.path.isdir(full) or "=" not in entry:
            continue
        _strip_hive_prefixes(full, depth - 1)
        value = unquote(entry.split("=", 1)[1])
        # a rendered value containing "/" nests further dirs, like the
        # reference's verbatim key concatenation. Key values are event
        # data: strip empty / "." / ".." segments so a malicious field
        # can't traverse outside base_path during the rename pass.
        segs = [s for s in value.split("/") if s not in ("", ".", "..")]
        target = os.path.join(root, *(segs or ["_invalid_key"]))
        os.makedirs(os.path.dirname(target), exist_ok=True)
        if os.path.isdir(target):
            # merge (append mode writing an existing key): move children
            for child in os.listdir(full):
                os.rename(os.path.join(full, child), os.path.join(target, child))
            os.rmdir(full)
        else:
            os.rename(full, target)


def write_templated(
    df: DataFrame,
    base_path: str,
    path_template: str,
    fmt: str = "parquet",
    ts_col: str = "ts",
    mode: str = "overwrite",
    options: dict | None = None,
) -> dict:
    """Write ``df`` under ``base_path`` laid out by ``path_template``.

    Returns ``{"path": ..., "dropped": n}`` where ``dropped`` counts rows
    whose template failed to render (NULL key — the reference's
    MissingKeys drop, `template/mod.rs` TemplateRenderingError).
    """
    static_prefix, seg_cols = template_path_segments(path_template, ts_col=ts_col)
    root = os.path.join(base_path, static_prefix) if static_prefix else base_path
    if not seg_cols:
        df.write.mode(mode).format(fmt).save(root)
        return {"path": root, "dropped": 0}

    key_names = [f"{_KEY_PREFIX}{i}" for i in range(len(seg_cols))]
    keyed = df.select(
        "*", *[c.alias(n) for c, n in zip(seg_cols, key_names)]
    )
    render_ok = F.lit(True)
    for n in key_names:
        render_ok = render_ok & F.col(n).isNotNull()
    good = keyed.where(render_ok)
    dropped = keyed.where(~render_ok).count()

    writer = good.write.mode(mode).format(fmt).partitionBy(*key_names)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(root)
    _strip_hive_prefixes(root, len(key_names))
    return {"path": root, "dropped": dropped}


def templated_stream_sink(
    df: DataFrame,
    base_path: str,
    path_template: str,
    checkpoint: str,
    fmt: str = "parquet",
    ts_col: str = "ts",
    trigger_secs: int = 1,
    options: dict | None = None,
):
    """Streaming counterpart: per micro-batch, one partitioned write +
    rename pass inside ``foreachBatch`` (the batch ≈ the reference's sink
    batch; the checkpointed epoch gives the end-to-end-ack analog)."""

    def _handle(batch_df: DataFrame, epoch_id: int) -> None:
        write_templated(
            batch_df,
            base_path,
            path_template,
            fmt=fmt,
            ts_col=ts_col,
            mode="append",
            options=options,
        )

    return (
        df.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


# ---- push sinks: http / socket / prometheus exporter --------------------
# Reference: `src/sinks/http/`, `src/sinks/socket.rs`,
# `src/sinks/prometheus/exporter.rs`. Spark shape: encode rows to lines
# JVM-side (to_json / the codec layer), then push per PARTITION from the
# executors — connections are per-partition, batching is per-partition
# chunks, and nothing funnels through the driver.


def _rows_to_lines(df: DataFrame, encoding: str, value_col: str) -> DataFrame:
    if encoding == "json":
        return df.select(F.to_json(F.struct(*df.columns)).alias("line"))
    if encoding == "text":
        return df.select(F.col(value_col).cast("string").alias("line"))
    raise ValueError(f"unknown encoding {encoding!r}")


def http_sink(
    df: DataFrame,
    url: str,
    encoding: str = "json",
    value_col: str = "message",
    batch_max_events: int = 500,
    batch_max_bytes: int = 10_000_000,
    timeout_secs: float = 10.0,
    content_type: str = "application/x-ndjson",
    concurrency: int | str | None = None,
    headers: dict[str, str] | None = None,
) -> int:
    """POST newline-batched events to `url` from each partition
    (src/sinks/http/config.rs; batch limits src/sinks/util/batch.rs)
    through the shared transport — default retry policy, optional
    `concurrency="adaptive"` ARC pipelining (request.concurrency).
    Returns the number of events sent (spark-side count).

    `uri` and `request.headers` accept event templates ({{ field }} —
    the reference landed this in the 0.49 window, release notes
    "Templating landed on the http sink's uri and request.headers").
    Templates render JVM-side per event; batches group by the rendered
    (uri, headers) key within each partition, so one request carries
    one destination. A null render (missing field) drops the event,
    the reference's MissingKeys contract."""
    from vector_spark.functions.template import template_column
    from vector_spark.sinks_services import _post_lines_per_partition

    user_headers = dict(headers or {})
    tmpl_hdrs = {k: v for k, v in user_headers.items() if "{{" in str(v)}
    if "{{" not in url and not tmpl_hdrs:
        lines = _rows_to_lines(df, encoding, value_col)
        return _post_lines_per_partition(
            lines.select(F.col("line")), url,
            {"Content-Type": content_type, **user_headers},
            batch_max_events, batch_max_bytes, timeout_secs,
            suffix=b"\n", concurrency=concurrency,
        )

    line_expr = (
        F.to_json(F.struct(*df.columns)) if encoding == "json"
        else F.col(value_col).cast("string")
    )
    hdr_keys = sorted(tmpl_hdrs)
    rendered = df.select(
        line_expr.alias("line"),
        (template_column(url) if "{{" in url else F.lit(url)).alias("_uri"),
        *[template_column(tmpl_hdrs[k]).alias(f"_h_{j}")
          for j, k in enumerate(hdr_keys)],
    )
    static_hdrs = {
        "Content-Type": content_type,
        **{k: v for k, v in user_headers.items() if k not in tmpl_hdrs},
    }
    sent = df.sparkSession.sparkContext.accumulator(0)
    from vector_spark.sinks_services import (
        _http_send_with_retry,
        _proxy_for,
    )

    proxy_by_uri: dict = {}

    def send_partition(rows) -> None:
        # per-destination buffers: key = (uri, rendered header values)
        buffers: dict[tuple, list[bytes]] = {}
        sizes: dict[tuple, int] = {}

        def flush(key) -> None:
            uri = key[0]
            hdrs = dict(static_hdrs)
            for k, v in zip(hdr_keys, key[1:]):
                hdrs[k] = v
            body = b"\n".join(buffers[key]) + b"\n"
            n = len(buffers[key])
            if uri not in proxy_by_uri:
                proxy_by_uri[uri] = _proxy_for(uri)
            _http_send_with_retry(uri, body, hdrs, timeout_secs,
                                  3, 0.2, proxy_by_uri[uri])
            sent.add(n)
            del buffers[key], sizes[key]

        for row in rows:
            if row["_uri"] is None or any(
                row[f"_h_{j}"] is None for j in range(len(hdr_keys))
            ):
                continue  # render error: drop (MissingKeys)
            key = (row["_uri"],) + tuple(
                row[f"_h_{j}"] for j in range(len(hdr_keys)))
            b = row["line"].encode()
            buf = buffers.setdefault(key, [])
            if buf and (
                len(buf) >= batch_max_events
                or sizes[key] + len(b) > batch_max_bytes
            ):
                flush(key)
                buf = buffers.setdefault(key, [])
            buf.append(b)
            sizes[key] = sizes.get(key, 0) + len(b)
        for key in list(buffers):
            flush(key)

    rendered.foreachPartition(send_partition)
    return sent.value


def socket_sink(
    df: DataFrame,
    host: str,
    port: int,
    encoding: str = "text",
    value_col: str = "message",
    timeout_secs: float = 10.0,
    tls=None,
) -> int:
    """Newline-framed TCP push, one connection per partition
    (src/sinks/socket.rs). ``tls`` (a TlsSettings) wraps each
    partition's outbound connection — the reference's `tls:` block on
    the socket sink (settings.rs via sinks/util/service/net); settings
    are picklable, the SSLContext builds executor-side."""
    lines = _rows_to_lines(df, encoding, value_col)

    def send_partition(rows) -> None:
        import socket as _socket

        first = True
        sock = None
        try:
            for row in rows:
                if first:
                    sock = _socket.create_connection(
                        (host, port), timeout=timeout_secs
                    )
                    if tls is not None:
                        sock = tls.wrap_client_connection(sock, host)
                    first = False
                sock.sendall((row["line"] + "\n").encode())
        finally:
            if sock is not None:
                sock.close()

    sent = df.sparkSession.sparkContext.accumulator(0)

    def send_and_count(rows) -> None:
        n = 0

        def counting(it):
            nonlocal n
            for r in it:
                n += 1
                yield r

        send_partition(counting(rows))
        sent.add(n)

    lines.foreachPartition(send_and_count)
    return sent.value


def prometheus_exporter_sink(
    df: DataFrame,
    path: str,
    name_col: str = "name",
    value_col: str = "value",
    tags_col: str = "tags",
) -> int:
    """Render metric rows in the text exposition format to a .prom file
    (src/sinks/prometheus/exporter.rs; the file form is the node-exporter
    textfile-collector convention — an HTTP exporter would serve the same
    bytes). One text-file write job, no driver collect."""
    from vector_spark.functions.codecs import encode_prometheus_line_map

    lines = df.select(
        encode_prometheus_line_map(
            F.col(name_col), F.col(tags_col), F.col(value_col)
        ).alias("value")
    )
    count = lines.count()
    lines.coalesce(1).write.mode("overwrite").text(path)
    return count


def http_stream_sink(
    df: DataFrame,
    url: str,
    checkpoint: str,
    encoding: str = "json",
    value_col: str = "message",
    trigger_secs: int = 1,
    buffer=None,
    data_dir: str | None = None,
    sink_name: str = "http",
):
    """Streaming http sink: per-micro-batch POST via foreachBatch (the
    checkpointed epoch is the delivery unit, as with the other sinks).

    ``buffer`` (a BufferConfig) puts the reference's bounded sink
    buffer between the trigger and the POST: when_full block /
    drop_newest / overflow-to-disk (streaming/buffer.py). The query
    object gains a ``sink_buffer`` attribute carrying the counters."""

    def _handle(batch_df: DataFrame, epoch_id: int) -> None:
        http_sink(batch_df, url, encoding=encoding, value_col=value_col)

    buf = None
    if buffer is not None and buffer.stages:
        from vector_spark.streaming.buffer import buffered_handler

        _handle, buf = buffered_handler(_handle, buffer, data_dir,
                                        sink_name)
    q = (
        df.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )
    q.sink_buffer = buf
    return q


def websocket_sink(
    df: DataFrame,
    host: str,
    port: int,
    path: str = "/",
    encoding: str = "text",
    value_col: str = "message",
    timeout_secs: float = 10.0,
    tls=None,
) -> int:
    """WebSocket client push (src/sinks/websocket/): RFC 6455 handshake
    + one MASKED text frame per event (client frames must mask, §5.3),
    one connection per partition — pure stdlib, same distribution shape
    as socket_sink."""
    lines = _rows_to_lines(df, encoding, value_col)

    def send_partition(rows) -> None:
        import base64 as _b64
        import hashlib as _hashlib
        import os as _os
        import socket as _socket
        import struct as _struct

        sock = None
        try:
            for row in rows:
                if sock is None:
                    sock = _socket.create_connection(
                        (host, port), timeout=timeout_secs
                    )
                    if tls is not None:  # wss:// — reference ws sink tls:
                        sock = tls.wrap_client_connection(sock, host)
                    key = _b64.b64encode(_os.urandom(16)).decode()
                    sock.sendall(
                        (
                            f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
                            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                            f"Sec-WebSocket-Key: {key}\r\n"
                            "Sec-WebSocket-Version: 13\r\n\r\n"
                        ).encode()
                    )
                    resp = b""
                    while b"\r\n\r\n" not in resp:
                        chunk = sock.recv(4096)
                        if not chunk:
                            raise ConnectionError("ws handshake failed")
                        resp += chunk
                    if b" 101 " not in resp.split(b"\r\n", 1)[0]:
                        raise ConnectionError("ws upgrade refused")
                    want = _b64.b64encode(
                        _hashlib.sha1(
                            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
                        ).digest()
                    )
                    assert want in resp, "bad Sec-WebSocket-Accept"
                payload = row["line"].encode()
                mask = _os.urandom(4)
                ln = len(payload)
                hdr = b"\x81"  # FIN + text
                if ln < 126:
                    hdr += bytes([0x80 | ln])
                elif ln < 65536:
                    hdr += bytes([0x80 | 126]) + _struct.pack(">H", ln)
                else:
                    hdr += bytes([0x80 | 127]) + _struct.pack(">Q", ln)
                sock.sendall(
                    hdr
                    + mask
                    + bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
                )
        finally:
            if sock is not None:
                try:  # clean close frame
                    sock.sendall(b"\x88\x80" + b"\x00\x00\x00\x00")
                except OSError:
                    pass
                sock.close()

    sent = df.sparkSession.sparkContext.accumulator(0)

    def send_and_count(rows) -> None:
        n = 0

        def counting(it):
            nonlocal n
            for r in it:
                n += 1
                yield r

        send_partition(counting(rows))
        sent.add(n)

    lines.foreachPartition(send_and_count)
    return sent.value


class WebsocketServerSink:
    """The reference's `websocket_server` sink
    (src/sinks/websocket_server/config.rs:20-26): LISTEN on an address
    and broadcast every event as an RFC 6455 text frame to each
    connected subscriber.

    Spark adaptation (documented): the reference is a single long-lived
    process, so its broadcast fan-out has exactly one listener socket.
    Here the server runs DRIVER-side and `broadcast(df)` streams rows
    through `toLocalIterator()` — a deliberate tap/debug surface (the
    same role as the reference's `vector tap`), NOT a bulk egress path;
    bulk delivery to another system is what the client-mode
    `websocket_sink` / socket/kafka sinks are for. One partition is
    fetched at a time, so driver memory stays bounded."""

    _WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import socket as _socket
        import threading as _threading

        self._clients: list = []
        self._lock = _threading.Lock()
        self.client_connected = _threading.Event()
        self._srv = _socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self._stop = _threading.Event()
        _threading.Thread(target=self._accept_loop,
                          daemon=True).start()

    def _accept_loop(self) -> None:
        import base64 as _b64
        import hashlib as _hashlib

        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                req = b""
                while b"\r\n\r\n" not in req:
                    chunk = conn.recv(4096)
                    if not chunk:
                        raise ConnectionError
                    req += chunk
                key = None
                for line in req.split(b"\r\n"):
                    if line.lower().startswith(b"sec-websocket-key:"):
                        key = line.split(b":", 1)[1].strip().decode()
                if key is None:
                    conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                    conn.close()
                    continue
                accept = _b64.b64encode(_hashlib.sha1(
                    (key + self._WS_GUID).encode()).digest()).decode()
                conn.sendall((
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
                ).encode())
                with self._lock:
                    self._clients.append(conn)
                self.client_connected.set()
            except (OSError, ConnectionError):
                conn.close()

    @staticmethod
    def _frame(payload: bytes) -> bytes:
        import struct as _struct

        hdr = b"\x81"  # FIN + text; server frames are unmasked (§5.1)
        ln = len(payload)
        if ln < 126:
            hdr += bytes([ln])
        elif ln < 65536:
            hdr += bytes([126]) + _struct.pack(">H", ln)
        else:
            hdr += bytes([127]) + _struct.pack(">Q", ln)
        return hdr + payload

    def broadcast(self, df: DataFrame, encoding: str = "json",
                  value_col: str = "message") -> int:
        lines = _rows_to_lines(df, encoding, value_col)
        n = 0
        for row in lines.toLocalIterator():
            frame = self._frame(row["line"].encode())
            dead = []
            with self._lock:
                for conn in self._clients:
                    try:
                        conn.sendall(frame)
                    except OSError:
                        dead.append(conn)
                for conn in dead:
                    self._clients.remove(conn)
                    conn.close()
            n += 1
        return n

    def close(self) -> None:
        self._stop.set()
        with self._lock:
            for conn in self._clients:
                try:
                    conn.sendall(b"\x88\x00")  # close frame
                except OSError:
                    pass
                conn.close()
            self._clients.clear()
        self._srv.close()


def vector_sink(
    df: DataFrame,
    host: str,
    port: int,
    timeout_secs: float = 10.0,
    version: int = 1,
    batch_max_events: int = 1000,
    tls=None,
    endpoints: list | None = None,
    strategy: str = "load_balance",
) -> int:
    """vector-to-vector native push (src/sinks/vector/).

    ``version=1``: each event row becomes a native EventWrapper
    protobuf frame (functions/protowire.py) with a 4-byte BE length
    prefix, one TCP connection per partition — the v1 wire shape a
    `vector` TCP source consumes.

    ``version=2`` (the reference's current protocol, config.rs V2):
    rows batch into PushEventsRequest protobufs sent as gRPC
    `/vector.Vector/PushEvents` calls over the repo's HTTP/2 client —
    the exact service our vector_grpc SOURCE serves, so the two halves
    pin each other; ``tls`` wraps the client connection.

    ``endpoints`` + ``strategy`` (v2 only) mirror the reference's
    multi-endpoint routing (src/sinks/vector/config.rs:328-357
    EndpointStrategy): ``load_balance`` rotates healthy endpoints per
    batch with failed ones backed off; ``failover`` sticks to the
    last working endpoint and advances on failure; ``failover_primary``
    re-tries from the FIRST configured endpoint on every failure so
    the sink converges back to its primary."""
    if version == 2:
        eps = [tuple(e) for e in (endpoints or [(host, port)])]
        return _vector_sink_v2(df, eps, strategy, timeout_secs,
                               batch_max_events, tls)
    sent = df.sparkSession.sparkContext.accumulator(0)
    cols = df.columns

    def send_partition(rows) -> None:
        import socket as _socket
        import struct as _struct

        from vector_spark.functions.protowire import encode_vector_log

        sock = None
        n = 0
        try:
            for row in rows:
                if sock is None:
                    sock = _socket.create_connection(
                        (host, port), timeout=timeout_secs
                    )
                payload = encode_vector_log(
                    {c: row[c] for c in cols if row[c] is not None}
                )
                sock.sendall(_struct.pack(">I", len(payload)) + payload)
                n += 1
        finally:
            if sock is not None:
                sock.close()
        sent.add(n)

    df.foreachPartition(send_partition)
    return sent.value


def _vector_sink_v2(df: DataFrame, endpoints: list, strategy: str,
                    timeout_secs: float, batch_max_events: int,
                    tls) -> int:
    if strategy not in ("load_balance", "failover", "failover_primary"):
        raise ValueError(f"vector sink: unknown strategy {strategy!r}")
    sent = df.sparkSession.sparkContext.accumulator(0)
    cols = df.columns

    def send_partition(rows) -> None:
        from vector_spark.functions.protowire import (
            encode_vector_log,
            write_len_delim,
        )
        from vector_spark.sources_grpc import grpc_unary_call

        batch: list[bytes] = []
        n = 0
        # per-partition routing state: active index (failover modes),
        # rotation counter + backoff (load_balance). Backed-off
        # endpoints sit out `backoff_batches` flushes before reprobe.
        state = {"active": 0, "rr": 0}
        cooldown: dict[int, int] = {}
        backoff_batches = 8

        def _try(idx: int, req: bytes) -> bool:
            host, port = endpoints[idx]
            try:
                status, _body = grpc_unary_call(
                    host, int(port), "/vector.Vector/PushEvents",
                    [req], timeout=timeout_secs, tls=tls)
            except OSError:
                return False
            return status == 0

        def _order() -> list[int]:
            k = len(endpoints)
            if strategy == "failover_primary":
                # always re-check the configured order from the primary
                return list(range(k))
            if strategy == "failover":
                a = state["active"]
                return [(a + i) % k for i in range(k)]
            # load_balance: rotate, healthy first
            state["rr"] += 1
            rot = [(state["rr"] + i) % k for i in range(k)]
            healthy = [i for i in rot if cooldown.get(i, 0) <= 0]
            cooled = [i for i in rot if cooldown.get(i, 0) > 0]
            for i in cooled:
                cooldown[i] -= 1
            return healthy + cooled

        def flush() -> None:
            nonlocal n
            if not batch:
                return
            req = bytearray()
            for wrapper in batch:  # PushEventsRequest.events = 1
                write_len_delim(1, wrapper, req)
            req = bytes(req)
            last_err = None
            for idx in _order():
                if _try(idx, req):
                    state["active"] = idx
                    sent.add(n)
                    batch.clear()
                    n = 0
                    return
                cooldown[idx] = backoff_batches
                last_err = endpoints[idx]
            raise ConnectionError(
                f"PushEvents failed on every endpoint (last {last_err})")

        for row in rows:
            batch.append(encode_vector_log(
                {c: row[c] for c in cols if row[c] is not None}))
            n += 1
            if len(batch) >= batch_max_events:
                flush()
        flush()

    df.foreachPartition(send_partition)
    return sent.value


def s3_sink(
    df: DataFrame,
    bucket: str,
    key_prefix: str = "date=%F/",
    region: str = "us-east-1",
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    endpoint: str | None = None,
    encoding: str = "ndjson",
    value_col: str = "message",
    gzip_objects: bool = False,
    timeout_secs: float = 30.0,
    force_path_style: bool = True,
) -> int:
    """S3 object sink (reference src/sinks/aws_s3/config.rs): one
    PutObject per partition, key = strftime-rendered prefix + a content
    hash (the reference appends a uuid for uniqueness; a hash of the
    body is the deterministic equivalent) + extension. Bodies are
    newline-delimited (text or JSON rows), optionally gzipped. Requests
    are SigV4-signed (functions/sigv4.py), so this works against live
    S3 or localstack/minio via ``endpoint``.

    ``force_path_style=False`` switches to virtual-hosted addressing
    (`https://{bucket}.s3.{region}.amazonaws.com/key` — the 0.46
    "vhost-style S3 bucket addressing" support; the reference defaults
    to path-style, serde default_true, config.rs:177).

    Scale stance mirrors the source: this is the reference's
    tail-stream shape (many small rolling objects). BULK columnar
    output belongs to ``df.write.parquet`` over s3a:// — documented,
    not duplicated. Returns the number of objects written."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_line"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def put_partition(rows) -> None:
        import gzip as _gzip
        import hashlib
        import time as _time
        import urllib.request
        from datetime import datetime, timezone
        from urllib.parse import quote

        from vector_spark.functions.sigv4 import sign_request

        body = "\n".join(r["_line"] for r in rows).encode("utf-8")
        if not body:
            return
        body += b"\n"
        ext = "log" if encoding != "json" else "ndjson"
        if gzip_objects:
            body = _gzip.compress(body, mtime=0)
            ext += ".gz"
        now = datetime.now(timezone.utc)
        prefix = now.strftime(key_prefix)
        digest = hashlib.sha256(body).hexdigest()[:16]
        key = f"{prefix}{int(_time.time())}-{digest}.{ext}"
        if force_path_style:
            base = endpoint or f"https://s3.{region}.amazonaws.com"
            url = (f"{base.rstrip('/')}/{bucket}/"
                   f"{quote(key, safe='/=-_.~')}")
        else:
            base = endpoint or f"https://{bucket}.s3.{region}.amazonaws.com"
            url = f"{base.rstrip('/')}/{quote(key, safe='/=-_.~')}"
        headers = sign_request(
            "PUT", url,
            {"x-amz-content-sha256": hashlib.sha256(body).hexdigest(),
             "content-type": "application/octet-stream"},
            body, access_key, secret_key, region, "s3",
            now.strftime("%Y%m%dT%H%M%SZ"),
            session_token=session_token,
        )
        req = urllib.request.Request(url, data=body, headers=headers,
                                     method="PUT")
        with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
            resp.read()
        counter.add(1)

    out.foreachPartition(put_partition)
    return counter.value


def gcp_pubsub_sink(
    df: DataFrame,
    project: str,
    topic: str,
    endpoint: str = "https://pubsub.googleapis.com",
    auth_token: str | None = None,
    value_col: str = "message",
    encoding: str = "text",
    batch_size: int = 500,
    attributes: dict | None = None,
    timeout_secs: float = 10.0,
) -> int:
    """Pub/Sub publish sink (reference src/sinks/gcp/pubsub.rs): the
    REST ``topics:publish`` surface of the same service (emulator-
    compatible; live API = bearer token). One connection per partition,
    messages base64'd and published in batches of ``batch_size`` (the
    API caps a publish at 1000). Returns the row count."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)
    url = (f"{endpoint.rstrip('/')}/v1/projects/{project}"
           f"/topics/{topic}:publish")

    def publish_partition(rows) -> None:
        import base64
        import json as _json
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if auth_token:
            headers["Authorization"] = f"Bearer {auth_token}"
        batch = []
        sent = 0

        def flush() -> None:
            nonlocal batch, sent
            if not batch:
                return
            body = _json.dumps({"messages": batch}).encode()
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req,
                                        timeout=timeout_secs) as resp:
                resp.read()
            sent += len(batch)
            batch = []

        for row in rows:
            msg = {"data": base64.b64encode(
                row["_payload"].encode("utf-8")).decode("ascii")}
            if attributes:
                msg["attributes"] = attributes
            batch.append(msg)
            if len(batch) >= batch_size:
                flush()
        flush()
        counter.add(sent)

    out.foreachPartition(publish_partition)
    return counter.value


def aws_sqs_sink(
    df: DataFrame,
    queue_url: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    value_col: str = "message",
    encoding: str = "text",
    timeout_secs: float = 10.0,
) -> int:
    """SQS sink (reference src/sinks/aws_sqs/): SendMessageBatch in
    API-max batches of 10 over the JSON protocol, SigV4-signed, one
    connection context per partition. Returns the row count."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def send_partition(rows) -> None:
        from vector_spark.sources_pull import _sqs_call

        batch = []
        sent = 0

        def flush() -> None:
            nonlocal batch, sent
            if not batch:
                return
            _sqs_call(
                queue_url, "SendMessageBatch",
                {"QueueUrl": queue_url, "Entries": batch},
                access_key, secret_key, region, timeout_secs,
                session_token=session_token,
            )
            sent += len(batch)
            batch = []

        for row in rows:
            batch.append({"Id": str(len(batch)),
                          "MessageBody": row["_payload"]})
            if len(batch) >= 10:
                flush()
        flush()
        counter.add(sent)

    out.foreachPartition(send_partition)
    return counter.value


def _aws_json_call(
    url: str,
    service: str,
    target: str,
    body: dict,
    access_key: str,
    secret_key: str,
    region: str,
    timeout_secs: float,
    session_token: str | None = None,
    json_version: str = "1.1",
    retries: int = 3,
    retry_backoff_secs: float = 0.2,
) -> dict:
    """One signed request against an AWS JSON-protocol service (the
    same shape _sqs_call uses; CloudWatch Logs and Kinesis speak
    x-amz-json-1.1). Transient statuses retry with backoff like the
    shared HTTP transport — each attempt RE-SIGNS with a fresh
    x-amz-date so the signature can't go stale mid-retry."""
    import json as _json
    import time
    import urllib.error
    import urllib.request
    from datetime import datetime, timezone

    from vector_spark.functions.sigv4 import sign_request
    from vector_spark.sinks_services import _RETRIABLE_STATUSES

    payload = _json.dumps(body).encode()
    headers = {
        "Content-Type": f"application/x-amz-json-{json_version}",
        "X-Amz-Target": target,
    }
    for attempt in range(retries + 1):
        amz_date = datetime.now(timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ")
        signed = sign_request("POST", url, headers.copy(), payload,
                              access_key, secret_key, region, service,
                              amz_date,
                          session_token=session_token)
        req = urllib.request.Request(url, data=payload,
                                     headers=signed)
        try:
            with urllib.request.urlopen(
                    req, timeout=timeout_secs) as resp:
                text = resp.read().decode("utf-8")
            return _json.loads(text) if text else {}
        except urllib.error.HTTPError as err:
            if (err.code not in _RETRIABLE_STATUSES
                    or attempt == retries):
                raise
        except (urllib.error.URLError, ConnectionError,
                TimeoutError):
            if attempt == retries:
                raise
        time.sleep(retry_backoff_secs * (2 ** attempt))
    raise ConnectionError("unreachable")


def aws_cloudwatch_logs_sink(
    df: DataFrame,
    group_name: str,
    stream_name: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    endpoint: str | None = None,
    value_col: str = "message",
    encoding: str = "text",
    ts_col: str = "ts",
    batch_size: int = 1000,
    timeout_secs: float = 10.0,
) -> int:
    """CloudWatch Logs sink (reference src/sinks/aws_cloudwatch_logs/):
    PutLogEvents batches (API max 10k events; events within a batch
    must be timestamp-ordered — enforced by a per-partition sort of
    the batch, the reference's own ordering fix), SigV4-signed. Rows
    without ``ts_col`` stamp the executor wall clock. Returns rows."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    cols = [payload.alias("_payload")]
    if ts_col in df.columns:
        cols.append(
            (F.col(ts_col).cast("double") * 1000).cast("long")
            .alias("_ts_ms")
        )
    out = df.select(*cols)
    counter = df.sparkSession.sparkContext.accumulator(0)
    url = endpoint or f"https://logs.{region}.amazonaws.com/"

    def push_partition(rows) -> None:
        import time as _time

        batch = []
        sent = 0

        def flush() -> None:
            nonlocal batch, sent
            if not batch:
                return
            batch.sort(key=lambda e: e["timestamp"])
            _aws_json_call(
                url, "logs", "Logs_20140328.PutLogEvents",
                {"logGroupName": group_name,
                 "logStreamName": stream_name, "logEvents": batch},
                access_key, secret_key, region, timeout_secs,
                session_token=session_token,
            )
            sent += len(batch)
            batch = []

        for row in rows:
            # explicit None check: a legitimate epoch timestamp of 0
            # must NOT fall back to the executor wall clock (only a
            # missing column or a null value does).
            ts = (row["_ts_ms"] if "_ts_ms" in row
                  and row["_ts_ms"] is not None
                  else int(_time.time() * 1000))
            batch.append({"timestamp": ts, "message": row["_payload"]})
            if len(batch) >= batch_size:
                flush()
        flush()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


def aws_kinesis_sink(
    df: DataFrame,
    stream_name: str,
    region: str,
    partition_key_col: str | None = None,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    endpoint: str | None = None,
    value_col: str = "message",
    encoding: str = "text",
    batch_size: int = 500,
    timeout_secs: float = 10.0,
) -> int:
    """Kinesis Data Streams sink (reference src/sinks/aws_kinesis/):
    PutRecords in API-max batches of 500, records base64'd, partition
    key from ``partition_key_col`` (falls back to a hash of the data —
    the reference's random-key behavior, made deterministic)."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    cols = [payload.alias("_payload")]
    if partition_key_col:
        cols.append(F.col(partition_key_col).cast("string").alias("_pk"))
    out = df.select(*cols)
    counter = df.sparkSession.sparkContext.accumulator(0)
    url = endpoint or f"https://kinesis.{region}.amazonaws.com/"

    def push_partition(rows) -> None:
        import base64
        import hashlib

        batch = []
        sent = 0

        def flush() -> None:
            nonlocal batch, sent
            if not batch:
                return
            # PutRecords can partially fail inside an HTTP 200:
            # FailedRecordCount > 0 with per-record ErrorCode. The
            # reference retries the failed subset — do the same,
            # bounded, then raise so the failure isn't silently
            # counted as sent.
            import time as _time

            pending = batch
            for attempt in range(4):
                resp = _aws_json_call(
                    url, "kinesis", "Kinesis_20131202.PutRecords",
                    {"StreamName": stream_name, "Records": pending},
                    access_key, secret_key, region, timeout_secs,
                session_token=session_token,
                )
                if not resp.get("FailedRecordCount"):
                    pending = []
                    break
                results = resp.get("Records", [])
                if len(results) != len(pending):
                    # malformed/truncated per-record array: zip would
                    # silently drop (and mark sent) the unmatched tail
                    # — retry the whole batch instead
                    _time.sleep(0.2 * (2 ** attempt))
                    continue
                pending = [rec for rec, res in zip(pending, results)
                           if res.get("ErrorCode")]
                if not pending:
                    break
                _time.sleep(0.2 * (2 ** attempt))
            if pending:
                raise ConnectionError(
                    f"PutRecords: {len(pending)} records still "
                    "failing after retries")
            sent += len(batch)
            batch = []

        for row in rows:
            data = row["_payload"].encode("utf-8")
            pk = (row["_pk"] if partition_key_col and row["_pk"]
                  else hashlib.md5(data).hexdigest())
            batch.append({
                "Data": base64.b64encode(data).decode("ascii"),
                "PartitionKey": pk,
            })
            if len(batch) >= min(batch_size, 500):
                flush()
        flush()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


def aws_kinesis_firehose_sink(
    df: DataFrame,
    stream_name: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    endpoint: str | None = None,
    value_col: str = "message",
    encoding: str = "text",
    batch_size: int = 500,
    batch_max_bytes: int = 4_000_000,
    timeout_secs: float = 10.0,
) -> int:
    """Kinesis Data Firehose sink (reference src/sinks/aws_kinesis/
    firehose/ — the delivery-stream sibling of the streams sink):
    `Firehose_20150804.PutRecordBatch` in the API-max batches of 500
    records / 4 MB (firehose/config.rs:48 cites the public limits
    page), records base64'd, SigV4-signed like the other AWS
    families. No partition key — Firehose delivery streams don't
    shard by key."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)
    url = endpoint or f"https://firehose.{region}.amazonaws.com/"

    def push_partition(rows) -> None:
        import base64

        batch = []
        batch_bytes = 0
        sent = 0

        def flush() -> None:
            nonlocal batch, batch_bytes, sent
            if not batch:
                return
            # PutRecordBatch reports partial failure inside an HTTP
            # 200 (FailedPutCount > 0 with per-record ErrorCode) — the
            # reference retries those records; mirror that, bounded,
            # then raise rather than count failures as sent.
            import time as _time

            pending = batch
            for attempt in range(4):
                resp = _aws_json_call(
                    url, "firehose",
                    "Firehose_20150804.PutRecordBatch",
                    {"DeliveryStreamName": stream_name,
                     "Records": pending},
                    access_key, secret_key, region, timeout_secs,
                session_token=session_token,
                )
                if not resp.get("FailedPutCount"):
                    pending = []
                    break
                results = resp.get("RequestResponses", [])
                if len(results) != len(pending):
                    # see PutRecords: never zip-drop a short response
                    _time.sleep(0.2 * (2 ** attempt))
                    continue
                pending = [rec for rec, res in zip(pending, results)
                           if res.get("ErrorCode")]
                if not pending:
                    break
                _time.sleep(0.2 * (2 ** attempt))
            if pending:
                raise ConnectionError(
                    f"PutRecordBatch: {len(pending)} records still "
                    "failing after retries")
            sent += len(batch)
            batch = []
            batch_bytes = 0

        for row in rows:
            data = row["_payload"].encode("utf-8")
            if batch and (len(batch) >= min(batch_size, 500)
                          or batch_bytes + len(data) > batch_max_bytes):
                flush()
            batch.append(
                {"Data": base64.b64encode(data).decode("ascii")})
            batch_bytes += len(data)
        flush()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


def _influx_field_value(col: "F.Column", dtype: str) -> "F.Column":
    """One log column → its influx line-protocol field rendering
    (lib/vector-lib influx Field typing): ints get the `i` suffix,
    floats/bools go bare, strings are quoted with \\ and \" escaped."""
    from pyspark.sql import functions as F

    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return F.concat(col.cast("string"), F.lit("i"))
    if dtype in ("float", "double", "boolean"):
        return col.cast("string")
    s = F.regexp_replace(col.cast("string"), r"\\", r"\\\\")
    s = F.regexp_replace(s, '"', '\\\\"')
    return F.concat(F.lit('"'), s, F.lit('"'))


def influx_logs_line(df: DataFrame, measurement: str,
                     tag_cols: list[str] | None,
                     ts_col: str = "ts") -> "F.Column":
    """The influxdb_logs line rendering as a reusable Column (shared
    by the sink and the registry's roundtrip oracle): sorted promoted
    tags + `metric_type=logs`, typed fields, ns timestamp."""
    from pyspark.sql import functions as F

    tag_cols = sorted(tag_cols or [])
    dtypes = dict(df.dtypes)
    tag_parts = [F.lit(measurement.replace(",", r"\,")
                       .replace(" ", r"\ "))]
    for c in tag_cols + ["metric_type"]:
        if c == "metric_type":
            v = F.lit("logs")
        else:
            # tag values escape , = and space (line-protocol rules)
            v = F.col(c).cast("string")
            v = F.regexp_replace(v, ",", r"\\,")
            v = F.regexp_replace(v, "=", r"\\=")
            v = F.regexp_replace(v, " ", r"\\ ")
        tag_parts.append(
            F.when(v.isNull(), F.lit("")).otherwise(
                F.concat(F.lit(f",{c}="), v)))
    field_cols = [c for c in df.columns
                  if c not in tag_cols and c != ts_col]
    pairs = F.array(*[
        F.when(
            F.col(c).isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.concat(F.lit(f"{c}="),
                     _influx_field_value(F.col(c), dtypes[c]))
        ) for c in field_cols
    ])
    fields = F.array_join(F.filter(pairs, lambda p: p.isNotNull()), ",")
    ts = (F.col(ts_col) if dtypes.get(ts_col) == "timestamp"
          else F.timestamp_seconds(F.col(ts_col).cast("double")))
    ts_ns = (F.unix_micros(ts) * 1000).cast("string")
    return F.concat(F.concat(*tag_parts), F.lit(" "), fields,
                    F.lit(" "), ts_ns)


def influxdb_logs_sink(
    df: DataFrame,
    url: str,
    measurement: str | None = None,
    namespace: str | None = None,
    tag_cols: list[str] | None = None,
    org: str = "",
    bucket: str = "",
    ts_col: str = "ts",
    batch_max_lines: int = 5000,
    timeout_secs: float = 10.0,
) -> int:
    """InfluxDB LOGS sink (reference src/sinks/influxdb/logs.rs): each
    log row becomes one line-protocol point. ``measurement`` names the
    point (or the deprecated ``namespace`` → `<namespace>.vector`,
    logs.rs:49-61); ``tag_cols`` are the log fields promoted to tags
    (sorted, plus the always-present `metric_type=logs` tag,
    logs.rs:275-276); every remaining column is a typed field —
    ints with the `i` suffix, floats/bools bare, strings quoted
    (the influx Field typing). Null fields are omitted per line."""
    if measurement is None:
        if namespace is None:
            raise ValueError("measurement (or namespace) is required")
        measurement = f"{namespace}.vector"
    out = df.select(
        influx_logs_line(df, measurement, tag_cols, ts_col)
        .alias("_line"))
    write_url = url
    if "/write" not in url:
        write_url = (f"{url.rstrip('/')}/api/v2/write?org={org}"
                     f"&bucket={bucket}&precision=ns")
    from vector_spark.sinks_services import _post_lines_per_partition

    return _post_lines_per_partition(
        out, write_url,
        {"Content-Type": "text/plain; charset=utf-8"},
        batch_max_lines, 100_000_000, timeout_secs,
    )


def influxdb_sink(
    df: DataFrame,
    url: str,
    org: str = "",
    bucket: str = "",
    token: str | None = None,
    measurement_col: str = "name",
    value_col: str = "value",
    tags_col: str | None = "tags",
    ts_col: str | None = "ts",
    batch_max_lines: int = 5000,
    timeout_secs: float = 10.0,
) -> int:
    """InfluxDB sink (reference src/sinks/influxdb/): metric rows →
    line protocol, POSTed to the v2 write endpoint
    (``/api/v2/write?org=&bucket=&precision=ns``; a bare ``url``
    pointing at a v1 ``/write`` works the same). Tags come from a
    map<string,string> column (sorted for deterministic lines), the
    value as ``value=<v>``, timestamps in ns. One connection per
    partition, lines batched."""
    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import encode_influxdb_line

    tags_expr = None
    if tags_col and tags_col in df.columns:
        # map -> ",k=v" suffix string, keys sorted
        entries = F.map_entries(F.col(tags_col))
        tags_expr = F.concat_ws(
            "",
            F.transform(
                F.array_sort(entries),
                lambda e: F.concat(F.lit(","), e["key"], F.lit("="),
                                   e["value"]),
            ),
        )
    measurement = F.col(measurement_col).cast("string")
    if tags_expr is not None:
        measurement = F.concat(measurement, tags_expr)
    ts_ns = None
    if ts_col and ts_col in df.columns:
        ts_ns = (F.col(ts_col).cast("double") * 1e9).cast("long")
    line = encode_influxdb_line(
        measurement, {"value": F.col(value_col)}, ts_ns=ts_ns
    )
    out = df.select(line.alias("_line"))
    counter = df.sparkSession.sparkContext.accumulator(0)
    write_url = url
    if "/write" not in url:
        write_url = (f"{url.rstrip('/')}/api/v2/write?org={org}"
                     f"&bucket={bucket}&precision=ns")

    def push_partition(rows) -> None:
        import urllib.request

        headers = {"Content-Type": "text/plain; charset=utf-8"}
        if token:
            headers["Authorization"] = f"Token {token}"
        buf: list[str] = []
        sent = 0

        def flush() -> None:
            nonlocal buf, sent
            if not buf:
                return
            req = urllib.request.Request(
                write_url, data=("\n".join(buf) + "\n").encode(),
                headers=headers,
            )
            with urllib.request.urlopen(req,
                                        timeout=timeout_secs) as resp:
                resp.read()
            sent += len(buf)
            buf = []

        for row in rows:
            buf.append(row["_line"])
            if len(buf) >= batch_max_lines:
                flush()
        flush()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


def statsd_sink(
    df: DataFrame,
    host: str,
    port: int,
    name_col: str = "name",
    value_col: str = "value",
    kind_col: str | None = "kind",
    tags_col: str | None = "tags",
) -> int:
    """statsd UDP sink (reference src/sinks/statsd/): one datagram per
    metric row, `name:value|type[|#tag:v,...]` with counter→c, gauge→g,
    anything else timing→ms (the reference's mapping). UDP per
    partition — fire-and-forget like the protocol."""
    from pyspark.sql import functions as F

    kind = (F.col(kind_col) if kind_col and kind_col in df.columns
            else F.lit("gauge"))
    type_code = (
        F.when(kind == "counter", "c")
        .when(kind == "gauge", "g")
        .otherwise("ms")
    )
    line = F.concat(
        F.col(name_col).cast("string"), F.lit(":"),
        F.col(value_col).cast("string"), F.lit("|"), type_code,
    )
    if tags_col and tags_col in df.columns:
        entries = F.map_entries(F.col(tags_col))
        tag_str = F.concat_ws(
            ",",
            F.transform(
                F.array_sort(entries),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"]),
            ),
        )
        line = F.when(
            F.size(entries) > 0,
            F.concat(line, F.lit("|#"), tag_str),
        ).otherwise(line)
    out = df.select(line.alias("_line"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def push_partition(rows) -> None:
        import socket as _socket

        sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        sent = 0
        try:
            for row in rows:
                sock.sendto(row["_line"].encode("utf-8"), (host, port))
                sent += 1
        finally:
            sock.close()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


def webhdfs_sink(
    df: DataFrame,
    endpoint: str,
    root: str,
    prefix: str = "date=%F/",
    user: str | None = None,
    value_col: str = "message",
    encoding: str = "ndjson",
    timeout_secs: float = 30.0,
) -> int:
    """WebHDFS sink (reference src/sinks/webhdfs/): one object per
    partition via the documented two-step CREATE — PUT
    ``?op=CREATE&noredirect=true`` to the namenode, then PUT the body
    to the returned datanode location (the protocol's redirect dance,
    followed explicitly so it works through proxies). Keys are
    strftime-prefixed + content hash, like the s3 sink. Returns the
    number of files written."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_line"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def put_partition(rows) -> None:
        import hashlib
        import json as _json
        import time as _time
        import urllib.request
        from datetime import datetime, timezone
        from urllib.parse import quote

        body = "\n".join(r["_line"] for r in rows).encode("utf-8")
        if not body:
            return
        body += b"\n"
        now = datetime.now(timezone.utc)
        name = (f"{now.strftime(prefix)}{int(_time.time())}-"
                f"{hashlib.sha256(body).hexdigest()[:16]}.log")
        path = "/".join(
            s for s in (root.strip("/") + "/" + name).split("/") if s
        )
        url = (f"{endpoint.rstrip('/')}/webhdfs/v1/"
               f"{quote(path, safe='/=-_.~')}"
               f"?op=CREATE&overwrite=false&noredirect=true")
        if user:
            url += f"&user.name={quote(user, safe='')}"
        req = urllib.request.Request(url, data=b"", method="PUT")
        with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
            text = resp.read().decode("utf-8")
            location = resp.headers.get("Location")
        if not location and text:
            location = _json.loads(text).get("Location")
        if not location:
            raise ConnectionError("webhdfs CREATE returned no Location")
        req2 = urllib.request.Request(
            location, data=body, method="PUT",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req2, timeout=timeout_secs) as resp:
            resp.read()
        counter.add(1)

    out.foreachPartition(put_partition)
    return counter.value


def azure_blob_sink(
    df: DataFrame,
    endpoint: str,
    container: str,
    prefix: str = "date=%F/",
    sas_token: str = "",
    account_name: str | None = None,
    shared_key: str | None = None,
    value_col: str = "message",
    encoding: str = "ndjson",
    gzip_objects: bool = False,
    timeout_secs: float = 30.0,
) -> int:
    """Azure Blob Storage sink (reference src/sinks/azure_blob/): one
    Put Blob per partition (``x-ms-blob-type: BlockBlob``), keys from a
    strftime prefix + content hash. Auth: a SAS token appended to the
    URL, or (r11) SharedKey — ``account_name`` + base64 ``shared_key``
    sign each request with the documented HMAC-SHA256 canonicalization
    (functions/azure_auth.py, pinned against the reference policy's
    rules src/sinks/azure_common/shared_key_policy.rs and validated
    Azurite-style by server-side recomputation in tests). Returns the
    blob count."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_line"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def put_partition(rows) -> None:
        import gzip as _gzip
        import hashlib
        import time as _time
        import urllib.request
        from datetime import datetime, timezone
        from urllib.parse import quote

        body = "\n".join(r["_line"] for r in rows).encode("utf-8")
        if not body:
            return
        body += b"\n"
        ext = "log" if encoding != "json" else "ndjson"
        if gzip_objects:
            body = _gzip.compress(body, mtime=0)
            ext += ".gz"
        now = datetime.now(timezone.utc)
        name = (f"{now.strftime(prefix)}{int(_time.time())}-"
                f"{hashlib.sha256(body).hexdigest()[:16]}.{ext}")
        url = (f"{endpoint.rstrip('/')}/{container}/"
               f"{quote(name, safe='/=-_.~')}")
        if sas_token:
            url += ("&" if "?" in url else "?") + sas_token.lstrip("?")
        headers = {
            "x-ms-blob-type": "BlockBlob",
            "x-ms-version": "2021-08-06",
            "Content-Type": "application/octet-stream",
        }
        if account_name and shared_key:
            from vector_spark.functions.azure_auth import (
                shared_key_headers,
            )

            headers = shared_key_headers(
                account_name, shared_key, "PUT", url, len(body),
                headers=headers)
        req = urllib.request.Request(
            url, data=body, method="PUT", headers=headers,
        )
        with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
            resp.read()
        counter.add(1)

    out.foreachPartition(put_partition)
    return counter.value


def gcs_sink(
    df: DataFrame,
    bucket: str,
    prefix: str = "date=%F/",
    endpoint: str = "https://storage.googleapis.com",
    auth_token: str | None = None,
    value_col: str = "message",
    encoding: str = "ndjson",
    gzip_objects: bool = False,
    timeout_secs: float = 30.0,
    content_type: str | None = None,
    content_encoding: str | None = None,
    cache_control: str | None = None,
) -> int:
    """Google Cloud Storage sink (reference src/sinks/gcp/cloud_storage
    /): one JSON-API media upload per partition
    (``POST /upload/storage/v1/b/{bucket}/o?uploadType=media&name=``),
    bearer-token auth (live API or fake-gcs-server via ``endpoint``),
    strftime + content-hash object names like the s3/azure sinks.
    Returns the object count."""
    from pyspark.sql import functions as F

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_line"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def put_partition(rows) -> None:
        import gzip as _gzip
        import hashlib
        import time as _time
        import urllib.request
        from datetime import datetime, timezone
        from urllib.parse import quote

        body = "\n".join(r["_line"] for r in rows).encode("utf-8")
        if not body:
            return
        body += b"\n"
        ext = "log" if encoding != "json" else "ndjson"
        if gzip_objects:
            body = _gzip.compress(body, mtime=0)
            ext += ".gz"
        now = datetime.now(timezone.utc)
        name = (f"{now.strftime(prefix)}{int(_time.time())}-"
                f"{hashlib.sha256(body).hexdigest()[:16]}.{ext}")
        url = (f"{endpoint.rstrip('/')}/upload/storage/v1/b/{bucket}/o"
               f"?uploadType=media&name={quote(name, safe='')}")
        # content_type / content_encoding / cache_control — the
        # 0.53/0.54-window gcp_cloud_storage options; the JSON-API
        # media upload carries them as object-metadata headers
        headers = {"Content-Type": content_type
                   or "application/octet-stream"}
        if gzip_objects or content_encoding:
            headers["Content-Encoding"] = content_encoding or "gzip"
        if cache_control:
            headers["Cache-Control"] = cache_control
        if auth_token:
            headers["Authorization"] = f"Bearer {auth_token}"
        req = urllib.request.Request(url, data=body, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
            resp.read()
        counter.add(1)

    out.foreachPartition(put_partition)
    return counter.value


def aws_cloudwatch_metrics_sink(
    df: DataFrame,
    namespace: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    endpoint: str | None = None,
    name_col: str = "name",
    value_col: str = "value",
    ts_col: str | None = "ts",
    batch_size: int = 20,
    timeout_secs: float = 10.0,
    high_resolution: bool = False,
) -> int:
    """CloudWatch Metrics sink (reference src/sinks/
    aws_cloudwatch_metrics/): PutMetricData over the QUERY protocol
    (``Action=PutMetricData&MetricData.member.N.*`` form encoding —
    CloudWatch's API predates the JSON protocol), batches of 20 (the
    API maximum), SigV4-signed. ``high_resolution`` sets
    StorageResolution=1 per datum (the 0.52-window high-resolution
    metrics support; default 60-second resolution omits the field).
    Returns the metric count."""
    from pyspark.sql import functions as F

    cols = [F.col(name_col).cast("string").alias("_name"),
            F.col(value_col).cast("double").alias("_value")]
    if ts_col and ts_col in df.columns:
        cols.append(
            F.date_format(F.col(ts_col),
                          "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("_ts")
        )
    out = df.select(*cols)
    counter = df.sparkSession.sparkContext.accumulator(0)
    url = endpoint or f"https://monitoring.{region}.amazonaws.com/"

    def push_partition(rows) -> None:
        import urllib.request
        from datetime import datetime, timezone
        from urllib.parse import quote

        from vector_spark.functions.sigv4 import sign_request

        batch = []
        sent = 0

        def flush() -> None:
            nonlocal batch, sent
            if not batch:
                return
            params = [("Action", "PutMetricData"),
                      ("Version", "2010-08-01"),
                      ("Namespace", namespace)]
            for i, row in enumerate(batch, start=1):
                params.append(
                    (f"MetricData.member.{i}.MetricName", row["_name"])
                )
                params.append(
                    (f"MetricData.member.{i}.Value", repr(row["_value"]))
                )
                if "_ts" in row and row["_ts"]:
                    params.append(
                        (f"MetricData.member.{i}.Timestamp", row["_ts"])
                    )
                if high_resolution:
                    params.append(
                        (f"MetricData.member.{i}.StorageResolution", "1")
                    )
            body = "&".join(
                f"{quote(k, safe='')}={quote(v, safe='')}"
                for k, v in params
            ).encode()
            amz_date = datetime.now(timezone.utc).strftime(
                "%Y%m%dT%H%M%SZ"
            )
            headers = sign_request(
                "POST", url,
                {"Content-Type":
                 "application/x-www-form-urlencoded; charset=utf-8"},
                body, access_key, secret_key, region, "monitoring",
                amz_date,
                session_token=session_token,
            )
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req,
                                        timeout=timeout_secs) as resp:
                resp.read()
            sent += len(batch)
            batch = []

        for row in rows:
            batch.append(row)
            if len(batch) >= min(batch_size, 20):
                flush()
        flush()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value
