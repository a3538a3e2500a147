"""Wire-protocol server sources: framing units + live socket ingest
through the DataSource API (vector src/sources/syslog.rs, statsd/)."""

from __future__ import annotations

import socket
import time
import uuid

import pytest

from vector_spark.sources import OctetCountingFramer


# ---- framing (RFC6587 auto-detect, lib/codecs octet_counting) ----------

def test_framer_newline():
    f = OctetCountingFramer()
    assert f.feed(b"hello\nworld\n") == ["hello", "world"]
    assert f.feed(b"par") == []
    assert f.feed(b"tial\n") == ["partial"]


def test_framer_octet_counting():
    f = OctetCountingFramer()
    assert f.feed(b"5 hello6 world!") == ["hello", "world!"]
    # split mid-frame
    assert f.feed(b"11 hello") == []
    assert f.feed(b" world") == ["hello world"]


def test_framer_mixed_and_crlf():
    f = OctetCountingFramer()
    assert f.feed(b"a\r\n3 xyz\nb\n") == ["a", "xyz", "b"]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _connect_retry(port: int, timeout: float = 30.0) -> socket.socket:
    """The listener binds lazily on the reader's first read() — probe
    until the port accepts."""
    deadline = time.time() + timeout
    while True:
        try:
            return socket.create_connection(("127.0.0.1", port), timeout=2)
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.5)


def _wait_rows(spark, name, n, timeout=45):
    deadline = time.time() + timeout
    while time.time() < deadline:
        got = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c
        if got >= n:
            return got
        time.sleep(1)
    return spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c


# ---- live ingest --------------------------------------------------------

@pytest.mark.streaming
def test_syslog_tcp_ingest_and_decode(spark, tmp_path):
    """Real bytes over TCP → DataSource → parse_syslog topology."""
    from pyspark.sql import functions as F

    from vector_spark.functions.vrl import VRL_FUNCTIONS
    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    raw = (
        spark.readStream.format("syslog_tcp")
        .option("host", "127.0.0.1")
        .option("port", port)
        .option("wal_dir", str(tmp_path / "wal"))
        .load()
    )
    decoded = raw.withColumn("syslog", VRL_FUNCTIONS["parse_syslog"](F.col("message")))
    name = f"sys_{uuid.uuid4().hex[:8]}"
    q = (
        decoded.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        msgs = [
            "<34>Jan  5 10:00:01 host1 app[42]: first message",
            "<13>Jan  5 10:00:02 host2 app[43]: second message",
        ]
        with _connect_retry(port) as c:
            # one octet-counted frame, one newline frame (auto-detect)
            payload = msgs[0].encode()
            c.sendall(str(len(payload)).encode() + b" " + payload)
            c.sendall(msgs[1].encode() + b"\n")
        got = _wait_rows(spark, name, 2)
        assert got == 2
        rows = spark.sql(
            f"SELECT message, syslog.hostname h, syslog.severity s FROM {name} ORDER BY seq"
        ).collect()
        assert rows[0].h == "host1" and rows[0].s == "crit"  # 34 % 8 -> name-coded
        assert rows[1].h == "host2" and rows[1].s == "notice"  # 13 % 8
    finally:
        q.stop()


@pytest.mark.streaming
def test_statsd_udp_ingest(spark, tmp_path):
    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    raw = (
        spark.readStream.format("statsd_udp")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    name = f"statsd_{uuid.uuid4().hex[:8]}"
    q = (
        raw.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # UDP gives no bind signal — resend until rows land (dup sends are
        # fine: we assert on the SET of distinct messages)
        deadline = time.time() + 45
        got = 0
        while time.time() < deadline and got < 3:
            s.sendto(b"page.views:1|c\nfuel.level:0.5|g", ("127.0.0.1", port))
            s.sendto(b"song.length:240|h|@0.5", ("127.0.0.1", port))
            time.sleep(2)
            got = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c
        msgs = {
            r.message
            for r in spark.sql(f"SELECT message FROM {name}").collect()
        }
        assert msgs == {"page.views:1|c", "fuel.level:0.5|g", "song.length:240|h|@0.5"}
    finally:
        q.stop()


@pytest.mark.streaming
def test_syslog_tcp_restart_no_duplicates(spark, tmp_path):
    """Exactly-once across restart: rows committed before the stop are not
    re-emitted by a new query on the same checkpoint + WAL, and frames
    received while the query was DOWN are delivered after restart."""
    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    wal = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        raw = (
            spark.readStream.format("syslog_tcp")
            .option("host", "127.0.0.1")
            .option("port", port)
            .option("wal_dir", wal)
            .load()
        )
        return (
            raw.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    def send(msg: str):
        with _connect_retry(port) as c:
            c.sendall(msg.encode() + b"\n")

    q = start()
    try:
        send("before-restart")
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()

    # while down: the listener is gone; nothing can connect — but WAL
    # retains any uncommitted tail. Restart and send more.
    q2 = start()
    try:
        send("after-restart")
        deadline = time.time() + 30
        while time.time() < deadline:
            msgs = [r.message for r in spark.read.parquet(out).collect()]
            if sorted(msgs) == ["after-restart", "before-restart"]:
                break
            time.sleep(1)
        msgs = sorted(r.message for r in spark.read.parquet(out).collect())
        # exactly once: no duplicate of the pre-restart row
        assert msgs == ["after-restart", "before-restart"]
    finally:
        q2.stop()


@pytest.mark.streaming
def test_http_server_ingest(spark, tmp_path):
    """POST bodies → events with the request path (http_server.rs:40):
    newline-framed text and a JSON-array body."""
    import http.client
    import json as _json

    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    raw = (
        spark.readStream.format("http_server")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    name = f"http_{uuid.uuid4().hex[:8]}"
    q = (
        raw.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # probe until the HTTP listener is up (lazy bind on first read())
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request("POST", "/lines", body="one\ntwo\n")
                assert c.getresponse().status == 200
                c.request(
                    "POST", "/batch",
                    body=_json.dumps([{"m": "a"}, {"m": "b"}]),
                    headers={"Content-Type": "application/json"},
                )
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted, "http listener never came up"
        got = _wait_rows(spark, name, 4)
        assert got == 4
        rows = spark.sql(f"SELECT path, message FROM {name} ORDER BY seq").collect()
        assert [r.path for r in rows] == ["/lines", "/lines", "/batch", "/batch"]
        assert [r.message for r in rows[:2]] == ["one", "two"]
        assert _json.loads(rows[2].message) == {"m": "a"}
    finally:
        q.stop()


def _msgpack_str(s: str) -> bytes:
    b = s.encode()
    return bytes([0xA0 | len(b)]) if not b else (
        bytes([0xA0 | len(b)]) + b if len(b) < 32 else b"\xd9" + bytes([len(b)]) + b
    )


def _msgpack_map(d: dict) -> bytes:
    out = bytes([0x80 | len(d)])
    for k, v in d.items():
        out += _msgpack_str(k)
        if isinstance(v, str):
            out += _msgpack_str(v)
        elif isinstance(v, int) and 0 <= v < 128:
            out += bytes([v])
        else:
            raise NotImplementedError
    return out


@pytest.mark.streaming
def test_fluent_forward_ingest(spark, tmp_path):
    """Real fluent-forward bytes: Message mode with EventTime ext
    timestamp, Forward mode, PackedForward, and chunk ack
    (src/sources/fluent/mod.rs)."""
    import json as _json

    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    raw = (
        spark.readStream.format("fluent")
        .option("host", "127.0.0.1")
        .option("port", port)
        .option("wal_dir", str(tmp_path / "wal"))
        .load()
    )
    name = f"fluent_{uuid.uuid4().hex[:8]}"
    q = (
        raw.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        with _connect_retry(port) as c:
            # 1) Message mode: ["app.log", EventTime(1700000000.5), {"m":"hello"}]
            et = b"\xd7\x00" + (1700000000).to_bytes(4, "big") + (500000000).to_bytes(4, "big")
            msg1 = b"\x93" + _msgpack_str("app.log") + et + _msgpack_map({"m": "hello"})
            c.sendall(msg1)
            # 2) Forward mode: ["web", [[100, {"m":"a"}], [101, {"m":"b"}]]]
            entry = lambda t, m: b"\x92" + bytes([t]) + _msgpack_map({"m": m})
            fwd = (b"\x92" + _msgpack_str("web")
                   + b"\x92" + entry(100, "a") + entry(101, "b"))
            c.sendall(fwd)
            # 3) PackedForward + chunk option → expect an ack back
            packed = entry(102, "c") + entry(103, "d")
            pf = (b"\x93" + _msgpack_str("bulk")
                  + b"\xc4" + bytes([len(packed)]) + packed
                  + _msgpack_map({"chunk": "abc123"}))
            c.sendall(pf)
            c.settimeout(15)
            ack = c.recv(256)
            assert b"ack" in ack and b"abc123" in ack
        got = _wait_rows(spark, name, 5)
        assert got == 5
        rows = [
            _json.loads(r.message)
            for r in spark.sql(f"SELECT message FROM {name} ORDER BY seq").collect()
        ]
        assert rows[0] == {"tag": "app.log", "timestamp": 1700000000.5,
                           "record": {"m": "hello"}}
        assert [r["record"]["m"] for r in rows[1:]] == ["a", "b", "c", "d"]
        assert {r["tag"] for r in rows[1:3]} == {"web"}
        assert {r["tag"] for r in rows[3:]} == {"bulk"}
        assert [r["timestamp"] for r in rows[1:]] == [100, 101, 102, 103]
    finally:
        q.stop()


@pytest.mark.streaming
def test_logstash_lumberjack_ingest(spark, tmp_path):
    """Lumberjack v2 frames: window, JSON data, zlib-compressed nested
    frames, key/value data frames, sequence ack (src/sources/logstash.rs)."""
    import json as _json
    import struct
    import zlib

    from vector_spark.sources import register_sources

    register_sources(spark)
    port = _free_port()
    raw = (
        spark.readStream.format("logstash")
        .option("host", "127.0.0.1")
        .option("port", port)
        .option("wal_dir", str(tmp_path / "wal"))
        .load()
    )
    name = f"ls_{uuid.uuid4().hex[:8]}"
    q = (
        raw.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        with _connect_retry(port) as c:
            jframe = lambda seq, obj: (
                b"2J" + struct.pack(">II", seq, len(_json.dumps(obj).encode()))
                + _json.dumps(obj).encode()
            )
            # window + two J frames, one inside a compressed frame
            c.sendall(b"2W" + struct.pack(">I", 3))
            c.sendall(jframe(1, {"msg": "plain", "beat": "filebeat"}))
            inner = jframe(2, {"msg": "zipped"})
            comp = zlib.compress(inner)
            c.sendall(b"2C" + struct.pack(">I", len(comp)) + comp)
            # D frame: seq=3, 2 key/value pairs
            kv = b""
            for k, v in [("msg", "kv-frame"), ("host", "h9")]:
                kv += struct.pack(">I", len(k)) + k.encode()
                kv += struct.pack(">I", len(v)) + v.encode()
            c.sendall(b"2D" + struct.pack(">II", 3, 2) + kv)
            c.settimeout(15)
            ack = c.recv(64)
            assert ack[:2] == b"2A" and struct.unpack(">I", ack[2:6])[0] >= 1
        got = _wait_rows(spark, name, 3)
        assert got == 3
        rows = [
            _json.loads(r.message)
            for r in spark.sql(f"SELECT message FROM {name} ORDER BY seq").collect()
        ]
        assert rows[0]["msg"] == "plain" and rows[0]["beat"] == "filebeat"
        assert rows[1]["msg"] == "zipped"
        assert rows[2] == {"msg": "kv-frame", "host": "h9"}
    finally:
        q.stop()


@pytest.mark.streaming
def test_http_server_hec_otlp_endpoints(spark, tmp_path):
    """Topology YAML: one http_server source path-routed to Splunk HEC
    and OTLP/JSON decode, through to a memory sink (r2 verdict #7;
    src/sources/splunk_hec/mod.rs, src/sources/opentelemetry/http.rs)."""
    import http.client
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks

    port = _free_port()
    name = f"ep_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  ingest:
    type: http_server
    port: {port}
    endpoints:
      /services/collector/event: splunk_hec
      /v1/logs: otlp_logs
sinks:
  out:
    type: memory
    inputs: [ingest]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        hec = _json.dumps(
            {"event": "disk full", "time": 1700000000.5, "host": "web-1",
             "sourcetype": "syslog"}
        )
        otlp = _json.dumps(
            {"resourceLogs": [{"resource": {}, "scopeLogs": [{
                "scope": {"name": "app"},
                "logRecords": [
                    {"timeUnixNano": "1", "body": {"stringValue": "first"}},
                    {"timeUnixNano": "2", "body": {"stringValue": "second"}},
                ]}]}]}
        )
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request("POST", "/services/collector/event", body=hec)
                assert c.getresponse().status == 200
                c.request("POST", "/v1/logs", body=otlp)
                assert c.getresponse().status == 200
                c.request("POST", "/other", body="passthru")
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        got = _wait_rows(spark, name, 4)
        assert got == 4
        rows = spark.sql(
            f"SELECT path, codec, event FROM {name} ORDER BY path, event"
        ).collect()
        by_codec = {}
        for r in rows:
            by_codec.setdefault(r.codec, []).append(r)
        hec_ev = _json.loads(by_codec["splunk_hec"][0].event)
        assert hec_ev["event"] == "disk full" and hec_ev["host"] == "web-1"
        otlp_bodies = sorted(
            _json.loads(r.event)["body"]["stringValue"]
            for r in by_codec["otlp_logs"]
        )
        assert otlp_bodies == ["first", "second"]
        assert by_codec["raw"][0].event == "passthru"
    finally:
        for q in queries.values():
            q.stop()


@pytest.mark.streaming
def test_http_server_pushgateway_endpoint(spark, tmp_path):
    """Pushgateway intake end-to-end: exposition text POSTed to
    /metrics/job/... through a live http_server listener; grouping
    labels from the path (incl. a base64 segment) override body
    labels (src/sources/prometheus/pushgateway.rs)."""
    import http.client
    import json as _json

    from vector_spark.config.loader import (
        load_topology,
        start_streaming_sinks,
    )

    port = _free_port()
    name = f"pgw_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  ingest:
    type: http_server
    port: {port}
    endpoints:
      /metrics/job: prometheus_pushgateway
sinks:
  out:
    type: memory
    inputs: [ingest]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        body = (
            "# TYPE jobs_total counter\n"
            'jobs_total{job="inline"} 7 1700000000123\n'
            "queue_depth 2.5\n"
        )
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=2
                )
                c.request(
                    "POST",
                    "/metrics/job/backup/instance@base64/d2ViLTE",
                    body=body,
                )
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        assert _wait_rows(spark, name, 2) == 2
        rows = spark.sql(
            f"SELECT codec, event FROM {name} ORDER BY event"
        ).collect()
        assert all(r.codec == "prometheus_pushgateway" for r in rows)
        events = {
            e["name"]: e for e in (_json.loads(r.event) for r in rows)
        }
        jt = events["jobs_total"]
        # path labels override the body's job="inline"; the base64
        # instance segment decodes to web-1
        assert jt["labels"] == {"job": "backup", "instance": "web-1"}
        assert jt["value"] == 7.0 and jt["ts_ms"] == 1700000000123
        qd = events["queue_depth"]
        assert qd["labels"] == {"job": "backup", "instance": "web-1"}
        assert qd["value"] == 2.5
    finally:
        for q in queries.values():
            q.stop()


def test_http_server_otlp_protobuf_endpoint(spark, tmp_path):
    """OTLP/HTTP with content-type application/x-protobuf: the listener
    carries the binary body base64'd; route_http_endpoints decodes it
    with the pure-Python wire codec (functions/protowire.py), one row
    per logRecord — the opentelemetry/http.rs protobuf contract without
    jars or google.protobuf."""
    import http.client
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks
    from vector_spark.functions.protowire import encode_otlp_logs

    port = _free_port()
    name = f"ep_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  ingest:
    type: http_server
    port: {port}
    endpoints:
      /v1/logs: otlp_logs_protobuf
sinks:
  out:
    type: memory
    inputs: [ingest]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        payload = encode_otlp_logs(
            [
                {"time_unix_nano": 1, "severity_text": "INFO", "body": "first"},
                {"time_unix_nano": 2, "severity_text": "WARN", "body": "second",
                 "attributes": {"k": "v"}},
            ],
            resource_attrs={"service.name": "svc"},
        )
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request(
                    "POST", "/v1/logs", body=payload,
                    headers={"Content-Type": "application/x-protobuf"},
                )
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        assert _wait_rows(spark, name, 2) == 2
        rows = spark.sql(f"SELECT codec, event FROM {name}").collect()
        assert all(r.codec == "otlp_logs_protobuf" for r in rows)
        evs = sorted((_json.loads(r.event) for r in rows),
                     key=lambda e: e["time_unix_nano"])
        assert [e["body"] for e in evs] == ["first", "second"]
        assert evs[1]["attributes"] == {"k": "v"}
        assert evs[0]["resource"] == {"service.name": "svc"}
        assert evs[1]["severity_text"] == "WARN"
    finally:
        for q in queries.values():
            q.stop()


def test_websocket_source_and_sink_loop(spark, tmp_path):
    """RFC 6455 both directions, pure stdlib: the websocket SERVER source
    accepts the upgrade and decodes masked client frames; the websocket
    client SINK performs the handshake (verifying Sec-WebSocket-Accept)
    and pushes one masked text frame per event. Wired together they form
    a full loop through a topology memory sink."""
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks
    from vector_spark.sinks import websocket_sink

    port = _free_port()
    name = f"ws_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  ws:
    type: websocket
    port: {port}
sinks:
  out: {{type: memory, inputs: [ws], query_name: {name}}}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        events = spark.createDataFrame(
            [(_json.dumps({"seq": i, "msg": f"ev-{i}"}),) for i in range(5)],
            "message string",
        ).coalesce(1)
        deadline = time.time() + 30
        sent = 0
        while time.time() < deadline and sent == 0:
            try:
                sent = websocket_sink(events, "127.0.0.1", port)
            except Exception:
                time.sleep(0.5)
        assert sent == 5
        assert _wait_rows(spark, name, 5) == 5
        rows = spark.sql(f"SELECT message FROM {name}").collect()
        seqs = sorted(_json.loads(r.message)["seq"] for r in rows)
        assert seqs == [0, 1, 2, 3, 4]
    finally:
        for q in queries.values():
            q.stop()


def test_heroku_logs_and_firehose_endpoints(spark, tmp_path):
    """heroku_logs (Logplex drain lines) and aws_kinesis_firehose
    (base64/gzip records envelope) endpoint codecs on one http_server."""
    import base64 as _b64
    import gzip as _gzip
    import http.client
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks

    port = _free_port()
    name = f"hf_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  ingest:
    type: http_server
    port: {port}
    endpoints:
      /events: heroku_logs
      /firehose: aws_kinesis_firehose
sinks:
  out: {{type: memory, inputs: [ingest], query_name: {name}}}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        logplex = (
            "83 <40>1 2024-01-02T03:04:05.000000+00:00 host app web.1 - "
            "State changed from starting to up\n"
            "119 <40>1 2024-01-02T03:04:06.000000+00:00 host heroku router - "
            "at=info method=GET path=/ status=200\n"
        )
        fh_lines = b"line one\nline two\n"
        firehose = _json.dumps(
            {
                "requestId": "req-123",
                "timestamp": 1700000000000,
                "records": [
                    {"data": _b64.b64encode(_gzip.compress(fh_lines)).decode()},
                    {"data": _b64.b64encode(b"plain third").decode()},
                ],
            }
        )
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request("POST", "/events", body=logplex,
                          headers={"Logplex-Msg-Count": "2"})
                assert c.getresponse().status == 200
                c.request("POST", "/firehose", body=firehose,
                          headers={"Content-Type": "application/json"})
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        assert _wait_rows(spark, name, 5) == 5
        rows = spark.sql(f"SELECT codec, event FROM {name}").collect()
        by = {}
        for r in rows:
            by.setdefault(r.codec, []).append(_json.loads(r.event))
        hk = sorted(by["heroku_logs"], key=lambda e: e["timestamp"])
        assert hk[0]["app_name"] == "app" and hk[0]["proc_id"] == "web.1"
        assert hk[0]["message"] == "State changed from starting to up"
        assert hk[1]["host"] == "host" and "at=info" in hk[1]["message"]
        fh = sorted(by["aws_kinesis_firehose"], key=lambda e: e["message"])
        assert [e["message"] for e in fh] == ["line one", "line two", "plain third"]
        assert all(e["request_id"] == "req-123" for e in fh)
    finally:
        for q in queries.values():
            q.stop()


def test_vector_to_vector_native_loop(spark, tmp_path):
    """vector-to-vector native protocol: a `vector` SINK pushes
    length-prefixed EventWrapper protobuf frames into a `vector` SOURCE
    (the v1 wire shape) — typed fields incl. ints and timestamps survive
    the wire."""
    import datetime as _dt
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks
    from vector_spark.sinks import vector_sink

    port = _free_port()
    name = f"vv_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  upstream:
    type: vector
    port: {port}
sinks:
  out: {{type: memory, inputs: [upstream], query_name: {name}}}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        events = spark.createDataFrame(
            [
                (i, f"msg-{i}", 1.5 * i, _dt.datetime(2024, 1, 2, 3, 4, i))
                for i in range(4)
            ],
            "seq long, message string, score double, ts timestamp",
        ).coalesce(1)
        deadline = time.time() + 30
        sent = 0
        while time.time() < deadline and sent == 0:
            try:
                sent = vector_sink(events, "127.0.0.1", port)
            except Exception:
                time.sleep(0.5)
        assert sent == 4
        assert _wait_rows(spark, name, 4) == 4
        rows = spark.sql(f"SELECT message FROM {name}").collect()
        evs = sorted((_json.loads(r.message) for r in rows), key=lambda e: e["seq"])
        assert [e["message"] for e in evs] == [f"msg-{i}" for i in range(4)]
        assert evs[2]["score"] == 3.0
        assert evs[1]["ts"].startswith("2024-01-02 03:04:01")
    finally:
        for q in queries.values():
            q.stop()


@pytest.mark.streaming
def test_http_server_datadog_agent_endpoints(spark):
    """datadog-agent intake endpoints (src/sources/datadog_agent/
    logs.rs, metrics.rs): /v1/input JSON log array and /api/v1/series
    metrics, one event per log object / per series POINT."""
    import http.client
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks

    port = _free_port()
    name = f"dd_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  agent:
    type: http_server
    port: {port}
    endpoints:
      /v1/input: datadog_logs
      /api/v1/series: datadog_series
sinks:
  out:
    type: memory
    inputs: [agent]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        logs = _json.dumps([
            {"message": "dd one", "status": "info", "hostname": "h1",
             "service": "svc", "ddsource": "nginx",
             "ddtags": "env:prod,team:a"},
            {"message": "dd two", "status": "error", "hostname": "h2",
             "service": "svc", "ddsource": "nginx", "ddtags": ""},
        ])
        series = _json.dumps({"series": [
            {"metric": "system.load.1", "type": "gauge", "host": "h1",
             "interval": 10, "tags": ["env:prod"],
             "points": [[1700000000, 0.5], [1700000010, 0.75]]},
        ]})
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request("POST", "/v1/input", body=logs)
                assert c.getresponse().status == 200
                c.request("POST", "/api/v1/series", body=series)
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        got = _wait_rows(spark, name, 4)  # 2 logs + 2 points
        assert got == 4
        rows = spark.sql(
            f"SELECT codec, event FROM {name} ORDER BY codec, event"
        ).collect()
        by_codec = {}
        for r in rows:
            by_codec.setdefault(r.codec, []).append(_json.loads(r.event))
        msgs = sorted(e["message"] for e in by_codec["datadog_logs"])
        assert msgs == ["dd one", "dd two"]
        assert by_codec["datadog_logs"][0]["ddsource"] == "nginx"
        pts = sorted(
            (e["timestamp"], e["value"]) for e in by_codec["datadog_series"]
        )
        assert pts == [(1700000000, 0.5), (1700000010, 0.75)]
        s0 = by_codec["datadog_series"][0]
        assert s0["metric"] == "system.load.1" and s0["type"] == "gauge"
        assert s0["host"] == "h1" and s0["tags"] == ["env:prod"]
        assert s0["interval"] == 10
    finally:
        for q in queries.values():
            q.stop()


@pytest.mark.streaming
def test_http_server_datadog_sketches_endpoint(spark):
    """datadog-agent protobuf sketches (/api/beta/sketches,
    proto/vector/dd_metric.proto SketchPayload): binary body through
    the base64 path, one event per dogsketch with the bin arrays."""
    import http.client
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks
    from vector_spark.functions.protowire import (
        DATADOG_REGISTRY,
        encode_message,
    )

    port = _free_port()
    name = f"dds_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  agent:
    type: http_server
    port: {port}
    endpoints:
      /api/beta/sketches: datadog_sketches
sinks:
  out:
    type: memory
    inputs: [agent]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        payload = encode_message(
            {"sketches": [{
                "metric": "request.latency", "host": "h9",
                "tags": ["env:prod"],
                "dogsketches": [
                    {"ts": 100, "cnt": 3, "min": 0.1, "max": 2.0,
                     "avg": 1.0, "sum": 3.0, "k": [-5, 0, 7],
                     "n": [1, 1, 1]},
                    {"ts": 110, "cnt": 1, "min": 0.5, "max": 0.5,
                     "avg": 0.5, "sum": 0.5, "k": [2], "n": [1]},
                ],
            }]},
            DATADOG_REGISTRY["SketchPayload"], DATADOG_REGISTRY,
        )
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request(
                    "POST", "/api/beta/sketches", body=payload,
                    headers={"Content-Type": "application/x-protobuf"},
                )
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        assert _wait_rows(spark, name, 2) == 2
        rows = spark.sql(
            f"SELECT codec, event FROM {name} ORDER BY event"
        ).collect()
        assert {r.codec for r in rows} == {"datadog_sketches"}
        events = sorted(
            (_json.loads(r.event) for r in rows), key=lambda e: e["ts"]
        )
        assert events[0]["metric"] == "request.latency"
        assert events[0]["host"] == "h9"
        assert events[0]["tags"] == ["env:prod"]
        # zigzag-coded bin keys survive, including the negative one
        assert events[0]["k"] == [-5, 0, 7] and events[0]["n"] == [1, 1, 1]
        assert events[1]["ts"] == 110 and events[1]["cnt"] == 1
    finally:
        for q in queries.values():
            q.stop()


@pytest.mark.streaming
def test_http_server_datadog_series_v2_endpoint(spark):
    """v2 MetricPayload protobuf (/api/v2/series): per-point fan-out
    with the series fields repeated."""
    import http.client
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks
    from vector_spark.functions.protowire import (
        DATADOG_REGISTRY,
        encode_message,
    )

    port = _free_port()
    name = f"ddv2_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  agent:
    type: http_server
    port: {port}
    endpoints:
      /api/v2/series: datadog_series_v2
sinks:
  out: {{type: memory, inputs: [agent], query_name: {name}}}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        payload = encode_message(
            {"series": [{
                "metric": "cpu.user", "type": 3, "tags": ["env:dev"],
                "unit": "percent", "interval": 10,
                "resources": [{"type": "host", "name": "h3"}],
                "points": [{"value": 0.25, "timestamp": 1700000000},
                           {"value": 0.5, "timestamp": 1700000010}],
            }]},
            DATADOG_REGISTRY["MetricPayload"], DATADOG_REGISTRY,
        )
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request("POST", "/api/v2/series", body=payload,
                          headers={"Content-Type":
                                   "application/x-protobuf"})
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        assert _wait_rows(spark, name, 2) == 2
        events = sorted(
            (_json.loads(r.event) for r in
             spark.sql(f"SELECT event FROM {name}").collect()),
            key=lambda e: e["timestamp"],
        )
        assert events[0]["metric"] == "cpu.user"
        assert events[0]["type"] == "gauge"
        assert events[0]["resources"] == [{"type": "host", "name": "h3"}]
        assert [(e["timestamp"], e["value"]) for e in events] == [
            (1700000000, 0.25), (1700000010, 0.5),
        ]
    finally:
        for q in queries.values():
            q.stop()


def test_http_server_request_surface():
    """The reference's SimpleHttpConfig request gating
    (src/sources/http_server.rs): Basic auth (401 on mismatch),
    method gating (405), strict path (404), custom success status,
    and header/query-parameter capture with wildcards into the meta
    column."""
    import http.client
    import json as _json
    import threading

    from vector_spark.sources import _http_listener, _ListenerState

    state = _ListenerState(None)
    port = _free_port()
    ready = threading.Event()
    opts = {
        "auth.username": "u1", "auth.password": "pw",
        "headers": "X-Trace-*,User-Agent",
        "query_parameters": "source,app*",
        "path": "/ingest", "strict_path": "true",
        "response_code": "201",
    }
    threading.Thread(
        target=_http_listener,
        args=(state, "127.0.0.1", port, ready, None, opts),
        daemon=True,
    ).start()
    assert ready.wait(5)

    import base64

    good_auth = "Basic " + base64.b64encode(b"u1:pw").decode()

    def req(method, path, body=b"x", headers=None):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        c.request(method, path, body=body, headers=headers or {})
        r = c.getresponse()
        r.read()
        c.close()
        return r.status

    # auth gating
    assert req("POST", "/ingest") == 401
    assert req("POST", "/ingest",
               headers={"Authorization": "Basic d3Jvbmc6bm8="}) == 401
    # method gating
    assert req("GET", "/ingest",
               headers={"Authorization": good_auth}) == 405
    # strict path gating
    assert req("POST", "/ingest/extra",
               headers={"Authorization": good_auth}) == 404
    # success: custom response code + captures
    status = req(
        "POST", "/ingest?source=web&appver=2&other=skip",
        body=b"hello-http",
        headers={"Authorization": good_auth,
                 "X-Trace-Id": "t-123",
                 "User-Agent": "curl/8",
                 "X-Other": "not-captured"})
    assert status == 201
    assert state.drain(-1) == [] or True  # entries appended async-safe
    entries = state.drain(-1)
    assert len(entries) == 1
    seq, ts, peer, path, message, meta = entries[0]
    assert path == "/ingest"
    assert message == "hello-http"
    m = _json.loads(meta)
    assert m["headers"] == {"X-Trace-Id": "t-123", "User-Agent": "curl/8"}
    assert m["query"] == {"source": "web", "appver": "2"}


def test_http_meta_merge_precedence(spark):
    """merge_http_meta: body beats captured headers; captured query
    parameters beat body (http_server.rs documented precedence)."""
    import json as _json

    from vector_spark.sources import merge_http_meta

    meta = _json.dumps({
        "headers": {"host": "from-header", "ua": "curl"},
        "query": {"level": "from-query"},
    })
    df = spark.createDataFrame(
        [
            (_json.dumps({"host": "from-body", "level": "info"}), meta),
            ("not json", meta),
            (_json.dumps({"v": 1}), "{}"),
        ],
        "message string, meta string",
    )
    got = [r.message for r in merge_http_meta(df).collect()]
    first = _json.loads(got[0])
    assert first == {"host": "from-body", "ua": "curl",
                     "level": "from-query"}
    assert got[1] == "not json"  # non-object passthrough
    assert _json.loads(got[2]) == {"v": 1}  # empty meta = identity


def test_splunk_hec_indexer_acknowledgements_end_to_end(spark):
    """Both halves of HEC indexer acknowledgements pin each other
    (src/sources/splunk_hec/acknowledgements.rs + the sink's ack
    polling): the ack-enabled listener assigns ackIds and answers
    /services/collector/ack; the ack-enabled sink sends with a
    channel, polls until True, and only then counts events as sent.
    Channel-less posts are rejected with Splunk's own error shape."""
    import http.client
    import json as _json
    import threading

    from vector_spark.sinks_services import splunk_hec_sink
    from vector_spark.sources import _http_listener, _ListenerState

    state = _ListenerState(None)
    port = _free_port()
    ready = threading.Event()
    threading.Thread(
        target=_http_listener,
        args=(state, "127.0.0.1", port, ready, None, {"hec.ack": "true"}),
        daemon=True,
    ).start()
    assert ready.wait(5)

    # channel-less post to a collector endpoint → Splunk error shape
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
    c.request("POST", "/services/collector/event",
              body=_json.dumps({"event": "x"}))
    r = c.getresponse()
    assert r.status == 400
    assert _json.loads(r.read()) == {"text": "Data channel is missing",
                                     "code": 10}
    c.close()

    # ack query for unknown ids → False
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
    c.request("POST", "/services/collector/ack",
              body=_json.dumps({"acks": [0, 7]}),
              headers={"X-Splunk-Request-Channel": "ch-1"})
    r = c.getresponse()
    assert r.status == 200
    assert _json.loads(r.read()) == {"acks": {"0": False, "7": False}}
    c.close()

    # the ack-enabled SINK against the ack-enabled listener
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("ev-1", 1700000000.0), ("ev-2", 1700000001.0),
         ("ev-3", 1700000002.0)],
        "message string, ts double",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts"))).coalesce(1)
    n = splunk_hec_sink(
        df, f"http://127.0.0.1:{port}", token="tk",
        batch_max_events=2, indexer_acknowledgements=True,
        ack_timeout_secs=10)
    assert n == 3
    msgs = [_json.loads(e[4])["event"] for e in state.drain(-1)]
    assert sorted(msgs) == ["ev-1", "ev-2", "ev-3"]


def test_udp_multicast_group_receive():
    """socket/udp multicast_groups: the listener joins the group at
    bind and receives datagrams sent to the group address
    (socket/udp.rs:46-75). Loopback multicast needs the interface set
    and IP_MULTICAST_LOOP (default on)."""
    import socket as _socket
    import threading
    import time

    from vector_spark.sources import _ListenerState
    from vector_spark.sources_core import _udp_listener

    group = "239.255.42.99"
    state = _ListenerState(None)
    port = _free_port()
    ready = threading.Event()
    threading.Thread(
        target=_udp_listener,
        args=(state, "0.0.0.0", port, ready, None,
              {"multicast_groups": group,
               "multicast_interface": "127.0.0.1"}),
        daemon=True,
    ).start()
    assert ready.wait(5)

    snd = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    snd.setsockopt(_socket.IPPROTO_IP, _socket.IP_MULTICAST_IF,
                   _socket.inet_aton("127.0.0.1"))
    snd.setsockopt(_socket.IPPROTO_IP, _socket.IP_MULTICAST_TTL, 1)
    for _ in range(3):
        snd.sendto(b"mc hello", (group, port))
        time.sleep(0.2)
        entries = state.drain(-1)
        if entries:
            break
    snd.close()
    assert entries and entries[0][-1] == "mc hello"


def test_unix_stream_socket_source(spark, tmp_path):
    """socket `mode: unix` (socket/unix.rs): framed events over an
    AF_UNIX stream socket, streamed live through the topology."""
    import socket as _socket

    from vector_spark.sources import register_sources

    path = str(tmp_path / "events.sock")

    register_sources(spark)
    df = (spark.readStream.format("unix_socket")
          .option("path", path).option("mode", "unix").load())
    q = (df.writeStream.format("memory").queryName("unix_sock_t")
         .trigger(processingTime="200 milliseconds").start())
    try:
        import time

        deadline = time.time() + 10
        while not __import__("os").path.exists(path):
            assert time.time() < deadline
            time.sleep(0.05)
        c = _socket.socket(_socket.AF_UNIX, _socket.SOCK_STREAM)
        c.connect(path)
        c.sendall(b"hello unix\nsecond line\n")
        c.close()
        while time.time() < deadline:
            rows = spark.sql("select * from unix_sock_t").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.2)
        msgs = {r["message"] for r in rows}
        assert msgs == {"hello unix", "second line"}
        assert rows[0]["peer"] == path
    finally:
        q.stop()


def test_unix_datagram_socket_source(spark, tmp_path):
    import socket as _socket
    import time

    from vector_spark.sources import register_sources

    register_sources(spark)
    path = str(tmp_path / "dgram.sock")
    df = (spark.readStream.format("unix_socket")
          .option("path", path).option("mode", "unix_datagram").load())
    q = (df.writeStream.format("memory").queryName("unix_dgram_t")
         .trigger(processingTime="200 milliseconds").start())
    try:
        deadline = time.time() + 10
        while not __import__("os").path.exists(path):
            assert time.time() < deadline
            time.sleep(0.05)
        c = _socket.socket(_socket.AF_UNIX, _socket.SOCK_DGRAM)
        c.sendto(b"dg one\ndg two", path)
        c.close()
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from unix_dgram_t").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.2)
        assert {r["message"] for r in rows} == {"dg one", "dg two"}
    finally:
        q.stop()
