"""Vendor-tail sink request shaping against a local HTTP capture
server (axiom NDJSON + Bearer, appsignal log envelopes, keep x-api-key
array, mezmo lines+query+basic-auth, stackdriver entries, chronicle
batchCreate, datadog per-event posts, SNS Query-protocol Publish) and
a TCP capture for papertrail syslog lines. The sematext/humio wrappers
ride the already-tested ES-bulk/HEC sinks."""

from __future__ import annotations

import base64
import json
import socketserver
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks_vendors import (
    appsignal_sink,
    aws_sns_sink,
    axiom_sink,
    datadog_events_sink,
    gcp_chronicle_sink,
    gcp_stackdriver_logs_sink,
    humio_logs_sink,
    keep_sink,
    mezmo_sink,
    papertrail_sink,
    sematext_logs_sink,
)


@pytest.fixture()
def capture_server():
    requests: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            requests.append({
                "path": self.path,
                "headers": {k.lower(): v
                            for k, v in self.headers.items()},
                "body": self.rfile.read(n),
            })
            body = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", requests
    srv.shutdown()


def _events(spark, n=4):
    return spark.createDataFrame(
        [(i, f"msg {i}", f"app-{i % 2}", f"2024-03-05 06:07:{i:02d}")
         for i in range(n)],
        "seq long, message string, app string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(1)


def test_axiom_ndjson_bearer(spark, capture_server):
    base, reqs = capture_server
    n = axiom_sink(_events(spark), "tok", url=base + "/v1/ingest",
                   org_id="org7")
    assert n == 4
    h = reqs[0]["headers"]
    assert h["authorization"] == "Bearer tok"
    assert h["x-axiom-org-id"] == "org7"
    assert h["content-type"] == "application/x-ndjson"
    lines = reqs[0]["body"].decode().splitlines()
    assert len(lines) == 4
    assert json.loads(lines[0])["message"] == "msg 0"


def test_axiom_dataset_url():
    with pytest.raises(ValueError, match="url or dataset"):
        axiom_sink(None, "tok")


def test_appsignal_log_envelopes(spark, capture_server):
    base, reqs = capture_server
    n = appsignal_sink(_events(spark), "pushkey", endpoint=base)
    assert n == 4
    assert reqs[0]["path"] == "/vector/events"
    assert reqs[0]["headers"]["authorization"] == "Bearer pushkey"
    body = json.loads(reqs[0]["body"])
    assert len(body) == 4
    assert body[0]["log"]["message"] == "msg 0"


def test_keep_api_key_array(spark, capture_server):
    base, reqs = capture_server
    n = keep_sink(_events(spark), "kk", base + "/alerts/event/vector")
    assert n == 4
    assert reqs[0]["headers"]["x-api-key"] == "kk"
    assert len(json.loads(reqs[0]["body"])) == 4


def test_mezmo_lines_query_and_auth(spark, capture_server):
    base, reqs = capture_server
    n = mezmo_sink(_events(spark), "apik", "web-1", endpoint=base,
                   tags=["t1", "t2"])
    assert n == 4
    q = urllib.parse.parse_qs(
        urllib.parse.urlsplit(reqs[0]["path"]).query
    )
    assert q["hostname"] == ["web-1"]
    assert q["tags"] == ["t1,t2"]
    assert "now" in q
    want = "Basic " + base64.b64encode(b"apik:").decode()
    assert reqs[0]["headers"]["authorization"] == want
    body = json.loads(reqs[0]["body"])
    lines = body["lines"]
    assert len(lines) == 4
    assert lines[0]["line"] == "msg 0"
    assert lines[0]["app"] == "vector"
    assert lines[0]["env"] == "production"
    assert lines[0]["meta"]["app"] == "app-0"
    assert isinstance(lines[0]["timestamp"], int)


def test_sematext_wraps_es_bulk(spark, capture_server):
    base, reqs = capture_server
    n = sematext_logs_sink(_events(spark), "TOKEN123", endpoint=base)
    assert n == 4
    assert reqs[0]["path"] == "/_bulk"
    first_action = json.loads(
        reqs[0]["body"].decode().splitlines()[0]
    )
    assert first_action["index"]["_index"] == "TOKEN123"


def test_humio_wraps_hec(spark, capture_server):
    base, reqs = capture_server
    n = humio_logs_sink(_events(spark), "ingest-tok", endpoint=base)
    assert n == 4
    assert reqs[0]["path"] == "/services/collector/event"
    assert (reqs[0]["headers"]["authorization"]
            == "Splunk ingest-tok")


def test_gcp_stackdriver_entries(spark, capture_server):
    base, reqs = capture_server
    n = gcp_stackdriver_logs_sink(
        _events(spark), "projects/p/logs/app", "gcp-tok",
        resource_type="gce_instance",
        resource_labels={"zone": "us-1"},
        endpoint=base,
    )
    assert n == 4
    assert reqs[0]["path"] == "/v2/entries:write"
    assert reqs[0]["headers"]["authorization"] == "Bearer gcp-tok"
    body = json.loads(reqs[0]["body"])
    assert len(body["entries"]) == 4
    e = body["entries"][0]
    assert e["logName"] == "projects/p/logs/app"
    assert e["resource"] == {"type": "gce_instance",
                             "labels": {"zone": "us-1"}}
    assert e["jsonPayload"]["message"] == "msg 0"
    assert e["timestamp"].startswith("2024-03-05T06:07:00")


def test_gcp_chronicle_batch_create(spark, capture_server):
    base, reqs = capture_server
    n = gcp_chronicle_sink(
        _events(spark), "cust-1", "NIX_SYSLOG", "tok", endpoint=base
    )
    assert n == 4
    assert reqs[0]["path"] == "/v2/unstructuredlogentries:batchCreate"
    body = json.loads(reqs[0]["body"])
    assert body["customer_id"] == "cust-1"
    assert body["log_type"] == "NIX_SYSLOG"
    assert [e["log_text"] for e in body["entries"]] == [
        "msg 0", "msg 1", "msg 2", "msg 3"
    ]


def test_datadog_events_per_event_posts(spark, capture_server):
    base, reqs = capture_server
    df = spark.createDataFrame(
        [("deploy done", "all good", 1700000000),
         (None, "no title -> dropped", 1700000001),
         ("disk alert", "df 99%", 1700000002)],
        "title string, message string, ts long",
    ).coalesce(1)
    n = datadog_events_sink(df, "dd-key", endpoint=base)
    assert n == 2  # the title-less row drops (sink.rs:49)
    assert len(reqs) == 2  # ONE request per event — the API contract
    assert all(r["path"] == "/api/v1/events" for r in reqs)
    assert all(r["headers"]["dd-api-key"] == "dd-key" for r in reqs)
    bodies = sorted(json.loads(r["body"])["title"] for r in reqs)
    assert bodies == ["deploy done", "disk alert"]
    b = json.loads(reqs[0]["body"])
    assert b["text"] in ("all good", "df 99%")
    assert b["date_happened"] in (1700000000, 1700000002)


def test_aws_sns_query_publish(spark, capture_server):
    base, reqs = capture_server
    df = spark.createDataFrame([("hello",), ("world",)],
                               "message string").coalesce(1)
    n = aws_sns_sink(
        df, "arn:aws:sns:eu-west-1:1:topic", "eu-west-1",
        access_key="AK", secret_key="SK", endpoint=base + "/",
    )
    assert n == 2
    assert len(reqs) == 2
    form = urllib.parse.parse_qs(reqs[0]["body"].decode())
    assert form["Action"] == ["Publish"]
    assert form["TopicArn"] == ["arn:aws:sns:eu-west-1:1:topic"]
    assert form["Message"][0] in ("hello", "world")
    auth = reqs[0]["headers"]["authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AK/")
    assert "/eu-west-1/sns/aws4_request" in auth


class _TcpCapture(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.data = bytearray()
        super().__init__(("127.0.0.1", 0), _TcpHandler)


class _TcpHandler(socketserver.BaseRequestHandler):
    def handle(self):
        while True:
            try:
                d = self.request.recv(65536)
            except OSError:
                return
            if not d:
                return
            self.server.data.extend(d)


def test_papertrail_syslog_lines(spark):
    srv = _TcpCapture()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        n = papertrail_sink(_events(spark, 2), host, port,
                            appname="myapp")
        assert n == 2
        import time

        deadline = time.time() + 10
        while time.time() < deadline and \
                bytes(srv.data).count(b"\n") < 2:
            time.sleep(0.1)
        lines = bytes(srv.data).decode().splitlines()
        assert len(lines) == 2
        assert lines[0].startswith("<14>Mar 5 06:07:")
        assert " localhost myapp: msg " in lines[0]
    finally:
        srv.shutdown()


def test_vendor_sinks_via_topology_loader(spark, capture_server,
                                          tmp_path):
    base, reqs = capture_server
    src = tmp_path / "rows.jsonl"
    src.write_text("\n".join(
        json.dumps({"seq": i, "message": f"m{i}",
                    "ts": "2024-03-05 06:07:00"})
        for i in range(3)
    ))
    from vector_spark.config.loader import load_topology, run_sinks

    topo = load_topology(spark, f"""
sources:
  in:
    type: json
    path: "{src}"
    schema: "seq long, message string, ts timestamp"
sinks:
  ax: {{type: axiom, token: t, url: "{base}/ax", inputs: [in]}}
  kp: {{type: keep, api_key: k, endpoint: "{base}/kp", inputs: [in]}}
  mz: {{type: mezmo, api_key: k, hostname: h, endpoint: "{base}",
       inputs: [in]}}
""")
    res = run_sinks(topo)
    assert all(res[s]["sent"] == 3 for s in ("ax", "kp", "mz"))
    paths = {r["path"].split("?")[0] for r in reqs}
    assert {"/ax", "/kp", "/logs/ingest"} <= paths


def test_azure_monitor_logs_shared_key(spark, capture_server):
    import base64 as _b64
    import hashlib
    import hmac as _hmac

    from vector_spark.sinks_vendors import azure_monitor_logs_sink

    base, reqs = capture_server
    key = _b64.b64encode(b"workspace-secret-key").decode()
    n = azure_monitor_logs_sink(
        _events(spark), "ws-123", key, "VectorLogs", endpoint=base
    )
    assert n == 4
    assert reqs[0]["path"] == "/api/logs?api-version=2016-04-01"
    h = reqs[0]["headers"]
    assert h["log-type"] == "VectorLogs"
    assert h["time-generated-field"] == "ts"
    body = reqs[0]["body"]
    assert len(json.loads(body)) == 4
    # recompute the documented signature from the captured request:
    # POST\n{len}\napplication/json\nx-ms-date:{date}\n/api/logs
    sts = (f"POST\n{len(body)}\napplication/json\n"
           f"x-ms-date:{h['x-ms-date']}\n/api/logs")
    want = _b64.b64encode(_hmac.new(
        _b64.b64decode(key), sts.encode(), hashlib.sha256
    ).digest()).decode()
    assert h["authorization"] == f"SharedKey ws-123:{want}"


def test_greptimedb_logs_url_and_auth(spark, capture_server):
    from vector_spark.sinks_vendors import greptimedb_logs_sink

    base, reqs = capture_server
    n = greptimedb_logs_sink(
        _events(spark), base, "public", "logs",
        pipeline_version="v7", username="u", password="p",
        extra_params={"source": "vector"},
    )
    assert n == 4
    q = urllib.parse.parse_qs(
        urllib.parse.urlsplit(reqs[0]["path"]).query
    )
    assert urllib.parse.urlsplit(reqs[0]["path"]).path \
        == "/v1/events/logs"
    assert q["db"] == ["public"] and q["table"] == ["logs"]
    assert q["pipeline_name"] == ["greptime_identity"]
    assert q["pipeline_version"] == ["v7"]
    assert q["source"] == ["vector"]
    want = "Basic " + base64.b64encode(b"u:p").decode()
    assert reqs[0]["headers"]["authorization"] == want
    assert len(json.loads(reqs[0]["body"])) == 4


def test_doris_stream_load_headers_and_redirect(spark):
    """FE answers 307 to the BE (the stream-load contract); the sink
    must re-PUT the same body to Location with the label intact."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks_vendors import doris_sink

    requests: list[dict] = []

    class BE(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            requests.append({
                "role": "be", "path": self.path,
                "headers": {k.lower(): v
                            for k, v in self.headers.items()},
                "body": self.rfile.read(n),
            })
            body = b'{"Status":"Success"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    be = HTTPServer(("127.0.0.1", 0), BE)
    threading.Thread(target=be.serve_forever, daemon=True).start()
    be_url = f"http://127.0.0.1:{be.server_port}"

    class FE(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            requests.append({"role": "fe", "path": self.path})
            self.send_response(307)
            self.send_header("Location", be_url + self.path)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    fe = HTTPServer(("127.0.0.1", 0), FE)
    threading.Thread(target=fe.serve_forever, daemon=True).start()
    try:
        n = doris_sink(
            _events(spark, 3), f"http://127.0.0.1:{fe.server_port}",
            "db1", "t1", username="root", password="pw",
        )
        assert n == 3
        fe_reqs = [r for r in requests if r["role"] == "fe"]
        be_reqs = [r for r in requests if r["role"] == "be"]
        assert len(fe_reqs) == 1 and len(be_reqs) == 1
        assert fe_reqs[0]["path"] == "/api/db1/t1/_stream_load"
        h = be_reqs[0]["headers"]
        assert h["format"] == "json"
        assert h["read_json_by_line"] == "true"
        assert h["content-type"] == "text/plain;charset=utf-8"
        assert h["label"].startswith("vector_db1_t1_")
        want = "Basic " + base64.b64encode(b"root:pw").decode()
        assert h["authorization"] == want
        lines = be_reqs[0]["body"].decode().splitlines()
        assert len(lines) == 3
        assert json.loads(lines[0])["message"] == "msg 0"
    finally:
        fe.shutdown()
        be.shutdown()


def test_websocket_server_sink_broadcast(spark):
    """Two RFC 6455 subscribers each receive every event as an
    unmasked text frame."""
    import base64 as _b64
    import socket
    import struct

    from vector_spark.sinks import WebsocketServerSink

    server = WebsocketServerSink()
    try:
        def connect():
            s = socket.create_connection(("127.0.0.1", server.port),
                                         timeout=10)
            key = _b64.b64encode(b"0123456789abcdef").decode()
            s.sendall((
                f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode())
            resp = b""
            while b"\r\n\r\n" not in resp:
                resp += s.recv(4096)
            assert b" 101 " in resp.split(b"\r\n", 1)[0]
            return s

        def read_frames(s, want):
            buf = b""
            out = []
            while len(out) < want:
                buf += s.recv(4096)
                while len(buf) >= 2:
                    ln = buf[1] & 0x7F
                    off = 2
                    if ln == 126:
                        ln = struct.unpack(">H", buf[2:4])[0]
                        off = 4
                    if len(buf) < off + ln:
                        break
                    assert buf[0] == 0x81  # FIN + text, unmasked
                    out.append(buf[off:off + ln].decode())
                    buf = buf[off + ln:]
            return out

        c1, c2 = connect(), connect()
        df = spark.createDataFrame([("a",), ("b",), ("c",)],
                                   "message string").coalesce(1)
        n = server.broadcast(df, encoding="text")
        assert n == 3
        assert read_frames(c1, 3) == ["a", "b", "c"]
        assert read_frames(c2, 3) == ["a", "b", "c"]
    finally:
        server.close()


def test_azure_logs_ingestion_dcr_stream(spark, capture_server):
    from vector_spark.sinks_vendors import azure_logs_ingestion_sink

    base, reqs = capture_server
    n = azure_logs_ingestion_sink(
        _events(spark), base, "dcr-000abc", "Custom-VectorLogs_CL",
        "aad-token",
    )
    assert n == 4
    assert reqs[0]["path"] == (
        "/dataCollectionRules/dcr-000abc/streams/"
        "Custom-VectorLogs_CL?api-version=2023-01-01"
    )
    assert reqs[0]["headers"]["authorization"] == "Bearer aad-token"
    assert len(json.loads(reqs[0]["body"])) == 4


def _metrics(spark):
    return spark.createDataFrame(
        [("pool.used", "jvm", "counter", 42.0, 1597784400.0,
          {"os.host": "somehost"}),
         ("cpu.idle", None, "gauge", 97.5, 1597784401.0, None)],
        "name string, namespace string, metric_type string,"
        " value double, ts double, tags map<string,string>",
    ).coalesce(1)


def test_sematext_metrics_influx_lines_with_token_tag(
        spark, capture_server):
    from vector_spark.sinks_vendors import sematext_metrics_sink

    base, reqs = capture_server
    n = sematext_metrics_sink(_metrics(spark), "atoken",
                              default_namespace="ns", endpoint=base)
    assert n == 2
    path, _, query = reqs[0]["path"].partition("?")
    assert path == "/write"
    params = dict(urllib.parse.parse_qsl(query))
    assert params["db"] == "metrics"
    assert params["precision"] == "ns"
    assert params["v"].startswith("vector-")
    lines = reqs[0]["body"].decode().splitlines()
    # measurement=namespace, sorted tags incl. metric_type + token,
    # field key = metric name (metrics.rs:347 expected line)
    assert lines[0] == ("jvm,metric_type=counter,os.host=somehost,"
                        "token=atoken pool.used=42.0 1597784400000000000")
    assert lines[1] == ("ns,metric_type=gauge,token=atoken "
                        "cpu.idle=97.5 1597784401000000000")


def test_humio_metrics_wraps_metric_to_log_hec(spark, capture_server):
    from vector_spark.sinks_vendors import humio_metrics_sink

    base, reqs = capture_server
    n = humio_metrics_sink(_metrics(spark), "humio-token", endpoint=base)
    assert n == 2
    assert reqs[0]["path"] == "/services/collector/event"
    assert reqs[0]["headers"]["authorization"] == "Splunk humio-token"
    first = json.loads(reqs[0]["body"].split(b"\n")[0])
    # the HEC event carries the serialized metric (metric_to_log shape)
    inner = json.loads(first["event"])
    assert inner["name"] == "pool.used"
    assert inner["value"] == 42.0


def test_gcp_stackdriver_metrics_series_json(spark, capture_server):
    from vector_spark.sinks_vendors import gcp_stackdriver_metrics_sink

    base, reqs = capture_server
    n = gcp_stackdriver_metrics_sink(
        _metrics(spark), "my-proj", "tok",
        started_iso="2020-08-18T21:00:00.000000000Z",
        default_namespace="vec", endpoint=base,
    )
    assert n == 2
    assert all(r["path"] == "/v3/projects/my-proj/timeSeries"
               for r in reqs)
    assert reqs[0]["headers"]["authorization"] == "Bearer tok"
    # default batch of 1 event per request (config.rs:158)
    bodies = [json.loads(r["body"]) for r in reqs]
    assert all(len(b["timeSeries"]) == 1 for b in bodies)
    counter = bodies[0]["timeSeries"][0]
    assert counter["metric"]["type"] == \
        "custom.googleapis.com/jvm/metrics/pool.used"
    assert counter["metric"]["labels"] == {"os.host": "somehost"}
    assert counter["resource"] == {"type": "global", "labels": {}}
    assert counter["metricKind"] == "CUMULATIVE"
    assert counter["valueType"] == "INT64"
    pt = counter["points"][0]
    assert pt["value"]["int64Value"] == "42"
    assert pt["interval"]["startTime"] == "2020-08-18T21:00:00.000000000Z"
    assert pt["interval"]["endTime"] == "2020-08-18T21:00:00.000000000Z"
    gauge = bodies[1]["timeSeries"][0]
    assert gauge["metricKind"] == "GAUGE"
    assert "startTime" not in gauge["points"][0]["interval"]
    # namespace falls back to the default (request_builder.rs:73-76)
    assert gauge["metric"]["type"] == \
        "custom.googleapis.com/vec/metrics/cpu.idle"


def test_greptimedb_metrics_influx_lines(spark, capture_server):
    from vector_spark.sinks_vendors import greptimedb_metrics_sink

    base, reqs = capture_server
    n = greptimedb_metrics_sink(
        _metrics(spark), base, dbname="metricsdb",
        username="u", password="p",
    )
    assert n == 2
    path, _, query = reqs[0]["path"].partition("?")
    assert path == "/v1/influxdb/write"
    assert dict(urllib.parse.parse_qsl(query)) == {"db": "metricsdb"}
    assert reqs[0]["headers"]["authorization"].startswith("Basic ")
    lines = reqs[0]["body"].decode().splitlines()
    # measurement → table, tags sorted, `val` value column
    # (greptimedb/metrics/config.rs:114)
    assert lines[0] == ("pool.used,os.host=somehost val=42.0 "
                        "1597784400000000000")
    assert lines[1] == "cpu.idle val=97.5 1597784401000000000"


def test_sematext_metrics_reserved_tag_collision(spark, capture_server):
    """User tags named token/metric_type must not collide with the
    auth/type tags (the reference's tags.replace overwrite)."""
    from vector_spark.sinks_vendors import sematext_metrics_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [("m", "ns", "gauge", 1.0, 1597784400.0,
          {"token": "spoofed", "metric_type": "wrong", "ok": "y"})],
        "name string, namespace string, metric_type string,"
        " value double, ts double, tags map<string,string>",
    ).coalesce(1)
    n = sematext_metrics_sink(df, "realtoken", endpoint=base)
    assert n == 1
    line = reqs[0]["body"].decode().strip()
    assert line == ("ns,metric_type=gauge,ok=y,token=realtoken "
                    "m=1.0 1597784400000000000")
