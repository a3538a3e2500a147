"""http sink uri/header templating + http_client VRL request params
(the reference's 0.49-window features: "Templating landed on the http
sink's uri and request.headers"; "HTTP client sources accept VRL
expressions in query parameters and in the request body")."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def capture_server():
    requests: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            n = int(self.headers.get("Content-Length", 0))
            requests.append({
                "method": self.command,
                "path": self.path,
                "headers": dict(self.headers),
                "body": self.rfile.read(n),
            })
            body = b"a\nb\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        do_POST = _handle
        do_GET = _handle
        do_PUT = _handle

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", requests
    srv.shutdown()


def test_http_sink_uri_template_routes_per_event(spark, capture_server):
    from vector_spark.sinks import http_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [("app-a", "m1"), ("app-b", "m2"), ("app-a", "m3")],
        "app string, message string",
    ).coalesce(1)
    sent = http_sink(df, base + "/ingest/{{ app }}", encoding="json")
    assert sent == 3
    by_path: dict = {}
    for r in reqs:
        for line in r["body"].decode().splitlines():
            by_path.setdefault(r["path"], []).append(
                json.loads(line)["message"])
    assert sorted(by_path["/ingest/app-a"]) == ["m1", "m3"]
    assert by_path["/ingest/app-b"] == ["m2"]


def test_http_sink_header_template(spark, capture_server):
    from vector_spark.sinks import http_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [("t1", "x"), ("t2", "y")], "tenant string, message string"
    ).coalesce(1)
    sent = http_sink(
        df, base + "/in", encoding="json",
        headers={"X-Tenant": "{{ tenant }}", "X-Static": "s"},
    )
    assert sent == 2
    tenants = sorted(r["headers"]["X-Tenant"] for r in reqs)
    assert tenants == ["t1", "t2"]
    assert all(r["headers"]["X-Static"] == "s" for r in reqs)


def test_http_sink_null_render_drops_event(spark, capture_server):
    from vector_spark.sinks import http_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [("a", "keep"), (None, "drop")], "app string, message string"
    ).coalesce(1)
    sent = http_sink(df, base + "/r/{{ app }}", encoding="json")
    assert sent == 1  # MissingKeys: the null-render row is dropped
    assert [r["path"] for r in reqs] == ["/r/a"]


def test_http_sink_static_path_unchanged(spark, capture_server):
    from vector_spark.sinks import http_sink

    base, reqs = capture_server
    df = spark.createDataFrame([("m",)], "message string").coalesce(1)
    assert http_sink(df, base + "/plain", encoding="json") == 1
    assert reqs[0]["path"] == "/plain"


def test_http_client_vrl_query_params(spark, capture_server):
    from vector_spark.sources_pull import http_client_source

    base, reqs = capture_server
    out = http_client_source(
        spark, base + "/poll",
        query={
            "fixed": "value",
            "multi": ["a", "b"],
            "dyn": {"value": 'upcase("x")', "type": "vrl"},
        },
    )
    assert out.count() == 2  # "a\nb" body from the fixture
    path = reqs[0]["path"]
    assert "fixed=value" in path
    assert "multi=a" in path and "multi=b" in path
    assert "dyn=X" in path


def test_http_client_vrl_timestamp_param(spark, capture_server):
    from vector_spark.sources_pull import http_client_source

    base, reqs = capture_server
    http_client_source(
        spark, base + "/poll",
        query={"since": {"value": "now()", "type": "vrl"}},
    )
    import re

    m = re.search(r"since=(\d{4}-\d{2}-\d{2}T\d{2}%3A\d{2}%3A\d{2}Z)",
                  reqs[0]["path"])
    assert m, reqs[0]["path"]  # RFC3339-rendered timestamp


def test_http_client_vrl_body_and_method(spark, capture_server):
    from vector_spark.sources_pull import http_client_source

    base, reqs = capture_server
    http_client_source(
        spark, base + "/poll", method="PUT",
        body={"value": '"q=" + downcase("ABC")', "type": "vrl"},
    )
    assert reqs[0]["method"] == "PUT"
    assert reqs[0]["body"] == b"q=abc"


def test_http_client_through_loader(spark, capture_server):
    from vector_spark.config.loader import load_topology

    base, reqs = capture_server
    topo = load_topology(spark, f"""
sources:
  api:
    type: http_client
    url: "{base}/cfg"
    query:
      token:
        value: 'upcase("t")'
        type: vrl
sinks:
  out:
    type: memory
    inputs: [api]
""")
    from vector_spark.config.loader import run_sinks

    res = run_sinks(topo)
    assert len(res["out"]["rows"]) == 2
    assert "token=T" in reqs[0]["path"]


# ---- custom VRL auth on http_server -------------------------------------

def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_http_server_custom_vrl_auth():
    """server_auth.rs Custom strategy: the VRL program sees
    .headers/.address/.path, returns a boolean, and %field writes ride
    into authenticated events' meta."""
    import http.client
    import threading

    from vector_spark.sources import _http_listener, _ListenerState

    state = _ListenerState(None)
    port = _free_port()
    ready = threading.Event()
    opts = {
        "auth.source": (
            '%who = .address\n'
            '.headers.authorization == "Bearer tok" && '
            'starts_with(.path, "/in")'
        ),
    }
    threading.Thread(
        target=_http_listener,
        args=(state, "127.0.0.1", port, ready, None, opts),
        daemon=True,
    ).start()
    assert ready.wait(5)

    def req(path, headers=None):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        c.request("POST", path, body=b"payload", headers=headers or {})
        r = c.getresponse()
        r.read()
        c.close()
        return r.status

    assert req("/in") == 401                                 # no header
    assert req("/in", {"Authorization": "Bearer bad"}) == 401
    assert req("/out", {"Authorization": "Bearer tok"}) == 401  # path gate
    assert req("/in", {"Authorization": "Bearer tok"}) == 200
    entries = state.drain(-1)
    assert len(entries) == 1
    meta = json.loads(entries[0][-1])
    assert meta["auth"] == {"who": "127.0.0.1"}  # %who = .address


def test_custom_auth_compile_errors():
    from vector_spark.functions.vrl_compiler import VrlCompileError
    from vector_spark.functions.vrl_interp import vrl_auth_matcher

    # event root is read-only (server_auth.rs:157)
    with pytest.raises(VrlCompileError, match="read-only"):
        vrl_auth_matcher('.x = 1\ntrue')
    # unknown function fails at build, not on the first request
    with pytest.raises(VrlCompileError, match="unknown function"):
        vrl_auth_matcher('frobnicate(.path)')


def test_custom_auth_through_loader(spark):
    from vector_spark.config.loader import load_topology

    # compile-time validation: a bad program fails load_topology
    with pytest.raises(Exception, match="read-only"):
        load_topology(spark, """
sources:
  s:
    type: http_server
    address: "127.0.0.1:0"
    auth:
      strategy: custom
      source: ".x = 1\\ntrue"
sinks:
  o: {type: blackhole, inputs: [s]}
""")


# ---- splunk_hec second-stage framing + decoding -------------------------

def test_hec_second_stage_decoding(spark):
    """splunk_hec `event: {framing, decoding}` (mod.rs:140-153): the
    envelope's event field feeds through a second codec pass; one
    envelope fans out; failures are swallowed."""
    from vector_spark.sources_http import route_http_endpoints

    rows = [
        (0, "p", "/services/collector/event",
         json.dumps({"event": "a=1 b=2\nc=3", "host": "h1",
                     "sourcetype": "st"})),
        (1, "p", "/services/collector/event",
         json.dumps({"event": {"k": 1}, "host": "h2"})),
    ]
    df = spark.createDataFrame(
        rows, "seq long, peer string, path string, message string"
    ).withColumn("ts", F.current_timestamp())

    # logfmt codec, newline framing: envelope 0 fans out to 2 events
    out = route_http_endpoints(df, {
        "/services/collector/event": {
            "codec": "splunk_hec",
            "event": {"framing": "newline_delimited",
                      "decoding": {"codec": "logfmt"}},
        },
    })
    got = [json.loads(r["event"]) for r in
           out.orderBy("seq").collect()]
    fan0 = [g for g in got if g.get("host") == "h1"]
    assert len(fan0) == 2
    assert json.loads(fan0[0]["event"]) == {"a": "1", "b": "2"}
    assert json.loads(fan0[1]["event"]) == {"c": "3"}
    assert fan0[0]["sourcetype"] == "st"

    # json codec, default bytes framing: the non-JSON envelope is
    # swallowed, the object envelope passes through
    out2 = route_http_endpoints(df, {
        "/services/collector/event": {
            "codec": "splunk_hec", "event": {"decoding": {"codec": "json"}}},
    })
    got2 = [json.loads(r["event"]) for r in out2.collect()]
    assert len(got2) == 1
    assert json.loads(got2[0]["event"]) == {"k": 1}
    assert got2[0]["host"] == "h2"


def test_hec_without_second_stage_unchanged(spark):
    from vector_spark.sources_http import route_http_endpoints

    df = spark.createDataFrame(
        [(0, "p", "/services/collector/event",
          json.dumps({"event": "plain", "host": "h"}))],
        "seq long, peer string, path string, message string"
    ).withColumn("ts", F.current_timestamp())
    out = route_http_endpoints(
        df, {"/services/collector/event": "splunk_hec"})
    ev = json.loads(out.head()["event"])
    assert ev["event"] == "plain" and ev["host"] == "h"


def test_custom_auth_crypto_functions():
    """Auth programs can hash/hmac token material in-process (the
    interpreter's crypto slice; hex forms comparable to the Column
    registry's idioms)."""
    import hashlib
    import hmac as _hmac

    from vector_spark.functions.vrl_interp import vrl_auth_matcher

    tok_hash = hashlib.sha256(b"secret-token").hexdigest()
    chk = vrl_auth_matcher(f'sha2(.headers."x-token") == "{tok_hash}"')
    assert chk({"X-Token": "secret-token"}, "1.1.1.1", "/")[0] is True
    assert chk({"X-Token": "wrong"}, "1.1.1.1", "/")[0] is False

    sig = _hmac.new(b"k", b"payload-id", hashlib.sha256).hexdigest()
    chk2 = vrl_auth_matcher(f'hmac(.headers."x-id", "k") == "{sig}"')
    assert chk2({"X-Id": "payload-id"}, None, "/")[0] is True
    assert chk2({"X-Id": "other"}, None, "/")[0] is False
