"""Global config options (lib/vector-core/src/config/global_options.rs):
log_schema key remapping, the default `timezone` for naive timestamp
parses, proxy config merge + no_proxy matching, and per-sink
healthcheck/buffer option-shape validation at load time."""

from __future__ import annotations

import pytest

from vector_spark.config.globals import (
    BufferConfig,
    GlobalOptions,
    GlobalsError,
    HealthcheckOptions,
    LogSchema,
    ProxyConfig,
    resolve_timezone,
)
from vector_spark.config.loader import TopologyError, load_topology, run_sinks


# --------------------------------------------------------------------------
# log_schema


def test_log_schema_defaults_and_renames():
    ls = LogSchema.parse(None)
    assert ls.message_key == "message" and ls.renames() == {}
    ls = LogSchema.parse({"message_key": "msg", "host_key": "node"})
    assert ls.renames() == {"message": "msg", "host": "node"}


def test_log_schema_rejects_unknown_field():
    with pytest.raises(GlobalsError, match="unknown field"):
        LogSchema.parse({"messages_key": "x"})


def test_log_schema_message_key_applies_end_to_end(spark):
    # the source's `message` lands under the configured key, user VRL
    # references the custom name, and the text-encoding sink default
    # follows it (log_schema.rs:48-90)
    yaml = """
log_schema:
  message_key: msg
sources:
  lines:
    type: values
    rows:
      - {seq: 1, message: "alpha", host: "h1"}
      - {seq: 2, message: "beta",  host: "h1"}
transforms:
  shaped:
    type: remap
    inputs: [lines]
    source: |
      .upper = upcase(.msg)
sinks:
  out:
    type: memory
    inputs: [shaped]
"""
    topo = load_topology(spark, yaml)
    rows = sorted(run_sinks(topo)["out"]["rows"], key=lambda r: r.seq)
    assert [r.msg for r in rows] == ["alpha", "beta"]
    assert rows[0].upper == "ALPHA"
    assert "message" not in rows[0].asDict()


def test_log_schema_host_key_rename(spark):
    yaml = """
log_schema:
  host_key: machine
sources:
  lines:
    type: values
    rows:
      - {seq: 1, message: "x", host: "h9"}
sinks:
  out: {type: memory, inputs: [lines]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert rows[0].machine == "h9"


# --------------------------------------------------------------------------
# timezone


def test_resolve_timezone_validates():
    assert resolve_timezone("America/New_York") == "America/New_York"
    with pytest.raises(GlobalsError, match="unknown zone"):
        resolve_timezone("Mars/Olympus_Mons")
    assert resolve_timezone("local")  # resolves to something non-empty


def test_global_timezone_applies_to_naive_parse(spark):
    # 2024-07-01 12:00 wall time in New York is 16:00 UTC (EDT, UTC-4);
    # the global timezone interprets the NAIVE parse in that zone
    # (global_options.rs:100-109)
    yaml = """
timezone: America/New_York
sources:
  lines:
    type: values
    rows:
      - {seq: 1, message: "01/07/2024 12:00:00"}
transforms:
  shaped:
    type: remap
    inputs: [lines]
    source: |
      .t = parse_timestamp!(.message, "%d/%m/%Y %H:%M:%S")
sinks:
  out: {type: memory, inputs: [shaped]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert rows[0].t.hour == 16


def test_remap_timezone_overrides_global(spark):
    # remap-level `timezone` wins (src/transforms/remap.rs:105-114);
    # Tokyo is UTC+9 (no DST): 12:00 wall -> 03:00 UTC
    yaml = """
timezone: America/New_York
sources:
  lines:
    type: values
    rows:
      - {seq: 1, message: "01/07/2024 12:00:00"}
transforms:
  shaped:
    type: remap
    timezone: Asia/Tokyo
    inputs: [lines]
    source: |
      .t = parse_timestamp!(.message, "%d/%m/%Y %H:%M:%S")
sinks:
  out: {type: memory, inputs: [shaped]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert rows[0].t.hour == 3


def test_timezone_ignored_for_zone_carrying_format(spark):
    # a format with %z carries its own zone — the default must NOT
    # double-shift it
    yaml = """
timezone: Asia/Tokyo
sources:
  lines:
    type: values
    rows:
      - {seq: 1, message: "01/07/2024 12:00:00 +0200"}
transforms:
  shaped:
    type: remap
    inputs: [lines]
    source: |
      .t = parse_timestamp!(.message, "%d/%m/%Y %H:%M:%S %z")
sinks:
  out: {type: memory, inputs: [shaped]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert rows[0].t.hour == 10  # 12:00+02:00 == 10:00 UTC


# --------------------------------------------------------------------------
# proxy


def test_no_proxy_pattern_table():
    # the documented matrix (proxy.rs:76-92)
    p = ProxyConfig(http="http://p:3128",
                    no_proxy=("example.com", ".corp.net", "127.0.0.1",
                              "10.0.0.0/8", "off.host:8080"))
    url = p.proxy_url_for
    assert url("http://example.com/a") is None          # exact domain
    assert url("http://sub.example.com/a") is None      # bare matches subdomain
    assert url("http://corp.net/a") is None             # .wildcard base
    assert url("http://x.corp.net/a") is None           # .wildcard subdomain
    assert url("http://127.0.0.1:9/a") is None          # IP
    assert url("http://10.20.30.40/a") is None          # CIDR
    assert url("http://off.host:8080/a") is None        # host:port match
    assert url("http://off.host:9090/a") == "http://p:3128"  # port differs
    assert url("http://other.io/a") == "http://p:3128"


def test_no_proxy_splat_and_disabled():
    assert ProxyConfig(http="http://p:1", no_proxy=("*",)) \
        .proxy_url_for("http://x.io") is None
    assert ProxyConfig(enabled=False, http="http://p:1") \
        .proxy_url_for("http://x.io") is None


def test_proxy_scheme_selection():
    p = ProxyConfig(http="http://hp:1", https="http://sp:2")
    assert p.proxy_url_for("http://a.io") == "http://hp:1"
    assert p.proxy_url_for("https://a.io") == "http://sp:2"
    assert ProxyConfig(https="http://sp:2").proxy_url_for("http://a.io") is None


def test_proxy_merge_order_config_over_env():
    # proxy.rs:120-123 merge_with_env: env is the base, explicit config
    # overrides; component overrides global; enabled ANDs
    env = {"http_proxy": "http://env:1", "no_proxy": "env.host"}
    g = ProxyConfig(http="http://glob:2")
    c = ProxyConfig(http="http://comp:3", no_proxy=("comp.host",))
    eff = ProxyConfig.merge_with_env(g, c, env)
    assert eff.http == "http://comp:3"
    assert eff.no_proxy == ("comp.host",)
    eff2 = ProxyConfig.merge_with_env(ProxyConfig(), None, env)
    assert eff2.http == "http://env:1"
    assert eff2.no_proxy == ("env.host",)
    off = ProxyConfig.merge_with_env(ProxyConfig(enabled=False), None, env)
    assert off.enabled is False


def test_proxy_lowercase_env_wins():
    env = {"http_proxy": "http://low:1", "HTTP_PROXY": "http://up:2"}
    assert ProxyConfig.from_env(env).http == "http://low:1"


# --------------------------------------------------------------------------
# per-sink option shapes fail at load time


def test_bad_buffer_rejected_at_load(spark):
    yaml = """
sources:
  s: {type: values, rows: [{seq: 1, message: "x"}]}
sinks:
  out:
    type: memory
    inputs: [s]
    buffer: {type: memory, max_size: 1000}
"""
    with pytest.raises(TopologyError, match="max_size"):
        load_topology(spark, yaml)


def test_bad_healthcheck_rejected_at_load(spark):
    yaml = """
sources:
  s: {type: values, rows: [{seq: 1, message: "x"}]}
sinks:
  out:
    type: memory
    inputs: [s]
    healthcheck: {enable: true}
"""
    with pytest.raises(TopologyError, match="unknown field"):
        load_topology(spark, yaml)


def test_buffer_validation_matrix():
    # lib/vector-buffers/src/config.rs:87-109
    ok = BufferConfig.parse({"type": "disk", "max_size": 1 << 20})
    assert ok.stages[0].kind == "disk"
    assert BufferConfig.parse(None).stages == ()
    dflt = BufferConfig.parse({})
    assert dflt.stages[0].max_events == 500  # memory default
    with pytest.raises(GlobalsError, match="requires `max_size`"):
        BufferConfig.parse({"type": "disk"})
    with pytest.raises(GlobalsError, match="max_events"):
        BufferConfig.parse({"type": "disk", "max_size": 10, "max_events": 5})
    with pytest.raises(GlobalsError, match="unknown variant"):
        BufferConfig.parse({"when_full": "explode"})
    with pytest.raises(GlobalsError, match="last stage"):
        BufferConfig.parse([{"type": "memory", "when_full": "overflow"}])
    two = BufferConfig.parse([
        {"type": "memory", "max_events": 10, "when_full": "overflow"},
        {"type": "disk", "max_size": 1 << 20},
    ])
    assert [s.kind for s in two.stages] == ["memory", "disk"]


def test_healthcheck_bool_or_struct():
    assert HealthcheckOptions.parse(True).enabled
    assert not HealthcheckOptions.parse(False).enabled
    hc = HealthcheckOptions.parse({"uri": "http://h/ping", "timeout": 1.5})
    assert hc.uri == "http://h/ping" and hc.timeout == 1.5


# --------------------------------------------------------------------------
# wildcard inputs (graph.rs add_input + the wildcard_matching global)


def test_wildcard_inputs_expand(spark):
    yaml = """
sources:
  app-a: {type: values, rows: [{seq: 1, message: "a"}]}
  app-b: {type: values, rows: [{seq: 2, message: "b"}]}
  other: {type: values, rows: [{seq: 3, message: "c"}]}
sinks:
  out:
    type: memory
    inputs: ["app-*"]
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert sorted(r.seq for r in rows) == [1, 2]


def test_wildcard_matches_named_ports(spark):
    yaml = """
sources:
  s: {type: values, rows: [{seq: 1, level: "error", message: "x"},
                           {seq: 2, level: "info", message: "y"}]}
transforms:
  split:
    type: route
    inputs: [s]
    routes:
      - {name: errors, condition: "level = 'error'"}
      - {name: infos,  condition: "level = 'info'"}
sinks:
  out:
    type: memory
    inputs: ["split.*"]
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    # both ports matched (the _unmatched port is empty)
    assert sorted(r.seq for r in rows) == [1, 2]


def test_wildcard_strict_errors_on_no_match(spark):
    yaml = """
sources:
  s: {type: values, rows: [{seq: 1, message: "x"}]}
sinks:
  out: {type: memory, inputs: ["nope-*"]}
"""
    with pytest.raises(TopologyError, match="didn't match any"):
        load_topology(spark, yaml)


def test_wildcard_relaxed_allows_no_match(spark):
    yaml = """
wildcard_matching: relaxed
sources:
  s: {type: values, rows: [{seq: 1, message: "x"}]}
sinks:
  out: {type: memory, inputs: [s, "nope-*"]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert [r.seq for r in rows] == [1]


def test_wildcard_excludes_self_match(spark):
    # a transform whose glob would match itself must not self-edge
    yaml = """
sources:
  t-src: {type: values, rows: [{seq: 1, message: "x"}]}
transforms:
  t-shape:
    type: remap
    inputs: ["t-*"]
    assign: {up: "upper(message)"}
sinks:
  out: {type: memory, inputs: [t-shape]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert rows[0].up == "X"


# --------------------------------------------------------------------------
# proxy: live wire tests through run_sinks


@pytest.fixture()
def proxy_server():
    """A forward-proxy capture: receives proxy-style requests (absolute
    URI in the request line) and answers 200 without forwarding."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    seen: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen.append({
                "uri": self.path,  # absolute URI when proxied
                "headers": dict(self.headers),
                "body": self.rfile.read(n),
            })
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", seen
    srv.shutdown()


def test_http_sink_traverses_global_proxy(spark, proxy_server):
    proxy_url, seen = proxy_server
    yaml = f"""
proxy:
  http: "{proxy_url}"
sources:
  s:
    type: values
    rows:
      - {{seq: 1, message: "hello"}}
sinks:
  out:
    type: http
    inputs: [s]
    url: "http://target.invalid:9/ingest"
    encoding: text
"""
    from vector_spark.config.loader import load_topology, run_sinks

    run_sinks(load_topology(spark, yaml))
    assert seen, "proxy never saw the request"
    # proxy-style request line: the FULL target URI
    assert seen[0]["uri"] == "http://target.invalid:9/ingest"
    assert seen[0]["body"] == b"hello\n"


def test_http_sink_no_proxy_goes_direct(spark, proxy_server):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    proxy_url, proxied = proxy_server
    direct: list[bytes] = []

    class Target(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            direct.append(self.rfile.read(n))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    tgt = HTTPServer(("127.0.0.1", 0), Target)
    threading.Thread(target=tgt.serve_forever, daemon=True).start()
    yaml = f"""
proxy:
  http: "{proxy_url}"
  no_proxy: ["127.0.0.1"]
sources:
  s: {{type: values, rows: [{{seq: 1, message: "direct"}}]}}
sinks:
  out:
    type: http
    inputs: [s]
    url: "http://127.0.0.1:{tgt.server_port}/ingest"
    encoding: text
"""
    from vector_spark.config.loader import load_topology, run_sinks

    run_sinks(load_topology(spark, yaml))
    tgt.shutdown()
    assert direct == [b"direct\n"]
    assert not proxied


def test_component_proxy_overrides_global(spark, proxy_server):
    comp_proxy, seen = proxy_server
    yaml = f"""
proxy:
  http: "http://global-proxy.invalid:9"
sources:
  s: {{type: values, rows: [{{seq: 1, message: "x"}}]}}
sinks:
  out:
    type: http
    inputs: [s]
    url: "http://target.invalid:9/i"
    encoding: text
    proxy:
      http: "{comp_proxy}"
"""
    from vector_spark.config.loader import load_topology, run_sinks

    run_sinks(load_topology(spark, yaml))
    assert seen and seen[0]["uri"] == "http://target.invalid:9/i"


def test_proxy_basic_auth_header(proxy_server):
    # user:pass in the proxy URL becomes Proxy-Authorization basic auth
    # (proxy.rs:162-170)
    import urllib.request

    from vector_spark.config.globals import urlopen_via

    proxy_url, seen = proxy_server
    authed = proxy_url.replace("http://", "http://u%40x:p%3Aw@")
    req = urllib.request.Request("http://t.invalid:9/z", data=b"b")
    urlopen_via(req, 5.0, authed).read()
    assert seen[0]["headers"].get("Proxy-Authorization") == \
        "Basic " + __import__("base64").b64encode(b"u@x:p:w").decode()


# --------------------------------------------------------------------------
# the rest of the bundle


def test_expire_metrics_secs_drops_idle_counters():
    import time

    from vector_spark.api_server import TopologyView

    view = TopologyView({}, {}, {}, expire_metrics_secs=0.2)
    view.bump("s", "sent_events_total", 5)
    assert view.live_counters("s") == {"sent_events_total": 5}
    time.sleep(0.3)
    assert view.live_counters("s") == {}  # expired
    view.bump("s", "sent_events_total", 1)
    assert view.live_counters("s")["sent_events_total"] == 6  # refreshed
    never = TopologyView({}, {}, {})  # no expiry configured
    never.bump("s", "sent_events_total", 1)
    time.sleep(0.05)
    assert never.live_counters("s") == {"sent_events_total": 1}


def test_global_options_parse_misc(tmp_path):
    gl = GlobalOptions.parse({
        "data_dir": str(tmp_path / "state"),
        "acknowledgements": {"enabled": True},
        "expire_metrics_secs": 30,
    })
    assert gl.acknowledgements is True
    assert gl.expire_metrics_secs == 30.0
    d = gl.resolve_data_dir()
    import os

    assert os.path.isdir(d)
    # deprecated expire_metrics duration table
    gl2 = GlobalOptions.parse({"expire_metrics": {"secs": 2, "nanos": 5e8}})
    assert gl2.expire_metrics_secs == 2.5
    with pytest.raises(GlobalsError, match="missing data_dir"):
        GlobalOptions.parse({}).resolve_data_dir()


def test_parse_timestamp_rfc3339_dispatch(spark):
    # the %+ fraction-length dispatch must accept everything the former
    # 6-format coalesce chain accepted
    from pyspark.sql import functions as F

    from vector_spark.functions.vrl import parse_timestamp

    vals = [
        "2024-07-01T12:00:00.123+02:00",
        "2024-07-01T12:00:00.123Z",
        "2024-07-01T12:00:00.123456+00:00",
        "2024-07-01T12:00:00.123456Z",
        "2024-07-01T12:00:00+02:00",
        "2024-07-01T12:00:00Z",
        "not a time",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = [r.t for r in
           df.select(parse_timestamp(F.col("s"), "%+").alias("t")).collect()]
    assert out[0].hour == 10 and out[0].microsecond == 123000
    assert out[1].hour == 12
    assert out[2].microsecond == 123456
    assert out[3].hour == 12 and out[3].microsecond == 123456
    assert out[4].hour == 10 and out[5].hour == 12
    assert out[6] is None


def test_format_timestamp_timezone_arg(spark):
    # VRL format_timestamp's optional timezone renders the UTC instant
    # as wall time in that zone
    yaml = """
sources:
  lines:
    type: values
    rows:
      - {seq: 1, message: "2024-07-01T16:00:00Z"}
transforms:
  shaped:
    type: remap
    inputs: [lines]
    source: |
      t = parse_timestamp!(.message, "%+")
      .ny = format_timestamp!(t, format: "%H:%M", timezone: "America/New_York")
      .utc = format_timestamp!(t, format: "%H:%M")
sinks:
  out: {type: memory, inputs: [shaped]}
"""
    rows = run_sinks(load_topology(spark, yaml))["out"]["rows"]
    assert rows[0].ny == "12:00"   # EDT = UTC-4
    assert rows[0].utc == "16:00"
