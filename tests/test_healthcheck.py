"""Sink startup healthchecks (each reference sink factory returns a
Healthcheck future; --require-healthy aborts on failure, src/cli.rs:129).
Probes verified against in-process servers."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vector_spark.healthcheck import check_sink, healthcheck_sinks


@pytest.fixture()
def health_server():
    """Answers the reference's documented health paths; records hits."""
    hits: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def _serve(self):
            hits.append({"method": self.command, "path": self.path,
                         "headers": dict(self.headers)})
            code = 200
            if self.path.startswith("/boom"):
                code = 503
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()

        do_GET = _serve
        do_HEAD = _serve

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", hits
    srv.shutdown()


def test_http_sink_head_probe(health_server):
    base, hits = health_server
    res = check_sink("out", {"type": "http", "url": base + "/ingest"})
    assert res["healthy"] is True
    assert hits[0]["method"] == "HEAD"  # http/config.rs:191 Request::head


def test_elasticsearch_cluster_health_path(health_server):
    base, hits = health_server
    res = check_sink("es", {"type": "elasticsearch", "endpoint": base})
    assert res["healthy"] is True
    assert hits[0]["path"] == "/_cluster/health"


def test_clickhouse_select_1(health_server):
    base, hits = health_server
    assert check_sink("ch", {"type": "clickhouse",
                             "endpoint": base})["healthy"] is True
    assert hits[0]["path"] == "/?query=SELECT%201"


def test_splunk_hec_health_path(health_server):
    base, hits = health_server
    assert check_sink("h", {"type": "splunk_hec",
                            "endpoint": base})["healthy"] is True
    assert hits[0]["path"] == "/services/collector/health/1.0"


def test_loki_ready_path(health_server):
    base, hits = health_server
    assert check_sink("l", {"type": "loki",
                            "endpoint": base})["healthy"] is True
    assert hits[0]["path"] == "/ready"


def test_datadog_validate_with_api_key(health_server):
    base, hits = health_server
    res = check_sink("dd", {"type": "datadog_logs", "endpoint": base,
                            "default_api_key": "k-123"})
    assert res["healthy"] is True
    assert hits[0]["path"] == "/api/v1/validate"
    assert hits[0]["headers"].get("Dd-Api-Key") == "k-123"


def test_explicit_healthcheck_uri_wins(health_server):
    base, hits = health_server
    res = check_sink("x", {"type": "elasticsearch", "endpoint": "http://n/",
                           "healthcheck": {"uri": base + "/custom"}})
    assert res["healthy"] is True and hits[0]["path"] == "/custom"


def test_unexpected_status_unhealthy(health_server):
    base, _ = health_server
    res = check_sink("x", {"type": "loki", "endpoint": base,
                           "healthcheck": {"uri": base + "/boom"}})
    assert res["healthy"] is False and "503" in res["detail"]


def test_unreachable_unhealthy():
    res = check_sink("x", {"type": "http", "url": "http://127.0.0.1:1/x",
                           "healthcheck": {"timeout": 0.5}})
    assert res["healthy"] is False and "unreachable" in res["detail"]


def test_disabled_healthcheck_skips():
    res = check_sink("x", {"type": "http", "url": "http://127.0.0.1:1/x",
                           "healthcheck": False})
    assert res["healthy"] is None and res["detail"] == "disabled"


def test_socket_tcp_probe(health_server):
    base, _ = health_server
    host, port = base.removeprefix("http://").split(":")
    ok = check_sink("s", {"type": "socket", "host": host, "port": int(port)})
    assert ok["healthy"] is True
    bad = check_sink("s", {"type": "socket", "host": "127.0.0.1", "port": 1,
                           "healthcheck": {"timeout": 0.5}})
    assert bad["healthy"] is False


def test_no_probe_family_passes():
    res = check_sink("m", {"type": "memory"})
    assert res["healthy"] is None


def test_require_healthy_raises(health_server):
    base, _ = health_server
    sinks = {
        "ok": {"type": "loki", "endpoint": base},
        "bad": {"type": "loki", "endpoint": base,
                "healthcheck": {"uri": base + "/boom"}},
    }
    with pytest.raises(RuntimeError, match="bad: unexpected status 503"):
        healthcheck_sinks(sinks, require_healthy=True)
    res = healthcheck_sinks(sinks)  # non-strict mode reports
    assert res["ok"]["healthy"] is True and res["bad"]["healthy"] is False


def test_probe_traverses_proxy(health_server):
    # the healthcheck rides the same proxy decision as the transport
    from vector_spark.config.globals import ProxyConfig

    proxy, hits = health_server
    res = check_sink(
        "x", {"type": "http", "url": "http://target.invalid:9/i"},
        global_proxy=ProxyConfig(http=proxy),
    )
    assert res["healthy"] is True
    assert hits[0]["path"] == "http://target.invalid:9/i"  # absolute URI
