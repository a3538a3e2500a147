"""Pull/poll sources (exec, http_client, prometheus_scrape, host_metrics,
static_metrics, stdin) and push sinks (http, socket, prometheus_exporter):
real bytes through real endpoints, value-level assertions."""

from __future__ import annotations

import io
import json
import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks import http_sink, prometheus_exporter_sink, socket_sink
from vector_spark.sources_pull import (
    exec_source,
    host_metrics_source,
    http_client_source,
    prometheus_scrape_source,
    static_metrics_source,
    stdin_source,
)

PROM_BODY = (
    "# HELP up Is the target up\n"
    "# TYPE up gauge\n"
    'up{job="api",instance="a:9090"} 1\n'
    'http_requests_total{job="api",code="200"} 1027\n'
    "process_start_time_seconds 1234.5\n"
)

# mod_status ?auto shape (field set from the reference's parser tests,
# src/sources/apache_metrics/parser.rs; BusyWorkers/IdleWorkers repeated
# per https://bz.apache.org/bugzilla/show_bug.cgi?id=63300 — last wins)
APACHE_BODY = (
    "localhost\n"
    "ServerVersion: Apache/2.4.46 (Unix)\n"
    "ServerMPM: event\n"
    "ServerUptimeSeconds: 12\n"
    "Total Accesses: 30\n"
    "Total kBytes: 20\n"
    "Total Duration: 11\n"
    "CPUUser: .2\n"
    "CPUSystem: .02\n"
    "CPUChildrenUser: 0\n"
    "CPUChildrenSystem: 0\n"
    "CPULoad: 1.83333\n"
    "BusyWorkers: 1\n"
    "IdleWorkers: 74\n"
    "ConnsTotal: 4\n"
    "ConnsAsyncWriting: 1\n"
    "ConnsAsyncKeepAlive: 2\n"
    "ConnsAsyncClosing: 0\n"
    "BusyWorkers: 1\n"
    "IdleWorkers: 74\n"
    "Scoreboard: "
    "____S_____I______R____W___" + "." * 25 + "\n"
)

# exact stub_status shape from the reference's parser test
# (src/sources/nginx_metrics/parser.rs:83)
NGINX_BODY = (
    "Active connections: 291 \n"
    "server accepts handled requests\n"
    " 16630948 16630948 31070465 \n"
    "Reading: 6 Writing: 179 Waiting: 106 \n"
)


@pytest.fixture(scope="module")
def http_fixture():
    """One-thread HTTP server: GET serves canned bodies by path, POST
    records bodies for the sink tests."""
    posts: list[bytes] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            bodies = {
                "/lines": "alpha\nbeta\ngamma\n",
                "/array": json.dumps([{"a": 1}, {"a": 2}]),
                "/metrics": PROM_BODY,
                "/server-status": APACHE_BODY,
                "/stub_status": NGINX_BODY,
                "/ecs-stats": json.dumps({
                    "c1": {"read": "2020-01-01T00:00:00Z", "name": "app",
                           "memory_stats": {"usage": 99}},
                }),
            }
            body = bodies.get(self.path, "").encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            posts.append(self.rfile.read(n))
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", posts
    srv.shutdown()


def test_exec_source(spark):
    df = exec_source(spark, "printf 'one\\ntwo\\nthree\\n'")
    rows = df.orderBy("seq").collect()
    assert [r["message"] for r in rows] == ["one", "two", "three"]
    assert rows[0]["source_type"] == "exec"
    assert rows[0]["ts"] is not None


def test_exec_source_argv(spark):
    df = exec_source(spark, ["echo", "hello world"])
    assert df.head()["message"] == "hello world"


def test_http_client_lines(spark, http_fixture):
    base, _ = http_fixture
    df = http_client_source(spark, base + "/lines")
    assert [r["message"] for r in df.orderBy("seq").collect()] == [
        "alpha", "beta", "gamma",
    ]


def test_http_client_json_array(spark, http_fixture):
    base, _ = http_fixture
    df = http_client_source(spark, base + "/array", decode="json_array")
    msgs = [json.loads(r["message"]) for r in df.orderBy("seq").collect()]
    assert msgs == [{"a": 1}, {"a": 2}]


def test_apache_metrics_source(spark, http_fixture):
    from vector_spark.sources_pull import apache_metrics_source

    base, _ = http_fixture
    df = apache_metrics_source(spark, base + "/server-status")
    rows = df.collect()
    by_key = {
        (r["name"], tuple(sorted((r["tags"] or {}).items()))): r for r in rows
    }

    def get(name, **tags):
        for (n, t), r in by_key.items():
            if n == name and all((k, v) in t for k, v in tags.items()):
                return r
        raise KeyError((name, tags))

    assert get("uptime_seconds_total")["value"] == 12.0
    assert get("uptime_seconds_total")["kind"] == "counter"
    assert get("access_total")["value"] == 30.0
    # Total kBytes scales to bytes (parser.rs TotalKBytes * 1024)
    assert get("sent_bytes_total")["value"] == 20 * 1024.0
    assert get("duration_seconds_total")["value"] == 11.0
    assert get("cpu_seconds_total", type="user")["value"] == 0.2
    assert get("cpu_seconds_total", type="system")["value"] == 0.02
    assert get("cpu_load")["value"] == 1.83333
    assert get("workers", state="busy")["value"] == 1.0
    assert get("workers", state="idle")["value"] == 74.0
    assert get("connections", state="total")["value"] == 4.0
    assert get("connections", state="keepalive")["value"] == 2.0
    # scoreboard explodes into one gauge per state, zeros included
    assert get("scoreboard", state="waiting")["value"] == 22.0
    assert get("scoreboard", state="open")["value"] == 25.0
    assert get("scoreboard", state="starting")["value"] == 1.0
    assert get("scoreboard", state="dnslookup")["value"] == 0.0
    states = {
        dict(t)["state"] for (n, t), _ in by_key.items() if n == "scoreboard"
    }
    assert len(states) == 11
    assert all(r["namespace"] == "apache" for r in rows)
    assert all(
        (r["tags"] or {}).get("endpoint", "").endswith("/server-status")
        for r in rows
    )


def test_nginx_metrics_source(spark, http_fixture):
    from vector_spark.sources_pull import nginx_metrics_source

    base, _ = http_fixture
    df = nginx_metrics_source(spark, base + "/stub_status")
    rows = {r["name"]: r for r in df.collect()}
    assert rows["up"]["value"] == 1.0
    assert rows["connections_active"]["value"] == 291.0
    assert rows["connections_accepted_total"]["value"] == 16630948.0
    assert rows["connections_accepted_total"]["kind"] == "counter"
    assert rows["connections_handled_total"]["value"] == 16630948.0
    assert rows["http_requests_total"]["value"] == 31070465.0
    assert rows["connections_reading"]["value"] == 6.0
    assert rows["connections_writing"]["value"] == 179.0
    assert rows["connections_waiting"]["value"] == 106.0
    assert all(r["namespace"] == "nginx" for r in rows.values())


def test_nginx_metrics_down_endpoint_emits_up_zero(spark, http_fixture):
    from vector_spark.sources_pull import nginx_metrics_source

    base, _ = http_fixture
    # /lines is a live URL but NOT a stub_status body → parse fails → up 0
    df = nginx_metrics_source(spark, base + "/lines")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "up" and rows[0]["value"] == 0.0


def test_prometheus_scrape(spark, http_fixture):
    base, _ = http_fixture
    df = prometheus_scrape_source(spark, base + "/metrics")
    rows = {r["name"]: r for r in df.collect()}
    assert rows["up"]["value"] == 1.0
    assert rows["up"]["tags"]["job"] == "api"
    assert rows["http_requests_total"]["value"] == 1027.0
    assert rows["http_requests_total"]["tags"]["code"] == "200"
    assert rows["process_start_time_seconds"]["value"] == 1234.5
    assert dict(rows["process_start_time_seconds"]["tags"] or {}) == {}


def test_host_metrics(spark):
    df = host_metrics_source(spark)
    names = {r["name"] for r in df.collect()}
    assert "memory_total_bytes" in names
    assert "load1" in names
    assert "cpu_seconds_total" in names
    mem = df.where(F.col("name") == "memory_total_bytes").head()
    assert mem["value"] > 1e8  # >100 MB of RAM exists
    cpu = df.where(F.col("name") == "cpu_seconds_total").head()
    assert cpu["kind"] == "incremental" and "cpu" in cpu["tags"]


def test_static_metrics(spark):
    df = static_metrics_source(
        spark,
        [
            {"name": "build_info", "value": 1, "tags": {"version": "1.2"}},
            {"name": "shards", "value": 16, "kind": "gauge"},
        ],
    )
    rows = {r["name"]: r for r in df.collect()}
    assert rows["build_info"]["tags"] == {"version": "1.2"}
    assert rows["shards"]["value"] == 16.0


def test_stdin_source(spark):
    df = stdin_source(spark, io.StringIO("l1\nl2\n\nl3\n"))
    assert [r["message"] for r in df.orderBy("seq").collect()] == [
        "l1", "l2", "l3",
    ]


def test_http_sink_roundtrip(spark, http_fixture):
    base, posts = http_fixture
    posts.clear()
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, message string"
    )
    sent = http_sink(df.coalesce(1), base + "/ingest", encoding="json")
    assert sent == 3
    got = [
        json.loads(line)
        for p in posts
        for line in p.decode().splitlines()
    ]
    assert sorted(got, key=lambda r: r["id"]) == [
        {"id": 1, "message": "a"},
        {"id": 2, "message": "b"},
        {"id": 3, "message": "c"},
    ]


def test_socket_sink_roundtrip(spark):
    received: list[bytes] = []
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def accept_loop():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            with conn:
                while chunk := conn.recv(65536):
                    received.append(chunk)

    threading.Thread(target=accept_loop, daemon=True).start()
    df = spark.createDataFrame([("x",), ("y",)], "message string")
    sent = socket_sink(df.coalesce(1), "127.0.0.1", port)
    assert sent == 2
    import time

    for _ in range(50):
        if b"".join(received).count(b"\n") >= 2:
            break
        time.sleep(0.1)
    srv.close()
    lines = b"".join(received).decode().splitlines()
    assert sorted(lines) == ["x", "y"]


def test_prometheus_exporter_sink(tmp_path, spark):
    from vector_spark.functions.codecs import decode_prometheus_line

    df = spark.createDataFrame(
        [("reqs_total", {"code": "200"}, 10.0), ("up", {}, 1.0)],
        "name string, tags map<string,string>, value double",
    )
    out = str(tmp_path / "metrics.prom")
    n = prometheus_exporter_sink(df, out)
    assert n == 2
    # round-trip through the DECODE codec: the exposition lines parse back
    back = (
        spark.read.text(out)
        .select(decode_prometheus_line(F.col("value")).alias("m"))
        .select("m.name", F.col("m.labels").alias("tags"), "m.value")
        .collect()
    )
    got = {r["name"]: r for r in back}
    assert got["reqs_total"]["value"] == 10.0
    assert got["reqs_total"]["tags"]["code"] == "200"
    assert got["up"]["value"] == 1.0


def test_poll_source_streaming(spark, tmp_path):
    """The `poll` DataSource: an exec poll per micro-batch lands rows in a
    memory sink."""
    from vector_spark.sources_pull import register_poll_source

    register_poll_source(spark)
    stream = (
        spark.readStream.format("poll")
        .option("mode", "exec")
        .option("command", "printf 'tick\\n'")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("poll_test")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select * from poll_test").count() >= 2:
                break
            time.sleep(0.5)
        rows = spark.sql("select * from poll_test").collect()
        assert len(rows) >= 2  # at least two polls fired
        assert all(r["message"] == "tick" for r in rows)
        # seq strictly increasing across polls
        seqs = sorted(r["seq"] for r in rows)
        assert seqs == list(range(len(seqs)))
    finally:
        q.stop()


def test_internal_metrics(spark):
    from vector_spark.sources_pull import internal_metrics_source
    from vector_spark.streaming.monitor import QueryStats, TopListener

    listener = TopListener()
    s = QueryStats("q1")
    s.total_rows, s.n_batches = 1234, 7
    listener.stats["q1"] = s
    df = internal_metrics_source(spark, listener)
    rows = {(r["name"], tuple(sorted((r["tags"] or {}).items()))): r
            for r in df.collect()}
    par = rows[("spark_default_parallelism", ())]
    assert par["value"] >= 1.0
    got = rows[("component_received_events_total", (("query", "q1"),))]
    assert got["value"] == 1234.0 and got["kind"] == "incremental"
    assert rows[("component_batches_total", (("query", "q1"),))]["value"] == 7.0


def test_exec_topology_yaml(spark, tmp_path):
    """exec source + http-style filter through the YAML front end."""
    import yaml

    from vector_spark.config.loader import load_topology, run_sinks

    cfg = {
        "sources": {
            "in": {"type": "exec", "command": "printf 'keep 1\\ndrop 2\\nkeep 3\\n'"}
        },
        "transforms": {
            "only_keep": {
                "type": "filter",
                "inputs": ["in"],
                "condition": "message like 'keep%'",
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["only_keep"]}},
    }
    path = tmp_path / "topo.yaml"
    path.write_text(yaml.safe_dump(cfg))
    topo = load_topology(spark, str(path))
    rows = run_sinks(topo)["out"]["rows"]
    assert sorted(r["message"] for r in rows) == ["keep 1", "keep 3"]


def test_kubernetes_logs_cri(spark, tmp_path):
    """CRI parse + partial-line reassembly + pod metadata from the path
    (reference parser/cri.rs regex, path_helpers.rs layout)."""
    from vector_spark.sources_pull import kubernetes_logs_source

    poddir = tmp_path / "pods" / "prod_api-5f7_abc123" / "api"
    poddir.mkdir(parents=True)
    (poddir / "0.log").write_text(
        "2024-01-01T00:00:01.000000000Z stdout F one-shot line\n"
        "2024-01-01T00:00:02.000000000Z stdout P partial start, \n"
        "2024-01-01T00:00:02.100000000Z stdout P middle, \n"
        "2024-01-01T00:00:02.200000000Z stdout F end\n"
        "2024-01-01T00:00:03.000000000Z stderr F an error line\n"
    )
    df = kubernetes_logs_source(spark, str(tmp_path / "pods" / "*" / "*" / "*.log"))
    rows = sorted(df.collect(), key=lambda r: r["_order"])
    assert [r["message"] for r in rows] == [
        "one-shot line",
        "partial start, middle, end",
        "an error line",
    ]
    assert rows[0]["pod_namespace"] == "prod"
    assert rows[0]["pod_name"] == "api-5f7"
    assert rows[0]["pod_uid"] == "abc123"
    assert rows[0]["container_name"] == "api"
    assert rows[2]["stream"] == "stderr"
    assert rows[1]["ts"] is not None


def test_kubernetes_logs_docker_format(spark, tmp_path):
    import json

    from vector_spark.sources_pull import kubernetes_logs_source

    poddir = tmp_path / "pods" / "ns_pod-1_uid9" / "c1"
    poddir.mkdir(parents=True)
    lines = [
        {"log": "hello\n", "stream": "stdout", "time": "2024-02-02T10:00:00Z"},
        {"log": "bye\n", "stream": "stderr", "time": "2024-02-02T10:00:01Z"},
    ]
    (poddir / "0.log").write_text("".join(json.dumps(l) + "\n" for l in lines))
    df = kubernetes_logs_source(
        spark, str(tmp_path / "pods" / "*" / "*" / "*.log"), log_format="docker"
    )
    rows = {r["message"]: r for r in df.collect()}
    assert rows["hello"]["stream"] == "stdout"
    assert rows["bye"]["pod_name"] == "pod-1"


def test_journald_env_gate(spark):
    import shutil

    from vector_spark.sources_pull import journald_source

    if shutil.which("journalctl") is None:
        with pytest.raises(RuntimeError, match="journalctl"):
            journald_source(spark)
    else:  # pragma: no cover - environment-dependent
        df = journald_source(spark, max_entries=5)
        assert "message" in df.columns


def test_host_metrics_filesystem(spark):
    from vector_spark.sources_pull import host_metrics_source

    df = host_metrics_source(spark, collectors=("filesystem",))
    # per-mount gauges since r9; check the root mount's arithmetic
    rows = {r["name"]: r for r in df.collect()
            if r["tags"].get("mountpoint") == "/"}
    total = rows["filesystem_total_bytes"]["value"]
    used = rows["filesystem_used_bytes"]["value"]
    free = rows["filesystem_free_bytes"]["value"]
    assert total > 0 and abs((used + free) - total) < 1e-6
    assert rows["filesystem_total_bytes"]["tags"]["mountpoint"] == "/"
    assert "filesystem" in rows["filesystem_total_bytes"]["tags"]


def test_parse_docker_stats_full():
    """ECS docker-stats mapping: blkio device/op tags + time→seconds,
    percpu bounded by online_cpus, memory gauges vs page counters,
    per-interface network; empty payloads skipped."""
    import json

    from vector_spark.sources_pull import parse_docker_stats

    sample = {
        "abc": {
            "read": "2020-01-01T00:00:00Z", "name": "web",
            "blkio_stats": {
                "io_service_bytes_recursive": [
                    {"major": 8, "minor": 0, "op": "Read", "value": 100}
                ],
                "io_wait_time_recursive": [
                    {"major": 8, "minor": 1, "op": "Write",
                     "value": 5_000_000_000}
                ],
                "io_time_recursive": [
                    {"major": 8, "minor": 0, "op": "Total", "value": 2000}
                ],
            },
            "cpu_stats": {
                "online_cpus": 2, "system_cpu_usage": 50,
                "cpu_usage": {"total_usage": 30,
                              "percpu_usage": [10, 20, 99],
                              "usage_in_usermode": 25,
                              "usage_in_kernelmode": 5},
                "throttling_data": {"periods": 4, "throttled_periods": 1,
                                    "throttled_time": 3_000_000_000},
            },
            "memory_stats": {"usage": 1024, "limit": 4096,
                             "stats": {"rss": 512, "pgfault": 7}},
            "networks": {"eth0": {"rx_bytes": 11, "tx_bytes": 22}},
        },
        "skipped-empty": {},
    }
    rows = parse_docker_stats(json.dumps(sample))
    ix = {
        (r[0], tuple(sorted(r[2].items()))): (r[3], r[4]) for r in rows
    }
    base = (("container_id", "abc"), ("container_name", "web"))

    def k(name, **extra):
        return (name, tuple(sorted(dict(base, **{
            str(a): str(b) for a, b in extra.items()
        }).items())))

    assert ix[k("blkio_recursive_io_service_bytes_total",
                device="8:0", op="read")] == ("counter", 100.0)
    # ns → seconds and ms → seconds
    assert ix[k("blkio_recursive_io_wait_time_seconds_total",
                device="8:1", op="write")] == ("counter", 5.0)
    assert ix[k("blkio_recursive_io_time_seconds_total",
                device="8:0", op="total")] == ("counter", 2.0)
    assert ix[k("cpu_online_cpus")] == ("gauge", 2.0)
    assert ix[k("cpu_throttled_time_seconds_total")] == ("counter", 3.0)
    # percpu bounded by online_cpus: index 2 (value 99) not emitted
    assert ix[k("cpu_usage_percpu_jiffies_total", cpu=1)] == (
        "counter", 20.0)
    assert k("cpu_usage_percpu_jiffies_total", cpu=2) not in ix
    assert ix[k("memory_used_bytes")] == ("gauge", 1024.0)
    assert ix[k("memory_rss_bytes")] == ("gauge", 512.0)
    assert ix[k("memory_page_faults_total")] == ("counter", 7.0)
    assert ix[k("network_receive_bytes_total", device="eth0")] == (
        "counter", 11.0)
    assert len(rows) == 19
    assert not any("skipped-empty" in str(r[2]) for r in rows)


def test_aws_ecs_metrics_source(spark, http_fixture):
    import json

    from vector_spark.sources_pull import aws_ecs_metrics_source

    base, _ = http_fixture
    df = aws_ecs_metrics_source(spark, base + "/ecs-stats")
    rows = df.collect()
    assert {r["namespace"] for r in rows} == {"awsecs"}
    assert any(r["name"] == "memory_used_bytes" for r in rows)


@pytest.fixture()
def fake_dockerd(tmp_path):
    """A unix-socket HTTP server speaking the two Engine API endpoints
    docker_logs uses, with a multiplexed (non-TTY) log body."""
    import json
    import socketserver
    import threading
    from http.server import BaseHTTPRequestHandler

    sock_path = str(tmp_path / "docker.sock")
    containers = [
        {"Id": "aaa111", "Names": ["/web"], "Image": "nginx:1",
         "Labels": {"app": "frontend"}},
        {"Id": "bbb222", "Names": ["/job"], "Image": "batch:2",
         "Labels": {}},
    ]

    def mux(*frames):
        out = b""
        for stream_type, text in frames:
            b = text.encode()
            out += bytes([stream_type, 0, 0, 0]) \
                + len(b).to_bytes(4, "big") + b
        return out

    logs = {
        "aaa111": mux((1, "2024-01-01T00:00:00.000000001Z out line\n"),
                      (2, "2024-01-01T00:00:00.000000002Z err line\n")),
        "bbb222": mux((1, "2024-01-01T00:00:01.000000001Z job says hi\n")),
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/containers/json":
                body = json.dumps(containers).encode()
            else:
                cid = self.path.split("/")[2]
                body = logs.get(cid, b"")
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

        # BaseHTTPRequestHandler wants a client address tuple; unix
        # sockets hand a path/empty string
        def address_string(self):
            return "unix"

    class UnixHTTPServer(socketserver.UnixStreamServer):
        daemon_threads = True

        def get_request(self):
            request, _ = super().get_request()
            return request, ("unix", 0)

    srv = UnixHTTPServer(sock_path, Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield sock_path
    srv.shutdown()


def test_docker_logs_source(spark, fake_dockerd):
    from vector_spark.sources_pull import docker_logs_source

    df = docker_logs_source(spark, socket_path=fake_dockerd)
    rows = df.orderBy("seq").collect()
    assert len(rows) == 3
    assert rows[0]["message"] == "out line"
    assert rows[0]["stream"] == "stdout"
    assert rows[0]["container_id"] == "aaa111"
    assert rows[0]["container_name"] == "web"
    assert rows[0]["image"] == "nginx:1"
    assert rows[0]["labels"]["app"] == "frontend"
    assert rows[0]["timestamp"] == "2024-01-01T00:00:00.000000001Z"
    assert rows[1]["stream"] == "stderr"
    assert rows[2]["container_name"] == "job"


def test_docker_logs_filters(spark, fake_dockerd):
    from vector_spark.sources_pull import docker_logs_source

    by_image = docker_logs_source(
        spark, socket_path=fake_dockerd, include_images=["batch:2"]
    )
    assert {r["container_name"] for r in by_image.collect()} == {"job"}
    by_label = docker_logs_source(
        spark, socket_path=fake_dockerd, include_labels=["app=frontend"]
    )
    assert {r["container_name"] for r in by_label.collect()} == {"web"}
    excl = docker_logs_source(
        spark, socket_path=fake_dockerd, exclude_containers=["web"]
    )
    assert {r["container_name"] for r in excl.collect()} == {"job"}


def test_okta_logs_source_cursor_paging(spark):
    """Cursor sweep: page 1 carries a rel=next Link, page 2 is empty →
    exactly one follow; SSWS auth header sent on both requests."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sources_pull import okta_logs_source

    seen = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            seen.append((self.path, self.headers.get("Authorization")))
            if self.path.startswith("/api/v1/logs"):
                body = json.dumps([
                    {"uuid": "e1", "eventType": "user.session.start"},
                    {"uuid": "e2", "eventType": "user.session.end"},
                ]).encode()
                nxt = (f"<http://127.0.0.1:{self.server.server_port}"
                       "/page2>; rel=\"next\"")
            else:
                body = b"[]"
                nxt = (f"<http://127.0.0.1:{self.server.server_port}"
                       "/page3>; rel=\"next\"")
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.send_header(
                "Link", "<http://x/self>; rel=\"self\", " + nxt
            )
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = okta_logs_source(
            spark, f"http://127.0.0.1:{srv.server_port}", token="tok-1",
            since_secs=300,
        )
        rows = df.orderBy("seq").collect()
        assert len(rows) == 2
        assert json.loads(rows[0]["message"])["uuid"] == "e1"
        assert rows[0]["source_type"] == "okta"
        # two requests: the since-seeded first page + the cursor follow
        assert len(seen) == 2
        assert seen[0][0].startswith("/api/v1/logs?since=")
        assert seen[1][0] == "/page2"
        assert all(a == "SSWS tok-1" for _p, a in seen)
    finally:
        srv.shutdown()


def test_gcp_pubsub_source_pull_and_ack(spark):
    """REST pull loop: two batches then empty; every pulled ackId is
    acknowledged; attributes and base64 data decode."""
    import base64
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sources_pull import gcp_pubsub_source

    pulls = []
    acks = []
    batches = [
        [{"ackId": "a1", "message": {
            "data": base64.b64encode(b"msg one").decode(),
            "messageId": "1", "publishTime": "2024-01-01T00:00:00Z",
            "attributes": {"k": "v"}}},
         {"ackId": "a2", "message": {
             "data": base64.b64encode(b"msg two").decode(),
             "messageId": "2", "publishTime": "2024-01-01T00:00:01Z"}}],
        [{"ackId": "a3", "message": {
            "data": base64.b64encode(b"msg three").decode(),
            "messageId": "3", "publishTime": "2024-01-01T00:00:02Z"}}],
        [],
    ]

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            if self.path.endswith(":pull"):
                pulls.append(body)
                out = {"receivedMessages": batches[min(len(pulls) - 1,
                                                       len(batches) - 1)]}
            else:
                acks.append(body["ackIds"])
                out = {}
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = gcp_pubsub_source(
            spark, "proj", "sub",
            endpoint=f"http://127.0.0.1:{srv.server_port}",
            auth_token="tok",
        )
        rows = df.orderBy("seq").collect()
        assert [r["message"] for r in rows] == [
            "msg one", "msg two", "msg three",
        ]
        assert rows[0]["attributes"]["k"] == "v"
        assert rows[0]["message_id"] == "1"
        assert rows[0]["source_type"] == "gcp_pubsub"
        assert acks == [["a1", "a2"], ["a3"]]
        assert len(pulls) == 3  # two full batches + the empty stop
    finally:
        srv.shutdown()


def test_aws_sqs_source_receive_delete_signed(spark):
    """SQS JSON protocol: batched ReceiveMessage + DeleteMessageBatch,
    every request carrying a SigV4 Authorization with the sqs scope."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sources_pull import aws_sqs_source

    calls = []
    batches = [
        {"Messages": [
            {"Body": "sqs one", "MessageId": "m1", "ReceiptHandle": "r1",
             "Attributes": {"SentTimestamp": "1700000000000"}},
            {"Body": "sqs two", "MessageId": "m2", "ReceiptHandle": "r2"},
        ]},
        {"Messages": []},
    ]

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            target = self.headers.get("X-Amz-Target")
            calls.append((target, body,
                          self.headers.get("Authorization", "")))
            if target == "AmazonSQS.ReceiveMessage":
                n_recv = sum(
                    1 for t, _b, _a in calls
                    if t == "AmazonSQS.ReceiveMessage"
                )
                out = batches[min(n_recv - 1, 1)]
            else:
                out = {"Successful": [{"Id": "0"}, {"Id": "1"}]}
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/000000/q1"
        df = aws_sqs_source(
            spark, url, region="eu-west-1",
            access_key="AKIDTEST", secret_key="secret",
        )
        rows = df.orderBy("seq").collect()
        assert [r["message"] for r in rows] == ["sqs one", "sqs two"]
        assert rows[0]["message_id"] == "m1"
        assert rows[0]["sent_timestamp"] == "1700000000000"
        targets = [t for t, _b, _a in calls]
        assert targets == ["AmazonSQS.ReceiveMessage",
                           "AmazonSQS.DeleteMessageBatch",
                           "AmazonSQS.ReceiveMessage"]
        # delete carries both receipt handles
        handles = [e["ReceiptHandle"] for e in calls[1][1]["Entries"]]
        assert handles == ["r1", "r2"]
        for _t, _b, auth in calls:
            assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDTEST/")
            assert "/eu-west-1/sqs/aws4_request" in auth
            assert "Signature=" in auth
    finally:
        srv.shutdown()


def test_aws_s3_source_notification_driven(spark):
    """aws_s3: SQS notification → signed GetObject (one plain, one
    gzip) → line events; non-ObjectCreated records skipped; messages
    deleted after the objects are read."""
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sources_pull import aws_s3_source

    objects = {
        "/logs-bucket/app/one.log": b"line a\nline b\n",
        "/logs-bucket/app/two.log.gz": gzip.compress(b"zipped line\n"),
    }
    notif = json.dumps({"Records": [
        {"eventName": "ObjectCreated:Put",
         "s3": {"bucket": {"name": "logs-bucket"},
                "object": {"key": "app/one.log"}}},
        {"eventName": "ObjectRemoved:Delete",
         "s3": {"bucket": {"name": "logs-bucket"},
                "object": {"key": "app/ignored.log"}}},
        {"eventName": "ObjectCreated:Put",
         "s3": {"bucket": {"name": "logs-bucket"},
                "object": {"key": "app/two.log.gz"}}},
    ]})
    calls = {"recv": 0, "deleted": [], "gets": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # SQS
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            if self.headers.get("X-Amz-Target") == (
                "AmazonSQS.ReceiveMessage"
            ):
                calls["recv"] += 1
                out = ({"Messages": [{"Body": notif, "MessageId": "m1",
                                      "ReceiptHandle": "rh1"}]}
                       if calls["recv"] == 1 else {"Messages": []})
            else:
                calls["deleted"].extend(
                    e["ReceiptHandle"] for e in body["Entries"]
                )
                out = {"Successful": []}
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # S3
            calls["gets"].append(
                (self.path, self.headers.get("Authorization", ""))
            )
            body = objects.get(self.path, b"")
            self.send_response(200 if body else 404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        df = aws_s3_source(
            spark, f"{base}/000/notifq", region="us-east-1",
            access_key="AK", secret_key="SK", s3_endpoint=base,
        )
        rows = df.orderBy("seq").collect()
        assert [r["message"] for r in rows] == [
            "line a", "line b", "zipped line",
        ]
        assert rows[0]["bucket"] == "logs-bucket"
        assert rows[0]["key"] == "app/one.log"
        assert rows[2]["key"] == "app/two.log.gz"
        # only the two created objects were fetched, each signed for s3
        assert [p for p, _a in calls["gets"]] == [
            "/logs-bucket/app/one.log", "/logs-bucket/app/two.log.gz",
        ]
        assert all("/us-east-1/s3/aws4_request" in a
                   for _p, a in calls["gets"])
        assert calls["deleted"] == ["rh1"]
    finally:
        srv.shutdown()


def test_s3_sink_puts_signed_objects(spark):
    """One signed PutObject per non-empty partition; strftime prefix
    renders; ndjson bodies decode; gzip mode round-trips."""
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import s3_sink

    objects = {}

    class Handler(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            objects[self.path] = (
                self.rfile.read(n),
                self.headers.get("Authorization", ""),
            )
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        df = spark.createDataFrame(
            [("e1",), ("e2",), ("e3",)], "message string"
        ).coalesce(1)
        n = s3_sink(df, "logs-bucket", key_prefix="dt=%Y-%m-%d/",
                    region="eu-west-1", access_key="AK", secret_key="SK",
                    endpoint=base)
        assert n == 1
        (path, (body, auth)), = objects.items()
        assert path.startswith("/logs-bucket/dt=")
        assert path.endswith(".log")
        assert body.decode().splitlines() == ["e1", "e2", "e3"]
        assert "/eu-west-1/s3/aws4_request" in auth
        objects.clear()
        n = s3_sink(df, "logs-bucket", region="eu-west-1",
                    access_key="AK", secret_key="SK", endpoint=base,
                    encoding="json", gzip_objects=True)
        assert n == 1
        (path2, (body2, _auth2)), = objects.items()
        assert path2.endswith(".ndjson.gz")
        lines = gzip.decompress(body2).decode().splitlines()
        assert json.loads(lines[0])["message"] == "e1"
    finally:
        srv.shutdown()


def test_gcp_pubsub_sink_publishes(spark):
    import base64
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import gcp_pubsub_sink

    published = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            published.append(
                (self.path, self.headers.get("Authorization"),
                 body["messages"])
            )
            out = json.dumps({"messageIds": [
                str(i) for i in range(len(body["messages"]))
            ]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("p one",), ("p two",), ("p three",)], "message string"
        ).coalesce(1)
        n = gcp_pubsub_sink(
            df, "proj", "events",
            endpoint=f"http://127.0.0.1:{srv.server_port}",
            auth_token="tok", batch_size=2,
            attributes={"src": "vector_spark"},
        )
        assert n == 3
        # batch_size=2 over 3 rows in one partition -> two publishes
        assert [len(m) for _p, _a, m in published] == [2, 1]
        assert all(p == "/v1/projects/proj/topics/events:publish"
                   for p, _a, _m in published)
        assert all(a == "Bearer tok" for _p, a, _m in published)
        datas = [base64.b64decode(m["data"]).decode()
                 for _p, _a, ms in published for m in ms]
        assert datas == ["p one", "p two", "p three"]
        assert published[0][2][0]["attributes"] == {"src": "vector_spark"}
    finally:
        srv.shutdown()


def test_aws_sqs_sink_batches_signed(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import aws_sqs_sink

    sends = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            sends.append(
                (self.headers.get("X-Amz-Target"),
                 self.headers.get("Authorization", ""), body)
            )
            out = json.dumps({"Successful": [
                {"Id": e["Id"]} for e in body["Entries"]
            ]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/1/q"
        df = spark.createDataFrame(
            [(f"m{i}",) for i in range(23)], "message string"
        ).coalesce(1)
        n = aws_sqs_sink(df, url, region="us-east-1",
                         access_key="AK", secret_key="SK")
        assert n == 23
        # 23 rows in one partition -> batches of 10, 10, 3
        assert [len(b["Entries"]) for _t, _a, b in sends] == [10, 10, 3]
        assert all(t == "AmazonSQS.SendMessageBatch"
                   for t, _a, _b in sends)
        assert all("/us-east-1/sqs/aws4_request" in a
                   for _t, a, _b in sends)
        bodies = [e["MessageBody"] for _t, _a, b in sends
                  for e in b["Entries"]]
        assert bodies == [f"m{i}" for i in range(23)]
    finally:
        srv.shutdown()


def _aws_json_server(handler_out):
    """Fake AWS JSON-protocol endpoint: records (target, auth, body)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            handler_out.append(
                (self.headers.get("X-Amz-Target"),
                 self.headers.get("Authorization", ""),
                 json.loads(self.rfile.read(n)))
            )
            out = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_aws_cloudwatch_logs_sink(spark):
    from vector_spark.sinks import aws_cloudwatch_logs_sink

    calls = []
    srv = _aws_json_server(calls)
    try:
        df = spark.createDataFrame(
            [("late", 2000.0), ("early", 1000.0), ("mid", 1500.0)],
            "message string, ts double",
        ).coalesce(1)
        n = aws_cloudwatch_logs_sink(
            df, "grp", "stream", region="us-east-1",
            access_key="AK", secret_key="SK",
            endpoint=f"http://127.0.0.1:{srv.server_port}/",
        )
        assert n == 3
        target, auth, body = calls[0]
        assert target == "Logs_20140328.PutLogEvents"
        assert "/us-east-1/logs/aws4_request" in auth
        assert body["logGroupName"] == "grp"
        # events sorted by timestamp within the batch (API requirement)
        assert [e["message"] for e in body["logEvents"]] == [
            "early", "mid", "late",
        ]
        assert body["logEvents"][0]["timestamp"] == 1000000
    finally:
        srv.shutdown()


def test_aws_kinesis_sink(spark):
    import base64

    from vector_spark.sinks import aws_kinesis_sink

    calls = []
    srv = _aws_json_server(calls)
    try:
        df = spark.createDataFrame(
            [("r1", "k1"), ("r2", "k2")], "message string, pk string"
        ).coalesce(1)
        n = aws_kinesis_sink(
            df, "events", region="eu-west-1",
            partition_key_col="pk", access_key="AK", secret_key="SK",
            endpoint=f"http://127.0.0.1:{srv.server_port}/",
        )
        assert n == 2
        target, auth, body = calls[0]
        assert target == "Kinesis_20131202.PutRecords"
        assert "/eu-west-1/kinesis/aws4_request" in auth
        assert body["StreamName"] == "events"
        recs = body["Records"]
        assert [base64.b64decode(r["Data"]).decode() for r in recs] == [
            "r1", "r2",
        ]
        assert [r["PartitionKey"] for r in recs] == ["k1", "k2"]
    finally:
        srv.shutdown()


def test_influxdb_sink_line_protocol(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import influxdb_sink

    writes = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            writes.append((self.path,
                           self.headers.get("Authorization"),
                           self.rfile.read(n).decode()))
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("cpu", 0.5, {"host": "h1", "az": "a"}, 1.5),
             ("mem", 7.0, {}, 2.0)],
            "name string, value double, tags map<string,string>,"
            " ts double",
        ).coalesce(1)
        n = influxdb_sink(
            df, f"http://127.0.0.1:{srv.server_port}",
            org="o", bucket="b", token="tk",
        )
        assert n == 2
        path, auth, body = writes[0]
        assert path == "/api/v2/write?org=o&bucket=b&precision=ns"
        assert auth == "Token tk"
        lines = sorted(body.strip().splitlines())
        assert lines[0] == "cpu,az=a,host=h1 value=0.5 1500000000"
        assert lines[1] == "mem value=7.0 2000000000"
    finally:
        srv.shutdown()


def test_statsd_sink_datagrams(spark):
    import socket as _socket

    from vector_spark.sinks import statsd_sink

    recv = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(10)
    port = recv.getsockname()[1]
    df = spark.createDataFrame(
        [("hits", 3.0, "counter", {"env": "p"}),
         ("temp", 21.5, "gauge", {}),
         ("lat", 12.0, "timing", {})],
        "name string, value double, kind string, tags map<string,string>",
    ).coalesce(1)
    n = statsd_sink(df, "127.0.0.1", port)
    assert n == 3
    got = sorted(recv.recv(1024).decode() for _ in range(3))
    recv.close()
    assert got == ["hits:3.0|c|#env:p", "lat:12.0|ms", "temp:21.5|g"]


def test_webhdfs_sink_two_step_create(spark):
    """CREATE against the namenode returns a datanode Location; the
    body lands there — both steps observed."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    steps = []

    class DataNode(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            steps.append(("data", self.path, self.rfile.read(n)))
            self.send_response(201)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    dn = HTTPServer(("127.0.0.1", 0), DataNode)
    threading.Thread(target=dn.serve_forever, daemon=True).start()

    class NameNode(BaseHTTPRequestHandler):
        def do_PUT(self):
            steps.append(("name", self.path, b""))
            out = json.dumps({"Location":
                              f"http://127.0.0.1:{dn.server_port}"
                              + self.path.split("?")[0]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    nn = HTTPServer(("127.0.0.1", 0), NameNode)
    threading.Thread(target=nn.serve_forever, daemon=True).start()
    try:
        from vector_spark.sinks import webhdfs_sink

        df = spark.createDataFrame([("l1",), ("l2",)], "message string") \
            .coalesce(1)
        n = webhdfs_sink(
            df, f"http://127.0.0.1:{nn.server_port}", "/logs/app",
            user="vector",
        )
        assert n == 1
        kinds = [k for k, _p, _b in steps]
        assert kinds == ["name", "data"]
        _k, npath, _b = steps[0]
        assert npath.startswith("/webhdfs/v1/logs/app/date=")
        assert "op=CREATE" in npath and "noredirect=true" in npath
        assert "user.name=vector" in npath
        _k2, _dpath, body = steps[1]
        assert body.decode().splitlines() == ["l1", "l2"]
    finally:
        nn.shutdown()
        dn.shutdown()


def test_azure_blob_sink(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import azure_blob_sink

    blobs = {}

    class Handler(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            blobs[self.path] = (
                self.rfile.read(n),
                self.headers.get("x-ms-blob-type"),
            )
            self.send_response(201)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([("b1",), ("b2",)], "message string") \
            .coalesce(1)
        n = azure_blob_sink(
            df, f"http://127.0.0.1:{srv.server_port}", "logs",
            sas_token="sv=2021&sig=abc",
        )
        assert n == 1
        (path, (body, blob_type)), = blobs.items()
        assert path.startswith("/logs/date=")
        assert path.endswith("?sv=2021&sig=abc")
        assert blob_type == "BlockBlob"
        assert body.decode().splitlines() == ["b1", "b2"]
    finally:
        srv.shutdown()


def test_gcs_sink_media_upload(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlsplit

    from vector_spark.sinks import gcs_sink

    uploads = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            uploads.append((self.path,
                            self.headers.get("Authorization"),
                            self.rfile.read(n)))
            out = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([("g1",), ("g2",)], "message string") \
            .coalesce(1)
        n = gcs_sink(df, "corpus",
                     endpoint=f"http://127.0.0.1:{srv.server_port}",
                     auth_token="tok")
        assert n == 1
        path, auth, body = uploads[0]
        parts = urlsplit(path)
        assert parts.path == "/upload/storage/v1/b/corpus/o"
        q = parse_qs(parts.query)
        assert q["uploadType"] == ["media"]
        assert q["name"][0].startswith("date=")
        assert auth == "Bearer tok"
        assert body.decode().splitlines() == ["g1", "g2"]
    finally:
        srv.shutdown()


def test_aws_cloudwatch_metrics_sink(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs

    from vector_spark.sinks import aws_cloudwatch_metrics_sink

    posts = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            posts.append((self.headers.get("Authorization", ""),
                          parse_qs(self.rfile.read(n).decode())))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("cpu", 0.5), ("mem", 2.0)], "name string, value double"
        ).coalesce(1)
        n = aws_cloudwatch_metrics_sink(
            df, "MyApp", region="us-east-1",
            access_key="AK", secret_key="SK",
            endpoint=f"http://127.0.0.1:{srv.server_port}/",
        )
        assert n == 2
        auth, q = posts[0]
        assert "/us-east-1/monitoring/aws4_request" in auth
        assert q["Action"] == ["PutMetricData"]
        assert q["Namespace"] == ["MyApp"]
        assert q["MetricData.member.1.MetricName"] == ["cpu"]
        assert q["MetricData.member.1.Value"] == ["0.5"]
        assert q["MetricData.member.2.MetricName"] == ["mem"]
    finally:
        srv.shutdown()


def test_aws_kinesis_firehose_sink(spark):
    import base64

    from vector_spark.sinks import aws_kinesis_firehose_sink

    calls = []
    srv = _aws_json_server(calls)
    try:
        df = spark.createDataFrame(
            [("r1",), ("r2",), ("r3",)], "message string"
        ).coalesce(1)
        n = aws_kinesis_firehose_sink(
            df, "delivery", region="us-west-2",
            access_key="AK", secret_key="SK",
            endpoint=f"http://127.0.0.1:{srv.server_port}/",
        )
        assert n == 3
        target, auth, body = calls[0]
        assert target == "Firehose_20150804.PutRecordBatch"
        assert "/us-west-2/firehose/aws4_request" in auth
        assert body["DeliveryStreamName"] == "delivery"
        assert [base64.b64decode(r["Data"]).decode()
                for r in body["Records"]] == ["r1", "r2", "r3"]
        assert "PartitionKey" not in body["Records"][0]
    finally:
        srv.shutdown()


def test_influxdb_logs_sink_typed_fields(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import influxdb_logs_sink

    writes = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            writes.append((self.path, self.rfile.read(n).decode()))
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("web", 'say "hi"', 42, 1.5, True, 1e9),
             ("db", None, 7, 0.25, False, 1e9 + 1)],
            "host string, message string, count long, ratio double,"
            " ok boolean, ts double",
        ).coalesce(1)
        n = influxdb_logs_sink(
            df, f"http://127.0.0.1:{srv.server_port}",
            namespace="ns", tag_cols=["host"],
            org="o", bucket="b",
        )
        assert n == 2
        path, body = writes[0]
        assert path.startswith("/api/v2/write?org=o&bucket=b")
        lines = body.splitlines()
        # measurement `<ns>.vector` (logs.rs:51), host promoted to tag,
        # metric_type=logs always added; fields carry influx typing
        # (int `i`, float/bool bare, strings quoted with escapes)
        assert lines[0] == (
            'ns.vector,host=web,metric_type=logs '
            'message="say \\"hi\\"",count=42i,ratio=1.5,ok=true '
            '1000000000000000000')
        # null message omitted from the fields of the second line
        assert lines[1] == (
            'ns.vector,host=db,metric_type=logs '
            'count=7i,ratio=0.25,ok=false 1000000001000000000')
    finally:
        srv.shutdown()


def test_file_descriptor_source(spark):
    import os

    from vector_spark.sources_pull import file_descriptor_source

    r, w = os.pipe()
    os.write(w, b"fd line 1\nfd line 2\n")
    os.close(w)
    df = file_descriptor_source(spark, r)
    rows = df.orderBy("seq").collect()
    assert [x["message"] for x in rows] == ["fd line 1", "fd line 2"]
    assert rows[0]["source_type"] == "file_descriptor"


def test_influxdb_logs_tag_value_escaping(spark):
    from vector_spark.sinks import influx_logs_line

    df = spark.createDataFrame(
        [("web server,a=b", 1, 1e9)],
        "host string, n long, ts double",
    )
    line = df.select(influx_logs_line(
        df, "m", ["host"], "ts").alias("l")).coalesce(1)
    row = line.collect()[0]
    assert row["l"] == (
        r"m,host=web\ server\,a\=b,metric_type=logs n=1i "
        "1000000000000000000")


def test_host_metrics_disk_tcp_process_collectors():
    """The r9 collector additions (disk/tcp/process/cgroups —
    src/sources/host_metrics/{disk,tcp,process,cgroups}.rs) read the
    live /proc; pure-row check, no Spark."""
    from vector_spark.sources_pull import _proc_host_metrics

    rows = _proc_host_metrics(("disk", "tcp", "process", "cgroups"))
    names = {r[0] for r in rows}
    # disk counters ride /proc/diskstats with a device tag
    assert "disk_read_bytes_total" in names
    disk = next(r for r in rows if r[0] == "disk_reads_completed_total")
    assert "device" in disk[2] and disk[3] == "incremental"
    # tcp table counts by state (this test process holds sockets)
    assert "tcp_connections_total" in names
    # per-process metrics tag pid + command, incl. this pytest process
    import os

    me = str(os.getpid())
    mine = [r for r in rows if r[0] == "process_memory_usage"
            and r[2].get("pid") == me]
    assert mine and mine[0][4] > 0
    runtime = [r for r in rows if r[0] == "process_runtime"
               and r[2].get("pid") == me]
    assert runtime and runtime[0][4] >= 0.0


def test_host_metrics_filesystem_enumerates_mounts():
    from vector_spark.sources_pull import _proc_host_metrics

    rows = _proc_host_metrics(("filesystem",))
    per_mount = {r[2]["mountpoint"]: r for r in rows
                 if r[0] == "filesystem_total_bytes"}
    assert "/" in per_mount
    assert per_mount["/"][2]["filesystem"]  # fstype tag present
    # used + free ≤ total per mount (statvfs arithmetic holds)
    for mp in per_mount:
        vals = {r[0]: r[4] for r in rows
                if r[2].get("mountpoint") == mp}
        assert vals["filesystem_used_bytes"] <= \
            vals["filesystem_total_bytes"]


def test_aws_json_call_retries_transient():
    """_aws_json_call re-signs and retries 5xx/429, raises 4xx
    immediately (the shared transport's policy on the SigV4 path)."""
    import threading
    import urllib.error
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import pytest as _pytest

    from vector_spark.sinks import _aws_json_call

    state = {"fail": 1, "auths": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            state["auths"].append(self.headers.get("Authorization"))
            code = 503 if state["fail"] > 0 else (
                400 if self.path == "/bad" else 200)
            if state["fail"] > 0:
                state["fail"] -= 1
            body = b"{}" if code == 200 else b""
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        out = _aws_json_call(base + "/", "logs", "X.Y", {"a": 1},
                             "AK", "SK", "us-east-1", 5.0,
                             retry_backoff_secs=0.01)
        assert out == {}
        assert len(state["auths"]) == 2  # 503 then success, re-signed
        assert all(a and a.startswith("AWS4-HMAC-SHA256")
                   for a in state["auths"])
        with _pytest.raises(urllib.error.HTTPError):
            _aws_json_call(base + "/bad", "logs", "X.Y", {}, "AK",
                           "SK", "us-east-1", 5.0,
                           retry_backoff_secs=0.01)
        assert len(state["auths"]) == 3  # one attempt, no retry on 400
    finally:
        srv.shutdown()


def test_gcs_sink_object_metadata_options(spark):
    """content_type / content_encoding / cache_control land as object
    headers on the media upload (the reference's gcp_cloud_storage
    options from the 0.53/0.54 window)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import gcs_sink

    seen = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            seen.append(dict(self.headers))
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([("x",)], "message string").coalesce(1)
        gcs_sink(df, "b", endpoint=f"http://127.0.0.1:{srv.server_port}",
                 content_type="application/jsonl",
                 content_encoding="identity",
                 cache_control="max-age=60")
        h = seen[0]
        assert h["Content-Type"] == "application/jsonl"
        assert h["Content-Encoding"] == "identity"
        assert h["Cache-Control"] == "max-age=60"
    finally:
        srv.shutdown()


def test_cloudwatch_high_resolution_metrics(spark):
    """high_resolution sets StorageResolution=1 per datum (the
    reference's high-resolution metrics support)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs

    from vector_spark.sinks import aws_cloudwatch_metrics_sink

    posts = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            posts.append(parse_qs(self.rfile.read(n).decode()))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("cpu", 0.5)], "name string, value double").coalesce(1)
        aws_cloudwatch_metrics_sink(
            df, "App", region="us-east-1", access_key="AK",
            secret_key="SK",
            endpoint=f"http://127.0.0.1:{srv.server_port}/",
            ts_col=None, high_resolution=True)
        q = posts[0]
        assert q["MetricData.member.1.StorageResolution"] == ["1"]
    finally:
        srv.shutdown()


def test_s3_sink_vhost_addressing(spark):
    """force_path_style=False → virtual-hosted bucket URLs (the 0.46
    vhost addressing support; path-style stays the default)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import s3_sink

    paths = []

    class Handler(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            paths.append(self.path)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([("x",)], "message string").coalesce(1)
        ep = f"http://127.0.0.1:{srv.server_port}"
        s3_sink(df, "bkt", region="us-east-1", access_key="AK",
                secret_key="SK", endpoint=ep)
        assert paths[0].startswith("/bkt/")        # path-style default
        s3_sink(df, "bkt", region="us-east-1", access_key="AK",
                secret_key="SK", endpoint=ep, force_path_style=False)
        # vhost: the bucket leaves the path (it would live in the host;
        # with an endpoint override the path starts at the key)
        assert not paths[1].startswith("/bkt/")
    finally:
        srv.shutdown()
