"""Service-shaped sink request shaping, verified against a local HTTP
capture server: Elasticsearch bulk pairs, Loki stream grouping + time
order, ClickHouse insert URL, Datadog v2 logs reserved attrs, Splunk HEC
envelopes. (The reference's live-service integration tests play this
role; here the capture server asserts the exact wire bytes.)"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks_services import (
    clickhouse_sink,
    datadog_logs_sink,
    elasticsearch_sink,
    loki_sink,
    splunk_hec_sink,
)


@pytest.fixture()
def capture_server():
    requests: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            requests.append({
                "path": self.path,
                "headers": dict(self.headers),
                "body": self.rfile.read(n),
            })
            body = b'{"errors":false}'
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


def _events(spark, n=6):
    return spark.createDataFrame(
        [
            (i, f"app-{i % 2}", f"msg {i}", f"2024-03-05 06:07:{i:02d}")
            for i in range(n)
        ],
        "seq long, app string, message string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(1)


def test_elasticsearch_bulk_pairs(spark, capture_server):
    base, reqs = capture_server
    n = elasticsearch_sink(
        _events(spark), base, index="logs-{{ app }}-%Y.%m.%d",
        id_col="seq",
    )
    assert n == 6
    assert reqs and reqs[0]["path"] == "/_bulk"
    assert reqs[0]["headers"]["Content-Type"] == "application/x-ndjson"
    lines = reqs[0]["body"].decode().strip().split("\n")
    assert len(lines) == 12  # action + doc per event
    act0 = json.loads(lines[0])
    doc0 = json.loads(lines[1])
    assert set(act0) == {"index"}
    assert act0["index"]["_index"] == f"logs-{doc0['app']}-2024.03.05"
    # id_key semantics: _id comes from the field, field leaves the doc
    assert "seq" not in doc0
    assert act0["index"]["_id"] == doc0["message"].removeprefix("msg ")
    # body ends with the required trailing newline
    assert reqs[0]["body"].endswith(b"\n")


def test_elasticsearch_batching_splits_requests(spark, capture_server):
    base, reqs = capture_server
    n = elasticsearch_sink(
        _events(spark, 10), base, index="fixed", batch_max_events=4,
    )
    assert n == 10
    assert len(reqs) == 3  # 4+4+2 from the single partition


def test_loki_streams_grouped_and_ordered(spark, capture_server):
    base, reqs = capture_server
    n = loki_sink(
        _events(spark), base,
        labels={"app": "{{ app }}", "env": "test"},
        line_col="message",
    )
    assert n == 6
    assert all(r["path"] == "/loki/api/v1/push" for r in reqs)
    streams = []
    for r in reqs:
        streams += json.loads(r["body"])["streams"]
    # one stream per label set per request
    by_label = {}
    for s in streams:
        key = json.dumps(s["stream"], sort_keys=True)
        by_label.setdefault(key, []).extend(s["values"])
    assert len(by_label) == 2
    for key, values in by_label.items():
        label = json.loads(key)
        assert label["env"] == "test"
        assert label["app"] in ("app-0", "app-1")
        ts = [int(v[0]) for v in values]
        assert ts == sorted(ts)  # time-ordered within the stream
        assert len(values) == 3
        assert all(v[1].startswith("msg ") for v in values)
        # nanosecond timestamps (19 digits for 2024 epochs)
        assert all(len(v[0]) == 19 for v in values)


def test_clickhouse_insert_url_and_ndjson(spark, capture_server):
    base, reqs = capture_server
    n = clickhouse_sink(_events(spark), base, table="logs", database="db1")
    assert n == 6
    path = reqs[0]["path"]
    assert "query=INSERT+INTO+%7Bdatabase%3AIdentifier%7D" in path
    assert "param_database=db1" in path and "param_table=logs" in path
    assert "input_format_import_nested_json=1" in path
    assert "input_format_skip_unknown_fields=1" in path
    rows = [json.loads(l) for l in reqs[0]["body"].decode().strip().split("\n")]
    assert len(rows) == 6
    assert {r["seq"] for r in rows} == set(range(6))


def test_datadog_logs_v2_payload(spark, capture_server):
    base, reqs = capture_server
    n = datadog_logs_sink(
        _events(spark), base, api_key="k123",
        ddsource="vector-spark", ddtags="env:test,team:{{ app }}",
        hostname_col="app", service_col="app",
    )
    assert n == 6
    assert reqs[0]["path"] == "/api/v2/logs"
    headers = {k.lower(): v for k, v in reqs[0]["headers"].items()}
    assert headers["dd-api-key"] == "k123"
    arr = json.loads(reqs[0]["body"])
    assert isinstance(arr, list) and len(arr) == 6
    ev = arr[0]
    assert ev["ddsource"] == "vector-spark"
    assert ev["ddtags"].startswith("env:test,team:app-")
    assert ev["hostname"] == ev["service"]
    assert ev["message"].startswith("msg ")


def test_splunk_hec_envelopes(spark, capture_server):
    base, reqs = capture_server
    n = splunk_hec_sink(
        _events(spark), base, token="tok-1",
        event_col="message", host_col="app", sourcetype="st-{{ app }}",
    )
    assert n == 6
    assert reqs[0]["path"] == "/services/collector/event"
    assert reqs[0]["headers"]["Authorization"] == "Splunk tok-1"
    envs = [json.loads(l) for l in reqs[0]["body"].decode().strip().split("\n")]
    assert len(envs) == 6
    assert envs[0]["event"].startswith("msg ")
    assert envs[0]["sourcetype"] == "st-" + envs[0]["host"]
    assert isinstance(envs[0]["time"], float)


def test_service_sinks_via_topology_yaml(spark, capture_server):
    from vector_spark.config.loader import load_topology, run_sinks

    base, reqs = capture_server
    topo = load_topology(
        spark,
        f"""
sources:
  logs:
    type: values
    rows:
      - {{seq: 1, app: "web", message: "hello", ts_s: "2024-01-02 03:04:05"}}
      - {{seq: 2, app: "db", message: "world", ts_s: "2024-01-02 03:04:06"}}
transforms:
  stamped:
    type: remap
    inputs: [logs]
    assign:
      ts: "to_timestamp(ts_s)"
sinks:
  es:
    type: elasticsearch
    inputs: [stamped]
    endpoint: "{base}"
    index: "logs-{{{{ app }}}}"
    id_key: seq
  lk:
    type: loki
    inputs: [stamped]
    endpoint: "{base}"
    labels:
      app: "{{{{ app }}}}"
""",
    )
    results = run_sinks(topo)
    assert results["es"]["sent"] == 2
    assert results["lk"]["sent"] == 2
    paths = [r["path"] for r in reqs]
    assert "/_bulk" in paths and "/loki/api/v1/push" in paths


def test_loki_batch_split_keeps_stream_contiguity(spark, capture_server):
    base, reqs = capture_server
    n = loki_sink(
        _events(spark, 9), base, labels={"app": "{{ app }}"},
        batch_max_events=4,
    )
    assert n == 9
    total = 0
    for r in reqs:
        body = json.loads(r["body"])
        for s in body["streams"]:
            total += len(s["values"])
            ts = [int(v[0]) for v in s["values"]]
            assert ts == sorted(ts)
    assert total == 9


def test_honeycomb_batch_envelopes(spark, capture_server):
    from vector_spark.sinks_services import honeycomb_sink

    base, reqs = capture_server
    n = honeycomb_sink(_events(spark, 3), base, "my-dataset", "hc-key")
    assert n == 3
    assert reqs and reqs[0]["path"] == "/1/batch/my-dataset"
    assert reqs[0]["headers"]["X-Honeycomb-Team"] == "hc-key"
    events = json.loads(reqs[0]["body"])
    assert len(events) == 3
    # timestamp lifted into the envelope, payload under data
    assert events[0]["time"].startswith("2024-03-05T06:07:00")
    assert events[0]["data"]["message"] == "msg 0"
    assert "ts" not in events[0]["data"]


def test_new_relic_logs_array(spark, capture_server):
    from vector_spark.sinks_services import new_relic_logs_sink

    base, reqs = capture_server
    n = new_relic_logs_sink(_events(spark, 2), "lic-key",
                            endpoint=base + "/log/v1")
    assert n == 2
    assert reqs and reqs[0]["path"] == "/log/v1"
    assert reqs[0]["headers"]["Api-Key"] == "lic-key"
    events = json.loads(reqs[0]["body"])
    assert [e["message"] for e in events] == ["msg 0", "msg 1"]


def test_new_relic_events_merges_json_message(spark, capture_server):
    from vector_spark.sinks_services import new_relic_events_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [(1, '{"user": "alice", "n": 42, "ok": true}'),
         (2, "plain text")],
        "seq long, message string",
    ).coalesce(1)
    n = new_relic_events_sink(df, "lic", "12345",
                              endpoint=base + "/v1/accounts/12345/events")
    assert n == 2
    assert reqs[0]["path"] == "/v1/accounts/12345/events"
    assert reqs[0]["headers"]["Api-Key"] == "lic"
    events = json.loads(reqs[0]["body"])
    ev_by_seq = {e["seq"]: e for e in events}
    # JSON message: scalar fields merged in (typed), message dropped
    assert ev_by_seq[1]["user"] == "alice"
    assert ev_by_seq[1]["n"] == 42
    assert ev_by_seq[1]["ok"] is True
    assert "message" not in ev_by_seq[1]
    # non-JSON message: kept verbatim
    assert ev_by_seq[2]["message"] == "plain text"
    # eventType defaulted on every event (model.rs:216-218)
    assert all(e["eventType"] == "VectorSink" for e in events)


def test_new_relic_metrics_types_and_intervals(spark, capture_server):
    from vector_spark.sinks_services import new_relic_metrics_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [("req_total", "counter", "incremental", 5.0, 1700000000.0, 10000),
         ("req_total_abs", "counter", "absolute", 7.0, 1700000000.0, None),
         ("temp", "gauge", "absolute", 21.5, 1700000001.0, None),
         ("dropped", "counter", "incremental", 1.0, 1700000002.0, None)],
        "name string, metric_type string, kind string, value double,"
        " ts double, interval_ms long",
    ).coalesce(1)
    n = new_relic_metrics_sink(df, "lic", endpoint=base + "/metric/v1",
                               interval_ms_col="interval_ms")
    # the incremental counter without an interval is dropped
    assert n == 3
    body = json.loads(reqs[0]["body"])
    metrics = {m["name"]: m for m in body[0]["metrics"]}
    assert metrics["req_total"]["type"] == "count"
    assert metrics["req_total"]["interval.ms"] == 10000
    assert metrics["req_total_abs"]["type"] == "gauge"
    assert "interval.ms" not in metrics["req_total_abs"]
    assert metrics["temp"]["type"] == "gauge"
    assert metrics["temp"]["value"] == 21.5
    assert metrics["temp"]["timestamp"] == 1700000001000
    assert "dropped" not in metrics


def test_splunk_hec_metrics_envelopes(spark, capture_server):
    from vector_spark.sinks_services import splunk_hec_metrics_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [("cpu.user", 0.25, {"host": "h1"}, 1700000000.5),
         ("mem.free", 1024.0, None, 1700000001.0)],
        "name string, value double, tags map<string,string>,"
        " ts double",
    ).coalesce(1)
    n = splunk_hec_metrics_sink(df, base, "hec-tok",
                                sourcetype="vector_metrics")
    assert n == 2
    assert reqs[0]["path"] == "/services/collector/event"
    assert reqs[0]["headers"]["Authorization"] == "Splunk hec-tok"
    envs = [json.loads(line) for line in
            reqs[0]["body"].decode().splitlines()]
    # encoder.rs:20-45: event literal "metric", tags + metric_name +
    # float _value inside fields, time as fractional seconds
    assert envs[0]["event"] == "metric"
    assert envs[0]["fields"] == {"host": "h1",
                                 "metric_name": "cpu.user",
                                 "_value": 0.25}
    assert envs[0]["time"] == 1700000000.5
    assert envs[0]["sourcetype"] == "vector_metrics"
    assert envs[1]["fields"] == {"metric_name": "mem.free",
                                 "_value": 1024.0}


def test_post_retry_transient_then_success(spark):
    """The shared transport retries the reference's transient statuses
    (RetryStrategy::Default — 5xx except 501, 408, 429) with backoff
    and raises permanent 4xx immediately."""
    import threading
    import urllib.error
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks_services import _post_lines_per_partition

    state = {"failures_left": 2, "hits": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            state["hits"] += 1
            if state["failures_left"] > 0:
                state["failures_left"] -= 1
                code = 503
            elif self.path == "/always400":
                code = 400
            else:
                code = 200
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        lines = spark.createDataFrame([("x",), ("y",)],
                                      "line string").coalesce(1)
        n = _post_lines_per_partition(
            lines, base + "/ok", {}, 1000, 10_000, 5.0,
            retry_backoff_secs=0.01,
        )
        assert n == 2
        assert state["hits"] == 3  # two 503s retried, then 200
        # permanent 4xx raises without retries
        state["failures_left"] = 0
        before = state["hits"]
        import pytest as _pytest
        with _pytest.raises(Exception) as exc:
            _post_lines_per_partition(
                lines, base + "/always400", {}, 1000, 10_000, 5.0,
                retry_backoff_secs=0.01,
            )
        assert "400" in str(exc.value)
        assert state["hits"] == before + 1  # exactly one attempt
    finally:
        srv.shutdown()
