"""Telemetry sink wire bytes, verified against a local HTTP capture
server: remote_write snappy+WriteRequest framing and header set, OTLP
resourceLogs batching, Datadog v2 series / sketch protobuf payloads —
each decoded back with the SOURCE-side codec, so the assertions are
roundtrip equalities, not string snapshots."""

from __future__ import annotations

import json
import threading
import zlib

from vector_spark.functions.zstd import decompress as zstd_decompress
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.protowire import (
    decode_datadog_metric_payload,
    decode_datadog_sketches,
    decode_prometheus_write_request,
)
from vector_spark.functions.snappy import decompress
from vector_spark.sinks_telemetry import (
    datadog_metrics_sink,
    datadog_sketches_sink,
    opentelemetry_logs_sink,
    prometheus_remote_write_sink,
)


@pytest.fixture()
def capture_server():
    requests: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            requests.append({
                "path": self.path,
                "headers": {k.lower(): v for k, v in self.headers.items()},
                "body": self.rfile.read(n),
            })
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", requests
    srv.shutdown()


def _metrics(spark, n=6):
    return spark.createDataFrame(
        [
            (f"metric_{i % 2}", {"job": f"j{i % 3}"}, float(i), 1000 + i)
            for i in range(n)
        ],
        "name string, tags map<string,string>, value double, ts long",
    ).coalesce(1)


def test_remote_write_headers_and_roundtrip(spark, capture_server):
    base, reqs = capture_server
    sent = prometheus_remote_write_sink(
        _metrics(spark), base + "/api/v1/write", tenant_id="team-a"
    )
    assert sent == 6
    assert len(reqs) == 1
    h = reqs[0]["headers"]
    assert h["content-type"] == "application/x-protobuf"
    assert h["content-encoding"] == "snappy"
    assert h["x-prometheus-remote-write-version"] == "0.1.0"
    assert h["x-scope-orgid"] == "team-a"
    samples = decode_prometheus_write_request(
        decompress(reqs[0]["body"])
    )
    assert len(samples) == 6
    got = {(s["name"], s["tags"]["job"], s["value"], s["timestamp_ms"])
           for s in samples}
    assert ("metric_0", "j0", 0.0, 1000) in got
    assert ("metric_1", "j1", 1.0, 1001) in got


def test_remote_write_series_grouping_and_sort(spark, capture_server):
    """Samples sharing a label set collapse into ONE TimeSeries with
    timestamp-sorted samples (the remote-write spec ordering)."""
    base, reqs = capture_server
    df = spark.createDataFrame(
        [("up", {"job": "a"}, 2.0, 2000), ("up", {"job": "a"}, 1.0, 1000),
         ("up", {"job": "b"}, 3.0, 1500)],
        "name string, tags map<string,string>, value double, ts long",
    ).coalesce(1)
    prometheus_remote_write_sink(df, base)
    from vector_spark.functions.protowire import (
        PROMETHEUS_REGISTRY,
        decode_message,
    )

    req = decode_message(decompress(reqs[0]["body"]),
                         PROMETHEUS_REGISTRY["WriteRequest"],
                         PROMETHEUS_REGISTRY)
    ts_list = req["timeseries"]
    assert len(ts_list) == 2
    job_a = next(t for t in ts_list
                 if {"name": "job", "value": "a"} in t["labels"])
    # labels sorted by name: __name__ < job
    assert [lb["name"] for lb in job_a["labels"]] == ["__name__", "job"]
    assert [s["timestamp"] for s in job_a["samples"]] == [1000, 2000]


def test_remote_write_batching(spark, capture_server):
    base, reqs = capture_server
    sent = prometheus_remote_write_sink(
        _metrics(spark, 10), base, batch_max_samples=4
    )
    assert sent == 10
    assert len(reqs) == 3  # 4 + 4 + 2
    total = sum(
        len(decode_prometheus_write_request(decompress(r["body"])))
        for r in reqs
    )
    assert total == 10


def _logs(spark, n=5):
    return spark.createDataFrame(
        [
            (i, f"svc-{i % 2}", f"msg {i}", f"2024-03-05 06:07:{i:02d}")
            for i in range(n)
        ],
        "seq long, app string, message string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(1)


def test_otlp_logs_sink_body_shape(spark, capture_server):
    base, reqs = capture_server
    sent = opentelemetry_logs_sink(
        _logs(spark), base,
        resource_attrs={"service.name": "app"},
    )
    assert sent == 5
    assert reqs[0]["path"] == "/v1/logs"
    assert reqs[0]["headers"]["content-type"] == "application/json"
    body = json.loads(reqs[0]["body"])
    assert len(body["resourceLogs"]) == 5
    rl = body["resourceLogs"][0]
    attrs = {a["key"]: a["value"]["stringValue"]
             for a in rl["resource"]["attributes"]}
    assert attrs["service.name"] in ("svc-0", "svc-1")
    rec = rl["scopeLogs"][0]["logRecords"][0]
    assert rec["body"]["stringValue"].startswith("msg ")
    assert rec["severityText"] == "INFO"
    # OTLP/JSON uint64 mapping: decimal STRING nanos
    assert isinstance(rec["timeUnixNano"], str)


def test_otlp_logs_sink_batches_by_events(spark, capture_server):
    base, reqs = capture_server
    opentelemetry_logs_sink(_logs(spark, 7), base, batch_max_events=3)
    assert len(reqs) == 3
    counts = [len(json.loads(r["body"])["resourceLogs"]) for r in reqs]
    assert sorted(counts) == [1, 3, 3]


def test_datadog_series_v2_roundtrip(spark, capture_server):
    base, reqs = capture_server
    df = spark.createDataFrame(
        [("cpu.user", {"host": "a"}, 0.5, 1700000000),
         ("cpu.user", {"host": "a"}, 0.7, 1700000010),
         ("mem.used", {"host": "b"}, 123.0, 1700000000)],
        "name string, tags map<string,string>, value double, ts long",
    ).coalesce(1)
    sent = datadog_metrics_sink(
        df, "dd-key", endpoint=base, default_type="gauge", interval=10
    )
    assert sent == 3
    assert reqs[0]["path"] == "/api/v2/series"
    h = reqs[0]["headers"]
    assert h["dd-api-key"] == "dd-key"
    assert h["content-type"] == "application/x-protobuf"
    # the reference compresses series v2 with zstd; bodies here are
    # store-mode RFC 8878 frames (functions/zstd.py) — decode with the
    # sibling decoder, which any real zstd implementation also accepts
    assert h["content-encoding"] == "zstd"
    points = decode_datadog_metric_payload(
        zstd_decompress(reqs[0]["body"])
    )
    assert len(points) == 3
    cpu = sorted(
        (p for p in points if p["metric"] == "cpu.user"),
        key=lambda p: p["timestamp"],
    )
    assert [p["value"] for p in cpu] == [0.5, 0.7]
    assert cpu[0]["tags"] == ["host:a"]
    assert cpu[0]["type"] == "gauge"
    assert cpu[0]["interval"] == 10


def test_datadog_sketches_roundtrip(spark, capture_server):
    base, reqs = capture_server
    df = spark.createDataFrame(
        [("lat", "h1", ["env:p"], 1700000000, 4, 0.1, 9.0, 3.0, 12.0,
          [1, 5, -2], [2, 1, 1])],
        "name string, host string, tags array<string>, ts long,"
        " cnt long, min double, max double, avg double, sum double,"
        " k array<int>, n array<int>",
    ).coalesce(1)
    sent = datadog_sketches_sink(
        df, "dd-key", endpoint=base, host_col="host"
    )
    assert sent == 1
    assert reqs[0]["path"] == "/api/beta/sketches"
    rows = decode_datadog_sketches(zstd_decompress(reqs[0]["body"]))
    assert rows == [{
        "metric": "lat", "host": "h1", "tags": ["env:p"],
        "ts": 1700000000, "cnt": 4, "min": 0.1, "max": 9.0,
        "avg": 3.0, "sum": 12.0, "k": [1, 5, -2], "n": [2, 1, 1],
    }]


def test_telemetry_sinks_via_topology_loader(spark, capture_server,
                                             tmp_path):
    """All three families dispatch through `type:` in run_sinks."""
    base, reqs = capture_server
    from vector_spark.config.loader import load_topology, run_sinks

    src = tmp_path / "m.jsonl"
    src.write_text(
        "\n".join(
            json.dumps({"name": f"m{i}", "tags": {"t": "x"},
                        "value": float(i), "ts": 1000 + i,
                        "message": f"log {i}"})
            for i in range(3)
        )
    )
    topo = load_topology(spark, f"""
sources:
  in:
    type: json
    path: "{src}"
    schema: "name string, tags map<string,string>, value double,
      ts long, message string"
sinks:
  rw: {{type: prometheus_remote_write, endpoint: "{base}/w",
       inputs: [in]}}
  dd: {{type: datadog_metrics, api_key: k, endpoint: "{base}",
       inputs: [in]}}
""")
    res = run_sinks(topo)
    assert res["rw"]["sent"] == 3
    assert res["dd"]["sent"] == 3
    paths = {r["path"] for r in reqs}
    assert "/w" in paths and "/api/v2/series" in paths


def test_datadog_traces_roundtrip(spark, capture_server):
    import gzip

    from vector_spark.functions.protowire import (
        decode_datadog_trace_payload,
    )
    from vector_spark.sinks_telemetry import datadog_traces_sink

    base, reqs = capture_server
    df = spark.createDataFrame(
        [(7, 1, 0, "web", "GET /", "/api", 1000, 50, 0, "web"),
         (7, 2, 1, "web", "db.query", "SELECT", 1010, 20, 1, "db"),
         (9, 3, 0, "auth", "login", "/login", 2000, 5, 0, "web")],
        "trace_id long, span_id long, parent_id long, service string,"
        " name string, resource string, start long, duration long,"
        " error int, type string",
    ).coalesce(1)
    sent = datadog_traces_sink(df, "dd-key", endpoint=base,
                               hostname="h1", env="prod")
    assert sent == 3
    assert reqs[0]["path"] == "/api/v0.2/traces"
    h = reqs[0]["headers"]
    assert h["dd-api-key"] == "dd-key"
    assert h["content-type"] == "application/x-protobuf"
    assert h["content-encoding"] == "gzip"  # Compression::gzip_default
    spans = decode_datadog_trace_payload(
        gzip.decompress(reqs[0]["body"])
    )
    assert len(spans) == 3
    assert all(s["hostname"] == "h1" and s["env"] == "prod"
               for s in spans)
    t7 = sorted((s for s in spans if s["trace_id"] == 7),
                key=lambda s: s["span_id"])
    assert t7[0]["name"] == "GET /" and t7[0]["parent_id"] == 0
    assert t7[1]["error"] == 1 and t7[1]["parent_id"] == 1
    assert t7[1]["duration"] == 20


def test_remote_write_stream_restart_no_duplicates(
        spark, capture_server, tmp_path):
    """Streaming receipt for the telemetry-protobuf transport class
    (r9 sink wave): a foreachBatch remote-write query stopped after
    commit and restarted from its checkpoint re-sends NOTHING — every
    sample the capture server decodes is exactly-once across the
    restart (the checkpointed epoch is the delivery unit, same
    contract the syslog source pins on the source side)."""
    import json as _json
    import os

    base, reqs = capture_server
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    def write_batch_file(lo, hi):
        p = os.path.join(src_dir, f"b{lo}.json")
        with open(p + ".tmp", "w") as f:
            for i in range(lo, hi):
                f.write(_json.dumps(
                    {"name": "m", "tags": {"seq": str(i)},
                     "value": float(i), "ts": 1000 + i}) + "\n")
        os.rename(p + ".tmp", p)

    def handle(batch_df, _epoch):
        if batch_df.count():
            prometheus_remote_write_sink(
                batch_df, base + "/api/v1/write")

    def start():
        df = (spark.readStream
              .schema("name string, tags map<string,string>,"
                      " value double, ts long")
              .json(src_dir))
        return (df.writeStream.foreachBatch(handle)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="1 seconds")
                .start())

    write_batch_file(0, 40)
    q = start()
    q.processAllAvailable()
    q.stop()
    write_batch_file(40, 80)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    seqs = []
    for r in reqs:
        for s in decode_prometheus_write_request(
                decompress(r["body"])):
            seqs.append(int(s["tags"]["seq"]))
    assert sorted(seqs) == list(range(80))  # no dups, no gaps


def test_otlp_logs_sink_protobuf_protocol(spark, capture_server):
    """protocol: protobuf — the 0.51-window otlp encoder: bodies are
    binary ExportLogsServiceRequest, decoded back with the repo's own
    wire reader to verify content."""
    from vector_spark.functions.protowire import decode_otlp_logs

    base, reqs = capture_server
    sent = opentelemetry_logs_sink(
        _logs(spark), base, protocol="protobuf",
        resource_attrs={"service.name": "app"},
    )
    assert sent == 5
    assert reqs[0]["headers"]["content-type"] == "application/x-protobuf"
    records = []
    for r in reqs:
        records.extend(decode_otlp_logs(r["body"]))
    assert len(records) == 5
    bodies = sorted(str(r["body"]) for r in records)
    assert bodies[0] == "msg 0"
    assert all(r["severity_text"] == "INFO" for r in records)
    assert all(int(r["time_unix_nano"]) > 0 for r in records)


def test_otlp_logs_sink_unknown_protocol(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown protocol"):
        opentelemetry_logs_sink(_logs(spark), "http://x", protocol="grpc")


def test_otlp_pb_batches_keyed_by_resource(spark, capture_server):
    """Mixed resource attributes in one partition: each protobuf
    request carries exactly one resource block with ITS records —
    never the first row's attributes applied to everything."""
    from vector_spark.functions.protowire import decode_otlp_logs

    base, reqs = capture_server
    sent = opentelemetry_logs_sink(
        _logs(spark), base, protocol="protobuf",
        resource_attrs={"service.name": "app"},
    )
    assert sent == 5
    # _logs alternates app svc-0/svc-1 → at least two requests, and
    # every record in a request shares its body parity with its svc
    assert len(reqs) >= 2
    for r in reqs:
        records = decode_otlp_logs(r["body"])
        svc = {str(rec.get("resource", {}).get("service.name"))
               for rec in records
               if isinstance(rec.get("resource"), dict)} or None
        # decoder may fold resource into each record or not expose it;
        # the invariant testable from bodies: one request = one parity
        parities = {int(str(rec["body"]).split()[-1]) % 2
                    for rec in records}
        assert len(parities) == 1
