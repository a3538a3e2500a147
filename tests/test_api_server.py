"""The `api:` observability endpoint (api_server.py).

Reference parity: `src/config/api.rs` (config section, disabled by
default), `proto/vector/observability.proto` + `src/api/grpc/
service.rs` (the ObservabilityService that `vector top` / `vector
tap` speak). Tests drive REAL gRPC calls — unary via grpc_unary_call,
server-streaming via grpc_stream_call — against a live topology with
`api: {enabled: true}`."""

from __future__ import annotations

import socket
import time

import pytest

from vector_spark.api_server import (
    OBSERVABILITY_REGISTRY,
    parse_address,
)
from vector_spark.functions.protowire import decode_message
from vector_spark.sources_grpc import grpc_stream_call, grpc_unary_call

_BASE = "/vector.observability.v1.ObservabilityService/"


def _dec(name, buf):
    return decode_message(buf, OBSERVABILITY_REGISTRY[name],
                          OBSERVABILITY_REGISTRY)


def _enc(name, obj):
    from vector_spark.functions.protowire import encode_message

    return encode_message(obj, OBSERVABILITY_REGISTRY[name],
                          OBSERVABILITY_REGISTRY)


@pytest.fixture()
def api_topo(spark, tmp_path):
    from vector_spark.config.loader import load_topology, run_sinks

    src = spark.createDataFrame(
        [(i, f"msg {i}") for i in range(40)], "seq long, message string"
    )
    path = str(tmp_path / "in.parquet")
    src.write.parquet(path)
    topo = load_topology(spark, f"""
api:
  enabled: true
  address: "127.0.0.1:0"
sources:
  ingest: {{type: parquet, path: "{path}"}}
transforms:
  keep:
    type: filter
    inputs: [ingest]
    condition: "seq >= 10"
sinks:
  sink:
    type: blackhole
    inputs: [keep]
""")
    assert topo.api is not None
    run_sinks(topo)
    yield topo
    topo.api.close()


def test_api_disabled_by_default(spark, tmp_path):
    from vector_spark.config.loader import load_topology

    src = spark.createDataFrame([(1,)], "seq long")
    path = str(tmp_path / "d.parquet")
    src.write.parquet(path)
    topo = load_topology(spark, f"""
sources:
  s: {{type: parquet, path: "{path}"}}
sinks:
  k: {{type: blackhole, inputs: [s]}}
""")
    assert topo.api is None  # src/config/api.rs: default_enabled false


def test_parse_address_default():
    assert parse_address(None) == ("127.0.0.1", 8686)
    assert parse_address("0.0.0.0:9999") == ("0.0.0.0", 9999)


def test_get_meta_and_allocation_status(api_topo):
    st, body = grpc_unary_call(
        "127.0.0.1", api_topo.api.port, _BASE + "GetMeta", [b""])
    assert st == 0
    meta = _dec("GetMetaResponse", body)
    assert meta["version"]
    assert meta["hostname"] == socket.gethostname()

    st, body = grpc_unary_call(
        "127.0.0.1", api_topo.api.port,
        _BASE + "GetAllocationTracingStatus", [b""])
    assert st == 0
    # proto3 default: enabled=false encodes as the empty message
    assert _dec("GetAllocationTracingStatusResponse", body).get(
        "enabled") in (None, False)


def test_get_components_graph_and_counters(api_topo):
    st, body = grpc_unary_call(
        "127.0.0.1", api_topo.api.port, _BASE + "GetComponents",
        [_enc("GetComponentsRequest", {})])
    assert st == 0
    comps = {c["component_id"]: c
             for c in _dec("GetComponentsResponse", body)["components"]}
    assert set(comps) == {"ingest", "keep", "sink"}
    assert comps["ingest"]["component_type"] == 1   # SOURCE
    assert comps["keep"]["component_type"] == 2     # TRANSFORM
    assert comps["sink"]["component_type"] == 3     # SINK
    assert comps["ingest"]["on_type"] == "parquet"
    assert comps["keep"]["on_type"] == "filter"
    # graph edges ride Output entries
    assert [o["output_id"] for o in comps["ingest"]["outputs"]] == ["keep"]
    assert [o["output_id"] for o in comps["keep"]["outputs"]] == ["sink"]
    # the blackhole run recorded counts: 30 events passed the filter
    assert comps["sink"]["metrics"]["sent_events_total"] == 30
    assert comps["keep"]["outputs"][0]["sent_events_total"] == 30

    # limit caps the listing (GetComponentsRequest.limit)
    st, body = grpc_unary_call(
        "127.0.0.1", api_topo.api.port, _BASE + "GetComponents",
        [_enc("GetComponentsRequest", {"limit": 1})])
    assert len(_dec("GetComponentsResponse", body)["components"]) == 1


def test_stream_heartbeat_and_uptime(api_topo):
    _st, msgs = grpc_stream_call(
        "127.0.0.1", api_topo.api.port, _BASE + "StreamHeartbeat",
        _enc("StreamHeartbeatRequest", {"interval_ms": 50}),
        max_messages=3)
    assert len(msgs) == 3
    secs = [_dec("StreamHeartbeatResponse", m)["utc"]["seconds"]
            for m in msgs]
    now = int(time.time())
    assert all(abs(s - now) < 30 for s in secs)
    assert secs == sorted(secs)

    _st, msgs = grpc_stream_call(
        "127.0.0.1", api_topo.api.port, _BASE + "StreamUptime",
        _enc("StreamUptimeRequest", {"interval_ms": 50}),
        max_messages=2)
    ups = [_dec("StreamUptimeResponse", m).get("uptime_seconds", 0)
           for m in msgs]
    assert len(ups) == 2 and all(u >= 0 for u in ups)


def test_stream_component_metrics_totals(api_topo):
    # METRIC_NAME_SENT_EVENTS_TOTAL = 6: totals with per-output map
    _st, msgs = grpc_stream_call(
        "127.0.0.1", api_topo.api.port,
        _BASE + "StreamComponentMetrics",
        _enc("StreamComponentMetricsRequest",
             {"interval_ms": 50, "metric": 6}),
        max_messages=3)
    got = {}
    for m in msgs:
        r = _dec("StreamComponentMetricsResponse", m)
        got[r["component_id"]] = r
    assert got["sink"]["total"]["value"] == 30
    keep = got.get("keep")
    if keep is not None:
        entries = {e["key"]: e.get("value", 0)
                   for e in keep["total"].get("output_totals", [])}
        assert entries == {"sink": 30}


def test_stream_output_events_tap(api_topo):
    from vector_spark.functions.protowire import (
        VECTOR_REGISTRY,
        _value_to_py,
    )

    _st, msgs = grpc_stream_call(
        "127.0.0.1", api_topo.api.port, _BASE + "StreamOutputEvents",
        _enc("StreamOutputEventsRequest",
             {"outputs_patterns": ["kee*"], "limit": 5,
              "interval_ms": 50}),
        max_messages=4)
    # the client may drain more than max_messages if they share a
    # recv() batch; at least the notification + 3 taps must be there
    assert len(msgs) >= 4
    first = _dec("StreamOutputEventsResponse", msgs[0])
    assert "successfully matched" in first["notification"]["message"]
    taps = [_dec("StreamOutputEventsResponse", m) for m in msgs[1:]]
    for t in taps:
        ev = t["tapped_event"]
        assert ev["component_id"] == "keep"
        assert ev["component_kind"] == "transform"
        assert ev["component_type"] == "filter"
        wrapper = decode_message(
            ev["event"], VECTOR_REGISTRY["EventWrapper"],
            VECTOR_REGISTRY)
        fields = _value_to_py(wrapper["log"]["value"])
        assert fields["seq"] >= 10  # filtered output, not the source


def test_unknown_rpc_is_unimplemented(api_topo):
    st, _ = grpc_unary_call(
        "127.0.0.1", api_topo.api.port,
        _BASE + "StreamComponentAllocatedBytes", [b""])
    assert st == 12  # documented out of scope; loud, never wrong data


def test_cli_tap_remote(api_topo):
    """`vector tap --url` analog: the CLI client taps a remote
    instance through the observability API (src/tap/cmd.rs)."""
    import json

    from vector_spark.cli import cmd_tap_remote

    lines = cmd_tap_remote(
        f"http://127.0.0.1:{api_topo.api.port}", ["keep"],
        limit=5, count=4, interval_ms=50)
    assert "successfully matched" in lines[0]
    events = [json.loads(ln) for ln in lines[1:]]
    assert events and all(e["component_id"] == "keep" for e in events)
    assert all(e["event"]["seq"] >= 10 for e in events)


def test_cli_top_remote(api_topo):
    """`vector top --url` analog: table frames from GetComponents +
    StreamComponentMetrics against a remote instance."""
    from vector_spark.cli import cmd_top_remote

    frames = cmd_top_remote(
        f"http://127.0.0.1:{api_topo.api.port}", frames=2,
        interval_ms=50)
    assert len(frames) >= 1
    last = frames[-1]
    assert "COMPONENT" in last and "SENT" in last
    # the blackhole sink's 30 filtered events appear in the table
    assert "sink" in last and "30" in last
    assert "ingest" in last and "keep" in last


def test_streaming_topology_feeds_api_counters(spark):
    """A STREAMING topology with api: enabled: progress events feed
    the counters GetComponents serves — `vector top --url` against a
    live streaming instance shows real throughput, the reference's
    primary use of the API."""
    from vector_spark.cli import cmd_top_remote
    from vector_spark.config.loader import (
        load_topology,
        start_streaming_sinks,
    )

    topo = load_topology(spark, """
api:
  enabled: true
  address: "127.0.0.1:0"
sources:
  ticks: {type: rate, rows_per_batch: 50}
sinks:
  collect:
    type: memory
    inputs: [ticks]
""")
    queries = start_streaming_sinks(topo)
    try:
        deadline = time.time() + 60
        sent = 0
        while time.time() < deadline:
            counters = topo.api_view.counters.get("collect", {})
            sent = counters.get("sent_events_total", 0)
            if sent > 0:
                break
            time.sleep(0.5)
        assert sent > 0, "no streaming progress fed the API counters"
        # the source got the upstream attribution too
        assert topo.api_view.counters["ticks"]["sent_events_total"] > 0
        frames = cmd_top_remote(
            f"http://127.0.0.1:{topo.api.port}", frames=1,
            interval_ms=50)
        assert frames and "collect" in frames[0]
        assert any(ch.isdigit() and ch != "0" for ch in frames[0])
    finally:
        for q in queries.values():
            q.stop()
        topo.api.close()
