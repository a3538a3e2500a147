"""The reference's `api:` endpoint: ObservabilityService over gRPC.

Reference: `src/config/api.rs` (the `api: {enabled, address}` section,
default 127.0.0.1:8686), `src/api/grpc_server.rs` + `src/api/grpc/
service.rs` (the server), and `proto/vector/observability.proto` (the
contract `vector top` / `vector tap` / vector-api-client speak):

- unary: GetMeta (version/hostname), GetComponents (ids, kinds,
  outputs, counters), GetAllocationTracingStatus
- server-streaming: StreamHeartbeat, StreamUptime,
  StreamComponentMetrics (totals or throughput per component at an
  interval), StreamOutputEvents (tap: glob-matched components'
  events as native EventWrapper, with the notification preamble)

Spark mapping: rides the repo's own clean-room h2/gRPC listener
(`sources_grpc.GrpcListener`, extended r11 with server-streaming) and
the pure-Python protowire codec — the same machinery the OTLP and
vector-native sources use, so `api: {enabled: true}` in a config
yields a LIVE endpoint any reference API client can poll while a
topology runs. Counters come from the topology view the loader
installs: batch sinks record their written row counts, streaming
queries report progress via the monitor listener.

Out of scope (documented): StreamComponentAllocatedBytes — the
reference only serves real data with allocation tracing compiled in;
GetAllocationTracingStatus answers enabled=false here, which tells
compliant clients not to ask (unknown paths answer UNIMPLEMENTED).
"""

from __future__ import annotations

import fnmatch
import socket
import time
from typing import Iterator

from vector_spark.functions.protowire import (
    encode_message,
    encode_vector_log,
)

# observability.proto message schemas (protowire registry form).
# Field numbers are verbatim from proto/vector/observability.proto.
OBSERVABILITY_REGISTRY: dict = {
    "Timestamp": {1: ("seconds", "int64"), 2: ("nanos", "int32")},
    "GetMetaResponse": {1: ("version", "string"),
                        2: ("hostname", "string")},
    "GetComponentsRequest": {1: ("limit", "int32")},
    "GetComponentsResponse": {
        1: ("components", "repeated msg:Component")},
    "Component": {
        1: ("component_id", "string"),
        2: ("component_type", "int32"),  # enum ComponentType
        3: ("on_type", "string"),
        4: ("outputs", "repeated msg:Output"),
        5: ("metrics", "msg:ComponentMetrics"),
    },
    "Output": {1: ("output_id", "string"),
               2: ("sent_events_total", "int64")},
    "ComponentMetrics": {
        1: ("received_bytes_total", "int64"),
        2: ("received_events_total", "int64"),
        3: ("sent_bytes_total", "int64"),
        4: ("sent_events_total", "int64"),
    },
    "GetAllocationTracingStatusResponse": {1: ("enabled", "bool")},
    "StreamHeartbeatRequest": {1: ("interval_ms", "int32")},
    "StreamHeartbeatResponse": {1: ("utc", "msg:Timestamp")},
    "StreamUptimeRequest": {1: ("interval_ms", "int32")},
    "StreamUptimeResponse": {1: ("uptime_seconds", "int64")},
    "StreamComponentMetricsRequest": {
        1: ("interval_ms", "int32"), 2: ("metric", "int32")},
    # proto3 maps are wire-encoded as repeated {1: key, 2: value}
    # entry messages — modeled explicitly (protowire has no map sugar)
    "TotalMetric": {1: ("value", "int64"),
                    2: ("output_totals",
                        "repeated msg:OutputTotalEntry")},
    "OutputTotalEntry": {1: ("key", "string"), 2: ("value", "int64")},
    "ThroughputMetric": {1: ("value", "double"),
                         2: ("output_throughputs",
                             "repeated msg:OutputRateEntry")},
    "OutputRateEntry": {1: ("key", "string"), 2: ("value", "double")},
    "StreamComponentMetricsResponse": {
        1: ("component_id", "string"),
        2: ("total", "msg:TotalMetric"),
        3: ("throughput", "msg:ThroughputMetric"),
    },
    "StreamOutputEventsRequest": {
        1: ("outputs_patterns", "repeated string"),
        2: ("inputs_patterns", "repeated string"),
        3: ("limit", "int32"),
        4: ("interval_ms", "int32"),
    },
    "StreamOutputEventsResponse": {
        1: ("tapped_event", "msg:TappedEvent"),
        2: ("notification", "msg:EventNotification"),
    },
    "TappedEvent": {
        1: ("component_id", "string"),
        2: ("component_type", "string"),
        3: ("component_kind", "string"),
        4: ("event", "bytes"),  # pre-encoded EventWrapper (see below)
    },
    "EventNotification": {1: ("message", "string")},
}

# MetricName enum values the reference's unified stream accepts
_THROUGHPUT_METRICS = {1, 2, 3, 4}
_TOTAL_FIELDS = {
    5: "received_events_total", 6: "sent_events_total",
    7: "received_bytes_total", 8: "sent_bytes_total",
    9: "errors_total",
}
_RATE_FIELDS = {
    1: "received_events_total", 2: "sent_events_total",
    3: "received_bytes_total", 4: "sent_bytes_total",
}


def _enc(name: str, obj: dict) -> bytes:
    return encode_message(obj, OBSERVABILITY_REGISTRY[name],
                          OBSERVABILITY_REGISTRY)


def _dec(name: str, buf: bytes) -> dict:
    from vector_spark.functions.protowire import decode_message

    return decode_message(buf, OBSERVABILITY_REGISTRY[name],
                          OBSERVABILITY_REGISTRY)


class TopologyView:
    """What the API serves: the component graph plus whatever counters
    the run has produced so far. ``counters`` maps component_id →
    {received_events_total, sent_events_total, ...}; batch `run_sinks`
    and the streaming monitor both feed it."""

    def __init__(self, sources: dict, transforms: dict, sinks: dict,
                 outputs: dict | None = None,
                 expire_metrics_secs: float | None = None):
        self.sources = sources
        self.transforms = transforms
        self.sinks = sinks
        self.outputs = outputs or {}
        self.counters: dict[str, dict[str, int]] = {}
        # global `expire_metrics_secs` (global_options.rs:139-146): a
        # component whose counters go un-bumped for this long stops
        # reporting them (the reference expires idle internal metrics)
        self.expire_metrics_secs = expire_metrics_secs
        self._last_bump: dict[str, float] = {}

    def kinds(self) -> list[tuple[str, int, str]]:
        """[(component_id, ComponentType enum, on_type)] in config
        order — sources, transforms, sinks (the reference's listing)."""
        out = []
        for name, cfg in self.sources.items():
            out.append((name, 1, cfg.get("type", "")))
        for name, cfg in self.transforms.items():
            out.append((name, 2, cfg.get("type", "")))
        for name, cfg in self.sinks.items():
            out.append((name, 3, cfg.get("type", "")))
        return out

    def downstream(self, name: str) -> list[str]:
        """Component ids that list ``name`` in their inputs."""
        kids = []
        for group in (self.transforms, self.sinks):
            for child, cfg in group.items():
                if name in (cfg.get("inputs") or []):
                    kids.append(child)
        return kids

    def bump(self, component_id: str, field: str, by: int) -> None:
        c = self.counters.setdefault(component_id, {})
        c[field] = c.get(field, 0) + int(by)
        self._last_bump[component_id] = time.monotonic()

    def live_counters(self, component_id: str) -> dict[str, int]:
        """The component's counters, or {} once expired
        (expire_metrics_secs of no updates)."""
        exp = self.expire_metrics_secs
        if exp is not None:
            last = self._last_bump.get(component_id)
            if last is None or time.monotonic() - last > exp:
                return {}
        return self.counters.get(component_id, {})


def _ticks(interval_ms: int) -> Iterator[None]:
    step = max(int(interval_ms or 1000), 10) / 1000.0
    while True:
        yield None
        time.sleep(step)


class ApiServer:
    """gRPC ObservabilityService bound to the config's `api.address`."""

    def __init__(self, view: TopologyView, host: str = "127.0.0.1",
                 port: int = 8686, version: str = "vector-spark"):
        from vector_spark.sources_grpc import GrpcListener

        self.view = view
        self.version = version
        self._t0 = time.time()
        base = "/vector.observability.v1.ObservabilityService/"
        self._listener = GrpcListener(
            {
                base + "GetMeta": self._get_meta,
                base + "GetComponents": self._get_components,
                base + "GetAllocationTracingStatus":
                    lambda _m: _enc("GetAllocationTracingStatusResponse",
                                    {"enabled": False}),
                base + "StreamHeartbeat": self._stream_heartbeat,
                base + "StreamUptime": self._stream_uptime,
                base + "StreamComponentMetrics":
                    self._stream_component_metrics,
                base + "StreamOutputEvents": self._stream_output_events,
            },
            host=host, port=port,
        )
        self.port = self._listener.port

    def close(self) -> None:
        self._listener.close()

    # ---- unary

    def _get_meta(self, _msg: bytes) -> bytes:
        return _enc("GetMetaResponse", {
            "version": self.version,
            "hostname": socket.gethostname(),
        })

    def _get_components(self, msg: bytes) -> bytes:
        req = _dec("GetComponentsRequest", msg)
        limit = int(req.get("limit") or 0)
        comps = []
        for name, ctype, on_type in self.view.kinds():
            counters = self.view.live_counters(name)
            sent = counters.get("sent_events_total")
            comp = {
                "component_id": name,
                "component_type": ctype,
                "on_type": on_type,
                "outputs": [
                    {"output_id": child,
                     "sent_events_total": int(sent or 0)}
                    for child in self.view.downstream(name)
                ],
            }
            if counters:
                comp["metrics"] = {
                    k: int(v) for k, v in counters.items()
                    if k in ("received_bytes_total",
                             "received_events_total",
                             "sent_bytes_total", "sent_events_total")
                }
            comps.append(comp)
            if limit and len(comps) >= limit:
                break
        return _enc("GetComponentsResponse", {"components": comps})

    # ---- streaming

    def _stream_heartbeat(self, msg: bytes):
        req = _dec("StreamHeartbeatRequest", msg)

        def gen():
            for _ in _ticks(req.get("interval_ms") or 1000):
                now = time.time()
                yield _enc("StreamHeartbeatResponse", {"utc": {
                    "seconds": int(now),
                    "nanos": int((now % 1) * 1e9),
                }})

        return gen()

    def _stream_uptime(self, msg: bytes):
        req = _dec("StreamUptimeRequest", msg)

        def gen():
            for _ in _ticks(req.get("interval_ms") or 1000):
                yield _enc("StreamUptimeResponse", {
                    "uptime_seconds": int(time.time() - self._t0)})

        return gen()

    def _stream_component_metrics(self, msg: bytes):
        req = _dec("StreamComponentMetricsRequest", msg)
        metric = int(req.get("metric") or 0)

        def gen():
            prev: dict[str, int] = {}
            step = max(int(req.get("interval_ms") or 1000), 10) / 1000.0
            for _ in _ticks(req.get("interval_ms") or 1000):
                for name, _ctype, _on in self.view.kinds():
                    counters = self.view.live_counters(name)
                    if metric in _TOTAL_FIELDS:
                        val = int(counters.get(_TOTAL_FIELDS[metric], 0))
                        resp = {"component_id": name,
                                "total": {"value": val}}
                        if metric == 6:  # sent events: per-output map
                            resp["total"]["output_totals"] = [
                                {"key": child, "value": val}
                                for child in self.view.downstream(name)
                            ]
                    elif metric in _RATE_FIELDS:
                        cur = int(counters.get(_RATE_FIELDS[metric], 0))
                        rate = (cur - prev.get(name, cur)) / step
                        prev[name] = cur
                        resp = {"component_id": name,
                                "throughput": {"value": float(rate)}}
                        if metric == 2:
                            resp["throughput"]["output_throughputs"] = [
                                {"key": child, "value": float(rate)}
                                for child in self.view.downstream(name)
                            ]
                    else:
                        continue
                    yield _enc("StreamComponentMetricsResponse", resp)

        return gen()

    def _stream_output_events(self, msg: bytes):
        req = _dec("StreamOutputEventsRequest", msg)
        patterns = req.get("outputs_patterns") or ["*"]
        limit = max(int(req.get("limit") or 100), 1)
        matched = [
            (name, ctype, on_type)
            for name, ctype, on_type in self.view.kinds()
            if any(fnmatch.fnmatch(name, p) for p in patterns)
            and name in self.view.outputs
        ]
        kind_names = {1: "source", 2: "transform", 3: "sink"}

        def gen():
            for p in patterns:
                ok = any(fnmatch.fnmatch(name, p)
                         for name, _c, _o in matched)
                yield _enc("StreamOutputEventsResponse", {
                    "notification": {"message": (
                        f"[tap] Pattern '{p}' successfully matched."
                        if ok else
                        f"[tap] Pattern '{p}' failed to match.")},
                })
            for _ in _ticks(req.get("interval_ms") or 500):
                for name, ctype, on_type in matched:
                    df = self.view.outputs[name]
                    try:
                        rows = df.take(limit)
                    except Exception:
                        continue
                    for row in rows:
                        wrapper = encode_vector_log(
                            row.asDict(recursive=True))
                        yield _enc("StreamOutputEventsResponse", {
                            "tapped_event": {
                                "component_id": name,
                                "component_type": on_type,
                                "component_kind": kind_names[ctype],
                                "event": wrapper,
                            },
                        })

        return gen()


def parse_address(addr: str | None) -> tuple[str, int]:
    """`api.address` string → (host, port); reference default
    127.0.0.1:8686 (src/config/api.rs default_address)."""
    if not addr:
        return "127.0.0.1", 8686
    host, _, port = str(addr).rpartition(":")
    return host or "127.0.0.1", int(port)


def start_api_server(view: TopologyView, api_cfg: dict) -> ApiServer:
    host, port = parse_address(api_cfg.get("address"))
    return ApiServer(view, host=host, port=port)

# TappedEvent.event is declared `bytes` in OBSERVABILITY_REGISTRY and
# fed a pre-encoded EventWrapper — wire-identical to a nested message
# field (protobuf nested messages are length-delimited bytes).


def attach_streaming_counters(spark, view: TopologyView):
    """Feed the API's counters from Structured Streaming progress:
    each sink's query is named after the sink (start_streaming_sink),
    so ``numInputRows`` per progress event attributes to that sink and
    its direct inputs — the streaming counterpart of run_sinks'
    batch-count feed (the reference's internal telemetry does the
    same attribution per component)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _CountersListener(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            p = event.progress
            name = p.name
            if not name or name not in view.sinks:
                return
            rows = int(p.numInputRows or 0)
            if not rows:
                return
            view.bump(name, "received_events_total", rows)
            view.bump(name, "sent_events_total", rows)
            for inp in view.sinks[name].get("inputs") or []:
                view.bump(inp, "sent_events_total", rows)

        def onQueryTerminated(self, event) -> None:
            pass

        def onQueryIdle(self, event) -> None:
            pass

    listener = _CountersListener()
    spark.streams.addListener(listener)
    return listener
