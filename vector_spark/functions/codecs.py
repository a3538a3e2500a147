"""Encoding/decoding codecs (reference `lib/codecs`, SURVEY §2.5).

Native Spark formats (json/csv/avro/parquet/text) need no code here —
`spark.read/write.format(...)`. This module supplies the wire formats the
reference encodes/decodes that Spark lacks, all as pure Column
expressions (JVM-side, codegen):

- logfmt  (encode/decode)  — `lib/codecs/src/encoding/format/logfmt.rs`
- GELF    (encode/decode)  — `.../gelf.rs` (JSON envelope with required
  version/host/short_message fields; extra fields carry a `_` prefix)
- CEF     (encode)         — `.../cef.rs` (pipe-delimited header +
  space-separated k=v extension)
- syslog  (encode)         — `.../syslog.rs` RFC3164 line (decode lives in
  functions.vrl.parse_syslog)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def encode_logfmt(pairs: dict[str, Column]) -> Column:
    """k=v space-separated; values with spaces are double-quoted."""
    parts = []
    for k, v in pairs.items():
        s = v.cast("string")
        quoted = F.when(
            s.contains(" ") | s.contains('"'),
            F.concat(F.lit('"'), F.regexp_replace(s, '"', '\\\\"'), F.lit('"')),
        ).otherwise(s)
        parts.append(F.concat(F.lit(f"{k}="), quoted))
    return F.concat_ws(" ", *parts)


def decode_logfmt(c: Column) -> Column:
    """logfmt line → map<string,string> (unquoted subset)."""
    return F.str_to_map(c, F.lit(" "), F.lit("="))


def encode_gelf(
    host: Column,
    short_message: Column,
    timestamp: Column,
    level: Column | None = None,
    extra: dict[str, Column] | None = None,
) -> Column:
    """GELF 1.1 JSON: required version/host/short_message; numeric epoch
    timestamp; additional fields MUST be prefixed with `_` (gelf spec,
    enforced by the reference's encoder)."""
    fields = [
        F.lit("1.1").alias("version"),
        host.alias("host"),
        short_message.alias("short_message"),
        F.unix_timestamp(timestamp).alias("timestamp"),
    ]
    if level is not None:
        fields.append(level.cast("int").alias("level"))
    for k, v in (extra or {}).items():
        name = k if k.startswith("_") else f"_{k}"
        fields.append(v.alias(name))
    return F.to_json(F.struct(*fields))


def decode_gelf(c: Column, extra_schema: str = "") -> Column:
    """GELF JSON → struct (version/host/short_message/timestamp/level +
    caller-specified `_`-prefixed extras, e.g. '_service string')."""
    schema = "version string, host string, short_message string, timestamp bigint, level int"
    if extra_schema:
        schema += ", " + extra_schema
    return F.from_json(c, schema)


def encode_cef(
    device_vendor: str,
    device_product: str,
    device_version: str,
    event_class_id: Column,
    name: Column,
    severity: Column,
    extension: dict[str, Column] | None = None,
) -> Column:
    """CEF:0|vendor|product|version|signature|name|severity|k=v k=v ..."""
    header = F.concat_ws(
        "|",
        F.lit("CEF:0"),
        F.lit(device_vendor),
        F.lit(device_product),
        F.lit(device_version),
        event_class_id.cast("string"),
        name.cast("string"),
        severity.cast("string"),
    )
    ext = [
        F.concat(F.lit(f"{k}="), v.cast("string"))
        for k, v in (extension or {}).items()
    ]
    if not ext:
        return header
    return F.concat(header, F.lit("|"), F.concat_ws(" ", *ext))


def encode_syslog(
    pri: Column,
    timestamp: Column,
    hostname: Column,
    appname: Column,
    message: Column,
    pid: Column | None = None,
) -> Column:
    """RFC3164 line: <pri>Mmm dd hh:mm:ss host app[pid]: message."""
    ts = F.date_format(timestamp, "MMM d HH:mm:ss")
    tag = (
        F.concat(appname, F.lit("["), pid.cast("string"), F.lit("]"))
        if pid is not None
        else appname
    )
    return F.concat(
        F.lit("<"), pri.cast("string"), F.lit(">"),
        ts, F.lit(" "), hostname, F.lit(" "), tag, F.lit(": "), message,
    )


# statsd wire format: <name>:<value>|<type>[|@<rate>][|#tag:v,tag:v]
# (reference src/sources/statsd/, lib/codecs decoding)
_STATSD_RE = r"^([^:]+):([-+]?[0-9.]+)\|(c|g|ms|s|h|d)(?:\|@([0-9.]+))?(?:\|#(.*))?$"


def decode_statsd(c: Column) -> Column:
    """statsd line → struct(name, value, metric_type, sample_rate, tags)."""
    mtype = F.regexp_extract(c, _STATSD_RE, 3)
    return F.struct(
        F.regexp_extract(c, _STATSD_RE, 1).alias("name"),
        _opt_cast(F.regexp_extract(c, _STATSD_RE, 2), "double").alias("value"),
        F.when(mtype == "c", "counter")
        .when(mtype == "g", "gauge")
        .when(mtype == "ms", "timing")
        .when(mtype == "s", "set")
        .when(mtype.isin("h", "d"), "histogram")
        .otherwise(None)
        .alias("metric_type"),
        F.coalesce(
            _opt_cast(F.regexp_extract(c, _STATSD_RE, 4), "double"), F.lit(1.0)
        ).alias("sample_rate"),
        _kv_or_empty(F.regexp_extract(c, _STATSD_RE, 5), ",", ":").alias("tags"),
    )


def _opt_cast(extracted: Column, dtype: str) -> Column:
    """try_cast for regexp_extract results: a missing optional group (or
    a non-matching line) extracts "" — guard it so the failure never
    takes Spark's exception-driven cast path (11x on failing rows,
    functions/vrl.py note). "" -> null either way."""
    return F.when(extracted != "", extracted.try_cast(dtype))


def _kv_or_empty(extracted: Column, pair_sep: str, kv_sep: str) -> Column:
    """str_to_map('') yields {'': null}; absent sections should be {}."""
    return F.when(
        extracted == "", F.map_from_arrays(F.array(), F.array())
    ).otherwise(F.str_to_map(extracted, F.lit(pair_sep), F.lit(kv_sep)))


# influxdb line protocol: measurement[,tag=v...] field=v[,field=v...] [ts]
# (reference lib/codecs/src/decoding/format/influxdb.rs)
_INFLUX_RE = r"^([^,\s]+)(?:,([^\s]+))?\s([^\s]+)(?:\s(\d+))?$"


def decode_influxdb_line(c: Column) -> Column:
    """InfluxDB line → struct(measurement, tags map, fields map, ts_ns).

    Field values keep their wire form in the map (callers cast; `i`
    suffix = integer per the protocol)."""
    return F.struct(
        F.regexp_extract(c, _INFLUX_RE, 1).alias("measurement"),
        _kv_or_empty(F.regexp_extract(c, _INFLUX_RE, 2), ",", "=").alias("tags"),
        _kv_or_empty(F.regexp_extract(c, _INFLUX_RE, 3), ",", "=").alias("fields"),
        _opt_cast(F.regexp_extract(c, _INFLUX_RE, 4), "long").alias("ts_ns"),
    )


# ---- OTLP (OpenTelemetry protocol, JSON encoding) ----------------------
# Reference lib/codecs/src/decoding/format/otlp.rs decodes the protobuf
# wire form; OTLP also defines a canonical JSON mapping (the OTLP/HTTP
# +json content type), which is what we implement — protobuf is
# unavailable in-container (scripts/probe_protobuf.py proves it:
# PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE).
# Structure: resourceLogs[] → (resource.attributes[], scopeLogs[] →
# (scope, logRecords[] → {timeUnixNano, severityNumber, severityText,
# body.stringValue})).

OTLP_LOGS_SCHEMA = (
    "resourceLogs array<struct<"
    "resource:struct<attributes:array<struct<"
    "key:string,value:struct<stringValue:string>>>>,"
    "scopeLogs:array<struct<"
    "scope:struct<name:string>,"
    "logRecords:array<struct<"
    "timeUnixNano:string,severityNumber:int,severityText:string,"
    "body:struct<stringValue:string>>>>>>>"
)


def _otlp_attr(key: str, value: Column) -> Column:
    return F.struct(
        F.lit(key).alias("key"),
        F.struct(value.cast("string").alias("stringValue")).alias("value"),
    )


def encode_otlp_logs(
    ts: Column,
    body: Column,
    severity_number: Column,
    severity_text: Column,
    resource_attrs: dict[str, Column],
    scope_name: str = "vector_spark",
    envelope: bool = True,
) -> Column:
    """One event → one OTLP/JSON ExportLogsServiceRequest payload.
    timeUnixNano is serialized as a decimal string (the OTLP JSON mapping
    for uint64 fields). With ``envelope=False`` returns just the
    resourceLogs ELEMENT json — the opentelemetry sink batches many
    elements into one request body (`{"resourceLogs":[e1,e2,...]}`)
    with byte-level concatenation, keeping all encoding JVM-side."""
    record = F.struct(
        (F.unix_micros(ts) * 1000).cast("string").alias("timeUnixNano"),
        severity_number.cast("int").alias("severityNumber"),
        severity_text.cast("string").alias("severityText"),
        F.struct(body.cast("string").alias("stringValue")).alias("body"),
    )
    resource_log = F.struct(
        F.struct(
            F.array(*[_otlp_attr(k, v) for k, v in resource_attrs.items()]).alias(
                "attributes"
            )
        ).alias("resource"),
        F.array(
            F.struct(
                F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                F.array(record).alias("logRecords"),
            )
        ).alias("scopeLogs"),
    )
    if not envelope:
        return F.to_json(resource_log)
    return F.to_json(F.struct(F.array(resource_log).alias("resourceLogs")))


def otlp_resource_attr(resource: Column, key: str) -> Column:
    """Extract one string resource attribute by key (null when absent)."""
    hit = F.filter(resource.getField("attributes"), lambda a: a.getField("key") == key)
    # try_element_at: ANSI mode throws on element_at over an empty array,
    # but an absent attribute must read as null
    return F.try_element_at(hit, F.lit(1)).getField("value").getField("stringValue")


_OTLP_RESOURCE_SCHEMA = (
    "struct<attributes:array<struct<key:string,"
    "value:struct<stringValue:string>>>>"
)


def otlp_logs_to_events(df, payload_col: str = "payload"):
    """OTLP/JSON payload column → flat log-event rows (one per logRecord).

    A payload batching many resources/scopes/records explodes into that
    many rows — the inverse of the reference's per-request decode. Narrow
    explode chain, no shuffle: stays scan-speed at 100 TB.

    Decodes through Spark 4's VARIANT (`parse_json` + `variant_get`)
    instead of `from_json` with the full nested schema: one binary parse
    per payload, then cheap path extraction — measured ~20x faster on
    the bench payloads (1.8 s → 0.1 s warm at sf0.1). Only the small
    `resource` subtree re-parses into its typed struct for downstream
    `otlp_resource_attr` consumers."""
    v = df.select(F.parse_json(F.col(payload_col)).alias("v"))
    rl = v.select(
        F.explode(
            F.try_variant_get("v", "$.resourceLogs", "array<variant>")
        ).alias("rl")
    )
    sl = rl.select(
        F.try_variant_get("rl", "$.resource", "variant").alias("rv"),
        F.explode(
            F.try_variant_get("rl", "$.scopeLogs", "array<variant>")
        ).alias("sl"),
    )
    lr = sl.select(
        "rv",
        F.try_variant_get("sl", "$.scope.name", "string").alias("scope_name"),
        F.explode(
            F.try_variant_get("sl", "$.logRecords", "array<variant>")
        ).alias("r"),
    )
    return lr.select(
        F.try_variant_get("r", "$.timeUnixNano", "string")
        .cast("long")
        .alias("time_unix_nano"),
        F.try_variant_get("r", "$.severityNumber", "int").alias("severity_number"),
        F.try_variant_get("r", "$.severityText", "string").alias("severity_text"),
        F.try_variant_get("r", "$.body.stringValue", "string").alias("body"),
        "scope_name",
        F.from_json(F.to_json("rv"), _OTLP_RESOURCE_SCHEMA).alias("resource"),
    )


# OTLP traces (JSON mapping): resourceSpans[] → scopeSpans[] → spans[]
# {traceId, spanId, parentSpanId, name, kind, startTimeUnixNano,
#  endTimeUnixNano, status.code}. TraceEvents are structurally logs in
# the reference (`lib/vector-core/src/event/trace.rs:19`); here they
# flatten to rows the trace_to_log transform already understands.

OTLP_TRACES_SCHEMA = (
    "resourceSpans array<struct<"
    "resource:struct<attributes:array<struct<"
    "key:string,value:struct<stringValue:string>>>>,"
    "scopeSpans:array<struct<"
    "scope:struct<name:string>,"
    "spans:array<struct<"
    "traceId:string,spanId:string,parentSpanId:string,name:string,"
    "kind:int,startTimeUnixNano:string,endTimeUnixNano:string,"
    "status:struct<code:int>>>>>>>"
)


def encode_otlp_traces(
    trace_id: Column,
    span_id: Column,
    name: Column,
    start_ts: Column,
    end_ts: Column,
    resource_attrs: dict[str, Column],
    parent_span_id: Column | None = None,
    kind: Column | None = None,
    status_code: Column | None = None,
    scope_name: str = "vector_spark",
) -> Column:
    """One span → one OTLP/JSON ExportTraceServiceRequest payload."""
    span = F.struct(
        trace_id.cast("string").alias("traceId"),
        span_id.cast("string").alias("spanId"),
        (parent_span_id if parent_span_id is not None else F.lit(None))
        .cast("string")
        .alias("parentSpanId"),
        name.cast("string").alias("name"),
        (kind if kind is not None else F.lit(1)).cast("int").alias("kind"),
        (F.unix_micros(start_ts) * 1000).cast("string").alias("startTimeUnixNano"),
        (F.unix_micros(end_ts) * 1000).cast("string").alias("endTimeUnixNano"),
        F.struct(
            (status_code if status_code is not None else F.lit(0))
            .cast("int")
            .alias("code")
        ).alias("status"),
    )
    resource_span = F.struct(
        F.struct(
            F.array(*[_otlp_attr(k, v) for k, v in resource_attrs.items()]).alias(
                "attributes"
            )
        ).alias("resource"),
        F.array(
            F.struct(
                F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                F.array(span).alias("spans"),
            )
        ).alias("scopeSpans"),
    )
    return F.to_json(F.struct(F.array(resource_span).alias("resourceSpans")))


def otlp_traces_to_events(df, payload_col: str = "payload"):
    """OTLP/JSON trace payloads → flat span rows (narrow explode chain;
    VARIANT decode like otlp_logs_to_events)."""
    v = df.select(F.parse_json(F.col(payload_col)).alias("v"))
    rs = v.select(
        F.explode(
            F.try_variant_get("v", "$.resourceSpans", "array<variant>")
        ).alias("rs")
    )
    ss = rs.select(
        F.try_variant_get("rs", "$.resource", "variant").alias("rv"),
        F.explode(
            F.try_variant_get("rs", "$.scopeSpans", "array<variant>")
        ).alias("ss"),
    )
    sp = ss.select(
        "rv",
        F.explode(F.try_variant_get("ss", "$.spans", "array<variant>")).alias("s"),
    )

    def g(path: str, t: str) -> Column:
        return F.try_variant_get("s", path, t)

    return sp.select(
        g("$.traceId", "string").alias("trace_id"),
        g("$.spanId", "string").alias("span_id"),
        g("$.parentSpanId", "string").alias("parent_span_id"),
        g("$.name", "string").alias("name"),
        g("$.kind", "int").alias("kind"),
        g("$.startTimeUnixNano", "string").cast("long").alias("start_unix_nano"),
        g("$.endTimeUnixNano", "string").cast("long").alias("end_unix_nano"),
        g("$.status.code", "int").alias("status_code"),
        F.from_json(F.to_json("rv"), _OTLP_RESOURCE_SCHEMA).alias("resource"),
    )


# OTLP metrics (JSON mapping): resourceMetrics[] → scopeMetrics[] →
# metrics[] → gauge|sum{dataPoints[{timeUnixNano, asDouble}]}. Decoded
# rows use the engine's tall metric shape (SURVEY §1.6: name, kind,
# ts-nanos, value) — sum.isMonotonic+delta temporality maps to kind
# 'incremental', gauge to 'absolute', feeding incremental_to_absolute.

OTLP_METRICS_SCHEMA = (
    "resourceMetrics array<struct<"
    "resource:struct<attributes:array<struct<"
    "key:string,value:struct<stringValue:string>>>>,"
    "scopeMetrics:array<struct<"
    "scope:struct<name:string>,"
    "metrics:array<struct<"
    "name:string,"
    "gauge:struct<dataPoints:array<struct<"
    "timeUnixNano:string,asDouble:double>>>,"
    "sum:struct<isMonotonic:boolean,aggregationTemporality:int,"
    "dataPoints:array<struct<timeUnixNano:string,asDouble:double>>>"
    ">>>>>>"
)


def encode_otlp_metrics(
    ts: Column,
    name: Column,
    value: Column,
    kind: Column,
    resource_attrs: dict[str, Column],
    scope_name: str = "vector_spark",
) -> Column:
    """One metric sample → one OTLP/JSON ExportMetricsServiceRequest.
    kind 'incremental' emits a monotonic delta sum, anything else a
    gauge (the reference's MetricKind mapping)."""
    point = F.struct(
        (F.unix_micros(ts) * 1000).cast("string").alias("timeUnixNano"),
        value.cast("double").alias("asDouble"),
    )
    is_incr = kind == "incremental"
    metric = F.struct(
        name.cast("string").alias("name"),
        F.when(~is_incr, F.struct(F.array(point).alias("dataPoints"))).alias(
            "gauge"
        ),
        F.when(
            is_incr,
            F.struct(
                F.lit(True).alias("isMonotonic"),
                F.lit(1).alias("aggregationTemporality"),  # DELTA
                F.array(point).alias("dataPoints"),
            ),
        ).alias("sum"),
    )
    resource_metric = F.struct(
        F.struct(
            F.array(*[_otlp_attr(k, v) for k, v in resource_attrs.items()]).alias(
                "attributes"
            )
        ).alias("resource"),
        F.array(
            F.struct(
                F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                F.array(metric).alias("metrics"),
            )
        ).alias("scopeMetrics"),
    )
    return F.to_json(F.struct(F.array(resource_metric).alias("resourceMetrics")))


def otlp_metrics_to_events(df, payload_col: str = "payload"):
    """OTLP/JSON metric payloads → tall metric rows: one row per data
    point, with kind derived from the gauge-vs-sum variant (narrow
    explode chain; VARIANT decode like otlp_logs_to_events)."""
    v = df.select(F.parse_json(F.col(payload_col)).alias("v"))
    rm = v.select(
        F.explode(
            F.try_variant_get("v", "$.resourceMetrics", "array<variant>")
        ).alias("rm")
    )
    sm = rm.select(
        F.try_variant_get("rm", "$.resource", "variant").alias("rv"),
        F.explode(
            F.try_variant_get("rm", "$.scopeMetrics", "array<variant>")
        ).alias("sm"),
    )
    m = sm.select(
        "rv",
        F.explode(F.try_variant_get("sm", "$.metrics", "array<variant>")).alias(
            "m"
        ),
    )
    gauge_pts = F.try_variant_get("m", "$.gauge.dataPoints", "array<variant>")
    sum_pts = F.try_variant_get("m", "$.sum.dataPoints", "array<variant>")
    mono = F.coalesce(
        F.try_variant_get("m", "$.sum.isMonotonic", "boolean"), F.lit(False)
    )
    gauge = m.where(gauge_pts.isNotNull()).select(
        "rv",
        F.try_variant_get("m", "$.name", "string").alias("name"),
        F.lit("absolute").alias("kind"),
        F.explode(gauge_pts).alias("p"),
    )
    summ = m.where(sum_pts.isNotNull()).select(
        "rv",
        F.try_variant_get("m", "$.name", "string").alias("name"),
        F.when(mono, "incremental").otherwise("absolute").alias("kind"),
        F.explode(sum_pts).alias("p"),
    )
    both = gauge.unionByName(summ)
    return both.select(
        "name",
        "kind",
        F.try_variant_get("p", "$.timeUnixNano", "string")
        .cast("long")
        .alias("time_unix_nano"),
        F.try_variant_get("p", "$.asDouble", "double").alias("value"),
        F.from_json(F.to_json("rv"), _OTLP_RESOURCE_SCHEMA).alias("resource"),
    )


# prometheus text exposition format (reference src/sources/prometheus/
# scrape parses this): `name{label="v",...} value [timestamp_ms]`
_PROM_RE = (
    r'^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+([-+]?[0-9.eE+NaInf]+)'
    r"(?:\s+(\d+))?$"
)


def decode_prometheus_line(c: Column) -> Column:
    """One exposition line → struct(name, labels map, value, ts_ms).
    Comment/TYPE/HELP lines yield name '' (filter upstream)."""
    labels_raw = F.regexp_extract(c, _PROM_RE, 2)
    # label pairs: k="v" comma-separated; strip the quotes after split
    labels = F.when(
        labels_raw == "", F.map_from_arrays(F.array(), F.array())
    ).otherwise(
        F.transform_values(
            F.str_to_map(labels_raw, F.lit(","), F.lit("=")),
            lambda k, v: F.regexp_replace(v, '^"|"$', ""),
        )
    )
    return F.struct(
        F.regexp_extract(c, _PROM_RE, 1).alias("name"),
        labels.alias("labels"),
        _opt_cast(F.regexp_extract(c, _PROM_RE, 3), "double").alias("value"),
        _opt_cast(F.regexp_extract(c, _PROM_RE, 4), "long").alias("ts_ms"),
    )


def encode_prometheus_line(
    name: Column, value: Column, labels: dict[str, Column] | None = None,
    ts_ms: Column | None = None,
) -> Column:
    """Metric row → exposition line (prometheus_exporter sink analog)."""
    parts = [name.cast("string")]
    if labels:
        kv = [
            F.concat(F.lit(f'{k}="'), v.cast("string"), F.lit('"'))
            for k, v in labels.items()
        ]
        parts += [F.lit("{"), F.concat_ws(",", *kv), F.lit("}")]
    parts += [F.lit(" "), value.cast("string")]
    if ts_ms is not None:
        parts += [F.lit(" "), ts_ms.cast("string")]
    return F.concat(*parts)


def encode_prometheus_line_map(
    name: Column, tags: Column, value: Column
) -> Column:
    """Exposition line from a map<string,string> tag column (the dynamic
    form sinks need; labels sorted for deterministic output)."""
    kv = F.transform(
        F.array_sort(F.map_entries(F.coalesce(tags, F.map_from_arrays(F.array(), F.array())))),
        lambda e: F.concat(e["key"], F.lit('="'), e["value"].cast("string"), F.lit('"')),
    )
    braced = F.when(
        F.size(kv) > 0,
        F.concat(F.lit("{"), F.array_join(kv, ","), F.lit("}")),
    ).otherwise(F.lit(""))
    return F.concat(name.cast("string"), braced, F.lit(" "), value.cast("string"))


def encode_influxdb_line(
    measurement: Column,
    fields: dict[str, Column],
    tags: dict[str, Column] | None = None,
    ts_ns: Column | None = None,
) -> Column:
    """Metric row → InfluxDB line protocol (influxdb sink analog).
    Numeric field values serialize bare; callers pre-escape specials."""
    parts = [measurement.cast("string")]
    for k, v in (tags or {}).items():
        parts += [F.lit(f",{k}="), v.cast("string")]
    fparts = [
        F.concat(F.lit(f"{k}="), v.cast("string")) for k, v in fields.items()
    ]
    parts += [F.lit(" "), F.concat_ws(",", *fparts)]
    if ts_ns is not None:
        parts += [F.lit(" "), ts_ns.cast("string")]
    return F.concat(*parts)


# ---- native_json / raw_message / arrow (encoding/format/{native_json,
# raw_message,arrow}.rs) ---------------------------------------------------

def encode_native_json(event_type: str = "log", **cols: Column) -> Column:
    """Vector's native JSON event form: the event wrapped under its type
    tag — `{"log": {...}}`, `{"metric": {...}}`, `{"trace": {...}}`
    (lib/codecs/src/encoding/format/native_json.rs)."""
    if event_type not in ("log", "metric", "trace"):
        raise ValueError(f"unknown event type {event_type!r}")
    return F.to_json(
        F.struct(
            F.struct(*[c.alias(n) for n, c in cols.items()]).alias(event_type)
        )
    )


def decode_native_json(c: Column, log_schema: str) -> Column:
    """Native JSON → struct of the wrapped event. `log_schema` is the
    inner field schema DDL, e.g. 'message string, host string'."""
    return F.from_json(
        c, f"log struct<{log_schema}>, metric string, trace string"
    )


def encode_raw_message(message: Column) -> Column:
    """raw_message encoding: the message bytes, nothing else."""
    return message.cast("string")


def encode_native_proto(event: Column) -> Column:
    """Vector `native` (protobuf) encoding: a struct Column → EventWrapper
    wire bytes (lib/codecs/src/encoding/format/native.rs) via the
    pure-Python wire codec in functions/protowire.py — Arrow-batched
    pandas UDF, no jars or google.protobuf."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(s: pd.DataFrame) -> pd.Series:
        from vector_spark.functions.protowire import encode_vector_log

        rows = s.to_dict("records") if isinstance(s, pd.DataFrame) else [
            dict(v) if v is not None else None for v in s
        ]
        return pd.Series(
            [None if r is None else encode_vector_log(r) for r in rows]
        )

    return enc(event)


def decode_native_proto_json(payload: Column) -> Column:
    """Vector `native` (protobuf) decoding: EventWrapper bytes → the
    event's fields as JSON text (timestamps as epoch-micros ints so the
    bridge stays exact) — apply from_json with the expected schema
    downstream, keeping the plan typed (decoding/format/native.rs)."""
    import json

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def dec(s: pd.Series) -> pd.Series:
        import datetime as dt

        from vector_spark.functions.protowire import decode_vector_log

        def conv(v):
            if isinstance(v, dt.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
                return (v - dt.datetime(1970, 1, 1)) // dt.timedelta(
                    microseconds=1
                )
            raise TypeError(type(v))

        return pd.Series(
            [
                None
                if b is None
                else json.dumps(decode_vector_log(bytes(b)), default=conv)
                for b in s
            ]
        )

    return dec(payload)


def encode_arrow_ipc(df, batch_max_rows: int = 10_000,
                     compression: str | None = None,
                     allow_nullable_fields: bool = False):
    """Events → Arrow IPC stream blobs, one row per Arrow batch
    (lib/codecs/src/encoding/format/arrow.rs — the reference emits one
    IPC payload per sink batch; the 0.57 window added buffer
    ``compression``: zstd/lz4). mapInPandas keeps this executor-side and
    Arrow-batched: each pandas chunk serializes with pyarrow, no driver
    collect. ``allow_nullable_fields`` mirrors arrow.rs:41-47 — with it
    off, a null in a non-nullable declared field errors the batch.
    Returns DataFrame[n_rows bigint, payload binary]."""
    import pandas as pd

    comp = None if compression in (None, "none") else str(compression)

    def serialize(batches):
        import io

        import pyarrow as pa

        opts = pa.ipc.IpcWriteOptions(compression=comp)
        for pdf in batches:
            for start in range(0, len(pdf), batch_max_rows):
                chunk = pdf.iloc[start : start + batch_max_rows]
                table = pa.Table.from_pandas(chunk, preserve_index=False)
                if not allow_nullable_fields:
                    for col, field in zip(table.columns, table.schema):
                        if not field.nullable and col.null_count:
                            raise ValueError(
                                f"arrow_ipc: null in non-nullable field "
                                f"{field.name!r} (set "
                                f"allow_nullable_fields)")
                buf = io.BytesIO()
                with pa.ipc.new_stream(buf, table.schema,
                                       options=opts) as writer:
                    writer.write_table(table)
                yield pd.DataFrame(
                    {"n_rows": [len(chunk)], "payload": [buf.getvalue()]}
                )

    return df.mapInPandas(serialize, schema="n_rows bigint, payload binary")


def decode_arrow_ipc(df, schema: str):
    """Arrow IPC blobs (payload binary) → event rows of `schema` (DDL).
    Inverse of encode_arrow_ipc; unreadable payloads are skipped."""
    def deserialize(batches):
        import io

        import pyarrow as pa

        for pdf in batches:
            for payload in pdf["payload"]:
                try:
                    with pa.ipc.open_stream(io.BytesIO(bytes(payload))) as r:
                        table = r.read_all()
                except pa.ArrowInvalid:
                    continue
                yield table.to_pandas()

    return df.mapInPandas(deserialize, schema=schema)


# ---- Splunk HEC (src/sources/splunk_hec, src/sinks/splunk_hec) ----------

def encode_splunk_hec(
    event: Column,
    ts: Column,
    host: Column | None = None,
    source: Column | None = None,
    sourcetype: Column | None = None,
    index: Column | None = None,
) -> Column:
    """Event → HEC JSON envelope: {"event": ..., "time": epoch.millis,
    "host": ..., "source": ..., "sourcetype": ..., "index": ...} — the
    /services/collector/event wire form."""
    fields = [
        event.alias("event"),
        (F.unix_micros(ts) / 1_000_000.0).alias("time"),
    ]
    for name, c in (
        ("host", host), ("source", source),
        ("sourcetype", sourcetype), ("index", index),
    ):
        if c is not None:
            fields.append(c.alias(name))
    return F.to_json(F.struct(*fields))


def decode_splunk_hec(c: Column) -> Column:
    """HEC JSON → struct(event, time → ts, host, source, sourcetype,
    index). `event` can be a string or an object; it comes back as its
    JSON text (parse_json downstream), matching the schemaless contract."""
    v = F.parse_json(c)

    def g(path: str, t: str) -> Column:
        return F.try_variant_get(v, path, t)

    event_text = F.coalesce(
        g("$.event", "string"),
        F.to_json(g("$.event", "variant")),
    )
    return F.struct(
        event_text.alias("event"),
        F.timestamp_micros(
            (g("$.time", "double") * 1_000_000).cast("long")
        ).alias("ts"),
        g("$.host", "string").alias("host"),
        g("$.source", "string").alias("source"),
        g("$.sourcetype", "string").alias("sourcetype"),
        g("$.index", "string").alias("index"),
    )


def encode_datadog_series_v2(series: Column) -> Column:
    """datadog series-v2 encoding: a struct Column (metric, type,
    tags array, value, ts) → zlib MetricPayload wire bytes, one
    single-point payload per row (src/sinks/datadog/metrics/
    encoder.rs) — the oracle-roundtrip Column form of the sink's
    codec."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(s: pd.DataFrame) -> pd.Series:
        import zlib

        from vector_spark.functions.protowire import (
            encode_datadog_metric_payload,
        )

        return pd.Series([
            None if r is None else zlib.compress(
                encode_datadog_metric_payload([{
                    "metric": r["metric"], "type": r["type"],
                    "tags": list(r["tags"] or []),
                    "points": [(r["ts"], r["value"])],
                }])
            )
            for r in s.to_dict("records")
        ])

    return enc(series)


def decode_datadog_series_v2_json(payload: Column) -> Column:
    """zlib MetricPayload bytes → the first point's flat fields as
    JSON text (the datadog_agent intake's fan-out shape)."""
    import json as _json

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def dec(s: pd.Series) -> pd.Series:
        import zlib

        from vector_spark.functions.protowire import (
            decode_datadog_metric_payload,
        )

        return pd.Series([
            None if b is None else _json.dumps(
                decode_datadog_metric_payload(
                    zlib.decompress(bytes(b))
                )[0]
            )
            for b in s
        ])

    return dec(payload)


def pushgateway_grouping_labels(path: Column) -> Column:
    """Pushgateway URL path → grouping-label map. The public contract
    (prometheus/pushgateway README; reference src/sources/prometheus/
    pushgateway.rs parse_path_labels): `/metrics/job/<v>[/<k>/<v>...]`
    in alternating key/value segments; a key suffixed `@base64`
    URL-safe-base64-decodes its value (padding optional; a value of
    only `=` characters means the empty string). Pure Column work —
    no Python in the loop. Odd segment counts yield null (callers
    drop, the reference 400s)."""
    rest = F.regexp_replace(path, r"^/metrics/", "")
    segs = F.split(rest, "/")
    keys = F.filter(segs, lambda x, i: i % 2 == 0)
    vals = F.filter(segs, lambda x, i: i % 2 == 1)

    def dec_val(k: Column, v: Column) -> Column:
        std = F.translate(v, "-_", "+/")
        padded = F.concat(
            std,
            F.repeat(F.lit("="), (4 - F.length(std) % 4) % 4),
        )
        return (
            F.when(~k.endswith("@base64"), v)
            .when(v.rlike("^=+$"), F.lit(""))
            .otherwise(F.decode(F.unbase64(padded), "UTF-8"))
        )

    return F.when(
        path.startswith("/metrics/job")
        & (F.size(keys) == F.size(vals)),
        F.map_from_arrays(
            F.transform(
                keys, lambda k: F.regexp_replace(k, "@base64$", "")
            ),
            F.zip_with(keys, vals, dec_val),
        ),
    )


def decode_pushgateway_event(path: Column, line: Column) -> Column:
    """One (request path, exposition line) pair → struct(name, labels,
    value, ts_ms) with the path's grouping labels OVERRIDING same-named
    body labels (parser.rs parse_text_with_overrides semantics)."""
    m = decode_prometheus_line(line)
    grouping = pushgateway_grouping_labels(path)
    body_only = F.map_filter(
        m.getField("labels"),
        lambda k, v: ~F.array_contains(F.map_keys(grouping), k),
    )
    return F.struct(
        m.getField("name").alias("name"),
        F.map_concat(body_only, grouping).alias("labels"),
        m.getField("value").alias("value"),
        m.getField("ts_ms").alias("ts_ms"),
    )


def prometheus_rw_roundtrip_rows(df, name_col: str, tags_col: str,
                                 value_col: str, ts_ms_col: str):
    """Encode each ARROW BATCH of samples as ONE snappy WriteRequest
    (the sink's real batching: series grouped on label sets, samples
    sorted) and decode it straight back through the source-side
    flattening — returning one row per sample. Batch boundaries don't
    affect the output SET, so the oracle hash is stable; batching
    keeps the pure-Python snappy cost amortized like the sink's
    (per-request, not per-row)."""

    def fn(batches):
        from vector_spark.functions.protowire import (
            decode_prometheus_write_request,
            encode_prometheus_write_request,
        )
        from vector_spark.functions.snappy import compress, decompress

        for pdf in batches:
            samples = [
                (r[name_col], r[tags_col], r[value_col], r[ts_ms_col])
                for r in pdf.to_dict("records")
            ]
            if not samples:
                continue
            wire = compress(encode_prometheus_write_request(samples))
            out = decode_prometheus_write_request(decompress(wire))
            yield pd.DataFrame({
                "name": [o["name"] for o in out],
                "tags": [o["tags"] for o in out],
                "value": [o["value"] for o in out],
                "timestamp_ms": [o["timestamp_ms"] for o in out],
            })

    return df.mapInPandas(
        fn,
        schema="name string, tags map<string,string>, value double,"
               " timestamp_ms long",
    )


def datadog_trace_roundtrip_rows(df):
    """Encode each ARROW BATCH of span rows as ONE TracePayload (the
    traces sink's per-request grouping: one TraceChunk per trace) and
    decode it straight back — one row per span. Batch boundaries don't
    change the output SET, so the oracle hash is stable."""

    def fn(batches):
        from vector_spark.functions.protowire import (
            decode_datadog_trace_payload,
            encode_datadog_trace_payload,
        )

        for pdf in batches:
            rows = pdf.to_dict("records")
            if not rows:
                continue
            out = decode_datadog_trace_payload(
                encode_datadog_trace_payload(rows)
            )
            yield pd.DataFrame({
                "trace_id": [o["trace_id"] for o in out],
                "span_id": [o["span_id"] for o in out],
                "parent_id": [o["parent_id"] for o in out],
                "service": [o["service"] for o in out],
                "name": [o["name"] for o in out],
                "start": [o["start"] for o in out],
                "duration": [o["duration"] for o in out],
                "error": [o["error"] for o in out],
            })

    return df.mapInPandas(
        fn,
        schema="trace_id long, span_id long, parent_id long,"
               " service string, name string, start long,"
               " duration long, error int",
    )


def otlp_traces_pb_roundtrip_rows(df):
    """Encode each ARROW BATCH of span rows as ONE
    ExportTraceServiceRequest (opentelemetry-proto trace/v1 wire form,
    the OTLP gRPC TraceService payload) and decode it straight back —
    one row per span. Batch boundaries don't change the output SET."""

    def fn(batches):
        from vector_spark.functions.protowire import (
            decode_otlp_traces_pb,
            encode_otlp_traces_pb,
        )

        for pdf in batches:
            rows = pdf.to_dict("records")
            if not rows:
                continue
            out = decode_otlp_traces_pb(encode_otlp_traces_pb(rows))
            yield pd.DataFrame({
                "trace_id": [o["trace_id"] for o in out],
                "span_id": [o["span_id"] for o in out],
                "name": [o["name"] for o in out],
                "kind": [o["kind"] for o in out],
                "start_time_unix_nano":
                    [o["start_time_unix_nano"] for o in out],
                "end_time_unix_nano":
                    [o["end_time_unix_nano"] for o in out],
                "status_code": [o["status_code"] for o in out],
            })

    return df.mapInPandas(
        fn,
        schema="trace_id string, span_id string, name string,"
               " kind int, start_time_unix_nano long,"
               " end_time_unix_nano long, status_code int",
    )


def otlp_metrics_pb_roundtrip_rows(df):
    """Encode each ARROW BATCH of metric rows as ONE
    ExportMetricsServiceRequest (opentelemetry-proto metrics/v1 wire
    form, the OTLP gRPC MetricsService payload) and decode it straight
    back — one row per data point."""

    def fn(batches):
        from vector_spark.functions.protowire import (
            decode_otlp_metrics_pb,
            encode_otlp_metrics_pb,
        )

        for pdf in batches:
            rows = pdf.to_dict("records")
            if not rows:
                continue
            out = decode_otlp_metrics_pb(encode_otlp_metrics_pb(rows))
            yield pd.DataFrame({
                "name": [o["name"] for o in out],
                "mtype": [o["type"] for o in out],
                "value": [float(o["value"]) for o in out],
                "time_unix_nano": [o["time_unix_nano"] for o in out],
            })

    return df.mapInPandas(
        fn,
        schema="name string, mtype string, value double,"
               " time_unix_nano long",
    )
