"""HTTP push-ingest source family (split out of sources.py in r11):
the http_server listener with the reference's full request surface
(src/sources/http_server.rs SimpleHttpConfig), meta merging, and
path-routing to per-endpoint decoders (splunk_hec, OTLP/HTTP,
prometheus pushgateway, datadog agent, heroku, firehose...).
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql.datasource import DataSource
from pyspark.sql.types import StructType

from vector_spark.sources_core import (
    HTTP_SCHEMA,
    SOCKET_SCHEMA,
    _ListenerState,
    _SocketStreamReader,
)

def _http_listener(state: _ListenerState, host: str, port: int,
                   ready: threading.Event, tls=None, options=None):
    """HTTP push endpoint (vector `src/sources/http_server.rs`):
    one event per newline-delimited body line; a JSON-array body yields
    one event per element (the reference's json decoding + framing).

    The reference's request-surface config (http_server.rs
    SimpleHttpConfig) rides in ``options``:
    - ``auth.username``/``auth.password`` — HTTP Basic; mismatch → 401
      (auth should pair with ``tls`` — the reference's own warning);
    - ``headers`` / ``query_parameters`` — comma-separated names,
      fnmatch wildcards allowed (``X-*``, ``*``); captured values land
      in the ``meta`` JSON column (downstream merges them into events,
      the reference's add_headers/add_query_parameters);
    - ``method`` (default POST) — others answer 405;
    - ``path`` + ``strict_path`` (default true when ``path`` is set) —
      exact match, or prefix when strict_path=false; miss → 404.
      Without a ``path`` option every path is accepted (this repo's
      multi-endpoint routing default, `route_http_endpoints`);
    - ``response_code`` — success status (default 200)."""
    import base64 as _b64
    import fnmatch
    import http.server

    opts = options or {}
    auth_user = opts.get("auth.username")
    auth_pass = opts.get("auth.password")
    want_auth = None
    if auth_user is not None:
        want_auth = "Basic " + _b64.b64encode(
            f"{auth_user}:{auth_pass or ''}".encode()).decode()
    # custom VRL auth (src/common/http/server_auth.rs Custom strategy):
    # the program sees .headers/.address/.path, must end in a boolean,
    # may write %field metadata that rides into authenticated events
    # (meta JSON "auth" object → merge_http_meta)
    custom_auth = None
    if opts.get("auth.source") is not None:
        from vector_spark.functions.vrl_interp import vrl_auth_matcher

        custom_auth = vrl_auth_matcher(str(opts["auth.source"]))
    hdr_pats = [p.strip() for p in (opts.get("headers") or "").split(",")
                if p.strip()]
    qp_pats = [p.strip()
               for p in (opts.get("query_parameters") or "").split(",")
               if p.strip()]
    method = (opts.get("method") or "POST").upper()
    cfg_path = opts.get("path")
    strict = str(opts.get("strict_path", "true")).lower() != "false"
    ok_code = int(opts.get("response_code", 200))
    # Splunk HEC indexer acknowledgements (src/sources/splunk_hec/
    # acknowledgements.rs): when enabled, event posts to the collector
    # endpoints REQUIRE a channel (X-Splunk-Request-Channel header or
    # `channel` query param) and answer {"text":"Success","code":0,
    # "ackId":N}; clients then POST {"acks":[ids]} to
    # /services/collector/ack and get {"acks":{id:bool}} back. Under
    # this engine's delivery contract an event is durable once it is
    # in the WAL, so an ackId reports True as soon as its request has
    # been appended (the reference flips it on end-to-end delivery;
    # WAL + checkpoint is this engine's equivalent boundary).
    hec_ack = str(opts.get("hec.ack", "")).lower() in ("1", "true",
                                                       "yes", "on")
    # max_pending_acks_per_channel (acknowledgements.rs: the reference
    # bounds pending statuses and drops the OLDEST when full) — acked
    # ids are monotonic per channel, so the bound is a min-id watermark
    hec_max_pending = int(opts.get("hec.max_pending_acks_per_channel",
                                   100_000))
    hec_lock = threading.Lock()
    hec_channels: dict[str, dict] = {}

    def _capture(headers, query: str) -> str:
        import urllib.parse

        h: dict = {}
        for name, value in headers.items():
            if any(fnmatch.fnmatch(name.lower(), p.lower())
                   for p in hdr_pats):
                h[name] = value
        q: dict = {}
        if qp_pats and query:
            for k, v in urllib.parse.parse_qsl(query):
                if any(fnmatch.fnmatch(k, p) for p in qp_pats):
                    q[k] = v
        if not h and not q:
            return "{}"
        # kept separate so merge_http_meta can honor the reference's
        # precedence: body beats headers, query beats body
        return json.dumps({"headers": h, "query": q})

    class Handler(http.server.BaseHTTPRequestHandler):
        def _reject(self, code: int) -> None:
            self.send_response(code)
            self.end_headers()

        def _json_reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _hec_channel(self, query: str) -> str | None:
            import urllib.parse

            ch = self.headers.get("X-Splunk-Request-Channel")
            if ch:
                return ch
            for k, v in urllib.parse.parse_qsl(query):
                if k == "channel":
                    return v
            return None

        def do_POST(self):  # noqa: N802 (stdlib naming)
            self._serve("POST")

        def do_PUT(self):  # noqa: N802
            self._serve("PUT")

        def do_GET(self):  # noqa: N802
            self._serve("GET")

        def _serve(self, got_method: str) -> None:
            if got_method != method:
                return self._reject(405)
            if want_auth is not None and (
                    self.headers.get("Authorization") != want_auth):
                return self._reject(401)
            url_path, _, query = self.path.partition("?")
            auth_enrich: dict = {}
            if custom_auth is not None:
                ok, auth_enrich = custom_auth(
                    dict(self.headers), self.client_address[0], url_path)
                if not ok:
                    return self._reject(401)
            if cfg_path is not None:
                hit = (url_path == cfg_path if strict
                       else url_path.startswith(cfg_path))
                if not hit:
                    return self._reject(404)
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            peer = f"{self.client_address[0]}:{self.client_address[1]}"
            meta = _capture(self.headers, query)
            if auth_enrich:
                # %field writes from the custom-auth program ride the
                # meta envelope (the engine's metadata channel for this
                # source) under "auth"
                mobj = json.loads(meta)
                mobj["auth"] = {k: v for k, v in auth_enrich.items()}
                meta = json.dumps(mobj)
            hec_channel = None
            if hec_ack and url_path.startswith("/services/collector"):
                hec_channel = self._hec_channel(query)
                if hec_channel is None:
                    # mod.rs: ack-enabled collector posts without a
                    # channel are rejected (Splunk's own error shape)
                    return self._json_reply(
                        400, {"text": "Data channel is missing",
                              "code": 10})
                if url_path == "/services/collector/ack":
                    ack_raw = raw
                    if self.headers.get(
                            "Content-Encoding", "").lower() == "gzip":
                        # ack query compression (the reference's HEC
                        # sink gzips its ack polls since the 0.51
                        # window) — accept transparently
                        import gzip as _gz

                        try:
                            ack_raw = _gz.decompress(ack_raw)
                        except OSError:
                            return self._reject(400)
                    try:
                        want = json.loads(
                            ack_raw.decode("utf-8", "replace"))["acks"]
                        want = [int(i) for i in want]
                    except (ValueError, KeyError, TypeError):
                        return self._reject(400)
                    with hec_lock:
                        acked = hec_channels.get(
                            hec_channel, {}).get("acked", set())
                        resp = {str(i): i in acked for i in want}
                    return self._json_reply(200, {"acks": resp})

            def hec_success() -> None:
                with hec_lock:
                    ch = hec_channels.setdefault(
                        hec_channel, {"next": 0, "acked": set()})
                    ack_id = ch["next"]
                    ch["next"] += 1
                    ch["acked"].add(ack_id)
                    # bound pending statuses: drop the oldest, the
                    # reference's max_pending_acks behavior
                    while len(ch["acked"]) > hec_max_pending:
                        ch["acked"].discard(min(ch["acked"]))
                self._json_reply(
                    ok_code,
                    {"text": "Success", "code": 0, "ackId": ack_id})

            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("application/x-protobuf"):
                # binary body (OTLP/HTTP protobuf, opentelemetry/http.rs):
                # one base64 message row carries the whole payload through
                # the text envelope; route_http_endpoints decodes it with
                # the pure-Python wire codec
                state.append(peer, url_path,
                             _b64.b64encode(raw).decode(), meta)
                if hec_channel is not None:
                    return hec_success()
                return self._reject(ok_code)
            body = raw.decode("utf-8", "replace")
            if ctype.startswith("application/json") and body.lstrip().startswith("["):
                try:
                    items = json.loads(body)
                    for item in items:
                        state.append(peer, url_path, json.dumps(item),
                                     meta)
                    if hec_channel is not None:
                        return hec_success()
                    return self._reject(ok_code)
                except json.JSONDecodeError:
                    return self._reject(400)
            for line in body.splitlines():
                if line.strip():
                    state.append(peer, url_path, line, meta)
            if hec_channel is not None:
                return hec_success()
            self._reject(ok_code)

        def log_message(self, *args):  # quiet
            pass

    if tls is None:
        srv = http.server.ThreadingHTTPServer((host, port), Handler)
    else:
        ctx = tls.server_context()

        class _TlsServer(http.server.ThreadingHTTPServer):
            """Wrap each ACCEPTED connection in its worker thread —
            wrapping the listening socket would run the handshake
            inside serve_forever's single accept loop, letting one
            stalled client block all ingest (the same reasoning as
            _accept_forever for the raw-TCP listeners)."""

            def process_request_thread(self, request, client_address):
                try:
                    request.settimeout(10)
                    request = ctx.wrap_socket(request, server_side=True)
                    request.settimeout(None)
                except (OSError, ValueError):
                    request.close()
                    return
                super().process_request_thread(request, client_address)

        srv = _TlsServer((host, port), Handler)
    ready.set()
    srv.serve_forever()



class HTTPServerDataSource(DataSource):
    """`http_server` source analog: POST bodies → events (newline lines
    or JSON-array elements); the request path rides along for routing."""

    @classmethod
    def name(cls) -> str:
        return "http_server"

    def schema(self) -> str:
        return HTTP_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SocketStreamReader:
        return _SocketStreamReader(self.options, "http")



def merge_http_meta(df, message_col: str = "message",
                    meta_col: str = "meta"):
    """Merge captured headers/query parameters (the http_server
    source's ``meta`` column) into JSON-object events with the
    reference's precedence (http_server.rs add_headers /
    add_query_parameters): a header is NOT included when the body has
    a conflicting field; a query parameter OVERRIDES the body value.
    Non-JSON-object messages pass through untouched. Arrow-batched
    (one pandas UDF, no per-row Python) — and only needed when
    captures are configured; without them ``meta`` is ``{}`` and this
    is the identity."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _merge(msg: pd.Series, meta: pd.Series) -> pd.Series:
        import json as _json

        def one(m, mt):
            if m is None:
                return None
            try:
                meta_o = _json.loads(mt) if mt else {}
            except ValueError:
                meta_o = {}
            h = meta_o.get("headers") or {}
            q = meta_o.get("query") or {}
            if not h and not q:
                return m
            try:
                body = _json.loads(m)
            except ValueError:
                return m
            if not isinstance(body, dict):
                return m
            out = {k: v for k, v in h.items() if k not in body}
            out.update(body)
            out.update(q)
            return _json.dumps(out)

        return pd.Series(
            [one(m, mt) for m, mt in zip(msg, meta)])

    return df.withColumn(
        message_col, _merge(F.col(message_col), F.col(meta_col)))



def _hec_second_stage(df, codec_cfg: dict, env: list):
    """splunk_hec `event: {framing, decoding}` — the second decoding
    pass (src/sources/splunk_hec/mod.rs:140-153): after the envelope
    parse, the envelope's event field feeds through framing + codec,
    one envelope fanning out to many events; decode failures are
    SWALLOWED (no event, no client error — the reference's contract).
    Output keeps the routed shape: `event` is the envelope JSON with
    its event field replaced by each decoded object's text; envelope
    metadata (host/source/sourcetype/index/ts) rides along."""
    import re as _re

    from pyspark.sql import functions as F

    dec = codec_cfg.get("decoding")
    codec = dec["codec"] if isinstance(dec, dict) else str(dec)
    framing = codec_cfg.get("framing")
    fmethod = (
        framing.get("method") if isinstance(framing, dict) else framing
    )
    inner = F.get_json_object(F.col("_hec"), "$.event")
    if fmethod is None:
        # per-codec default (mod.rs: "Defaults to a per-codec choice"):
        # whole-payload for json, newline framing for line codecs
        fmethod = "bytes" if codec == "json" else "newline_delimited"
    if fmethod == "bytes":
        frames = F.array(inner)
    elif fmethod == "newline_delimited":
        frames = F.filter(F.split(inner, "\r?\n"), lambda x: x != "")
    elif fmethod == "character_delimited":
        delim = (framing or {}).get("character_delimited", {}).get(
            "delimiter", ",")
        frames = F.filter(
            F.split(inner, _re.escape(str(delim))), lambda x: x != "")
    else:
        raise ValueError(f"splunk_hec: unknown framing {fmethod!r}")

    ex = df.select(*env, "_hec", F.explode(frames).alias("_frame"))
    if codec == "json":
        decoded = F.when(
            F.try_parse_json(F.col("_frame")).isNotNull(), F.col("_frame"))
    else:
        from vector_spark.config.loader import _DECODE_CODECS

        if codec not in _DECODE_CODECS or _DECODE_CODECS[codec] is None:
            raise ValueError(
                f"splunk_hec second-stage: unknown codec {codec!r}")
        mod, fn, _is_struct = _DECODE_CODECS[codec]
        decode = getattr(__import__(mod, fromlist=[fn]), fn)
        # struct AND map codecs both render as their JSON text
        decoded = F.to_json(decode(F.col("_frame")))
    rebuilt = F.to_json(F.struct(
        decoded.alias("event"),
        F.get_json_object(F.col("_hec"), "$.ts").alias("ts"),
        F.get_json_object(F.col("_hec"), "$.host").alias("host"),
        F.get_json_object(F.col("_hec"), "$.source").alias("source"),
        F.get_json_object(F.col("_hec"), "$.sourcetype").alias("sourcetype"),
        F.get_json_object(F.col("_hec"), "$.index").alias("index"),
    ))
    return (
        ex.withColumn("_dec", decoded)
        .where(F.col("_dec").isNotNull())  # failures swallowed
        .select(*env, F.lit("splunk_hec").alias("codec"),
                rebuilt.alias("event"))
    )


def route_http_endpoints(df, endpoints: dict[str, str]):
    """Path-route an http_server stream to per-endpoint decoders — the
    modern push-ingest shapes the reference serves from dedicated
    sources: Splunk HEC (`src/sources/splunk_hec/mod.rs`, the
    /services/collector/event contract) and OTLP/HTTP JSON
    (`src/sources/opentelemetry/http.rs`, /v1/logs).

    endpoints: {path: codec} with codec ∈ {"splunk_hec", "otlp_logs",
    "json"}. Output unified as (seq, ts, peer, path, codec, event) where
    `event` is the decoded event's JSON text (one row per event — an
    OTLP request batching many logRecords explodes into that many rows).
    Unmatched paths pass through as codec='raw'."""
    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import decode_splunk_hec

    env = ["seq", "ts", "peer", "path"]
    outs = []
    matched = None
    for path, codec in endpoints.items():
        # endpoint value may be a config OBJECT: {codec: splunk_hec,
        # event: {framing, decoding}} — the HEC second-stage decoding
        # surface (splunk_hec/mod.rs:140-153)
        spec = codec if isinstance(codec, dict) else {}
        if isinstance(codec, dict):
            codec = codec.get("codec", "raw")
        if codec == "prometheus_pushgateway":
            # grouping labels ride in the path, so the match is a
            # PREFIX (`/metrics/job/...`), not an exact path
            cond = F.col("path").startswith(path)
        else:
            cond = F.col("path") == path
        part = df.where(cond)
        matched = cond if matched is None else (matched | cond)
        if codec == "splunk_hec":
            envelope = F.to_json(decode_splunk_hec(F.col("message")))
            second = spec.get("event") or {}
            if second.get("decoding"):
                outs.append(
                    _hec_second_stage(
                        part.select(*env, envelope.alias("_hec")),
                        second, env,
                    )
                )
            else:
                outs.append(
                    part.select(
                        *env,
                        F.lit("splunk_hec").alias("codec"),
                        envelope.alias("event"),
                    )
                )
        elif codec == "otlp_logs":
            v = part.select(*env, F.parse_json("message").alias("v"))
            rl = v.select(
                *env,
                F.explode(
                    F.try_variant_get("v", "$.resourceLogs", "array<variant>")
                ).alias("rl"),
            )
            sl = rl.select(
                *env,
                F.explode(
                    F.try_variant_get("rl", "$.scopeLogs", "array<variant>")
                ).alias("sl"),
            )
            lr = sl.select(
                *env,
                F.explode(
                    F.try_variant_get("sl", "$.logRecords", "array<variant>")
                ).alias("r"),
            )
            outs.append(
                lr.select(
                    *env,
                    F.lit("otlp_logs").alias("codec"),
                    F.to_json(F.col("r")).alias("event"),
                )
            )
        elif codec == "otlp_logs_protobuf":
            # OTLP/HTTP protobuf (opentelemetry/http.rs with
            # content-type application/x-protobuf): the listener stored
            # the raw body base64'd in one message row; decode with the
            # pure-Python wire codec, one output row per logRecord.
            # Arrow-batched pandas UDF returns a JSON-ARRAY string →
            # from_json → explode keeps the fan-out in the plan.
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def dec_otlp(s: pd.Series) -> pd.Series:
                import base64
                import json as _json

                from vector_spark.functions.protowire import (
                    decode_otlp_logs,
                )

                def one(b64):
                    try:
                        return _json.dumps(
                            [
                                _json.dumps(r)
                                for r in decode_otlp_logs(
                                    base64.b64decode(b64)
                                )
                            ]
                        )
                    except Exception:
                        return "[]"

                return s.map(one)

            recs = part.select(
                *env,
                F.explode(
                    F.from_json(
                        dec_otlp(F.col("message")), "array<string>"
                    )
                ).alias("event"),
            )
            outs.append(
                recs.select(
                    *env,
                    F.lit("otlp_logs_protobuf").alias("codec"),
                    "event",
                )
            )
        elif codec in ("datadog_sketches", "datadog_series_v2"):
            # datadog-agent protobuf intake (src/sources/datadog_agent/
            # metrics.rs decode_ddsketch / the v2 MetricPayload;
            # proto/vector/dd_metric.proto): binary body base64'd by the
            # listener, decoded with the pure-Python wire codec — one
            # row per dogsketch / per series point.
            from pyspark.sql.functions import pandas_udf

            fn_name = (
                "decode_datadog_sketches"
                if codec == "datadog_sketches"
                else "decode_datadog_metric_payload"
            )

            @pandas_udf("string")
            def dec_dd(s: pd.Series) -> pd.Series:
                import base64
                import json as _json

                from vector_spark.functions import protowire

                decode = getattr(protowire, fn_name)

                def one(b64):
                    try:
                        return _json.dumps(
                            [_json.dumps(r)
                             for r in decode(base64.b64decode(b64))]
                        )
                    except Exception:
                        return "[]"

                return s.map(one)

            recs = part.select(
                *env,
                F.explode(
                    F.from_json(dec_dd(F.col("message")),
                                "array<string>")
                ).alias("event"),
            )
            outs.append(
                recs.select(
                    *env, F.lit(codec).alias("codec"), "event",
                )
            )
        elif codec == "heroku_logs":
            # Heroku Logplex drain (src/sources/heroku_logs.rs
            # line_to_events): body lines are octet-prefixed syslog-ish
            # frames `<len> <pri>ver ts host app proc msgid message`;
            # pure-Column split + regexp, one event per line.
            lines = part.select(
                *env,
                F.explode(
                    F.filter(
                        F.split(F.col("message"), r"\n"),
                        lambda x: x != "",
                    )
                ).alias("line"),
            )
            pat = r"^\d+ <\d+>\d* (\S+) (\S+) (\S+) (\S+) \S+ (.*)$"
            outs.append(
                lines.select(
                    *env,
                    F.lit("heroku_logs").alias("codec"),
                    F.to_json(
                        F.struct(
                            F.regexp_extract("line", pat, 1).alias("timestamp"),
                            F.regexp_extract("line", pat, 2).alias("host"),
                            F.regexp_extract("line", pat, 3).alias("app_name"),
                            F.regexp_extract("line", pat, 4).alias("proc_id"),
                            F.regexp_extract("line", pat, 5).alias("message"),
                        )
                    ).alias("event"),
                )
            )
        elif codec == "datadog_logs":
            # datadog-agent log intake (src/sources/datadog_agent/
            # logs.rs decode_log_body): the body is a JSON ARRAY of log
            # objects {message, status, timestamp, hostname, service,
            # ddsource, ddtags} — one event per object, fields passed
            # through (the reference copies them onto the event log).
            v = part.select(*env, F.parse_json("message").alias("v"))
            items = v.select(
                *env,
                F.explode(
                    F.try_variant_get("v", "$", "array<variant>")
                ).alias("r"),
            )
            outs.append(
                items.select(
                    *env,
                    F.lit("datadog_logs").alias("codec"),
                    F.to_json(F.col("r")).alias("event"),
                )
            )
        elif codec == "datadog_series":
            # datadog-agent v1 metrics intake (src/sources/
            # datadog_agent/metrics.rs decode_datadog_series_v1):
            # {"series": [{metric, type, interval?, host?, points:
            # [[ts, value], ...], tags?}]} — one metric event per POINT,
            # the series fields repeated (exactly the reference's
            # into_vector_metric fan-out).
            v = part.select(*env, F.parse_json("message").alias("v"))
            series = v.select(
                *env,
                F.explode(
                    F.try_variant_get("v", "$.series", "array<variant>")
                ).alias("s"),
            )
            points = series.select(
                *env,
                "s",
                F.explode(
                    F.try_variant_get(
                        "s", "$.points", "array<array<double>>"
                    )
                ).alias("p"),
            )
            outs.append(
                points.select(
                    *env,
                    F.lit("datadog_series").alias("codec"),
                    F.to_json(
                        F.struct(
                            F.try_variant_get(
                                "s", "$.metric", "string"
                            ).alias("metric"),
                            F.try_variant_get(
                                "s", "$.type", "string"
                            ).alias("type"),
                            F.try_variant_get(
                                "s", "$.host", "string"
                            ).alias("host"),
                            F.try_variant_get(
                                "s", "$.interval", "long"
                            ).alias("interval"),
                            F.try_variant_get(
                                "s", "$.tags", "array<string>"
                            ).alias("tags"),
                            F.col("p")[0].cast("long").alias("timestamp"),
                            F.col("p")[1].alias("value"),
                        )
                    ).alias("event"),
                )
            )
        elif codec == "aws_kinesis_firehose":
            # Kinesis Firehose HTTP destination (src/sources/
            # aws_kinesis_firehose/): JSON body {requestId, timestamp,
            # records: [{data: base64(, gzip'd) bytes}]}; each record's
            # decoded bytes split on newlines, one event per line (the
            # CloudWatch Logs subscription shape gunzips transparently).
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def dec_fh(s: pd.Series) -> pd.Series:
                import base64
                import gzip
                import json as _json

                def one(body):
                    try:
                        req = _json.loads(body)
                        events = []
                        for rec in req.get("records", []):
                            raw = base64.b64decode(rec.get("data", ""))
                            if raw[:2] == b"\x1f\x8b":
                                raw = gzip.decompress(raw)
                            for line in raw.decode("utf-8", "replace").splitlines():
                                if line.strip():
                                    events.append(
                                        _json.dumps(
                                            {
                                                "message": line,
                                                "request_id": req.get("requestId"),
                                            }
                                        )
                                    )
                        return _json.dumps(events)
                    except Exception:
                        return "[]"

                return s.map(one)

            outs.append(
                part.select(
                    *env,
                    F.explode(
                        F.from_json(dec_fh(F.col("message")), "array<string>")
                    ).alias("event"),
                ).select(
                    *env,
                    F.lit("aws_kinesis_firehose").alias("codec"),
                    "event",
                )
            )
        elif codec == "prometheus_pushgateway":
            # pushgateway intake (src/sources/prometheus/pushgateway.rs):
            # text-exposition lines POSTed under /metrics/job/...; the
            # path's grouping labels override same-named body labels.
            # POST-only and text-only like the reference; comment lines
            # and invalid grouping paths drop. aggregate_metrics stays
            # out of scope (needs per-family TYPE state the line codec
            # deliberately doesn't track); the reference defaults it
            # off, so default behavior matches.
            from vector_spark.functions.codecs import (
                decode_pushgateway_event,
            )

            ev = decode_pushgateway_event(F.col("path"),
                                          F.col("message"))
            outs.append(
                part.where(~F.col("message").startswith("#"))
                .select(*env, ev.alias("m"))
                .where(
                    F.col("m.name").isNotNull()
                    & (F.col("m.name") != "")
                    & F.col("m.labels").isNotNull()
                )
                .select(
                    *env,
                    F.lit("prometheus_pushgateway").alias("codec"),
                    F.to_json(F.col("m")).alias("event"),
                )
            )
        elif codec == "prometheus_remote_write":
            # prometheus remote_write (src/sources/prometheus/
            # remote_write.rs): snappy-compressed WriteRequest protobuf,
            # decoded with the pure-Python snappy + wire codecs — one
            # output row per sample, labels flattened into the event.
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def dec_rw(s: pd.Series) -> pd.Series:
                import base64
                import json as _json

                from vector_spark.functions.protowire import (
                    decode_prometheus_write_request,
                )
                from vector_spark.functions.snappy import decompress

                def one(b64):
                    try:
                        rows = decode_prometheus_write_request(
                            decompress(base64.b64decode(b64))
                        )
                        return _json.dumps(
                            [_json.dumps(r) for r in rows]
                        )
                    except Exception:
                        return "[]"

                return s.map(one)

            outs.append(
                part.select(
                    *env,
                    F.explode(
                        F.from_json(dec_rw(F.col("message")), "array<string>")
                    ).alias("event"),
                ).select(
                    *env,
                    F.lit("prometheus_remote_write").alias("codec"),
                    "event",
                )
            )
        elif codec == "json":
            outs.append(
                part.select(
                    *env, F.lit("json").alias("codec"),
                    F.col("message").alias("event"),
                )
            )
        else:
            raise ValueError(f"http_server endpoint codec {codec!r}")
    rest = df.where(~matched if matched is not None else F.lit(True)).select(
        *env, F.lit("raw").alias("codec"), F.col("message").alias("event")
    )
    out = rest
    for o in outs:
        out = out.unionByName(o)
    return out


