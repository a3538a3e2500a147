"""Service-shaped HTTP sinks: Elasticsearch bulk, Loki push, ClickHouse
HTTP insert, Datadog logs v2, Splunk HEC collector.

Reference wire shapes (re-expressed, not translated):
- elasticsearch: `src/sinks/elasticsearch/encoder.rs:145` — per event an
  action line `{"<bulk_action>": {"_index": ..., "_id": ...?}}` followed by
  the document JSON, newline-delimited, POSTed to `<endpoint>/_bulk`.
- loki: `src/sinks/loki/event.rs:36,:126` — body
  `{"streams": [{"stream": {label: value}, "values": [["<ts_ns>", line],
  ...]}]}` with values sorted by timestamp within each stream.
- clickhouse: `src/sinks/clickhouse/service.rs:134` — POST ndjson to
  `<endpoint>/?query=INSERT INTO {db}.{table} FORMAT JSONEachRow` (the
  Identifier-parameter form) with `input_format_import_nested_json=1`.
- datadog logs: `src/sinks/datadog/logs/config.rs:311` — JSON array POST
  to `<endpoint>/api/v2/logs`, `DD-API-KEY` header, reserved attributes
  ddsource/ddtags/hostname/service/message at the event root
  (`src/sinks/datadog/logs/sink.rs:116`), ≤1000 events / ≤5 MB a batch.
- splunk_hec: `src/sinks/splunk_hec/logs/config.rs` — HEC envelopes to
  `/services/collector/event`, `Authorization: Splunk <token>`.

Spark-first execution: every byte of every request body is rendered
JVM-side (to_json / template columns / concat) so the executor Python only
concatenates pre-encoded lines and POSTs per partition — no per-row Python
encoding, no driver funnel. Batch limits mirror
`src/sinks/util/batch.rs:13` (max_events + max_bytes).
"""

from __future__ import annotations

import json
import urllib.parse
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.functions.codecs import encode_splunk_hec
from vector_spark.functions.template import template_column


#: Transient statuses per the reference's default HTTP retry policy
#: (src/sinks/util/http.rs RetryStrategy::Default — 5xx except 501,
#: plus 408 Request Timeout and 429 Too Many Requests).
_RETRIABLE_STATUSES = frozenset(
    {408, 429} | set(range(500, 600)) - {501}
)


# ---------------------------------------------------------------------------
# proxy support (lib/vector-core/src/config/proxy.rs): the effective
# proxy for a sink's endpoint is decided DRIVER-side (env + global +
# per-component merge, no_proxy matching) and the resolved URL string is
# captured into the partition closure — executors never consult config
# state. run_sinks scopes _PROXY_CFG around each sink's execution.

_PROXY_CFG = None  # driver-side ProxyConfig for the sink being built


@contextmanager
def proxy_scope(cfg):
    """Scope the effective ProxyConfig over one sink's (driver-side)
    build + dispatch. ``cfg`` is already env+global+component merged."""
    global _PROXY_CFG
    prev = _PROXY_CFG
    _PROXY_CFG = cfg
    try:
        yield
    finally:
        _PROXY_CFG = prev


def _proxy_for(url: str) -> str | None:
    """The proxy endpoint this sink's requests should traverse, or None.
    Called driver-side only (the result is closure-captured)."""
    if _PROXY_CFG is None:
        return None
    return _PROXY_CFG.proxy_url_for(url)


def _http_send_with_retry(url: str, body: bytes, headers: dict,
                          timeout_secs: float, retries: int,
                          backoff_secs: float,
                          proxy_url: str | None = None) -> None:
    """One request with the reference's retry policy: transient
    statuses and connection errors back off exponentially for up to
    ``retries`` re-attempts; permanent 4xx/501 raise immediately."""
    import time
    import urllib.error
    import urllib.request

    from vector_spark.config.globals import urlopen_via

    for attempt in range(retries + 1):
        req = urllib.request.Request(url, data=body, headers=headers)
        try:
            urlopen_via(req, timeout_secs, proxy_url).read()
            return
        except urllib.error.HTTPError as err:
            if (err.code not in _RETRIABLE_STATUSES
                    or attempt == retries):
                raise
        except (urllib.error.URLError, ConnectionError, TimeoutError):
            if attempt == retries:
                raise
        time.sleep(backoff_secs * (2 ** attempt))


def _http_send_once(url: str, body: bytes, headers: dict,
                    timeout_secs: float,
                    proxy_url: str | None = None) -> None:
    """One attempt, no internal retry — the ARC path owns pacing."""
    import urllib.request

    from vector_spark.config.globals import urlopen_via

    req = urllib.request.Request(url, data=body, headers=headers)
    urlopen_via(req, timeout_secs, proxy_url).read()


def _is_backpressure_error(err: BaseException) -> bool:
    """The reference's backpressure classification (adaptive_concurrency/
    controller.rs adjust_to_response): retryable statuses, timeouts and
    connection errors are back pressure; HTTP protocol-level errors
    (permanent 4xx/501) are not."""
    import urllib.error

    if isinstance(err, urllib.error.HTTPError):
        return err.code in _RETRIABLE_STATUSES
    return isinstance(
        err, (urllib.error.URLError, ConnectionError, TimeoutError))


def _post_lines_per_partition(
    lines: DataFrame,
    url: str,
    headers: dict[str, str],
    batch_max_events: int,
    batch_max_bytes: int,
    timeout_secs: float,
    prefix: bytes = b"",
    suffix: bytes = b"",
    joiner: bytes = b"\n",
    retries: int = 3,
    retry_backoff_secs: float = 0.2,
    concurrency: int | str | None = None,
) -> int:
    """POST the single string column of ``lines`` in per-partition batches
    bounded by events AND bytes (src/sinks/util/batch.rs defaults), with
    the reference's default retry policy per request (transient statuses
    retried with exponential backoff, permanent ones raised). Returns
    the number of events sent (accumulator, counted executor-side).

    ``concurrency`` mirrors the reference's `request.concurrency`:
    None = serial per partition (this repo's historical default),
    ``"adaptive"`` = the ARC AIMD controller probes the service and
    pipelines batches concurrently (vector_spark.arc — the reference's
    own default mode), an int = fixed in-flight limit. Concurrent
    requests may land out of order, exactly as in the reference."""
    sent = lines.sparkSession.sparkContext.accumulator(0)
    proxy_url = _proxy_for(url)  # driver-side decision, closure-captured

    def send_partition(rows) -> None:
        def bodies():
            buf: list[bytes] = []
            buf_bytes = 0
            for row in rows:
                b = row[0].encode()
                if buf and (
                    len(buf) >= batch_max_events
                    or buf_bytes + len(b) > batch_max_bytes
                ):
                    yield (prefix + joiner.join(buf) + suffix, len(buf))
                    buf = []
                    buf_bytes = 0
                buf.append(b)
                buf_bytes += len(b)
            if buf:
                yield (prefix + joiner.join(buf) + suffix, len(buf))

        _dispatch_bodies(bodies(), url, headers, timeout_secs,
                         retries, retry_backoff_secs, concurrency, sent,
                         proxy_url)

    lines.foreachPartition(send_partition)
    return sent.value


def _dispatch_bodies(bodies, url, headers, timeout_secs, retries,
                     retry_backoff_secs, concurrency, sent,
                     proxy_url: str | None = None) -> None:
    """Send (body, n_events) pairs: serial with the default retry
    policy, or ARC-gated concurrent when ``concurrency`` is set."""
    if concurrency is None:
        for body, n in bodies:
            _http_send_with_retry(url, body, headers, timeout_secs,
                                  retries, retry_backoff_secs, proxy_url)
            sent.add(n)
        return

    import threading

    from vector_spark.arc import AdaptiveController, send_all_adaptive

    ctrl = AdaptiveController(
        concurrency=None if concurrency == "adaptive"
        else int(concurrency))
    # Accumulator.add is a non-atomic read-modify-write — tally under
    # a local lock across the worker threads, ONE add at the end
    lock = threading.Lock()
    total = [0]

    def send_one(item) -> None:
        body, n = item
        _http_send_once(url, body, headers, timeout_secs, proxy_url)
        with lock:
            total[0] += n

    send_all_adaptive(bodies, send_one, ctrl, _is_backpressure_error)
    sent.add(total[0])


def elasticsearch_sink(
    df: DataFrame,
    endpoint: str,
    index: str,
    bulk_action: str = "index",
    id_col: str | None = None,
    ts_col: str = "ts",
    batch_max_events: int = 1000,
    batch_max_bytes: int = 10_000_000,
    timeout_secs: float = 10.0,
    concurrency: int | str | None = None,
) -> int:
    """Bulk-index ``df`` rows as documents. ``index`` is a template
    (``{{ field }}`` / strftime, e.g. ``logs-{{ app }}-%Y.%m.%d`` — the
    reference's index template + data_stream naming), rendered JVM-side.

    The per-row request fragment is `action\\ndocument` built with
    ``to_json`` — two JSON lines per event exactly as
    `encoder.rs:write_bulk_action` emits them."""
    if bulk_action not in ("index", "create"):
        raise ValueError("bulk_action must be 'index' or 'create'")
    doc_cols = [c for c in df.columns if c != id_col]
    action_fields = [template_column(index, ts_col=ts_col).alias("_index")]
    if id_col is not None:
        action_fields.append(F.col(id_col).cast("string").alias("_id"))
    action = F.to_json(
        F.struct(F.struct(*action_fields).alias(bulk_action))
    )
    doc = F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
    pair = F.concat(action, F.lit("\n"), doc)
    lines = df.select(pair.alias("pair"))
    url = endpoint.rstrip("/") + "/_bulk"
    return _post_lines_per_partition(
        lines, url,
        {"Content-Type": "application/x-ndjson"},
        batch_max_events, batch_max_bytes, timeout_secs,
        suffix=b"\n",
        concurrency=concurrency,
    )


def loki_sink(
    df: DataFrame,
    endpoint: str,
    labels: dict[str, str],
    line_col: str = "message",
    ts_col: str = "ts",
    encoding: str = "text",
    batch_max_events: int = 1000,
    batch_max_bytes: int = 1_000_000,
    timeout_secs: float = 10.0,
    concurrency: int | str | None = None,
) -> int:
    """Push rows to Loki grouped into streams by rendered label set.

    ``labels`` values are templates (``{"app": "{{ service }}",
    "env": "prod"}``). The plan: render labels + the [ts_ns, line] value
    pair JVM-side, ``repartition`` by the label set so each stream's rows
    land in one partition, ``sortWithinPartitions`` by label set + ts so
    (a) each partition walks streams contiguously and (b) values are
    time-ordered within a stream, exactly the `event.rs:126` sort — then
    each partition emits `{"streams":[...]}` bodies with NO Python-side
    sorting or buffering beyond the open stream."""
    if encoding == "json":
        line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    elif encoding == "text":
        line = F.col(line_col).cast("string")
    else:
        raise ValueError(f"unknown encoding {encoding!r}")

    label_entries = {
        name: template_column(tmpl, ts_col=ts_col)
        for name, tmpl in sorted(labels.items())
    }
    # the stream key: the label MAP rendered to its JSON object form —
    # equality of this string IS equality of the label set
    stream_json = F.to_json(F.struct(*[
        c.alias(n) for n, c in label_entries.items()
    ]))
    ts_ns = (F.unix_micros(F.col(ts_col)) * 1000).cast("string")
    value_json = F.to_json(F.array(ts_ns, line))
    shaped = df.select(
        stream_json.alias("stream"), value_json.alias("value"),
        F.col(ts_col).alias("_ts"),
    ).repartition(F.col("stream")).sortWithinPartitions("stream", "_ts")

    url = endpoint.rstrip("/") + "/loki/api/v1/push"
    sent = df.sparkSession.sparkContext.accumulator(0)

    def send_partition(rows) -> None:
        def bodies():
            streams: list[str] = []  # {"stream":..,"values":[..]} frags
            cur_label: str | None = None
            cur_values: list[str] = []
            n_events = 0
            total_bytes = 0

            def close_stream() -> None:
                nonlocal cur_values
                if cur_label is not None and cur_values:
                    streams.append(
                        '{"stream":%s,"values":[%s]}'
                        % (cur_label, ",".join(cur_values))
                    )
                cur_values = []

            for row in rows:
                if (n_events >= batch_max_events
                        or total_bytes >= batch_max_bytes):
                    close_stream()  # same stream continues as a fresh frag
                    if streams:
                        yield (('{"streams":[%s]}'
                                % ",".join(streams)).encode(), n_events)
                        streams = []
                    n_events = 0
                    total_bytes = 0
                if row["stream"] != cur_label:
                    close_stream()
                    cur_label = row["stream"]
                cur_values.append(row["value"])
                n_events += 1
                total_bytes += len(row["value"])
            close_stream()
            if streams:
                yield (('{"streams":[%s]}'
                        % ",".join(streams)).encode(), n_events)

        _dispatch_bodies(bodies(), url,
                         {"Content-Type": "application/json"},
                         timeout_secs, 3, 0.2, concurrency, sent)

    shaped.foreachPartition(send_partition)
    return sent.value


def clickhouse_sink(
    df: DataFrame,
    endpoint: str,
    table: str,
    database: str = "default",
    skip_unknown_fields: bool = True,
    batch_max_events: int = 10_000,
    batch_max_bytes: int = 10_000_000,
    timeout_secs: float = 10.0,
    concurrency: int | str | None = None,
    user_agent: str | None = None,
    query_settings: dict | None = None,
) -> int:
    """INSERT rows over the ClickHouse HTTP interface as JSONEachRow.
    URL uses the Identifier query-parameter form (server-side quoting,
    `service.rs:144`) so table/database names never need client
    escaping; ``user_agent`` sets the request User-Agent (the
    0.57-window clickhouse option); ``query_settings`` appends
    arbitrary ClickHouse settings as query parameters (the 0.49
    `query_settings` option, e.g. async_insert=1)."""
    params = {
        "query": "INSERT INTO {database:Identifier}.{table:Identifier}"
                 " FORMAT JSONEachRow",
        "param_database": database,
        "param_table": table,
    }
    for k, v in (query_settings or {}).items():
        params[str(k)] = str(v)
    q = urllib.parse.urlencode(params)
    url = (
        endpoint.rstrip("/") + "/?input_format_import_nested_json=1&"
        + ("input_format_skip_unknown_fields=1&" if skip_unknown_fields else "")
        + q
    )
    lines = df.select(F.to_json(F.struct(*df.columns)).alias("line"))
    hdrs = {"Content-Type": "application/x-ndjson"}
    if user_agent:
        hdrs["User-Agent"] = str(user_agent)
    return _post_lines_per_partition(
        lines, url, hdrs,
        batch_max_events, batch_max_bytes, timeout_secs,
        suffix=b"\n",
        concurrency=concurrency,
    )


def datadog_logs_sink(
    df: DataFrame,
    endpoint: str,
    api_key: str,
    message_col: str = "message",
    ddsource: str | None = None,
    ddtags: str | None = None,
    hostname_col: str | None = None,
    service_col: str | None = None,
    batch_max_events: int = 1000,
    batch_max_bytes: int = 4_250_000,
    timeout_secs: float = 10.0,
    concurrency: int | str | None = None,
) -> int:
    """POST a JSON array of log events to /api/v2/logs with the reserved
    attributes at the event root. Batch caps are the reference's
    MAX_PAYLOAD_BYTES (serialized, uncompressed) and 1000-event limits."""
    fields = [F.col(message_col).cast("string").alias("message")]
    if ddsource is not None:
        fields.append(template_column(ddsource).alias("ddsource"))
    if ddtags is not None:
        fields.append(template_column(ddtags).alias("ddtags"))
    if hostname_col is not None:
        fields.append(F.col(hostname_col).cast("string").alias("hostname"))
    if service_col is not None:
        fields.append(F.col(service_col).cast("string").alias("service"))
    reserved = {message_col, hostname_col, service_col}
    extras = [c for c in df.columns if c not in reserved]
    fields += [F.col(c) for c in extras]
    lines = df.select(F.to_json(F.struct(*fields)).alias("line"))
    url = endpoint.rstrip("/") + "/api/v2/logs"
    return _post_lines_per_partition(
        lines, url,
        {"Content-Type": "application/json", "DD-API-KEY": api_key},
        batch_max_events, batch_max_bytes, timeout_secs,
        prefix=b"[", suffix=b"]", joiner=b",",
        concurrency=concurrency,
    )


def splunk_hec_sink(
    df: DataFrame,
    endpoint: str,
    token: str,
    event_col: str = "message",
    ts_col: str = "ts",
    host_col: str | None = None,
    sourcetype: str | None = None,
    index: str | None = None,
    batch_max_events: int = 1000,
    batch_max_bytes: int = 1_000_000,
    timeout_secs: float = 10.0,
    concurrency: int | str | None = None,
    indexer_acknowledgements: bool = False,
    ack_poll_interval_secs: float = 0.25,
    ack_timeout_secs: float = 30.0,
) -> int:
    """HEC envelopes (the existing codec) POSTed newline-concatenated to
    /services/collector/event with Splunk token auth — the HEC endpoint
    accepts back-to-back JSON objects, no framing array.

    ``indexer_acknowledgements`` mirrors the reference sink's
    acknowledgements mode (src/sinks/splunk_hec/common/acknowledgements
    .rs): each partition mints one channel id, every request carries
    X-Splunk-Request-Channel, the ackId from the response is polled at
    /services/collector/ack until the server reports True (bounded by
    ``ack_timeout_secs``) — only then do the batch's events count as
    sent. Serial per partition by design (the ack handshake IS the
    pacing)."""
    env = encode_splunk_hec(
        F.col(event_col),
        F.col(ts_col),
        host=F.col(host_col) if host_col else None,
        sourcetype=template_column(sourcetype, ts_col=ts_col)
        if sourcetype else None,
        index=template_column(index, ts_col=ts_col) if index else None,
    )
    lines = df.select(env.alias("line"))
    url = endpoint.rstrip("/") + "/services/collector/event"
    headers = {
        "Content-Type": "application/json",
        "Authorization": f"Splunk {token}",
    }
    if not indexer_acknowledgements:
        return _post_lines_per_partition(
            lines, url, headers,
            batch_max_events, batch_max_bytes, timeout_secs,
            concurrency=concurrency,
        )

    ack_url = endpoint.rstrip("/") + "/services/collector/ack"
    sent = df.sparkSession.sparkContext.accumulator(0)

    def send_partition(rows) -> None:
        import time as _time
        import urllib.request
        import uuid as _uuid

        channel = str(_uuid.uuid4())
        hdrs = dict(headers)
        hdrs["X-Splunk-Request-Channel"] = channel

        def post(u: str, body: bytes) -> dict:
            req = urllib.request.Request(u, data=body, headers=hdrs)
            text = urllib.request.urlopen(
                req, timeout=timeout_secs).read()
            return json.loads(text) if text else {}

        def flush(buf: list[bytes]) -> None:
            resp = post(url, b"\n".join(buf))
            ack_id = resp.get("ackId")
            if ack_id is None:
                raise ConnectionError(
                    "HEC response carried no ackId with "
                    "indexer_acknowledgements enabled")
            deadline = _time.monotonic() + ack_timeout_secs
            while True:
                # ack queries go up gzip-compressed (the reference's
                # 0.51-window "HEC indexer ack query compression")
                import gzip as _gz

                ack_body = _gz.compress(
                    json.dumps({"acks": [ack_id]}).encode(), mtime=0)
                ack_hdrs = dict(hdrs)
                ack_hdrs["Content-Encoding"] = "gzip"
                req = urllib.request.Request(
                    ack_url, data=ack_body, headers=ack_hdrs)
                text = urllib.request.urlopen(
                    req, timeout=timeout_secs).read()
                status = json.loads(text) if text else {}
                if status.get("acks", {}).get(str(ack_id)):
                    break
                if _time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"HEC ackId {ack_id} unacknowledged after "
                        f"{ack_timeout_secs}s")
                _time.sleep(ack_poll_interval_secs)
            sent.add(len(buf))

        buf: list[bytes] = []
        buf_bytes = 0
        for row in rows:
            b = row[0].encode()
            if buf and (len(buf) >= batch_max_events
                        or buf_bytes + len(b) > batch_max_bytes):
                flush(buf)
                buf = []
                buf_bytes = 0
            buf.append(b)
            buf_bytes += len(b)
        if buf:
            flush(buf)

    lines.foreachPartition(send_partition)
    return sent.value


def honeycomb_sink(
    df: DataFrame,
    endpoint: str,
    dataset: str,
    api_key: str,
    ts_col: str = "ts",
    batch_max_events: int = 1000,
    batch_max_bytes: int = 4_000_000,
    timeout_secs: float = 10.0,
) -> int:
    """POST a JSON array of ``{"time": rfc3339, "data": {event}}``
    envelopes to ``/1/batch/{dataset}`` with the ``X-Honeycomb-Team``
    key header (reference src/sinks/honeycomb/: config.rs:158 batch
    URL, encoder.rs:41 time envelope). The event's remaining fields
    travel inside ``data``, timestamp lifted out — the reference's
    remove_timestamp behavior."""
    data_cols = [c for c in df.columns if c != ts_col]
    env = F.to_json(
        F.struct(
            F.date_format(
                F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX"
            ).alias("time") if ts_col in df.columns else
            F.lit(None).cast("string").alias("time"),
            F.struct(*[F.col(c) for c in data_cols]).alias("data"),
        )
    )
    lines = df.select(env.alias("line"))
    url = f"{endpoint.rstrip('/')}/1/batch/{dataset}"
    return _post_lines_per_partition(
        lines, url,
        {"Content-Type": "application/json",
         "X-Honeycomb-Team": api_key},
        batch_max_events, batch_max_bytes, timeout_secs,
        prefix=b"[", suffix=b"]", joiner=b",",
    )


def new_relic_logs_sink(
    df: DataFrame,
    license_key: str,
    endpoint: str = "https://log-api.newrelic.com/log/v1",
    message_col: str = "message",
    batch_max_events: int = 1000,
    batch_max_bytes: int = 1_000_000,
    timeout_secs: float = 10.0,
) -> int:
    """POST a JSON array of log objects to the Log API with the
    ``Api-Key`` license header (reference src/sinks/new_relic/:
    config.rs:210 endpoints, service.rs:87 header; the JSON-array body
    is the documented logs shape, model.rs:344)."""
    lines = df.select(F.to_json(F.struct(*df.columns)).alias("line"))
    return _post_lines_per_partition(
        lines, endpoint,
        {"Content-Type": "application/json", "Api-Key": license_key},
        batch_max_events, batch_max_bytes, timeout_secs,
        prefix=b"[", suffix=b"]", joiner=b",",
    )


def new_relic_events_sink(
    df: DataFrame,
    license_key: str,
    account_id: str,
    endpoint: str | None = None,
    message_col: str = "message",
    batch_max_events: int = 1000,
    batch_max_bytes: int = 1_000_000,
    timeout_secs: float = 10.0,
) -> int:
    """The Event API half of the reference's `new_relic` sink
    (config.rs:189-196 endpoint, model.rs:151-240 shaping): a JSON
    array of flat event objects POSTed to
    `/v1/accounts/{account_id}/events` with the Api-Key header.

    Reference semantics re-expressed JVM-side:
    - every event carries an `eventType` (defaulted to "VectorSink"
      when the column is absent, model.rs:216-218);
    - when ``message_col`` holds a JSON *object* string, its fields are
      merged into the event and the message key dropped
      (model.rs:179-213). The merge is pure string surgery on the two
      rendered JSON bodies (message fields rendered last, so on key
      collision they win — the reference's insert-over behavior).
      Divergence, documented: the reference silently drops
      array/nested-object values inside the message; this merge keeps
      them (they are valid JSON and NRQL flattens them server-side).
    """
    if endpoint is None:
        endpoint = ("https://insights-collector.newrelic.com"
                    f"/v1/accounts/{account_id}/events")
    cols = [c for c in df.columns if c != message_col]
    if "eventType" not in df.columns:
        base_fields = [F.lit("VectorSink").alias("eventType")]
    else:
        base_fields = []
    base_fields += [F.col(c) for c in cols]
    base = F.to_json(F.struct(*base_fields))
    if message_col in df.columns:
        msg = F.trim(F.col(message_col).cast("string"))
        # (?s) so pretty-printed (multi-line) JSON objects still take
        # the merge path — '.' must match newlines.
        is_obj = msg.rlike(r"(?s)^\{.*\}$") & (msg != F.lit("{}"))
        # splice: '{base-without-}' + ',' + 'message-body-without-{'
        # — but when base renders as '{}' (eventType column present but
        # null and no other non-message columns; to_json drops nulls)
        # the comma would make invalid JSON '{,...}', so emit the
        # message body alone.
        merged = F.when(
            base == F.lit("{}"), msg,
        ).otherwise(F.concat(
            F.substring(base, 1, F.length(base) - F.lit(1)),
            F.lit(","),
            F.substring(msg, 2, F.length(msg) - F.lit(1)),
        ))
        plain = F.to_json(F.struct(*(base_fields + [F.col(message_col)])))
        line = F.when(is_obj, merged).otherwise(plain)
    else:
        line = base
    lines = df.select(line.alias("line"))
    return _post_lines_per_partition(
        lines, endpoint,
        {"Content-Type": "application/json", "Api-Key": license_key},
        batch_max_events, batch_max_bytes, timeout_secs,
        prefix=b"[", suffix=b"]", joiner=b",",
    )


def new_relic_metrics_sink(
    df: DataFrame,
    license_key: str,
    endpoint: str = "https://metric-api.newrelic.com/metric/v1",
    name_col: str = "name",
    kind_col: str = "kind",
    type_col: str = "metric_type",
    value_col: str = "value",
    tags_col: str | None = "tags",
    ts_col: str = "ts",
    interval_ms_col: str | None = None,
    batch_max_events: int = 1000,
    batch_max_bytes: int = 1_000_000,
    timeout_secs: float = 10.0,
) -> int:
    """The Metric API half of the reference's `new_relic` sink
    (config.rs:203-207 endpoint, model.rs:31-140 shaping): body
    `[{"metrics":[{name,type,value,timestamp,attributes,
    "interval.ms"}]}]` with the Api-Key header.

    Type mapping (model.rs:77-94): incremental counters become
    `count` and REQUIRE an interval (rows without one are dropped,
    the reference's num_missing_interval path); absolute counters and
    gauges become `gauge`. NaN values are dropped. Timestamps are
    epoch millis."""
    dtypes = dict(df.dtypes)
    kind = F.col(kind_col).cast("string") if kind_col in df.columns \
        else F.lit("absolute")
    mtype = F.col(type_col).cast("string")
    is_count = (mtype == F.lit("counter")) & (kind == F.lit("incremental"))
    interval = (F.col(interval_ms_col).cast("long")
                if interval_ms_col and interval_ms_col in df.columns
                else F.lit(None).cast("long"))
    value = F.col(value_col).cast("double")
    ts_ms = (F.unix_millis(F.col(ts_col))
             if dtypes.get(ts_col) == "timestamp"
             else (F.col(ts_col).cast("double") * 1000).cast("long"))
    attrs = (F.col(tags_col)
             if tags_col and tags_col in df.columns
             and dtypes.get(tags_col, "").startswith("map")
             else F.lit(None).cast("map<string,string>"))
    metric = F.struct(
        F.when(is_count, interval).alias("interval.ms"),
        F.col(name_col).cast("string").alias("name"),
        F.when(is_count, F.lit("count")).otherwise(F.lit("gauge"))
         .alias("type"),
        value.alias("value"),
        ts_ms.alias("timestamp"),
        attrs.alias("attributes"),
    )
    kept = df.where(~(F.isnan(value)) & (~is_count | interval.isNotNull()))
    lines = kept.select(F.to_json(metric).alias("line"))
    return _post_lines_per_partition(
        lines, endpoint,
        {"Content-Type": "application/json", "Api-Key": license_key},
        batch_max_events, batch_max_bytes, timeout_secs,
        prefix=b'[{"metrics":[', suffix=b"]}]", joiner=b",",
    )


def splunk_hec_metrics_sink(
    df: DataFrame,
    endpoint: str,
    token: str,
    name_col: str = "name",
    value_col: str = "value",
    tags_col: str | None = "tags",
    ts_col: str = "ts",
    host_col: str | None = None,
    sourcetype: str | None = None,
    index: str | None = None,
    batch_max_events: int = 1000,
    batch_max_bytes: int = 1_000_000,
    timeout_secs: float = 10.0,
) -> int:
    """The metrics half of the reference's splunk_hec family
    (src/sinks/splunk_hec/metrics/encoder.rs:20-90): HEC envelopes
    `{"event":"metric","fields":{<tags...>,"metric_name":...,
    "_value":<float>},"time":<epoch.secs>}` POSTed back-to-back to
    /services/collector/event with Splunk token auth. The fields map
    mixes string tags with the float `_value`, so it is spliced from
    the JVM-rendered tags JSON rather than a typed map."""
    def jstr(c) -> F.Column:
        # JSON string literal: escape \, ", and the common controls
        s = F.regexp_replace(c.cast("string"), r"\\", r"\\\\")
        s = F.regexp_replace(s, '"', '\\\\"')
        s = F.regexp_replace(s, "\n", r"\\n")
        s = F.regexp_replace(s, "\t", r"\\t")
        s = F.regexp_replace(s, "\r", r"\\r")
        return F.concat(F.lit('"'), s, F.lit('"'))

    dtypes = dict(df.dtypes)
    tags_json = (
        F.coalesce(F.to_json(F.col(tags_col)), F.lit("{}"))
        if tags_col and tags_col in df.columns
        and dtypes.get(tags_col, "").startswith("map")
        else F.lit("{}")
    )
    # '{tags...' + ',' (unless empty) + '"metric_name":...,"_value":v}'
    head = F.substring(tags_json, 1, F.length(tags_json) - F.lit(1))
    comma = F.when(tags_json == F.lit("{}"), F.lit("")) \
             .otherwise(F.lit(","))
    fields = F.concat(
        head, comma,
        F.lit('"metric_name":'),
        jstr(F.col(name_col)),
        F.lit(',"_value":'),
        F.col(value_col).cast("double").cast("string"),
        F.lit("}"),
    )
    ts = (F.col(ts_col) if dtypes.get(ts_col) == "timestamp"
          else F.timestamp_seconds(F.col(ts_col).cast("double")))
    time_s = (F.unix_millis(ts).cast("double") / 1000.0).cast("string")
    parts = [F.lit('{"event":"metric","fields":'), fields,
             F.lit(',"time":'), time_s]
    if host_col and host_col in df.columns:
        parts += [F.lit(',"host":'), jstr(F.col(host_col))]
    if index:
        parts += [F.lit(',"index":'), jstr(F.lit(index))]
    if sourcetype:
        parts += [F.lit(',"sourcetype":'), jstr(F.lit(sourcetype))]
    parts.append(F.lit("}"))
    # NaN can't serialize into JSON — such metrics drop (the
    # reference's serde path errors and drops the event the same way)
    kept = df.where(~F.isnan(F.col(value_col).cast("double")))
    lines = kept.select(F.concat(*parts).alias("line"))
    url = endpoint.rstrip("/") + "/services/collector/event"
    return _post_lines_per_partition(
        lines, url,
        {"Content-Type": "application/json",
         "Authorization": f"Splunk {token}"},
        batch_max_events, batch_max_bytes, timeout_secs,
    )
