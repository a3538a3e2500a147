"""Wire-protocol server sources via the PySpark Python DataSource API.

Reference:
- syslog TCP listener: `src/sources/syslog.rs:45` (framing: RFC6587
  octet-counting OR newline non-transparent, auto-detected per message)
- statsd UDP listener: `src/sources/statsd/mod.rs` (one metric line per
  datagram, newline-separated lines allowed)
- socket source: `src/sources/socket/mod.rs:22`

Spark-first shape: a `SimpleDataSourceStreamReader` runs DRIVER-side — the
right place for a listener socket (one bind point, like the reference's
single listener task); decoded lines enter micro-batches through the
offset/commit contract, so downstream transforms stay fully distributed
DataFrame ops and the per-batch volume is the only driver constraint —
the same constraint the reference's single-socket listener has.

Delivery contract: every received frame is appended to a driver-local WAL
*before* it becomes readable, and batch offsets live in the query
checkpoint. On restart Spark hands us the last committed offset and we
replay the WAL tail — received-and-unprocessed frames survive restarts
(exactly-once into the sink, stronger than the reference's ack-less
socket source, which re-delivers nothing). Frames that never reached the
WAL (crash mid-append) are lost, as they are in any ack-less wire
protocol.

Usage:
    register_sources(spark)
    df = (spark.readStream.format("syslog_tcp")
          .option("host", "127.0.0.1").option("port", 5140)
          .option("wal_dir", "/tmp/syslog-wal").load())
Schema: seq BIGINT, ts TIMESTAMP, peer STRING, message STRING.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


# ---------------------------------------------------------------------------
# r11: the listener families moved to sources_core / sources_http /
# sources_wire (this file had grown to 1,600+ lines). This module stays
# the import hub — every public and test-facing symbol re-exports here,
# so `from vector_spark.sources import X` keeps working unchanged.

from vector_spark.sources_core import (
    UnixSocketDataSource,  # noqa: F401,E402
    SOCKET_SCHEMA,
    OctetCountingFramer,
    StatsdUDPDataSource,
    SyslogTCPDataSource,
    _ListenerState,
    _SocketStreamReader,
    _accept_forever,
    _tcp_listener,
    _udp_listener,
)
from vector_spark.sources_http import (  # noqa: F401,E402
    HTTPServerDataSource,
    _http_listener,
    merge_http_meta,
    route_http_endpoints,
)
from vector_spark.sources_wire import (  # noqa: F401,E402
    DnstapDataSource,
    FluentDataSource,
    LogstashDataSource,
    OtlpGrpcDataSource,
    VectorDataSource,
    VectorGrpcDataSource,
    WebsocketDataSource,
    _dnstap_listener,
    _fluent_listener,
    _logstash_listener,
    _otlp_grpc_listener,
    _vector_grpc_listener,
    _vector_listener,
    _websocket_listener,
)


def register_sources(spark) -> None:
    """Register the wire-protocol sources on a session (idempotent)."""
    spark.dataSource.register(SyslogTCPDataSource)
    spark.dataSource.register(StatsdUDPDataSource)
    spark.dataSource.register(UnixSocketDataSource)
    spark.dataSource.register(HTTPServerDataSource)
    spark.dataSource.register(FluentDataSource)
    spark.dataSource.register(LogstashDataSource)
    spark.dataSource.register(DnstapDataSource)
    spark.dataSource.register(WebsocketDataSource)
    spark.dataSource.register(VectorDataSource)
    spark.dataSource.register(OtlpGrpcDataSource)
    spark.dataSource.register(VectorGrpcDataSource)
