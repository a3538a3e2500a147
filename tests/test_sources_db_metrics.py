"""Database server-metrics codecs (EventStoreDB / MongoDB / PostgreSQL).

Each parse_* is checked against hand-derived expectations transcribed
from the reference's field-by-field mapping (eventstoredb_metrics/
types.rs, mongodb_metrics/mod.rs, postgresql_metrics.rs) — never against
the parser's own output.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vector_spark.sources_db_metrics import (
    SAMPLE_ESDB_STATS,
    SAMPLE_PG_STATS,
    SAMPLE_SERVER_STATUS,
    eventstoredb_metrics_source,
    mongodb_metrics_source,
    parse_eventstoredb_stats,
    parse_mongodb_server_status,
    parse_postgresql_stats,
    postgresql_metrics_source,
)


def _index(rows):
    return {
        (r[0], tuple(sorted(r[2].items()))): (r[3], r[4]) for r in rows
    }


def test_parse_eventstoredb_stats_full():
    rows = parse_eventstoredb_stats(json.dumps(SAMPLE_ESDB_STATS))
    assert len(rows) == 9
    ix = _index(rows)
    pid = ("id", "4711")
    assert ix[("process_memory_used_bytes", (pid,))] == ("gauge", 201.0)
    assert ix[("disk_read_bytes_total", (pid,))] == ("counter", 202.0)
    assert ix[("disk_written_bytes_total", (pid,))] == ("counter", 203.0)
    assert ix[("disk_read_ops_total", (pid,))] == ("counter", 204.0)
    assert ix[("disk_write_ops_total", (pid,))] == ("counter", 205.0)
    assert ix[("memory_free_bytes", (pid,))] == ("gauge", 206.0)
    dr = (pid, ("path", "/var/lib/esdb"))
    assert ix[("disk_total_bytes", dr)] == ("gauge", 208.0)
    assert ix[("disk_free_bytes", dr)] == ("gauge", 207.0)
    assert ix[("disk_used_bytes", dr)] == ("gauge", 209.0)
    assert all(r[1] == "eventstoredb" for r in rows)


def test_parse_eventstoredb_stats_no_drive():
    doc = {"proc": SAMPLE_ESDB_STATS["proc"],
           "sys": {"freeMem": 1, "loadavg": {}}}
    rows = parse_eventstoredb_stats(json.dumps(doc))
    assert len(rows) == 6
    assert not any(r[0].startswith("disk_total") for r in rows)


def test_eventstoredb_metrics_source_http(spark):
    body = json.dumps(SAMPLE_ESDB_STATS).encode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = eventstoredb_metrics_source(
            spark, f"http://127.0.0.1:{srv.server_port}/stats"
        )
        rows = df.collect()
        assert len(rows) == 9
        assert rows[0]["ts"] is not None
        assert {r["namespace"] for r in rows} == {"eventstoredb"}
    finally:
        srv.shutdown()


def test_parse_mongodb_server_status_full():
    rows = parse_mongodb_server_status(SAMPLE_SERVER_STATUS)
    assert len(rows) == 119
    ix = _index(rows)
    # spot checks across every group, values from the sample's numbering
    assert ix[("asserts_total", (("type", "rollovers"),))] == (
        "counter", 5.0)
    assert ix[("connections", (("state", "current"),))] == ("counter", 8.0)
    assert ix[("memory", (("type", "mapped_with_journal"),))] == (
        "gauge", 16.0)
    assert ix[("mongod_global_lock_current_queue",
               (("type", "writers"),))] == ("gauge", 23.0)
    # i64 division truncates: 35500 // 1000 = 35 (not 35.5)
    assert ix[("mongod_metrics_get_last_error_wtime_seconds_total",
               ())] == ("counter", 35.0)
    assert ix[("mongod_metrics_repl_apply_batches_seconds_total", ())] == (
        "counter", 44.0)
    # per-lock-type acquiring modes (locks.Global.timeAcquiringMicros.r/w)
    assert ix[("mongod_locks_time_acquiring_global_seconds_total",
               (("mode", "read"), ("type", "Global")))] == ("counter", 24.0)
    assert ix[("mongod_locks_time_acquiring_global_seconds_total",
               (("mode", "write"), ("type", "Global")))] == (
        "counter", 25.0)
    # op latency histogram buckets carry a micros tag
    assert ix[("mongod_op_latencies_histogram",
               (("micros", "2"), ("type", "reads")))] == ("gauge", 62.0)
    assert ix[("mongod_op_latencies_ops_total",
               (("type", "writes"),))] == ("gauge", 64.0)
    assert ix[("mongod_storage_engine",
               (("engine", "wiredTiger"),))] == ("gauge", 1.0)
    # wiredtiger: checkpoint msecs // 1000, and the cache_bytes_total
    # metric reads the PAGES counters (reference mod.rs:900 does too)
    assert ix[("mongod_wiredtiger_transactions_checkpoint_seconds",
               (("type", "min"),))] == ("gauge", 107.0)
    assert ix[("mongod_wiredtiger_cache_bytes_total",
               (("type", "read"),))] == ("counter", 81.0)
    assert ix[("mongod_wiredtiger_transactions_total",
               (("type", "rolledback"),))] == ("counter", 114.0)
    # the reference's swapped opcounter names are preserved:
    # opcounters → op_counters_repl_total, opcountersRepl → op_counters_total
    assert ix[("op_counters_repl_total", (("type", "insert"),))] == (
        "counter", 118.0)
    assert ix[("op_counters_repl_total", (("type", "query"),))] == (
        "counter", 119.0)
    assert ix[("op_counters_total", (("type", "insert"),))] == (
        "counter", 120.0)


def test_parse_mongodb_optional_sections_skip():
    doc = {
        "asserts": SAMPLE_SERVER_STATUS["asserts"],
        "connections": SAMPLE_SERVER_STATUS["connections"],
        "extra_info": {"page_faults": 10},  # no heap_usage_bytes
        "uptime": 1, "uptimeEstimate": 2,
        "mem": {"resident": 1, "virtual": 2},  # no mapped
        "globalLock": SAMPLE_SERVER_STATUS["globalLock"],
        "metrics": {
            "cursor": {"timedOut": 1,
                       "open": {"noTimeout": 1, "pinned": 1, "total": 1}},
            # no record, no collectionScans
            "queryExecutor": {"scanned": 1, "scannedObjects": 2},
        },
        "network": {"bytesIn": 1, "bytesOut": 2, "numRequests": 3},
        "storageEngine": {"name": "inMemory"},
        # no wiredTiger, no locks, no opLatencies, no localTime
    }
    rows = parse_mongodb_server_status(doc)
    names = {r[0] for r in rows}
    assert "extra_info_heap_usage_bytes" not in names
    assert "mongod_metrics_record_moves_total" not in names
    assert "instance_local_time" not in names
    assert not any(n.startswith("mongod_wiredtiger") for n in names)
    ix = _index(rows)
    assert ("mongod_metrics_query_executor_total",
            (("state", "collection_scans"),)) not in ix
    assert ix[("mongod_storage_engine", (("engine", "inMemory"),))] == (
        "gauge", 1.0)


def test_parse_mongodb_local_time():
    doc = dict(SAMPLE_SERVER_STATUS)
    doc["localTime"] = 1_700_000_123_456  # epoch millis
    rows = parse_mongodb_server_status(doc)
    ix = _index(rows)
    assert ix[("instance_local_time", ())] == ("gauge", 1_700_000_123.0)


def test_mongodb_metrics_source_up(spark):
    df = mongodb_metrics_source(spark, SAMPLE_SERVER_STATUS,
                                tags={"endpoint": "mongodb://x"})
    rows = df.collect()
    assert len(rows) == 120
    up = [r for r in rows if r["name"] == "up"]
    assert len(up) == 1 and up[0]["value"] == 1.0
    down = mongodb_metrics_source(spark, {}, up=False).collect()
    assert len(down) == 1 and down[0]["value"] == 0.0


def test_parse_postgresql_stats_full():
    rows = parse_postgresql_stats(**SAMPLE_PG_STATS)
    ix = _index(rows)
    db = (("db", "postgres"),)
    assert ix[("pg_stat_database_datid", db)] == ("gauge", 301.0)
    assert ix[("pg_stat_database_xact_commit_total", db)] == (
        "counter", 303.0)
    assert ix[("pg_stat_database_deadlocks_total", db)] == (
        "counter", 315.0)
    assert ix[("pg_stat_database_checksum_failures_total", db)] == (
        "counter", 316.0)
    # milliseconds → float seconds (318500 ms / 1000 = 318.5 s)
    assert ix[("pg_stat_database_blk_read_time_seconds_total", db)] == (
        "counter", 318.5)
    # NULL datname tags db='' (reference's unwrap_or(""))
    shared = (("db", ""),)
    assert ix[("pg_stat_database_numbackends", shared)] == ("gauge", 322.0)
    # no-checksum cluster: optional metrics absent for that row only
    assert ("pg_stat_database_checksum_failures_total", shared) not in ix
    assert ("pg_stat_database_stats_reset", shared) not in ix
    assert ix[("pg_stat_database_conflicts_confl_deadlock_total", db)] == (
        "counter", 345.0)
    assert ix[("pg_stat_bgwriter_checkpoint_write_time_seconds_total",
               ())] == ("counter", 353.5)
    assert ix[("pg_stat_bgwriter_buffers_alloc_total", ())] == (
        "counter", 360.0)
    # 20 + 18 (per-db, minus checksum x2 and stats_reset) + 5 + 11
    assert len(rows) == 20 + 17 + 5 + 11


def test_postgresql_metrics_source_up(spark):
    df = postgresql_metrics_source(spark, **SAMPLE_PG_STATS)
    rows = df.collect()
    assert rows[0]["name"] == "up" and rows[0]["value"] == 1.0
    assert len(rows) == 1 + 53
    down = postgresql_metrics_source(spark, up=False).collect()
    assert len(down) == 1 and down[0]["value"] == 0.0


@pytest.mark.parametrize("ns", ["custom_ns"])
def test_namespace_override(ns):
    rows = parse_eventstoredb_stats(
        json.dumps(SAMPLE_ESDB_STATS), namespace=ns
    )
    assert {r[1] for r in rows} == {ns}
