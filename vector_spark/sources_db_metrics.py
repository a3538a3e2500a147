"""Database server-metrics pollers: EventStoreDB, MongoDB, PostgreSQL.

The reference implements these as live pollers over each database's own
protocol (src/sources/eventstoredb_metrics/mod.rs — HTTP ``/stats``;
src/sources/mongodb_metrics/mod.rs — the ``serverStatus`` admin command;
src/sources/postgresql_metrics.rs — ``SELECT * FROM pg_stat_database /
pg_stat_database_conflicts / pg_stat_bgwriter``). Here the stats→metric
mapping is a pure codec over the fetched payload (the same split as the
apache/nginx status codecs in ``sources_pull.py``): ``parse_*`` turns the
raw stats document into metric rows with the reference's exact names,
kinds, and tags, and the ``*_metrics_source`` wrappers do the one-shot
fetch. EventStoreDB's fetch is plain HTTP and works as-is; mongo/postgres
fetches need a live server speaking its wire protocol, so the wrappers
accept a pre-fetched payload (any client/JDBC can supply it) and the
documented non-goal is only the wire client, no longer the metric
mapping (COVERAGE.md's poller row).

Scale shape (same argument as apache/nginx): one tiny stats document per
endpoint per poll interval — parsed driver-side; the data never needs
executors until it joins the metric stream.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.sources_pull import METRIC_SCHEMA, _http_get


def _rows_adder(rows: list, namespace: str, base_tags: dict):
    def add(name, value, extra=None, kind="gauge"):
        rows.append(
            (name, namespace, {**base_tags, **(extra or {})}, kind,
             float(value))
        )
    return add


# ---- EventStoreDB /stats ------------------------------------------------


def parse_eventstoredb_stats(
    payload: str, namespace: str = "eventstoredb", tags: dict | None = None
) -> list[tuple]:
    """EventStoreDB ``/stats`` JSON body → metric rows.

    Same mapping as the reference's ``Stats::metrics``
    (src/sources/eventstoredb_metrics/types.rs:19): process memory and
    disk-IO counters tagged with the process ``id``, system free memory,
    and — when a drive is reported — the per-path disk gauges. The
    reference deserializes ``sys.drive`` as a single-entry map keyed by
    the mount path (types.rs ``DriveVisitor``); absent drive info just
    skips those gauges."""
    doc = json.loads(payload)
    proc, sys_ = doc["proc"], doc["sys"]
    rows: list[tuple] = []
    add = _rows_adder(rows, namespace, {**(tags or {}), "id": str(proc["id"])})
    add("process_memory_used_bytes", proc["mem"])
    dio = proc["diskIo"]
    add("disk_read_bytes_total", dio["readBytes"], kind="counter")
    add("disk_written_bytes_total", dio["writtenBytes"], kind="counter")
    add("disk_read_ops_total", dio["readOps"], kind="counter")
    add("disk_write_ops_total", dio["writeOps"], kind="counter")
    add("memory_free_bytes", sys_["freeMem"])
    drive = sys_.get("drive") or {}
    for path, stats in drive.items() if isinstance(drive, dict) else []:
        if not isinstance(stats, dict):
            continue
        extra = {"path": path}
        add("disk_total_bytes", stats["totalBytes"], extra)
        add("disk_free_bytes", stats["availableBytes"], extra)
        add("disk_used_bytes", stats["usedBytes"], extra)
    return rows


def eventstoredb_metrics_source(
    spark: SparkSession,
    url: str = "https://localhost:2113/stats",
    namespace: str = "eventstoredb",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """One poll of an EventStoreDB stats endpoint → metric rows
    (src/sources/eventstoredb_metrics/mod.rs:59 default endpoint)."""
    body = _http_get(url, timeout_secs)
    rows = parse_eventstoredb_stats(body, namespace=namespace)
    return spark.createDataFrame(rows, METRIC_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


# ---- MongoDB serverStatus ----------------------------------------------

# (name, kind, tag dict, path into the serverStatus document, divisor)
# — Rust's i64 division truncates, so divisor entries use // below.
_MONGO_SIMPLE = [
    ("asserts_total", "counter", {"type": "regular"}, ("asserts", "regular")),
    ("asserts_total", "counter", {"type": "warning"}, ("asserts", "warning")),
    ("asserts_total", "counter", {"type": "msg"}, ("asserts", "msg")),
    ("asserts_total", "counter", {"type": "user"}, ("asserts", "user")),
    ("asserts_total", "counter", {"type": "rollovers"},
     ("asserts", "rollovers")),
    ("connections", "counter", {"state": "active"},
     ("connections", "active")),
    ("connections", "counter", {"state": "available"},
     ("connections", "available")),
    ("connections", "counter", {"state": "current"},
     ("connections", "current")),
    ("extra_info_heap_usage_bytes", "gauge", {},
     ("extra_info", "heap_usage_bytes")),
    ("extra_info_page_faults", "gauge", {}, ("extra_info", "page_faults")),
    ("instance_uptime_estimate_seconds_total", "gauge", {},
     ("uptimeEstimate",)),
    ("instance_uptime_seconds_total", "gauge", {}, ("uptime",)),
    ("memory", "gauge", {"type": "resident"}, ("mem", "resident")),
    ("memory", "gauge", {"type": "virtual"}, ("mem", "virtual")),
    ("memory", "gauge", {"type": "mapped"}, ("mem", "mapped")),
    ("memory", "gauge", {"type": "mapped_with_journal"},
     ("mem", "mappedWithJournal")),
    ("mongod_global_lock_total_time_seconds", "counter", {},
     ("globalLock", "totalTime")),
    ("mongod_global_lock_active_clients", "gauge", {"type": "total"},
     ("globalLock", "activeClients", "total")),
    ("mongod_global_lock_active_clients", "gauge", {"type": "readers"},
     ("globalLock", "activeClients", "readers")),
    ("mongod_global_lock_active_clients", "gauge", {"type": "writers"},
     ("globalLock", "activeClients", "writers")),
    ("mongod_global_lock_current_queue", "gauge", {"type": "total"},
     ("globalLock", "currentQueue", "total")),
    ("mongod_global_lock_current_queue", "gauge", {"type": "readers"},
     ("globalLock", "currentQueue", "readers")),
    ("mongod_global_lock_current_queue", "gauge", {"type": "writers"},
     ("globalLock", "currentQueue", "writers")),
    ("mongod_metrics_cursor_timed_out_total", "counter", {},
     ("metrics", "cursor", "timedOut")),
    ("mongod_metrics_cursor_open", "gauge", {"state": "no_timeout"},
     ("metrics", "cursor", "open", "noTimeout")),
    ("mongod_metrics_cursor_open", "gauge", {"state": "pinned"},
     ("metrics", "cursor", "open", "pinned")),
    ("mongod_metrics_cursor_open", "gauge", {"state": "total"},
     ("metrics", "cursor", "open", "total")),
    ("mongod_metrics_document_total", "counter", {"state": "deleted"},
     ("metrics", "document", "deleted")),
    ("mongod_metrics_document_total", "counter", {"state": "inserted"},
     ("metrics", "document", "inserted")),
    ("mongod_metrics_document_total", "counter", {"state": "returned"},
     ("metrics", "document", "returned")),
    ("mongod_metrics_document_total", "counter", {"state": "updated"},
     ("metrics", "document", "updated")),
    ("mongod_metrics_get_last_error_wtime_num", "gauge", {},
     ("metrics", "getLastError", "wtime", "num")),
    ("mongod_metrics_get_last_error_wtime_seconds_total", "counter", {},
     ("metrics", "getLastError", "wtime", "totalMillis"), 1000),
    ("mongod_metrics_get_last_error_wtimeouts_total", "counter", {},
     ("metrics", "getLastError", "wtimeouts")),
    ("mongod_metrics_operation_total", "counter",
     {"type": "scan_and_order"}, ("metrics", "operation", "scanAndOrder")),
    ("mongod_metrics_operation_total", "counter",
     {"type": "write_conflicts"},
     ("metrics", "operation", "writeConflicts")),
    ("mongod_metrics_query_executor_total", "counter", {"state": "scanned"},
     ("metrics", "queryExecutor", "scanned")),
    ("mongod_metrics_query_executor_total", "counter",
     {"state": "scanned_objects"},
     ("metrics", "queryExecutor", "scannedObjects")),
    ("mongod_metrics_query_executor_total", "counter",
     {"state": "collection_scans"},
     ("metrics", "queryExecutor", "collectionScans", "total")),
    ("mongod_metrics_record_moves_total", "counter", {},
     ("metrics", "record", "moves")),
    ("mongod_metrics_repl_apply_batches_num_total", "counter", {},
     ("metrics", "repl", "apply", "batches", "num")),
    ("mongod_metrics_repl_apply_batches_seconds_total", "counter", {},
     ("metrics", "repl", "apply", "batches", "totalMillis"), 1000),
    ("mongod_metrics_repl_apply_ops_total", "counter", {},
     ("metrics", "repl", "apply", "ops")),
    ("mongod_metrics_repl_buffer_count", "counter", {},
     ("metrics", "repl", "buffer", "count")),
    ("mongod_metrics_repl_buffer_max_size_bytes_total", "counter", {},
     ("metrics", "repl", "buffer", "maxSizeBytes")),
    ("mongod_metrics_repl_buffer_size_bytes", "counter", {},
     ("metrics", "repl", "buffer", "sizeBytes")),
    ("mongod_metrics_repl_executor_queue", "gauge",
     {"type": "network_in_progress"},
     ("metrics", "repl", "executor", "queues", "networkInProgress")),
    ("mongod_metrics_repl_executor_queue", "gauge", {"type": "sleepers"},
     ("metrics", "repl", "executor", "queues", "sleepers")),
    ("mongod_metrics_repl_executor_unsignaled_events", "gauge", {},
     ("metrics", "repl", "executor", "unsignaledEvents")),
    ("mongod_metrics_repl_network_bytes_total", "counter", {},
     ("metrics", "repl", "network", "bytes")),
    ("mongod_metrics_repl_network_getmores_num_total", "counter", {},
     ("metrics", "repl", "network", "getmores", "num")),
    ("mongod_metrics_repl_network_getmores_seconds_total", "counter", {},
     ("metrics", "repl", "network", "getmores", "totalMillis"), 1000),
    ("mongod_metrics_repl_network_ops_total", "counter", {},
     ("metrics", "repl", "network", "ops")),
    ("mongod_metrics_repl_network_readers_created_total", "counter", {},
     ("metrics", "repl", "network", "readersCreated")),
    ("mongod_metrics_ttl_deleted_documents_total", "counter", {},
     ("metrics", "ttl", "deletedDocuments")),
    ("mongod_metrics_ttl_passes_total", "counter", {},
     ("metrics", "ttl", "passes")),
    ("network_bytes_total", "counter", {"state": "bytes_in"},
     ("network", "bytesIn")),
    ("network_bytes_total", "counter", {"state": "bytes_out"},
     ("network", "bytesOut")),
    ("network_metrics_num_requests_total", "counter", {},
     ("network", "numRequests")),
]

# WiredTiger sub-document: (name, kind, tags, path under wiredTiger, div)
_MONGO_WT = [
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter",
     {"type": "blocks_read"}, ("block-manager", "blocks read")),
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter",
     {"type": "blocks_read_mapped"}, ("block-manager",
                                      "mapped blocks read")),
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter",
     {"type": "blocks_pre_loaded"}, ("block-manager", "blocks pre-loaded")),
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter",
     {"type": "blocks_written"}, ("block-manager", "blocks written")),
    ("mongod_wiredtiger_blockmanager_bytes_total", "counter",
     {"type": "bytes_read"}, ("block-manager", "bytes read")),
    ("mongod_wiredtiger_blockmanager_bytes_total", "counter",
     {"type": "bytes_read_mapped"}, ("block-manager", "mapped bytes read")),
    ("mongod_wiredtiger_blockmanager_bytes_total", "counter",
     {"type": "bytes_written"}, ("block-manager", "bytes written")),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "total"},
     ("cache", "bytes currently in the cache")),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "dirty"},
     ("cache", "tracked dirty bytes in the cache")),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "internal_pages"},
     ("cache", "tracked bytes belonging to internal pages in the cache")),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "leaf_pages"},
     ("cache", "tracked bytes belonging to leaf pages in the cache")),
    ("mongod_wiredtiger_cache_bytes_total", "counter", {"type": "read"},
     ("cache", "pages read into cache")),
    ("mongod_wiredtiger_cache_bytes_total", "counter", {"type": "written"},
     ("cache", "pages written from cache")),
    ("mongod_wiredtiger_cache_evicted_total", "counter",
     {"type": "modified"}, ("cache", "modified pages evicted")),
    ("mongod_wiredtiger_cache_evicted_total", "counter",
     {"type": "unmodified"}, ("cache", "unmodified pages evicted")),
    ("mongod_wiredtiger_cache_max_bytes", "gauge", {},
     ("cache", "maximum bytes configured")),
    ("mongod_wiredtiger_cache_overhead_percent", "gauge", {},
     ("cache", "percentage overhead")),
    ("mongod_wiredtiger_cache_pages", "gauge", {"type": "total"},
     ("cache", "pages currently held in the cache")),
    ("mongod_wiredtiger_cache_pages", "gauge", {"type": "dirty"},
     ("cache", "tracked dirty pages in the cache")),
    ("mongod_wiredtiger_cache_pages_total", "counter", {"type": "read"},
     ("cache", "pages read into cache")),
    ("mongod_wiredtiger_cache_pages_total", "counter", {"type": "write"},
     ("cache", "pages written from cache")),
    ("mongod_wiredtiger_concurrent_transactions_available_tickets", "gauge",
     {"type": "read"}, ("concurrentTransactions", "read", "available")),
    ("mongod_wiredtiger_concurrent_transactions_available_tickets", "gauge",
     {"type": "write"}, ("concurrentTransactions", "write", "available")),
    ("mongod_wiredtiger_concurrent_transactions_out_tickets", "gauge",
     {"type": "read"}, ("concurrentTransactions", "read", "out")),
    ("mongod_wiredtiger_concurrent_transactions_out_tickets", "gauge",
     {"type": "write"}, ("concurrentTransactions", "write", "out")),
    ("mongod_wiredtiger_concurrent_transactions_total_tickets", "gauge",
     {"type": "read"}, ("concurrentTransactions", "read", "totalTickets")),
    ("mongod_wiredtiger_concurrent_transactions_total_tickets", "gauge",
     {"type": "write"},
     ("concurrentTransactions", "write", "totalTickets")),
    ("mongod_wiredtiger_log_bytes_total", "counter", {"type": "payload"},
     ("log", "log bytes of payload data")),
    ("mongod_wiredtiger_log_bytes_total", "counter", {"type": "written"},
     ("log", "log bytes written")),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "write"},
     ("log", "log write operations")),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "scan"},
     ("log", "log scan operations")),
    ("mongod_wiredtiger_log_operations_total", "counter",
     {"type": "scan_double"},
     ("log", "log scan records requiring two reads")),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "sync"},
     ("log", "log sync operations")),
    ("mongod_wiredtiger_log_operations_total", "counter",
     {"type": "sync_dir"}, ("log", "log sync_dir operations")),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "flush"},
     ("log", "log flush operations")),
    ("mongod_wiredtiger_log_records_scanned_total", "counter",
     {"type": "compressed"}, ("log", "log records compressed")),
    ("mongod_wiredtiger_log_records_scanned_total", "counter",
     {"type": "uncompressed"}, ("log", "log records not compressed")),
    ("mongod_wiredtiger_log_records_total", "counter", {},
     ("log", "records processed by log scan")),
    ("mongod_wiredtiger_session_open_sessions", "gauge", {},
     ("session", "open session count")),
    ("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge",
     {"type": "min"},
     ("transaction", "transaction checkpoint min time (msecs)"), 1000),
    ("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge",
     {"type": "max"},
     ("transaction", "transaction checkpoint max time (msecs)"), 1000),
    ("mongod_wiredtiger_transactions_checkpoint_seconds_total", "counter",
     {}, ("transaction", "transaction checkpoint total time (msecs)"),
     1000),
    ("mongod_wiredtiger_transactions_running_checkpoints", "gauge", {},
     ("transaction", "transaction checkpoint currently running")),
    ("mongod_wiredtiger_transactions_total", "counter", {"type": "begins"},
     ("transaction", "transaction begins")),
    ("mongod_wiredtiger_transactions_total", "counter",
     {"type": "checkpoints"}, ("transaction", "transaction checkpoints")),
    ("mongod_wiredtiger_transactions_total", "counter",
     {"type": "committed"}, ("transaction", "transactions committed")),
    ("mongod_wiredtiger_transactions_total", "counter",
     {"type": "rolledback"}, ("transaction", "transactions rolled back")),
]


def _dig(doc: dict, path: tuple):
    cur = doc
    for key in path:
        if not isinstance(cur, dict) or key not in cur:
            return None
        cur = cur[key]
    return cur


def parse_mongodb_server_status(
    doc: dict, namespace: str = "mongodb", tags: dict | None = None
) -> list[tuple]:
    """MongoDB ``serverStatus`` command result → metric rows.

    Replays the reference's field-by-field mapping
    (src/sources/mongodb_metrics/mod.rs:294-960, field names from
    types.rs): asserts/connections/memory/global-lock groups with their
    type/state tags, the metrics.* counters (millisecond totals
    integer-divided to seconds exactly as Rust's i64 division
    truncates), per-lock-type acquiring times, per-op-type latency
    histograms, the storage-engine marker gauge, the full WiredTiger
    battery, and the op counters. Optional sub-documents (extra_info
    heap, mem.mapped, metrics.record, collectionScans, wiredTiger) skip
    silently when absent, matching the reference's Option fields.

    Two reference quirks preserved deliberately: ``instance_local_time``
    is emitted from ``localTime`` (epoch millis // 1000) — callers who
    need determinism can strip it; and the reference emits ``opcounters``
    under the name ``op_counters_repl_total`` and ``opcountersRepl``
    under ``op_counters_total`` (swapped at mod.rs:1046-1060) — kept
    as-is so dashboards built against the reference keep working."""
    rows: list[tuple] = []
    add = _rows_adder(rows, namespace, dict(tags or {}))

    def emit(specs, root):
        for spec in specs:
            name, kind, tg, path = spec[0], spec[1], spec[2], spec[3]
            div = spec[4] if len(spec) > 4 else None
            v = _dig(root, path)
            if v is None:
                continue
            if div:
                v = int(v) // div
            add(name, v, tg, kind)

    emit(_MONGO_SIMPLE, doc)
    lt = _dig(doc, ("localTime",))
    if lt is not None:
        ms = lt if isinstance(lt, (int, float)) else None
        if ms is not None:
            add("instance_local_time", int(ms) // 1000, {}, "gauge")
    for lock_type, lock in (doc.get("locks") or {}).items():
        modes = (lock or {}).get("timeAcquiringMicros") or {}
        for mode_key, mode in (("r", "read"), ("w", "write")):
            if modes.get(mode_key) is not None:
                add("mongod_locks_time_acquiring_global_seconds_total",
                    modes[mode_key], {"type": lock_type, "mode": mode},
                    "counter")
    for op_type, stat in (doc.get("opLatencies") or {}).items():
        for bucket in stat.get("histogram") or []:
            add("mongod_op_latencies_histogram", bucket["count"],
                {"type": op_type, "micros": str(bucket["micros"])})
        add("mongod_op_latencies_latency", stat["latency"],
            {"type": op_type})
        add("mongod_op_latencies_ops_total", stat["ops"], {"type": op_type})
    engine = _dig(doc, ("storageEngine", "name"))
    if engine is not None:
        add("mongod_storage_engine", 1, {"engine": engine})
    wt = doc.get("wiredTiger")
    if wt is not None:
        emit(_MONGO_WT, wt)
    for op_type, value in (doc.get("opcounters") or {}).items():
        add("op_counters_repl_total", value, {"type": op_type}, "counter")
    for op_type, value in (doc.get("opcountersRepl") or {}).items():
        add("op_counters_total", value, {"type": op_type}, "counter")
    return rows


def mongodb_metrics_source(
    spark: SparkSession,
    server_status: dict,
    namespace: str = "mongodb",
    tags: dict | None = None,
    up: bool = True,
) -> DataFrame:
    """serverStatus document (fetched by any mongo client) → metric
    DataFrame, plus the reference's ``up`` gauge (1 on success, 0 when
    the caller passes ``up=False`` after a failed fetch —
    src/sources/mongodb_metrics/mod.rs:245)."""
    rows = (
        parse_mongodb_server_status(server_status, namespace, tags)
        if up and server_status else []
    )
    rows.append(("up", namespace, dict(tags or {}), "gauge",
                 1.0 if up else 0.0))
    return spark.createDataFrame(rows, METRIC_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


# ---- PostgreSQL pg_stat_* ----------------------------------------------

# (metric suffix, kind, source column, millis→seconds flag) for one
# pg_stat_database row (src/sources/postgresql_metrics.rs:615-731)
_PG_STAT_DATABASE = [
    ("pg_stat_database_datid", "gauge", "datid", False),
    ("pg_stat_database_numbackends", "gauge", "numbackends", False),
    ("pg_stat_database_xact_commit_total", "counter", "xact_commit", False),
    ("pg_stat_database_xact_rollback_total", "counter", "xact_rollback",
     False),
    ("pg_stat_database_blks_read_total", "counter", "blks_read", False),
    ("pg_stat_database_blks_hit_total", "counter", "blks_hit", False),
    ("pg_stat_database_tup_returned_total", "counter", "tup_returned",
     False),
    ("pg_stat_database_tup_fetched_total", "counter", "tup_fetched", False),
    ("pg_stat_database_tup_inserted_total", "counter", "tup_inserted",
     False),
    ("pg_stat_database_tup_updated_total", "counter", "tup_updated", False),
    ("pg_stat_database_tup_deleted_total", "counter", "tup_deleted", False),
    ("pg_stat_database_conflicts_total", "counter", "conflicts", False),
    ("pg_stat_database_temp_files_total", "counter", "temp_files", False),
    ("pg_stat_database_temp_bytes_total", "counter", "temp_bytes", False),
    ("pg_stat_database_deadlocks_total", "counter", "deadlocks", False),
    ("pg_stat_database_checksum_failures_total", "counter",
     "checksum_failures", False),
    ("pg_stat_database_checksum_last_failure", "gauge",
     "checksum_last_failure", False),
    ("pg_stat_database_blk_read_time_seconds_total", "counter",
     "blk_read_time", True),
    ("pg_stat_database_blk_write_time_seconds_total", "counter",
     "blk_write_time", True),
    ("pg_stat_database_stats_reset", "gauge", "stats_reset", False),
]

_PG_CONFLICTS = [
    ("pg_stat_database_conflicts_confl_tablespace_total",
     "confl_tablespace"),
    ("pg_stat_database_conflicts_confl_lock_total", "confl_lock"),
    ("pg_stat_database_conflicts_confl_snapshot_total", "confl_snapshot"),
    ("pg_stat_database_conflicts_confl_bufferpin_total", "confl_bufferpin"),
    ("pg_stat_database_conflicts_confl_deadlock_total", "confl_deadlock"),
]

_PG_BGWRITER = [
    ("pg_stat_bgwriter_checkpoints_timed_total", "counter",
     "checkpoints_timed", False),
    ("pg_stat_bgwriter_checkpoints_req_total", "counter",
     "checkpoints_req", False),
    ("pg_stat_bgwriter_checkpoint_write_time_seconds_total", "counter",
     "checkpoint_write_time", True),
    ("pg_stat_bgwriter_checkpoint_sync_time_seconds_total", "counter",
     "checkpoint_sync_time", True),
    ("pg_stat_bgwriter_buffers_checkpoint_total", "counter",
     "buffers_checkpoint", False),
    ("pg_stat_bgwriter_buffers_clean_total", "counter", "buffers_clean",
     False),
    ("pg_stat_bgwriter_maxwritten_clean_total", "counter",
     "maxwritten_clean", False),
    ("pg_stat_bgwriter_buffers_backend_total", "counter",
     "buffers_backend", False),
    ("pg_stat_bgwriter_buffers_backend_fsync_total", "counter",
     "buffers_backend_fsync", False),
    ("pg_stat_bgwriter_buffers_alloc_total", "counter", "buffers_alloc",
     False),
    ("pg_stat_bgwriter_stats_reset", "gauge", "stats_reset", False),
]


def parse_postgresql_stats(
    stat_database: list[dict] | None = None,
    stat_database_conflicts: list[dict] | None = None,
    stat_bgwriter: dict | None = None,
    namespace: str = "postgresql",
    tags: dict | None = None,
) -> list[tuple]:
    """pg_stat_database / pg_stat_database_conflicts / pg_stat_bgwriter
    rows (as dicts, from any postgres client) → metric rows with the
    reference's names (src/sources/postgresql_metrics.rs:615-870):
    per-database rows tagged ``db`` = datname ('' when NULL, as the
    reference's ``unwrap_or("")``), millisecond columns divided to
    float seconds, optional columns (checksum_*, absent on clusters
    without data checksums) skipped when missing or NULL. Timestamp
    columns (stats_reset, checksum_last_failure) are expected as epoch
    seconds; NULL skips the metric, matching the reference's
    Option<DateTime> handling."""
    rows: list[tuple] = []
    add = _rows_adder(rows, namespace, dict(tags or {}))
    for row in stat_database or []:
        db = {"db": row.get("datname") or ""}
        for name, kind, col, is_ms in _PG_STAT_DATABASE:
            v = row.get(col)
            if v is None:
                continue
            add(name, float(v) / 1000.0 if is_ms else v, db, kind)
    for row in stat_database_conflicts or []:
        db = {"db": row.get("datname") or ""}
        for name, col in _PG_CONFLICTS:
            v = row.get(col)
            if v is not None:
                add(name, v, db, "counter")
    if stat_bgwriter:
        for name, kind, col, is_ms in _PG_BGWRITER:
            v = stat_bgwriter.get(col)
            if v is None:
                continue
            add(name, float(v) / 1000.0 if is_ms else v, None, kind)
    return rows


def postgresql_metrics_source(
    spark: SparkSession,
    stat_database: list[dict] | None = None,
    stat_database_conflicts: list[dict] | None = None,
    stat_bgwriter: dict | None = None,
    namespace: str = "postgresql",
    tags: dict | None = None,
    up: bool = True,
) -> DataFrame:
    """pg_stat_* snapshot → metric DataFrame with the leading ``up``
    gauge (src/sources/postgresql_metrics.rs:543)."""
    rows = [("up", namespace, dict(tags or {}), "gauge",
             1.0 if up else 0.0)]
    if up:
        rows.extend(
            parse_postgresql_stats(
                stat_database, stat_database_conflicts, stat_bgwriter,
                namespace, tags,
            )
        )
    return spark.createDataFrame(rows, METRIC_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


# ---- demo fixtures ------------------------------------------------------
# A structurally-complete serverStatus sample (every field the mapping
# reads, distinct values so tests and the registry oracle can verify each
# one independently). Mirrors the real command's shape:
# https://docs.mongodb.com/manual/reference/command/serverStatus/
SAMPLE_SERVER_STATUS = {
    "asserts": {"regular": 1, "warning": 2, "msg": 3, "user": 4,
                "rollovers": 5},
    "connections": {"active": 6, "available": 7, "current": 8},
    "extra_info": {"heap_usage_bytes": 9, "page_faults": 10},
    "uptimeEstimate": 11, "uptime": 12.5,
    "mem": {"resident": 13, "virtual": 14, "mapped": 15,
            "mappedWithJournal": 16},
    "globalLock": {
        "totalTime": 17,
        "activeClients": {"total": 18, "readers": 19, "writers": 20},
        "currentQueue": {"total": 21, "readers": 22, "writers": 23},
    },
    "locks": {"Global": {"timeAcquiringMicros": {"r": 24, "w": 25}}},
    "metrics": {
        "cursor": {"timedOut": 26,
                   "open": {"noTimeout": 27, "pinned": 28, "total": 29}},
        "document": {"deleted": 30, "inserted": 31, "returned": 32,
                     "updated": 33},
        "getLastError": {"wtime": {"num": 34, "totalMillis": 35500},
                         "wtimeouts": 36},
        "operation": {"scanAndOrder": 37, "writeConflicts": 38},
        "queryExecutor": {"scanned": 39, "scannedObjects": 40,
                          "collectionScans": {"total": 41}},
        "record": {"moves": 42},
        "repl": {
            "apply": {"batches": {"num": 43, "totalMillis": 44999},
                      "ops": 45},
            "buffer": {"count": 46, "maxSizeBytes": 47, "sizeBytes": 48},
            "executor": {"queues": {"networkInProgress": 49,
                                    "sleepers": 50},
                         "unsignaledEvents": 51},
            "network": {"bytes": 52,
                        "getmores": {"num": 53, "totalMillis": 54000},
                        "ops": 55, "readersCreated": 56},
        },
        "ttl": {"deletedDocuments": 57, "passes": 58},
    },
    "opLatencies": {
        "reads": {"latency": 59, "ops": 60,
                  "histogram": [{"micros": 1, "count": 61},
                                {"micros": 2, "count": 62}]},
        "writes": {"latency": 63, "ops": 64,
                   "histogram": [{"micros": 1, "count": 65}]},
    },
    "storageEngine": {"name": "wiredTiger"},
    "wiredTiger": {
        "block-manager": {
            "blocks read": 70, "mapped blocks read": 71,
            "blocks pre-loaded": 72, "blocks written": 73,
            "bytes read": 74, "mapped bytes read": 75,
            "bytes written": 76,
        },
        "cache": {
            "bytes currently in the cache": 77,
            "tracked dirty bytes in the cache": 78,
            "tracked bytes belonging to internal pages in the cache": 79,
            "tracked bytes belonging to leaf pages in the cache": 80,
            "pages read into cache": 81, "pages written from cache": 82,
            "modified pages evicted": 83, "unmodified pages evicted": 84,
            "maximum bytes configured": 85, "percentage overhead": 86,
            "pages currently held in the cache": 87,
            "tracked dirty pages in the cache": 88,
        },
        "concurrentTransactions": {
            "read": {"available": 89, "out": 90, "totalTickets": 91},
            "write": {"available": 92, "out": 93, "totalTickets": 94},
        },
        "log": {
            "log bytes of payload data": 95, "log bytes written": 96,
            "log write operations": 97, "log scan operations": 98,
            "log scan records requiring two reads": 99,
            "log sync operations": 100, "log sync_dir operations": 101,
            "log flush operations": 102, "log records compressed": 103,
            "log records not compressed": 104,
            "records processed by log scan": 105,
        },
        "session": {"open session count": 106},
        "transaction": {
            "transaction checkpoint min time (msecs)": 107000,
            "transaction checkpoint max time (msecs)": 108000,
            "transaction checkpoint total time (msecs)": 109000,
            "transaction checkpoint currently running": 110,
            "transaction begins": 111, "transaction checkpoints": 112,
            "transactions committed": 113, "transactions rolled back": 114,
        },
    },
    "network": {"bytesIn": 115, "bytesOut": 116, "numRequests": 117},
    "opcounters": {"insert": 118, "query": 119},
    "opcountersRepl": {"insert": 120},
}

SAMPLE_ESDB_STATS = {
    "proc": {
        "id": 4711, "mem": 201, "cpu": 1.5, "threadsCount": 12,
        "thrownExceptionsRate": 0.0,
        "diskIo": {"readBytes": 202, "writtenBytes": 203, "readOps": 204,
                   "writeOps": 205},
    },
    "sys": {
        "freeMem": 206,
        "loadavg": {"1m": 0.1, "5m": 0.2, "15m": 0.3},
        "drive": {"/var/lib/esdb": {"availableBytes": 207,
                                    "totalBytes": 208, "usage": "42%",
                                    "usedBytes": 209}},
    },
}

SAMPLE_PG_STATS = {
    "stat_database": [
        {"datname": "postgres", "datid": 301, "numbackends": 302,
         "xact_commit": 303, "xact_rollback": 304, "blks_read": 305,
         "blks_hit": 306, "tup_returned": 307, "tup_fetched": 308,
         "tup_inserted": 309, "tup_updated": 310, "tup_deleted": 311,
         "conflicts": 312, "temp_files": 313, "temp_bytes": 314,
         "deadlocks": 315, "checksum_failures": 316,
         "checksum_last_failure": 317, "blk_read_time": 318500.0,
         "blk_write_time": 319500.0, "stats_reset": 320},
        # NULL datname (shared objects row) + no-checksums cluster
        {"datname": None, "datid": 0, "numbackends": 322,
         "xact_commit": 323, "xact_rollback": 324, "blks_read": 325,
         "blks_hit": 326, "tup_returned": 327, "tup_fetched": 328,
         "tup_inserted": 329, "tup_updated": 330, "tup_deleted": 331,
         "conflicts": 332, "temp_files": 333, "temp_bytes": 334,
         "deadlocks": 335, "checksum_failures": None,
         "checksum_last_failure": None, "blk_read_time": 336000.0,
         "blk_write_time": 337000.0, "stats_reset": None},
    ],
    "stat_database_conflicts": [
        {"datname": "postgres", "confl_tablespace": 341, "confl_lock": 342,
         "confl_snapshot": 343, "confl_bufferpin": 344,
         "confl_deadlock": 345},
    ],
    "stat_bgwriter": {
        "checkpoints_timed": 351, "checkpoints_req": 352,
        "checkpoint_write_time": 353500.0, "checkpoint_sync_time": 354500.0,
        "buffers_checkpoint": 355, "buffers_clean": 356,
        "maxwritten_clean": 357, "buffers_backend": 358,
        "buffers_backend_fsync": 359, "buffers_alloc": 360,
        "stats_reset": 361,
    },
}
