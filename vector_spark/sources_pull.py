"""Pull/poll-style sources: exec, http_client, prometheus_scrape,
host_metrics, static_metrics, stdin.

Reference components (all in `/root/reference/src/sources/`):
- `exec/mod.rs` — run a command, each stdout line becomes an event;
  scheduled mode re-runs on an interval, streaming mode tails a
  long-running process.
- `http_client/client.rs` — poll an HTTP endpoint on an interval, decode
  the body (lines / JSON array).
- `prometheus/scrape.rs` — http_client specialized to the text
  exposition format.
- `host_metrics/mod.rs` — cpu/memory/load/network gauges of the local
  host.
- `static_metrics.rs` — constant metrics from config.
- `file_descriptors/` (stdin) — read lines from stdin once.

Spark shape: each source has a BATCH snapshot builder (one poll →
DataFrame, used by the batch topology runner and tests) and the
streaming form is the registered `poll` Python DataSource
(`PollDataSource`), whose reader re-polls once per micro-batch — the
exact analog of the reference's interval scraping; the trigger interval
IS the scrape interval. Polls run driver-side (they are one fetch per
interval, not data-plane work); rows then distribute to executors for
the transform pipeline.
"""

from __future__ import annotations

import datetime
import os
import re
import subprocess
import sys
import time
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

LINES_SCHEMA = "seq bigint, ts timestamp, message string, source_type string"


def _lines_df(spark: SparkSession, lines: list[str], source_type: str) -> DataFrame:
    rows = [(i, line, source_type) for i, line in enumerate(lines)]
    df = spark.createDataFrame(rows, "seq bigint, message string, source_type string")
    return df.select(
        "seq", F.current_timestamp().alias("ts"), "message", "source_type"
    )


# ---- exec ---------------------------------------------------------------

def exec_source(
    spark: SparkSession,
    command: list[str] | str,
    timeout_secs: float = 30.0,
    include_stderr: bool = False,
) -> DataFrame:
    """One run of `command`; each stdout line → one event
    (src/sources/exec/mod.rs, scheduled mode's single tick)."""
    argv = command if isinstance(command, list) else ["sh", "-c", command]
    proc = subprocess.run(
        argv,
        capture_output=True,
        text=True,
        timeout=timeout_secs,
        check=False,
    )
    text = proc.stdout + (proc.stderr if include_stderr else "")
    lines = [ln for ln in text.splitlines() if ln]
    return _lines_df(spark, lines, "exec")


# ---- http_client / prometheus_scrape ------------------------------------

def _http_get(url: str, timeout_secs: float = 10.0,
              headers: dict | None = None, method: str = "GET",
              body: bytes | None = None) -> str:
    req = urllib.request.Request(url, headers=headers or {}, method=method,
                                 data=body)
    with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
        return resp.read().decode("utf-8", errors="replace")


def _eval_vrl_param(spark: SparkSession, expr: str) -> str:
    """Evaluate a VRL expression for a request parameter — the
    http_client config's `{value: "now()", type: vrl}` form
    (src/sources/http_client/client.rs:162,187-215: params compile as
    VRL programs and re-resolve each poll). Evaluated here per poll on
    the driver against no event (the reference runs them on an empty
    target). Timestamps render RFC3339 (the VRL display form)."""
    from pyspark.sql import functions as F2

    from vector_spark.functions.vrl_compiler import compile_vrl

    assigns = compile_vrl(f".v = {expr}")
    col = assigns[-1].expr
    probe = spark.range(1).select(col.alias("v"))
    if probe.schema[0].dataType.simpleString() == "timestamp":
        probe = spark.range(1).select(
            F2.date_format(
                F2.to_utc_timestamp(col, spark.conf.get(
                    "spark.sql.session.timeZone", "UTC")),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("v"))
    v = probe.head()[0]
    return "" if v is None else str(v)


def _resolve_param(spark: SparkSession, v):
    """Plain string | {value, type: vrl} | list of either → list[str]."""
    items = v if isinstance(v, list) else [v]
    out = []
    for item in items:
        if isinstance(item, dict) and str(item.get("type")) == "vrl":
            out.append(_eval_vrl_param(spark, str(item.get("value", ""))))
        else:
            out.append(str(item))
    return out


def http_client_source(
    spark: SparkSession,
    url: str,
    decode: str = "lines",
    timeout_secs: float = 10.0,
    headers: dict | None = None,
    query: dict | None = None,
    method: str = "GET",
    body=None,
) -> DataFrame:
    """One poll of `url` (src/sources/http_client/client.rs).
    decode: 'lines' (newline-delimited events), 'json_array' (each array
    element one event, re-encoded as a JSON string for downstream
    parse_json), or 'body' (whole body, one event).

    `query` values and `body` accept the reference's VRL parameter form
    ({value: "now()", type: vrl} — client.rs:162): expressions
    re-evaluate on every poll, enabling dynamic request construction."""
    if query:
        from urllib.parse import urlencode

        pairs = []
        for k, v in query.items():
            for rendered in _resolve_param(spark, v):
                pairs.append((k, rendered))
        url = url + ("&" if "?" in url else "?") + urlencode(pairs)
    req_body = None
    if body is not None:
        req_body = _resolve_param(spark, body)[0].encode()
    body = _http_get(url, timeout_secs, headers, method=method,
                     body=req_body)
    if decode == "lines":
        lines = [ln for ln in body.splitlines() if ln]
    elif decode == "json_array":
        import json

        items = json.loads(body)
        if not isinstance(items, list):
            items = [items]
        lines = [json.dumps(item, sort_keys=True) for item in items]
    elif decode == "body":
        lines = [body] if body else []
    else:
        raise ValueError(f"http_client: unknown decode {decode!r}")
    return _lines_df(spark, lines, "http_client")


def prometheus_scrape_source(
    spark: SparkSession, url: str, timeout_secs: float = 10.0
) -> DataFrame:
    """Scrape + decode the text exposition format into metric rows
    (src/sources/prometheus/scrape.rs); reuses the prometheus line codec."""
    from vector_spark.functions.codecs import decode_prometheus_line

    raw = http_client_source(spark, url, decode="lines", timeout_secs=timeout_secs)
    data = raw.where(~F.col("message").startswith("#"))
    parsed = data.select(
        "seq", "ts", decode_prometheus_line(F.col("message")).alias("m")
    )
    return parsed.select(
        "seq",
        "ts",
        F.col("m.name").alias("name"),
        F.col("m.labels").alias("tags"),
        F.col("m.value").alias("value"),
    ).where(F.col("name").isNotNull() & (F.col("name") != ""))


# ---- host_metrics -------------------------------------------------------

METRIC_SCHEMA = (
    "name string, namespace string, tags map<string,string>, kind string, "
    "value double"
)


def _proc_host_metrics(collectors: tuple[str, ...]) -> list[tuple]:
    """Read /proc — the same counters the reference's heim-based
    collectors expose (src/sources/host_metrics/{cpu,memory,network}.rs)."""
    rows: list[tuple] = []

    def add(name: str, value: float, tags: dict | None = None, kind: str = "gauge"):
        rows.append((name, "host", tags or {}, kind, float(value)))

    if "cpu" in collectors:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu") and line[3:4].isdigit():
                    parts = line.split()
                    cpu = parts[0]
                    names = ("user", "nice", "system", "idle", "iowait")
                    for mode, val in zip(names, parts[1:6]):
                        add(
                            "cpu_seconds_total",
                            int(val) / os.sysconf("SC_CLK_TCK"),
                            {"cpu": cpu[3:], "mode": mode},
                            kind="incremental",
                        )
    if "memory" in collectors:
        want = {
            "MemTotal": "memory_total_bytes",
            "MemFree": "memory_free_bytes",
            "MemAvailable": "memory_available_bytes",
            "Buffers": "memory_buffers_bytes",
            "Cached": "memory_cached_bytes",
            "SwapTotal": "memory_swap_total_bytes",
            "SwapFree": "memory_swap_free_bytes",
        }
        with open("/proc/meminfo") as f:
            for line in f:
                key = line.split(":")[0]
                if key in want:
                    add(want[key], int(line.split()[1]) * 1024)
    if "load" in collectors:
        with open("/proc/loadavg") as f:
            one, five, fifteen = f.read().split()[:3]
        add("load1", float(one))
        add("load5", float(five))
        add("load15", float(fifteen))
    if "filesystem" in collectors:
        # one gauge set per REAL mount (src/sources/host_metrics/
        # filesystem.rs walks the mount table the same way); pseudo
        # filesystems carry no blocks and are skipped
        mounts: list[tuple[str, str]] = [("/", "rootfs")]
        try:
            with open("/proc/mounts") as f:
                mounts = [
                    (p[1], p[2]) for p in
                    (line.split() for line in f) if len(p) >= 3
                ]
        except OSError:
            pass
        seen_mounts = set()
        for mountpoint, fstype in mounts:
            if mountpoint in seen_mounts:
                continue
            seen_mounts.add(mountpoint)
            try:
                st = os.statvfs(mountpoint)
            except OSError:
                continue
            if st.f_blocks == 0:
                continue  # proc/sysfs/cgroup pseudo-mounts
            tags = {"mountpoint": mountpoint, "filesystem": fstype}
            add("filesystem_total_bytes", st.f_blocks * st.f_frsize,
                tags)
            add("filesystem_free_bytes", st.f_bfree * st.f_frsize,
                tags)
            add("filesystem_used_bytes",
                (st.f_blocks - st.f_bfree) * st.f_frsize, tags)
    if "network" in collectors:
        with open("/proc/net/dev") as f:
            for line in f.readlines()[2:]:
                iface, data = line.split(":")
                fields = data.split()
                tags = {"device": iface.strip()}
                add("network_receive_bytes_total", int(fields[0]), tags,
                    kind="incremental")
                add("network_transmit_bytes_total", int(fields[8]), tags,
                    kind="incremental")
    if "disk" in collectors:
        # /proc/diskstats → the reference's four disk counters
        # (src/sources/host_metrics/disk.rs); sectors are 512 bytes by
        # kernel contract regardless of device sector size
        try:
            with open("/proc/diskstats") as f:
                for line in f:
                    p = line.split()
                    if len(p) < 10:
                        continue
                    tags = {"device": p[2]}
                    add("disk_reads_completed_total", int(p[3]), tags,
                        kind="incremental")
                    add("disk_read_bytes_total", int(p[5]) * 512, tags,
                        kind="incremental")
                    add("disk_writes_completed_total", int(p[7]), tags,
                        kind="incremental")
                    add("disk_written_bytes_total", int(p[9]) * 512,
                        tags, kind="incremental")
        except OSError:
            pass
    if "tcp" in collectors:
        # /proc/net/tcp[6] → connection counts per state + queued bytes
        # (src/sources/host_metrics/tcp.rs reads the same socket table
        # via netlink sock_diag; the counters match)
        states = {
            "01": "established", "02": "syn_sent", "03": "syn_recv",
            "04": "fin_wait1", "05": "fin_wait2", "06": "time_wait",
            "07": "close", "08": "close_wait", "09": "last_ack",
            "0A": "listen", "0B": "closing",
        }
        counts: dict[str, int] = {}
        tx = rx = 0
        for path in ("/proc/net/tcp", "/proc/net/tcp6"):
            try:
                with open(path) as f:
                    for line in f.readlines()[1:]:
                        p = line.split()
                        st = states.get(p[3].upper(), "unknown")
                        counts[st] = counts.get(st, 0) + 1
                        txq, _, rxq = p[4].partition(":")
                        tx += int(txq, 16)
                        rx += int(rxq, 16)
            except OSError:
                continue
        for st, n in sorted(counts.items()):
            add("tcp_connections_total", n, {"state": st})
        add("tcp_tx_queued_bytes_total", tx)
        add("tcp_rx_queued_bytes_total", rx)
    if "process" in collectors:
        # /proc/[pid]/stat → the reference's four per-process metrics
        # (src/sources/host_metrics/process.rs)
        tck = os.sysconf("SC_CLK_TCK")
        page = os.sysconf("SC_PAGE_SIZE")
        try:
            with open("/proc/uptime") as f:
                uptime = float(f.read().split()[0])
        except OSError:
            uptime = 0.0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    raw = f.read()
            except OSError:
                continue  # process exited mid-scan
            # comm may contain spaces/parens: split after the LAST ')'
            head, _, rest = raw.rpartition(")")
            comm = head.split("(", 1)[1] if "(" in head else "?"
            p = rest.split()
            # fields after comm: state=0, ... utime=11 stime=12 (0-idx)
            tags = {"pid": pid, "command": comm}
            add("process_cpu_usage",
                (int(p[11]) + int(p[12])) / tck, tags)
            add("process_memory_usage", int(p[21]) * page, tags)
            add("process_memory_virtual_usage", int(p[20]), tags)
            starttime = int(p[19]) / tck
            add("process_runtime", max(uptime - starttime, 0.0), tags)
    if "temperature" in collectors:
        # /sys/class/thermal zones (src/sources/host_metrics/
        # temperature.rs); absent on most containers/VMs → no rows
        import glob as _glob

        for zone in sorted(_glob.glob(
                "/sys/class/thermal/thermal_zone*")):
            try:
                with open(f"{zone}/temp") as f:
                    milli = int(f.read().strip())
                with open(f"{zone}/type") as f:
                    ztype = f.read().strip()
            except (OSError, ValueError):
                continue
            add("temperature_degrees_celsius", milli / 1000.0,
                {"zone": zone.rsplit("/", 1)[1], "type": ztype})
    if "cgroups" in collectors:
        # cgroup v2 unified hierarchy (src/sources/host_metrics/
        # cgroups.rs reads the same cpu.stat / memory files)
        root = "/sys/fs/cgroup"
        tags = {"cgroup": "/"}
        try:
            with open(f"{root}/cpu.stat") as f:
                stat = dict(
                    line.split() for line in f if len(line.split()) == 2
                )
            for key, name in (
                ("usage_usec", "cgroup_cpu_usage_seconds_total"),
                ("user_usec", "cgroup_cpu_user_seconds_total"),
                ("system_usec", "cgroup_cpu_system_seconds_total"),
            ):
                if key in stat:
                    add(name, int(stat[key]) / 1e6, tags,
                        kind="incremental")
        except OSError:
            pass
        try:
            with open(f"{root}/memory.current") as f:
                add("cgroup_memory_current_bytes", int(f.read()), tags)
            with open(f"{root}/memory.stat") as f:
                mstat = dict(
                    line.split() for line in f if len(line.split()) == 2
                )
            for key, name in (
                ("anon", "cgroup_memory_anon_bytes"),
                ("file", "cgroup_memory_file_bytes"),
            ):
                if key in mstat:
                    add(name, int(mstat[key]), tags)
        except OSError:
            pass
    return rows


def host_metrics_source(
    spark: SparkSession,
    collectors: tuple[str, ...] = ("cpu", "memory", "load", "network"),
) -> DataFrame:
    """Snapshot of local host gauges/counters as metric-schema rows.
    Reads the DRIVER's /proc — same single-host semantics as the
    reference agent; on a cluster each executor host would run its own
    agent topology."""
    rows = _proc_host_metrics(collectors)
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return df.withColumn("ts", F.current_timestamp())


# ---- vendor status-page pollers (apache / nginx) ------------------------

# Apache scoreboard characters → worker-state tag values
# (src/sources/apache_metrics/parser.rs:7 SCOREBOARD)
_APACHE_SCOREBOARD = {
    "_": "waiting", "S": "starting", "R": "reading", "W": "sending",
    "K": "keepalive", "D": "dnslookup", "C": "closing", "L": "logging",
    "G": "finishing", "I": "idle_cleanup", ".": "open",
}


def parse_apache_status(
    payload: str, namespace: str = "apache", tags: dict | None = None
) -> list[tuple]:
    """Apache mod_status `?auto` (machine-readable) body → metric rows.

    Same field mapping as the reference's parser
    (src/sources/apache_metrics/parser.rs:110 `parse` +
    `StatusFieldStatistic::from_key_value`): duplicate keys last-win
    (mod_status repeats BusyWorkers/IdleWorkers), `Total kBytes` scales
    to bytes, CPU splits into a `type` tag, Scoreboard explodes into
    per-state `scoreboard` gauges covering every known state (0 when
    absent). Unknown keys are ignored, unparseable values skipped."""
    tags = dict(tags or {})
    parsed: dict[str, str] = {}
    for line in payload.splitlines():
        key, sep, value = line.partition(":")
        if sep:
            parsed[key] = value.strip()

    rows: list[tuple] = []

    def add(name: str, value: float, extra: dict | None = None, kind: str = "gauge"):
        rows.append((name, namespace, {**tags, **(extra or {})}, kind, float(value)))

    _num = {"ServerUptimeSeconds": ("uptime_seconds_total", "counter", 1, None),
            "Total Accesses": ("access_total", "counter", 1, None),
            "Total kBytes": ("sent_bytes_total", "counter", 1024, None),
            "Total Duration": ("duration_seconds_total", "counter", 1, None),
            "CPUUser": ("cpu_seconds_total", "gauge", 1, {"type": "user"}),
            "CPUSystem": ("cpu_seconds_total", "gauge", 1, {"type": "system"}),
            "CPUChildrenUser": ("cpu_seconds_total", "gauge", 1,
                                {"type": "children_user"}),
            "CPUChildrenSystem": ("cpu_seconds_total", "gauge", 1,
                                  {"type": "children_system"}),
            "CPULoad": ("cpu_load", "gauge", 1, None),
            "IdleWorkers": ("workers", "gauge", 1, {"state": "idle"}),
            "BusyWorkers": ("workers", "gauge", 1, {"state": "busy"}),
            "ConnsTotal": ("connections", "gauge", 1, {"state": "total"}),
            "ConnsAsyncWriting": ("connections", "gauge", 1, {"state": "writing"}),
            "ConnsAsyncClosing": ("connections", "gauge", 1, {"state": "closing"}),
            "ConnsAsyncKeepAlive": ("connections", "gauge", 1,
                                    {"state": "keepalive"})}
    for key, value in parsed.items():
        spec = _num.get(key)
        if spec is not None:
            name, kind, scale, extra = spec
            try:
                add(name, float(value) * scale, extra, kind)
            except ValueError:
                continue
        elif key == "Scoreboard":
            counts: dict[str, int] = {}
            for c in value:
                counts[c] = counts.get(c, 0) + 1
            for c, state in _APACHE_SCOREBOARD.items():
                add("scoreboard", counts.get(c, 0), {"state": state})
    return rows


def apache_metrics_source(
    spark: SparkSession,
    url: str,
    namespace: str = "apache",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """One poll of an Apache mod_status endpoint → metric rows
    (src/sources/apache_metrics/mod.rs; endpoint + host tags as there).
    Driver-side fetch+parse is the right scale shape: one tiny text body
    per endpoint per interval — the data never needs executors."""
    from urllib.parse import urlparse

    body = _http_get(url, timeout_secs)
    host = urlparse(url).netloc
    rows = parse_apache_status(
        body, namespace=namespace, tags={"endpoint": url, "host": host}
    )
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return df.withColumn("ts", F.current_timestamp())


def parse_nginx_stub_status(payload: str) -> dict | None:
    """nginx stub_status body → dict of the seven counters, or None when
    the body is not a stub_status page (the reference's nom parser,
    src/sources/nginx_metrics/parser.rs:37 `TryFrom<&str>`)."""
    m = re.match(
        r"Active connections:\s+(\d+)\s*\n"
        r"server accepts handled requests\s*\n"
        r"\s*(\d+)\s+(\d+)\s+(\d+)\s*\n"
        r"Reading:\s*(\d+)\s+Writing:\s*(\d+)\s+Waiting:\s*(\d+)",
        payload,
    )
    if not m:
        return None
    active, accepts, handled, requests, reading, writing, waiting = (
        int(g) for g in m.groups()
    )
    return {
        "active": active, "accepts": accepts, "handled": handled,
        "requests": requests, "reading": reading, "writing": writing,
        "waiting": waiting,
    }


def nginx_metrics_source(
    spark: SparkSession,
    url: str,
    namespace: str = "nginx",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """One poll of an nginx stub_status endpoint → metric rows with the
    reference's names (src/sources/nginx_metrics/mod.rs:236) plus the
    `up` gauge (…:203): 1 when the fetch+parse succeeded, 0 otherwise —
    a failed poll still emits `up 0` so alerting sees the outage."""
    from urllib.parse import urlparse

    tags = {"endpoint": url, "host": urlparse(url).netloc}
    status = None
    try:
        status = parse_nginx_stub_status(_http_get(url, timeout_secs))
    except Exception:
        pass
    rows: list[tuple] = [
        ("up", namespace, tags, "gauge", 1.0 if status is not None else 0.0)
    ]
    if status is not None:
        for name, key, kind in (
            ("connections_active", "active", "gauge"),
            ("connections_accepted_total", "accepts", "counter"),
            ("connections_handled_total", "handled", "counter"),
            ("http_requests_total", "requests", "counter"),
            ("connections_reading", "reading", "gauge"),
            ("connections_writing", "writing", "gauge"),
            ("connections_waiting", "waiting", "gauge"),
        ):
            rows.append((name, namespace, tags, kind, float(status[key])))
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return df.withColumn("ts", F.current_timestamp())


def static_metrics_source(spark: SparkSession, metrics: list[dict]) -> DataFrame:
    """Constant metrics from config (src/sources/static_metrics.rs)."""
    rows = [
        (
            m["name"],
            m.get("namespace", "static"),
            dict(m.get("tags") or {}),
            m.get("kind", "gauge"),
            float(m.get("value", 0.0)),
        )
        for m in metrics
    ]
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return df.withColumn("ts", F.current_timestamp())


# ---- stdin / file descriptors -------------------------------------------

def stdin_source(spark: SparkSession, stream=None) -> DataFrame:
    """Read all lines from stdin (or any file-like) once —
    src/sources/file_descriptors/ (stdin variant). Batch-only by nature."""
    stream = stream if stream is not None else sys.stdin
    lines = [ln.rstrip("\n") for ln in stream if ln.strip()]
    return _lines_df(spark, lines, "stdin")


def file_descriptor_source(spark: SparkSession, fd: int) -> DataFrame:
    """Read all lines from an inherited file descriptor once —
    src/sources/file_descriptors/file_descriptor.rs (`fd` config
    field). The reference wraps the raw fd in a buffered reader and
    streams lines exactly like its stdin sibling; so does this."""
    import os

    with os.fdopen(fd, "r", errors="replace") as stream:
        lines = [ln.rstrip("\n") for ln in stream if ln.strip()]
    return _lines_df(spark, lines, "file_descriptor")


# ---- streaming: the `poll` DataSource -----------------------------------

class _PollStreamReader(SimpleDataSourceStreamReader):
    """Re-poll once per micro-batch. Offsets are (batch ordinal, rows
    emitted); each poll's rows are NEW events (a scrape is a snapshot, so
    recovery re-polls rather than replaying — matching the reference,
    where a missed scrape interval is simply missed)."""

    def __init__(self, options: dict) -> None:
        self.mode = options.get("mode", "exec")
        self.command = options.get("command")
        self.url = options.get("url")
        self.decode = options.get("decode", "lines")
        self.min_interval = float(options.get("min_interval_secs", 0.0))
        self._last_poll = 0.0

    def __getstate__(self) -> dict:
        return {
            "mode": self.mode,
            "command": self.command,
            "url": self.url,
            "decode": self.decode,
            "min_interval": self.min_interval,
        }

    def __setstate__(self, d: dict) -> None:
        self.__dict__.update(d)
        self._last_poll = 0.0

    def _poll(self) -> list[str]:
        if self.mode == "exec":
            proc = subprocess.run(
                ["sh", "-c", self.command], capture_output=True, text=True,
                timeout=30, check=False,
            )
            return [ln for ln in proc.stdout.splitlines() if ln]
        body = _http_get(self.url)
        if self.decode == "lines":
            return [ln for ln in body.splitlines() if ln]
        return [body] if body else []

    def initialOffset(self) -> dict:
        return {"batch": 0, "seq": 0}

    def read(self, start: dict) -> tuple:
        now = time.monotonic()
        if self.min_interval and now - self._last_poll < self.min_interval:
            return iter(()), start
        self._last_poll = now
        try:
            lines = self._poll()
        except Exception:
            lines = []  # a failed scrape emits nothing; next tick retries
        base = start["seq"]
        now_ts = datetime.datetime.now()
        rows = [
            (base + i, now_ts, line, f"poll_{self.mode}")
            for i, line in enumerate(lines)
        ]
        end = {"batch": start["batch"] + 1, "seq": base + len(rows)}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # snapshot semantics: a replayed range cannot be re-observed;
        # emit nothing (documented delta vs WAL-backed push sources)
        return iter(())

    def commit(self, end: dict) -> None:
        pass


class PollDataSource(DataSource):
    """format('poll'): exec / http_client / prometheus scrape driver.
    options: mode=exec|http, command=..., url=..., decode=lines|body."""

    @classmethod
    def name(cls) -> str:
        return "poll"

    def schema(self) -> str:
        return LINES_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _PollStreamReader:
        return _PollStreamReader(self.options)


def register_poll_source(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(PollDataSource)
    except Exception:
        pass  # already registered


# ---- internal_metrics / internal_logs -----------------------------------

def internal_metrics_source(spark: SparkSession, listener=None) -> DataFrame:
    """The engine's own telemetry as metric rows
    (src/sources/internal_metrics.rs: vector emits its component counters
    back into the topology; `vector top` reads the same numbers).

    Spark mapping: per-streaming-query progress from a TopListener
    (streaming/monitor.py) when one is registered, plus executor/core
    gauges from the SparkContext — snapshot form, so a topology can route
    its own throughput through transforms/sinks like any other metrics."""
    rows: list[tuple] = []
    sc = spark.sparkContext
    rows.append(("spark_default_parallelism", "internal", {}, "gauge",
                 float(sc.defaultParallelism)))
    try:
        n_execs = len(sc._jsc.sc().statusTracker().getExecutorInfos())
        rows.append(("spark_executors", "internal", {}, "gauge", float(n_execs)))
    except Exception:
        pass
    for q in spark.streams.active:
        tags = {"query": q.name or q.id}
        rows.append(("stream_query_active", "internal", tags, "gauge", 1.0))
        progress = q.lastProgress
        if progress:
            rows.append(
                ("events_in_total", "internal", tags, "incremental",
                 float(progress.get("numInputRows") or 0))
            )
            rows.append(
                ("events_per_second", "internal", tags, "gauge",
                 float(progress.get("processedRowsPerSecond") or 0.0))
            )
    if listener is not None:
        for s in listener.stats.values():
            tags = {"query": s.name}
            rows.append(("component_received_events_total", "internal", tags,
                         "incremental", float(s.total_rows)))
            rows.append(("component_batches_total", "internal", tags,
                         "incremental", float(s.n_batches)))
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return df.withColumn("ts", F.current_timestamp())


# ---- kubernetes_logs ----------------------------------------------------

# CRI log line (src/sources/kubernetes_logs/parser/cri.rs:148):
# `<ts> <stdout|stderr> <P|F> <message>`; P = partial line, F = final.
_CRI_RE = r"^(\S+) (stdout|stderr) (P|F) (.*)$"
# pod dir layout (path_helpers.rs): /var/log/pods/<ns>_<pod>_<uid>/<container>/N.log
_POD_PATH_RE = r"/pods/([^_/]+)_([^_/]+)_([^/]+)/([^/]+)/"


def kubernetes_logs_source(
    spark: SparkSession, path_glob: str, log_format: str = "cri"
) -> DataFrame:
    """`kubernetes_logs` analog (src/sources/kubernetes_logs/): read pod
    log files, parse the CRI (or docker JSON-file) line format, reassemble
    CRI partial lines (P…P F → one event), and lift pod metadata out of
    the file path.

    Ordering note: partial-line reassembly needs within-file order.
    Kubelet rotates pod logs at 10 MB, far below a scan split, so each
    file is exactly one split and monotonically_increasing_id gives the
    in-file line order — this holds at any cluster size because the bound
    is per-file, not per-dataset."""
    raw = (
        spark.read.text(path_glob)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("_seq"),
            F.col("value"),
        )
    )
    meta = [
        F.regexp_extract("file", _POD_PATH_RE, 1).alias("pod_namespace"),
        F.regexp_extract("file", _POD_PATH_RE, 2).alias("pod_name"),
        F.regexp_extract("file", _POD_PATH_RE, 3).alias("pod_uid"),
        F.regexp_extract("file", _POD_PATH_RE, 4).alias("container_name"),
    ]
    if log_format == "docker":
        # docker json-file driver: {"log": "...\n", "stream": "...", "time": "..."}
        e = F.from_json(
            "value", "log string, stream string, time string"
        )
        return raw.select(
            "file",
            *meta,
            F.to_timestamp(e["time"]).alias("ts"),
            e["stream"].alias("stream"),
            F.regexp_replace(e["log"], r"\n$", "").alias("message"),
        )
    if log_format != "cri":
        raise ValueError(f"kubernetes_logs: unknown format {log_format!r}")
    parsed = raw.select(
        "file",
        "_seq",
        *meta,
        F.regexp_extract("value", _CRI_RE, 1).alias("_ts_raw"),
        F.regexp_extract("value", _CRI_RE, 2).alias("stream"),
        F.regexp_extract("value", _CRI_RE, 3).alias("_tag"),
        F.regexp_extract("value", _CRI_RE, 4).alias("_msg"),
    ).where(F.col("_tag") != "")
    # group id: a new group starts right after an F line — cumulative count
    # of PRIOR F lines within (file, stream) identifies each P…PF run
    from pyspark.sql import Window

    w = (
        Window.partitionBy("file", "stream")
        .orderBy("_seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = parsed.withColumn(
        "_grp", F.coalesce(F.sum(F.when(F.col("_tag") == "F", 1).otherwise(0)).over(w), F.lit(0))
    )
    return (
        grouped.groupBy("file", "stream", "_grp")
        .agg(
            F.min_by(F.col("_ts_raw"), F.col("_seq")).alias("_ts_raw"),
            F.min_by(F.col("pod_namespace"), F.col("_seq")).alias("pod_namespace"),
            F.min_by(F.col("pod_name"), F.col("_seq")).alias("pod_name"),
            F.min_by(F.col("pod_uid"), F.col("_seq")).alias("pod_uid"),
            F.min_by(F.col("container_name"), F.col("_seq")).alias("container_name"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_seq").alias("o"), F.col("_msg").alias("m")))
                    ),
                    lambda s: s["m"],
                ),
                "",
            ).alias("message"),
            F.min("_seq").alias("_order"),
        )
        .select(
            "file",
            "pod_namespace",
            "pod_name",
            "pod_uid",
            "container_name",
            "stream",
            F.to_timestamp(F.regexp_replace("_ts_raw", r"Z$", "+00:00")).alias("ts"),
            "message",
            "_order",
        )
    )


# ---- journald (env-gated on the journalctl binary) ----------------------

def journald_source(
    spark: SparkSession, units: list[str] | None = None, max_entries: int = 10000
) -> DataFrame:
    """`journald` source (src/sources/journald/): shells out to
    `journalctl -o json` (the reference does exactly this — it spawns
    journalctl rather than linking libsystemd) and decodes one JSON event
    per line. Env-gated: raises with a clear message when the binary is
    absent (containers without systemd)."""
    import shutil

    if shutil.which("journalctl") is None:
        raise RuntimeError(
            "journald source requires the journalctl binary, which is not "
            "present in this environment (env-gated, like protobuf — see "
            "scripts/probe_protobuf.py for the pattern)"
        )
    cmd = ["journalctl", "-o", "json", "-n", str(max_entries), "--no-pager"]
    for u in units or []:
        cmd += ["-u", u]
    df = exec_source(spark, cmd)
    e = F.from_json(
        "message",
        "MESSAGE string, _SYSTEMD_UNIT string, _HOSTNAME string, "
        "PRIORITY string, __REALTIME_TIMESTAMP string",
    )
    return df.select(
        "seq",
        F.timestamp_micros(e["__REALTIME_TIMESTAMP"].cast("long")).alias("ts"),
        e["MESSAGE"].alias("message"),
        e["_SYSTEMD_UNIT"].alias("unit"),
        e["_HOSTNAME"].alias("host"),
        e["PRIORITY"].try_cast("int").alias("priority"),
    )


# ---- AWS ECS task-metadata stats (docker-stats JSON) --------------------

# cgroup blkio list name → (metric suffix, divisor) — time stats arrive
# in ns (io_service_time, io_wait_time) or ms (io_time); the reference
# converts to seconds (src/sources/aws_ecs_metrics/parser.rs:169-259)
_ECS_BLKIO = [
    ("io_merged_recursive", "recursive_io_merged_total", 1),
    ("io_queue_recursive", "recursive_io_queued_total", 1),
    ("io_service_bytes_recursive", "recursive_io_service_bytes_total", 1),
    ("io_service_time_recursive",
     "recursive_io_service_time_seconds_total", 1e9),
    ("io_serviced_recursive", "recursive_io_serviced_total", 1),
    ("io_time_recursive", "recursive_io_time_seconds_total", 1e3),
    ("io_wait_time_recursive",
     "recursive_io_wait_time_seconds_total", 1e9),
    ("sectors_recursive", "recursive_sectors_total", 1),
]

_ECS_MEM_GAUGES = [
    ("used_bytes", "usage"), ("max_used_bytes", "max_usage"),
    ("limit_bytes", "limit"),
]
_ECS_MEM_STAT_GAUGES = [
    ("active_anonymous_bytes", "active_anon"),
    ("active_file_bytes", "active_file"), ("cache_bytes", "cache"),
    ("dirty_bytes", "dirty"),
    ("inactive_anonymous_bytes", "inactive_anon"),
    ("inactive_file_bytes", "inactive_file"),
    ("mapped_file_bytes", "mapped_file"), ("rss_bytes", "rss"),
    ("rss_hugepages_bytes", "rss_huge"),
    ("unevictable_bytes", "unevictable"),
    ("writeback_bytes", "writeback"),
    ("total_active_anonymous_bytes", "total_active_anon"),
    ("total_active_file_bytes", "total_active_file"),
    ("total_cache_bytes", "total_cache"),
    ("total_dirty_bytes", "total_dirty"),
    ("total_inactive_anonymous_bytes", "total_inactive_anon"),
    ("total_inactive_file_bytes", "total_inactive_file"),
    ("total_mapped_file_bytes", "total_mapped_file"),
    ("total_rss_bytes", "total_rss"),
    ("total_rss_hugepages_bytes", "total_rss_huge"),
    ("total_unevictable_bytes", "total_unevictable"),
    ("total_writeback_bytes", "total_writeback"),
    ("hierarchical_memory_limit_bytes", "hierarchical_memory_limit"),
    ("hierarchical_memsw_limit_bytes", "hierarchical_memsw_limit"),
]
_ECS_MEM_STAT_COUNTERS = [
    ("page_faults_total", "pgfault"),
    ("major_faults_total", "pgmajfault"),
    ("page_charged_total", "pgpgin"),
    ("page_uncharged_total", "pgpgout"),
    ("total_page_faults_total", "total_pgfault"),
    ("total_major_faults_total", "total_pgmajfault"),
    ("total_page_charged_total", "total_pgpgin"),
    ("total_page_uncharged_total", "total_pgpgout"),
]
_ECS_NET = [
    ("receive_bytes_total", "rx_bytes"),
    ("receive_packets_total", "rx_packets"),
    ("receive_packets_drop_total", "rx_dropped"),
    ("receive_errs_total", "rx_errors"),
    ("transmit_bytes_total", "tx_bytes"),
    ("transmit_packets_total", "tx_packets"),
    ("transmit_packets_drop_total", "tx_dropped"),
    ("transmit_errs_total", "tx_errors"),
]


def parse_docker_stats(
    payload: str, namespace: str = "awsecs", tags: dict | None = None
) -> list[tuple]:
    """ECS task-metadata ``/stats`` body ({container_id: docker stats})
    → metric rows, the reference's exact mapping
    (src/sources/aws_ecs_metrics/parser.rs): blkio lists tagged
    device="major:minor" + lowercased op with time stats converted to
    seconds; cpu/precpu jiffy counters incl. per-cpu (index-tagged,
    bounded by online_cpus) and throttling (throttled_time ns→s);
    memory gauges + page-event counters; per-interface network counters.
    Missing/null sub-objects skip silently (the reference's Option
    fields); non-container entries (empty/null payloads) are ignored."""
    import json as _json

    doc = _json.loads(payload)
    rows: list[tuple] = []
    for container_id, stats in sorted((doc or {}).items()):
        if not isinstance(stats, dict) or not stats:
            continue
        base = {**(tags or {}), "container_id": container_id}
        if stats.get("name"):
            base["container_name"] = stats["name"]

        def add(prefix, name, value, kind, extra=None):
            rows.append((
                f"{prefix}_{name}", namespace,
                {**base, **(extra or {})}, kind, float(value),
            ))

        for list_name, suffix, div in _ECS_BLKIO:
            for item in (stats.get("blkio_stats") or {}).get(
                list_name
            ) or []:
                add("blkio", suffix, item["value"] / div, "counter",
                    {"device": f"{item['major']}:{item['minor']}",
                     "op": item["op"].lower()})
        for prefix in ("cpu", "precpu"):
            cpu = stats.get(f"{prefix}_stats") or {}
            if cpu.get("online_cpus") is not None:
                add(prefix, "online_cpus", cpu["online_cpus"], "gauge")
            if cpu.get("system_cpu_usage") is not None:
                add(prefix, "usage_system_jiffies_total",
                    cpu["system_cpu_usage"], "counter")
            usage = cpu.get("cpu_usage") or {}
            for suffix, key in (
                ("usage_usermode_jiffies_total", "usage_in_usermode"),
                ("usage_kernelmode_jiffies_total", "usage_in_kernelmode"),
                ("usage_total_jiffies_total", "total_usage"),
            ):
                if usage.get(key) is not None:
                    add(prefix, suffix, usage[key], "counter")
            thr = cpu.get("throttling_data") or {}
            for suffix, key, div in (
                ("throttling_periods_total", "periods", 1),
                ("throttled_periods_total", "throttled_periods", 1),
                ("throttled_time_seconds_total", "throttled_time", 1e9),
            ):
                if thr.get(key) is not None:
                    add(prefix, suffix, thr[key] / div, "counter")
            percpu = usage.get("percpu_usage") or []
            for index in range(int(cpu.get("online_cpus") or 0)):
                if index < len(percpu):
                    add(prefix, "usage_percpu_jiffies_total",
                        percpu[index], "counter", {"cpu": str(index)})
        mem = stats.get("memory_stats") or {}
        for suffix, key in _ECS_MEM_GAUGES:
            if mem.get(key) is not None:
                add("memory", suffix, mem[key], "gauge")
        ext = mem.get("stats") or {}
        for suffix, key in _ECS_MEM_STAT_GAUGES:
            if ext.get(key) is not None:
                add("memory", suffix, ext[key], "gauge")
        for suffix, key in _ECS_MEM_STAT_COUNTERS:
            if ext.get(key) is not None:
                add("memory", suffix, ext[key], "counter")
        for interface in sorted(stats.get("networks") or {}):
            net = stats["networks"][interface] or {}
            for suffix, key in _ECS_NET:
                if net.get(key) is not None:
                    add("network", suffix, net[key], "counter",
                        {"device": interface})
    return rows


def aws_ecs_metrics_source(
    spark: SparkSession,
    url: str = "http://169.254.170.2/v4/stats",
    namespace: str = "awsecs",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """One poll of the ECS task-metadata stats endpoint
    (src/sources/aws_ecs_metrics/mod.rs — v2/v3/v4 share the /stats
    path shape; pass the URI the task environment advertises)."""
    body = _http_get(url, timeout_secs)
    rows = parse_docker_stats(body, namespace=namespace)
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return df.withColumn("ts", F.current_timestamp())


# ---- docker_logs (Docker Engine HTTP API over the unix socket) ----------


def _docker_http_get(socket_path: str, path: str,
                     timeout_secs: float = 10.0) -> bytes:
    """Minimal HTTP/1.1 GET over a unix socket (the Engine API is plain
    HTTP; no docker client library needed). Handles Content-Length and
    chunked transfer encoding."""
    import http.client
    import socket as _socket

    class _UnixConn(http.client.HTTPConnection):
        def __init__(self):
            super().__init__("localhost", timeout=timeout_secs)

        def connect(self):
            sock = _socket.socket(_socket.AF_UNIX, _socket.SOCK_STREAM)
            sock.settimeout(timeout_secs)
            sock.connect(socket_path)
            self.sock = sock

    conn = _UnixConn()
    try:
        conn.request("GET", path)
        resp = conn.getresponse()
        body = resp.read()
        if resp.status >= 400:
            raise ConnectionError(
                f"docker API {path}: HTTP {resp.status} "
                f"{body[:200]!r}"
            )
        return body
    finally:
        conn.close()


def demux_docker_stream(data: bytes) -> list[tuple[str, bytes]]:
    """Demultiplex the Engine log stream: 8-byte frames
    [stream_type u8, 0,0,0, size u32 BE] + payload, stream_type 1 =
    stdout, 2 = stderr (the non-TTY attach format the reference's
    container log stream decodes). A body that doesn't start with a
    valid frame header is treated as a raw TTY stream (single stdout
    chunk)."""
    frames: list[tuple[str, bytes]] = []
    pos = 0
    if not data:
        return frames
    if data[0] not in (0, 1, 2) or data[1:4] != b"\x00\x00\x00":
        return [("stdout", data)]
    while pos + 8 <= len(data):
        stream_type = data[pos]
        size = int.from_bytes(data[pos + 4:pos + 8], "big")
        payload = data[pos + 8:pos + 8 + size]
        frames.append(
            ("stderr" if stream_type == 2 else "stdout", payload)
        )
        pos += 8 + size
    return frames


def docker_logs_source(
    spark: SparkSession,
    socket_path: str = "/var/run/docker.sock",
    include_containers: list[str] | None = None,
    exclude_containers: list[str] | None = None,
    include_images: list[str] | None = None,
    include_labels: list[str] | None = None,
    tail: int = 1000,
    timeout_secs: float = 10.0,
) -> DataFrame:
    """One sweep of running containers' logs via the Engine API
    (reference src/sources/docker_logs/mod.rs): list containers, apply
    the reference's filters (name/id prefix include+exclude, exact
    image match, label k=v match), fetch each log with timestamps, and
    demux stdout/stderr. Events carry container_id, container_name,
    image, stream, and the label map — the reference's field set
    (mod.rs:60-64).

    Scale shape: the Engine socket is per-host by definition — on a
    cluster each node's collector daemon runs its own sweep; this
    driver-side poll is the single-host analog (same stance as
    kubernetes_logs' file tail)."""
    import json as _json

    containers = _json.loads(
        _docker_http_get(socket_path, "/containers/json", timeout_secs)
    )
    rows: list[tuple] = []
    seq = 0
    for c in containers:
        cid = c.get("Id", "")
        name = (c.get("Names") or ["/"])[0].lstrip("/")
        image = c.get("Image", "")
        labels = c.get("Labels") or {}
        if include_containers is not None and not any(
            name.startswith(p) or cid.startswith(p)
            for p in include_containers
        ):
            continue
        if exclude_containers is not None and any(
            name.startswith(p) or cid.startswith(p)
            for p in exclude_containers
        ):
            continue
        if include_images is not None and image not in include_images:
            continue
        if include_labels is not None:
            want = dict(s.split("=", 1) for s in include_labels)
            if not all(labels.get(k) == v for k, v in want.items()):
                continue
        body = _docker_http_get(
            socket_path,
            f"/containers/{cid}/logs?stdout=true&stderr=true"
            f"&timestamps=true&tail={tail}",
            timeout_secs,
        )
        for stream, chunk in demux_docker_stream(body):
            for line in chunk.decode("utf-8", "replace").splitlines():
                if not line:
                    continue
                # docker prepends an RFC3339Nano timestamp + space
                ts_str, _, message = line.partition(" ")
                rows.append((message, cid, name, image, stream,
                             labels, ts_str, "docker", seq))
                seq += 1
    return spark.createDataFrame(
        rows,
        "message string, container_id string, container_name string,"
        " image string, stream string, labels map<string,string>,"
        " timestamp string, source_type string, seq long",
    )


# ---- okta system-log poll (cursor-paged HTTP) ----------------------------


def _find_rel_next_link(header: str) -> str | None:
    """Okta Link header → the rel="next" URL
    (src/sources/okta/client.rs:102)."""
    for part in header.split(","):
        part = part.strip()
        if 'rel="next"' in part and part.startswith("<"):
            end = part.find(">")
            if end > 0:
                return part[1:end]
    return None


def okta_logs_source(
    spark: SparkSession,
    domain: str,
    token: str,
    since_secs: float | None = None,
    max_pages: int = 10,
    timeout_secs: float = 10.0,
) -> DataFrame:
    """One sweep of Okta's System Log API (reference src/sources/okta/):
    GET {domain}/api/v1/logs?since=<rfc3339>, authenticated with the
    ``SSWS`` token scheme, following the Link rel="next" cursor until a
    page comes back empty (Okta always returns a next link, so the
    empty page — not link absence — ends the sweep, client.rs:282-283).
    Each log entry (a JSON object) becomes one event's ``message``."""
    import json as _json
    import urllib.request
    from datetime import datetime, timedelta, timezone
    from urllib.parse import quote

    url = f"{domain.rstrip('/')}/api/v1/logs"
    if since_secs is not None:
        since = datetime.now(timezone.utc) - timedelta(seconds=since_secs)
        url += "?since=" + quote(
            since.isoformat(timespec="seconds"), safe=""
        )
    rows: list[tuple] = []
    for _page in range(max_pages):
        req = urllib.request.Request(
            url, headers={"Authorization": f"SSWS {token}",
                          "Accept": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
            body = resp.read().decode("utf-8")
            link = resp.headers.get("Link") or resp.headers.get("link")
        entries = _json.loads(body)
        if not entries:
            break
        for entry in entries:
            rows.append((_json.dumps(entry, separators=(",", ":")),
                         "okta", len(rows)))
        nxt = _find_rel_next_link(link or "")
        if not nxt:
            break
        url = nxt
    return spark.createDataFrame(
        rows, "message string, source_type string, seq long"
    ).withColumn("ts", F.current_timestamp())


# ---- GCP Pub/Sub pull (REST surface of the same service) ----------------


def gcp_pubsub_source(
    spark: SparkSession,
    project: str,
    subscription: str,
    endpoint: str = "https://pubsub.googleapis.com",
    max_events: int = 1000,
    batch_size: int = 100,
    auth_token: str | None = None,
    ack: bool = True,
    timeout_secs: float = 10.0,
) -> DataFrame:
    """Bounded pull from a Pub/Sub subscription (reference
    src/sources/gcp_pubsub.rs — it streams over gRPC; the REST
    ``subscriptions:pull`` / ``:acknowledge`` endpoints carry the same
    PubsubMessage surface and are what the official emulator speaks,
    so this source works against the emulator or the live API with a
    bearer token). Messages are acknowledged after each pulled batch —
    the at-least-once contract: a crash between pull and ack redelivers
    (the reference's ack-on-consume has the same window)."""
    import base64
    import json as _json
    import urllib.request

    base = (f"{endpoint.rstrip('/')}/v1/projects/{project}"
            f"/subscriptions/{subscription}")
    headers = {"Content-Type": "application/json"}
    if auth_token:
        headers["Authorization"] = f"Bearer {auth_token}"

    def post(url: str, body: dict) -> dict:
        req = urllib.request.Request(
            url, data=_json.dumps(body).encode(), headers=headers
        )
        with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
            text = resp.read().decode("utf-8")
        return _json.loads(text) if text else {}

    rows: list[tuple] = []
    while len(rows) < max_events:
        want = min(batch_size, max_events - len(rows))
        got = post(f"{base}:pull", {"maxMessages": want})
        received = got.get("receivedMessages") or []
        if not received:
            break
        ack_ids = []
        for rm in received:
            msg = rm.get("message") or {}
            data = base64.b64decode(msg.get("data") or b"")
            rows.append((
                data.decode("utf-8", errors="replace"),
                msg.get("messageId", ""),
                msg.get("publishTime", ""),
                dict(msg.get("attributes") or {}),
                "gcp_pubsub",
                len(rows),
            ))
            if rm.get("ackId"):
                ack_ids.append(rm["ackId"])
        if ack and ack_ids:
            post(f"{base}:acknowledge", {"ackIds": ack_ids})
    return spark.createDataFrame(
        rows,
        "message string, message_id string, publish_time string,"
        " attributes map<string,string>, source_type string, seq long",
    )


# ---- AWS SQS (JSON protocol + SigV4, no SDK) -----------------------------


def _sqs_call(
    queue_url: str,
    target: str,
    body: dict,
    access_key: str,
    secret_key: str,
    region: str,
    timeout_secs: float,
    session_token: str | None = None,
) -> dict:
    import json as _json
    import urllib.request
    from datetime import datetime, timezone

    from vector_spark.functions.sigv4 import sign_request

    payload = _json.dumps(body).encode()
    headers = {
        "Content-Type": "application/x-amz-json-1.0",
        "X-Amz-Target": f"AmazonSQS.{target}",
    }
    amz_date = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    signed = sign_request(
        "POST", queue_url, headers, payload,
        access_key, secret_key, region, "sqs", amz_date,
        session_token=session_token,
    )
    req = urllib.request.Request(queue_url, data=payload, headers=signed)
    with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
        text = resp.read().decode("utf-8")
    return _json.loads(text) if text else {}


def aws_sqs_source(
    spark: SparkSession,
    queue_url: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    max_events: int = 1000,
    batch_size: int = 10,
    delete: bool = True,
    timeout_secs: float = 10.0,
) -> DataFrame:
    """Bounded drain of an SQS queue (reference src/sources/aws_sqs/):
    ReceiveMessage in batches of ≤10 (the API maximum) over the
    documented JSON protocol, each batch SigV4-signed with plain
    credentials — works against the live service or any
    SQS-API-compatible endpoint (localstack/elasticmq). Received
    messages are deleted after each batch via DeleteMessageBatch (the
    reference's ack; ``delete=False`` leaves them for redelivery)."""
    rows: list[tuple] = []
    while len(rows) < max_events:
        want = min(batch_size, 10, max_events - len(rows))
        got = _sqs_call(
            queue_url, "ReceiveMessage",
            {"QueueUrl": queue_url, "MaxNumberOfMessages": want,
             "WaitTimeSeconds": 0,
             "MessageSystemAttributeNames": ["SentTimestamp"]},
            access_key, secret_key, region, timeout_secs,
                session_token=session_token,
        )
        messages = got.get("Messages") or []
        if not messages:
            break
        entries = []
        for m in messages:
            attrs = m.get("Attributes") or {}
            rows.append((
                m.get("Body", ""), m.get("MessageId", ""),
                attrs.get("SentTimestamp", ""), "aws_sqs", len(rows),
            ))
            entries.append({"Id": str(len(entries)),
                            "ReceiptHandle": m.get("ReceiptHandle", "")})
        if delete and entries:
            _sqs_call(
                queue_url, "DeleteMessageBatch",
                {"QueueUrl": queue_url, "Entries": entries},
                access_key, secret_key, region, timeout_secs,
                session_token=session_token,
            )
    return spark.createDataFrame(
        rows,
        "message string, message_id string, sent_timestamp string,"
        " source_type string, seq long",
    )


# ---- AWS S3 source (SQS bucket-notification driven, like the reference) --


def s3_get_object(
    bucket: str,
    key: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    endpoint: str | None = None,
    timeout_secs: float = 30.0,
) -> bytes:
    """Signed S3 GetObject (virtual path-style URL; ``endpoint``
    overrides for localstack/minio). S3 requires the payload hash
    header to be signed — included here."""
    import hashlib
    import urllib.request
    from datetime import datetime, timezone
    from urllib.parse import quote

    from vector_spark.functions.sigv4 import sign_request

    base = endpoint or f"https://s3.{region}.amazonaws.com"
    url = f"{base.rstrip('/')}/{bucket}/{quote(key)}"
    empty_sha = hashlib.sha256(b"").hexdigest()
    amz_date = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    headers = sign_request(
        "GET", url, {"x-amz-content-sha256": empty_sha}, b"",
        access_key, secret_key, region, "s3", amz_date,
        session_token=session_token,
    )
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout_secs) as resp:
        return resp.read()


def aws_s3_source(
    spark: SparkSession,
    queue_url: str,
    region: str,
    access_key: str = "",
    secret_key: str = "",
    session_token: str | None = None,
    max_objects: int = 100,
    s3_endpoint: str | None = None,
    timeout_secs: float = 30.0,
) -> DataFrame:
    """The reference's aws_s3 design (src/sources/aws_s3/mod.rs: SQS
    bucket-notification queue → fetch each created object → one event
    per line): drain the notification queue, GET each referenced
    object (gzip-decoded when the key says so, matching the
    reference's content-encoding handling), emit (message, bucket,
    key, seq). Notifications that aren't s3:ObjectCreated records are
    skipped, and the SQS messages are deleted after their objects are
    read — the same ack order as the reference (a crash in between
    redelivers, at-least-once).

    Scale note: this driver-side poll is the notification/control
    plane; the DATA path for bulk S3 reads on a cluster remains
    `spark.read` over s3a:// (COVERAGE.md) — this source exists for
    the reference's tail-new-objects use, where objects arrive one at
    a time."""
    import gzip
    import json as _json

    rows: list[tuple] = []
    n_objects = 0
    while n_objects < max_objects:
        got = _sqs_call(
            queue_url, "ReceiveMessage",
            {"QueueUrl": queue_url, "MaxNumberOfMessages": 10,
             "WaitTimeSeconds": 0},
            access_key, secret_key, region, timeout_secs,
                session_token=session_token,
        )
        messages = got.get("Messages") or []
        if not messages:
            break
        entries = []
        for m in messages:
            try:
                body = _json.loads(m.get("Body", "{}"))
            except ValueError:
                body = {}
            for record in body.get("Records") or []:
                if not str(record.get("eventName", "")).startswith(
                    "ObjectCreated"
                ):
                    continue
                s3info = record.get("s3") or {}
                bucket = (s3info.get("bucket") or {}).get("name", "")
                key = (s3info.get("object") or {}).get("key", "")
                if not bucket or not key:
                    continue
                # S3 event notifications URL-encode the object key
                # ('+' for space plus %XX escapes); the reference
                # percent-decodes before GetObject
                # (src/sources/aws_s3/sqs.rs urlencoded_string).
                # Without this, s3_get_object re-quotes the encoded
                # key and fetches a wrong (double-encoded) path.
                key = urllib.parse.unquote_plus(key)
                data = s3_get_object(
                    bucket, key, region, access_key, secret_key,
                    endpoint=s3_endpoint, timeout_secs=timeout_secs,
                )
                if key.endswith(".gz"):
                    data = gzip.decompress(data)
                for line in data.decode(
                    "utf-8", errors="replace"
                ).splitlines():
                    if line:
                        rows.append((line, bucket, key, "aws_s3",
                                     len(rows)))
                n_objects += 1
            entries.append({"Id": str(len(entries)),
                            "ReceiptHandle": m.get("ReceiptHandle", "")})
        if entries:
            _sqs_call(
                queue_url, "DeleteMessageBatch",
                {"QueueUrl": queue_url, "Entries": entries},
                access_key, secret_key, region, timeout_secs,
                session_token=session_token,
            )
    return spark.createDataFrame(
        rows,
        "message string, bucket string, key string, source_type string,"
        " seq long",
    )
