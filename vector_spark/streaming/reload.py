"""Live config reload + tap for a running streaming topology.

Reference behavior being matched (not copied — the reference is Rust/tokio,
this is Spark Structured Streaming):

- `src/config/watcher.rs:55` — `spawn_thread` watches the config paths and
  emits a reload signal on change (debounced).
- `src/topology/running.rs` `reload_config_and_respawn` — diffs the new
  config against the running one; **unchanged components keep running**,
  only added/changed components (re)spawn and removed ones shut down.
- `src/tap/cmd.rs:13` — `vector tap` attaches an observer to a running
  component's output without disturbing the topology.

Spark mapping: the respawn unit is the **sink-rooted StreamingQuery** — a
sink's query plan embeds its whole upstream transform chain, so a sink must
restart iff its transitive input closure intersects the set of changed
components (or the sink's own config changed). Everything else keeps its
StreamingQuery untouched (same `id`/`runId` — asserted in tests).

Checkpoint note: restarted file/kafka sinks reuse their checkpoint
directory, so exactly-once delivery carries across a reload exactly like a
process restart. Changing a *stateful* transform's shape under the same
checkpoint can be checkpoint-incompatible — the same operational caveat the
reference documents for disk-buffer format changes.
"""

from __future__ import annotations

import hashlib
import threading
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import SparkSession

from vector_spark.config.loader import (
    Topology,
    TopologyError,
    build_topology,
    parse_config,
    start_streaming_sink,
)

_parse = parse_config


_RELOAD_COUNTS = {"config_reloaded": 0, "config_reload_rejected": 0}


def _bump_reload_counter(name: str) -> None:
    """Fold the reload counters into the VRL internal-metrics snapshot
    (lib/vector-vrl/metrics reads the same numbers `vector top` sees)."""
    _RELOAD_COUNTS[name] += 1
    from vector_spark.functions.vrl_metrics import METRICS_STORAGE

    METRICS_STORAGE.upsert([
        {"name": k, "tags": {"component_kind": "config"},
         "type": "counter", "kind": "incremental", "value": float(v)}
        for k, v in _RELOAD_COUNTS.items()
    ])


def upstream_closure(cfg: dict, name: str) -> set[str]:
    """Transitive input components of `name` (exclusive of `name`).
    Input refs may sub-address named outputs (`route.a`) — closure is over
    the base component name."""
    transforms = cfg.get("transforms", {}) or {}
    sinks = cfg.get("sinks", {}) or {}
    graph = {**transforms, **sinks}
    out: set[str] = set()
    stack = [name]
    while stack:
        n = stack.pop()
        for ref in (graph.get(n, {}) or {}).get("inputs", []):
            base = ref.split(".", 1)[0]
            if base not in out:
                out.add(base)
                stack.append(base)
    return out


def component_diff(old_cfg: dict, new_cfg: dict) -> dict[str, set[str]]:
    """Names whose config dict changed/appeared/disappeared, per the
    reference's ConfigDiff (src/config/diff.rs): added / removed / changed,
    across all three sections."""
    added: set[str] = set()
    removed: set[str] = set()
    changed: set[str] = set()
    for section in ("sources", "transforms", "sinks"):
        old = old_cfg.get(section, {}) or {}
        new = new_cfg.get(section, {}) or {}
        added |= set(new) - set(old)
        removed |= set(old) - set(new)
        changed |= {n for n in set(old) & set(new) if old[n] != new[n]}
    return {"added": added, "removed": removed, "changed": changed}


@dataclass
class ReloadReport:
    started: list[str] = dc_field(default_factory=list)
    stopped: list[str] = dc_field(default_factory=list)
    kept: list[str] = dc_field(default_factory=list)

    @property
    def changed_anything(self) -> bool:
        return bool(self.started or self.stopped)


class RunningTopology:
    """A started streaming topology that can hot-rewire itself.

    >>> rt = RunningTopology(spark, "topology.yaml")
    >>> rt.reload("topology.yaml")   # after editing the file
    >>> rt.tap("my_transform")        # `vector tap` analog
    >>> rt.stop()
    """

    def __init__(self, spark: SparkSession, path_or_yaml: str):
        self.spark = spark
        self.cfg = _parse(path_or_yaml)
        self.topology: Topology = build_topology(spark, self.cfg)
        self.queries: dict[str, Any] = {
            name: start_streaming_sink(self.topology, name)
            for name in self.topology.sinks
        }
        self._taps: dict[str, Any] = {}
        self._lock = threading.Lock()

    # -- reload ----------------------------------------------------------
    def reload(self, path_or_yaml: str) -> ReloadReport:
        """Apply a new config. Only sinks whose upstream closure (or own
        config) changed are stopped and restarted; removed sinks stop; new
        sinks start; everything else keeps its running StreamingQuery.

        Emits `config_reloaded` / `config_reload_rejected` counters
        into the internal-metrics snapshot (the 0.51-window config
        observability counters) — a rejected reload is a parse or
        build failure that leaves the running topology untouched."""
        try:
            report = self._reload_inner(path_or_yaml)
        except Exception:
            _bump_reload_counter("config_reload_rejected")
            raise
        _bump_reload_counter("config_reloaded")
        return report

    def _reload_inner(self, path_or_yaml: str) -> ReloadReport:
        with self._lock:
            new_cfg = _parse(path_or_yaml)
            diff = component_diff(self.cfg, new_cfg)
            touched = diff["added"] | diff["removed"] | diff["changed"]
            report = ReloadReport()
            if not touched:
                report.kept = sorted(self.queries)
                return report

            new_sinks = new_cfg.get("sinks", {}) or {}
            restart = set()
            for name in new_sinks:
                if name in touched or (upstream_closure(new_cfg, name) & touched):
                    restart.add(name)
            stop = (set(self.queries) - set(new_sinks)) | (
                restart & set(self.queries)
            )

            # Build the new topology BEFORE stopping anything — a config
            # error must leave the running topology untouched (the
            # reference keeps the old topology on failed reload,
            # running.rs "reload failed").
            new_topo = build_topology(self.spark, new_cfg)

            for name in sorted(stop):
                try:
                    self.queries[name].stop()
                finally:
                    del self.queries[name]
                report.stopped.append(name)
            for name in sorted(set(new_sinks) - set(self.queries)):
                self.queries[name] = start_streaming_sink(new_topo, name)
                report.started.append(name)
            report.kept = sorted(set(self.queries) - set(report.started))

            self.cfg = new_cfg
            self.topology = new_topo
            return report

    # -- tap (`vector tap` analog) ---------------------------------------
    def tap(self, component: str, name: str | None = None) -> Any:
        """Attach an ad-hoc in-memory observer to a component's output
        without disturbing the topology. Read rows with
        `spark.sql(f"SELECT * FROM {tap_name}")`; detach with untap()."""
        from vector_spark.streaming.pipeline import memory_sink

        if component not in self.topology.outputs:
            raise TopologyError(f"unknown component output: {component}")
        tap_name = name or f"tap_{component.replace('.', '_')}"
        q = memory_sink(self.topology.outputs[component], tap_name)
        self._taps[tap_name] = q
        return q

    def untap(self, name: str) -> None:
        q = self._taps.pop(name)
        q.stop()

    # -- lifecycle -------------------------------------------------------
    def stop(self) -> None:
        with self._lock:
            for q in list(self._taps.values()) + list(self.queries.values()):
                try:
                    q.stop()
                except Exception:
                    pass
            self._taps.clear()
            self.queries.clear()


class ConfigWatcher:
    """Poll a config file and reload the topology when its bytes change
    (`src/config/watcher.rs:55` spawn_thread; we poll a content hash
    instead of inotify — no extra deps, identical observable behavior,
    and the debounce-by-interval matches the reference's delay param)."""

    def __init__(
        self,
        topology: RunningTopology,
        path: str,
        interval: float = 1.0,
        on_reload: Callable[[ReloadReport], None] | None = None,
    ):
        self.topology = topology
        self.path = path
        self.interval = interval
        self.on_reload = on_reload
        self.history: list[ReloadReport] = []
        self.errors: list[str] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _digest(self) -> str:
        with open(self.path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    def _run(self) -> None:
        last = self._digest()
        while not self._stop.wait(self.interval):
            try:
                cur = self._digest()
            except OSError:
                continue  # editor mid-rename; retry next tick
            if cur == last:
                continue
            last = cur
            try:
                report = self.topology.reload(self.path)
                self.history.append(report)
                if self.on_reload:
                    self.on_reload(report)
            except Exception as e:  # bad config: keep old topology running
                self.errors.append(str(e))

    def start(self) -> "ConfigWatcher":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)
