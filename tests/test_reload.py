"""Live reload + tap (vector src/config/watcher.rs,
src/topology/running.rs reload_config_and_respawn, src/tap/cmd.rs).

The invariant under test is the reference's: a reload touches ONLY the
components whose config (or upstream chain) changed — everything else
keeps its running task. Here "task" is the sink-rooted StreamingQuery, so
we assert on query id/runId stability.
"""

from __future__ import annotations

import time

import pytest

from vector_spark.streaming.reload import (
    ConfigWatcher,
    RunningTopology,
    component_diff,
    upstream_closure,
)

BASE_YAML = """
sources:
  gen: {type: rate, rows_per_second: 200}
transforms:
  a:
    type: remap
    inputs: [gen]
    assign: {x: "seq * 2"}
  b:
    type: remap
    inputs: [gen]
    assign: {y: "seq + 1"}
sinks:
  sink_a: {type: memory, inputs: [a], query_name: reload_sink_a}
  sink_b: {type: memory, inputs: [b], query_name: reload_sink_b}
"""


def _wait(pred, timeout=20.0, step=0.25):
    end = time.time() + timeout
    while time.time() < end:
        if pred():
            return True
        time.sleep(step)
    return False


def test_upstream_closure_and_diff():
    import yaml

    cfg = yaml.safe_load(BASE_YAML)
    assert upstream_closure(cfg, "sink_a") == {"a", "gen"}
    assert upstream_closure(cfg, "b") == {"gen"}
    new = yaml.safe_load(BASE_YAML.replace("seq + 1", "seq + 10"))
    d = component_diff(cfg, new)
    assert d == {"added": set(), "removed": set(), "changed": {"b"}}


@pytest.fixture(scope="module")
def running(spark):
    rt = RunningTopology(spark, BASE_YAML)
    yield rt
    rt.stop()


def test_reload_respawns_only_affected_sink(spark, running):
    id_a, run_a = running.queries["sink_a"].id, running.queries["sink_a"].runId
    run_b = running.queries["sink_b"].runId

    report = running.reload(BASE_YAML.replace("seq + 1", "seq + 100"))
    assert report.stopped == ["sink_b"] and report.started == ["sink_b"]
    assert report.kept == ["sink_a"]
    # untouched sink: SAME running query (id and runId stable)
    assert running.queries["sink_a"].id == id_a
    assert running.queries["sink_a"].runId == run_a
    assert running.queries["sink_a"].isActive
    # respawned sink: new run, new semantics visible in its output
    assert running.queries["sink_b"].runId != run_b
    assert _wait(
        lambda: spark.sql(
            "SELECT count(*) FROM reload_sink_b WHERE y = seq + 100"
        ).first()[0]
        > 0
    )


def test_reload_source_change_respawns_all_dependents(running):
    runs = {n: q.runId for n, q in running.queries.items()}
    report = running.reload(BASE_YAML.replace("rows_per_second: 200",
                                              "rows_per_second: 300"))
    assert set(report.stopped) == {"sink_a", "sink_b"}
    assert set(report.started) == {"sink_a", "sink_b"}
    for n in runs:
        assert running.queries[n].runId != runs[n]
    # restore the module baseline for later tests
    running.reload(BASE_YAML)


def test_reload_add_and_remove_sink(running):
    added = BASE_YAML + (
        "  sink_c: {type: memory, inputs: [a], query_name: reload_sink_c}\n"
    )
    run_a = running.queries["sink_a"].runId
    report = running.reload(added)
    assert report.started == ["sink_c"] and report.stopped == []
    assert running.queries["sink_a"].runId == run_a  # sharing input 'a' is NOT a change
    report = running.reload(BASE_YAML)
    assert report.stopped == ["sink_c"] and report.started == []
    assert "sink_c" not in running.queries


def test_reload_noop_keeps_everything(running):
    runs = {n: q.runId for n, q in running.queries.items()}
    report = running.reload(BASE_YAML)
    assert not report.changed_anything
    assert {n: q.runId for n, q in running.queries.items()} == runs


def test_bad_reload_leaves_topology_running(running):
    runs = {n: q.runId for n, q in running.queries.items()}
    bad = BASE_YAML.replace("inputs: [b]", "inputs: [nonexistent]")
    with pytest.raises(Exception):
        running.reload(bad)
    # old topology untouched: same queries, still active
    assert {n: q.runId for n, q in running.queries.items()} == runs
    assert all(q.isActive for q in running.queries.values())


def test_tap_attach_and_detach(spark, running):
    runs = {n: q.runId for n, q in running.queries.items()}
    q = running.tap("a", name="reload_tap_a")
    assert _wait(
        lambda: spark.sql("SELECT count(*) FROM reload_tap_a").first()[0] > 0
    )
    # topology queries untouched by the tap
    assert {n: q2.runId for n, q2 in running.queries.items()} == runs
    running.untap("reload_tap_a")
    assert not q.isActive
    assert all(q2.isActive for q2 in running.queries.values())


def test_config_watcher_applies_file_change(spark, tmp_path):
    path = tmp_path / "topo.yaml"
    path.write_text(BASE_YAML.replace("reload_sink_a", "watch_sink_a")
                    .replace("reload_sink_b", "watch_sink_b"))
    rt = RunningTopology(spark, str(path))
    watcher = ConfigWatcher(rt, str(path), interval=0.2).start()
    try:
        run_a = rt.queries["sink_a"].runId
        path.write_text(path.read_text().replace("seq + 1", "seq + 7"))
        assert _wait(lambda: watcher.history, timeout=15)
        report = watcher.history[0]
        assert report.stopped == ["sink_b"] and report.started == ["sink_b"]
        assert rt.queries["sink_a"].runId == run_a
        # a broken edit is caught and the topology keeps running
        path.write_text(path.read_text().replace("inputs: [b]",
                                                 "inputs: [missing]"))
        assert _wait(lambda: watcher.errors, timeout=15)
        assert all(q.isActive for q in rt.queries.values())
    finally:
        watcher.stop()
        rt.stop()


def test_reload_counters_in_metrics_snapshot(spark, tmp_path):
    """config_reloaded / config_reload_rejected counters land in the
    internal-metrics snapshot (the 0.51-window config observability
    counters) and are readable through the VRL metrics functions."""
    import vector_spark.streaming.reload as rl
    from vector_spark.functions.vrl_metrics import METRICS_STORAGE

    before = dict(rl._RELOAD_COUNTS)
    rl._bump_reload_counter("config_reloaded")
    rl._bump_reload_counter("config_reload_rejected")
    rl._bump_reload_counter("config_reloaded")
    try:
        got = {m["name"]: m["value"] for m in METRICS_STORAGE.snapshot()
               if m["name"].startswith("config_reload")}
        assert got["config_reloaded"] == before["config_reloaded"] + 2
        assert (got["config_reload_rejected"]
                == before["config_reload_rejected"] + 1)
        assert METRICS_STORAGE.get_metric(
            "config_reloaded", {"component_kind": "config"}) is not None
    finally:
        METRICS_STORAGE.store([])
