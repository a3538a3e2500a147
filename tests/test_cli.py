"""CLI subcommand parity (`python -m vector_spark`, reference
src/cli.rs): list/validate/graph are spark-free; vrl/tap/run drive the
real topology machinery through the session fixture."""

from __future__ import annotations

import json

import pytest

from vector_spark.cli import (
    cmd_graph,
    cmd_list,
    cmd_tap,
    cmd_validate,
    cmd_vrl,
    component_types,
)


def test_list_contains_loader_dispatch(tmp_path):
    types = component_types()
    # the listing is scraped from the loader's own dispatch code — a
    # representative member of each kind must be present
    assert "rate" in types["sources"] and "http_server" in types["sources"]
    assert "remap" in types["transforms"] and "throttle" in types["transforms"]
    assert "console" in types["sinks"] and "parquet" in types["sinks"]
    assert types["enrichment_tables"] == ["file"]
    out = json.loads(cmd_list("json"))
    assert out == types
    text = cmd_list("text")
    assert "Sources:" in text and "- remap" in text


@pytest.fixture()
def cfg_file(tmp_path):
    p = tmp_path / "topo.yaml"
    p.write_text(
        """
sources:
  gen:
    type: values
    rows:
      - {seq: 0, msg: "a"}
      - {seq: 1, msg: "b"}
      - {seq: 2, msg: "c"}
transforms:
  evens:
    type: filter
    inputs: [gen]
    condition: "seq % 2 = 0"
sinks:
  out:
    type: memory
    inputs: [evens]
"""
    )
    return str(p)


def test_validate_ok_and_errors(cfg_file, tmp_path):
    msg = cmd_validate([cfg_file])
    assert "3 components" in msg and "1 sources" in msg

    from vector_spark.config.loader import TopologyError

    bad_type = tmp_path / "bad1.yaml"
    bad_type.write_text(
        "sources:\n  s:\n    type: no_such_thing\n"
    )
    with pytest.raises(TopologyError, match="unknown type 'no_such_thing'"):
        cmd_validate([str(bad_type)])

    bad_input = tmp_path / "bad2.yaml"
    bad_input.write_text(
        "transforms:\n  t:\n    type: filter\n    inputs: [ghost]\n"
        "    condition: 'true'\n"
    )
    with pytest.raises(TopologyError, match="unknown input"):
        cmd_validate([str(bad_input)])


def test_graph_dot(cfg_file):
    dot = cmd_graph([cfg_file])
    assert dot.startswith("digraph {") and dot.endswith("}")
    assert '"gen" [shape=trapezium]' in dot
    assert '"evens" [shape=diamond]' in dot
    assert '"out" [shape=invtrapezium]' in dot
    assert '"gen" -> "evens"' in dot and '"evens" -> "out"' in dot


def test_vrl_subcommand(spark):
    out = cmd_vrl(
        '.upper = upcase(.msg)\n.n2 = .n * 2',
        ['{"msg": "hi", "n": 3}', '{"msg": "yo", "n": 5}'],
        spark=spark,
    )
    rows = [json.loads(ln) for ln in out]
    assert [r["upper"] for r in rows] == ["HI", "YO"]
    assert [r["n2"] for r in rows] == [6, 10]


def test_tap_subcommand(cfg_file, spark):
    lines = cmd_tap([cfg_file], "evens", spark=spark)
    rows = [json.loads(ln) for ln in lines]
    assert sorted(r["seq"] for r in rows) == [0, 2]


def test_run_batch(cfg_file, spark):
    from vector_spark.cli import cmd_run

    out = cmd_run([cfg_file], spark=spark)
    assert "out" in out  # the memory sink executed


def test_run_streaming_detection_any_input(tmp_path, spark):
    """A sink whose FIRST input is batch but a LATER input is streaming
    must take the streaming path: detection checks every resolved input
    of every sink, not just the first."""
    from vector_spark.cli import _topology_is_streaming
    from vector_spark.config.loader import build_topology

    p = tmp_path / "mixed.yaml"
    p.write_text(
        """
sources:
  batch_src:
    type: values
    rows:
      - {seq: 0}
  stream_src:
    type: rate
    rows_per_second: 1
sinks:
  out:
    type: memory
    inputs: [batch_src, stream_src]
"""
    )
    import yaml

    topo = build_topology(spark, yaml.safe_load(p.read_text()))
    assert _topology_is_streaming(topo)

    q = tmp_path / "batch.yaml"
    q.write_text(
        """
sources:
  batch_src:
    type: values
    rows:
      - {seq: 0}
sinks:
  out:
    type: memory
    inputs: [batch_src]
"""
    )
    topo2 = build_topology(spark, yaml.safe_load(q.read_text()))
    assert not _topology_is_streaming(topo2)


def test_top_renders_live_throughput(tmp_path, spark):
    """`top` starts the streaming sinks and renders one throughput frame
    per engine progress event (ProgressBarrier-driven — no sleeps); the
    deterministic rate-micro-batch source makes the row counts exact."""
    from vector_spark.cli import cmd_top

    p = tmp_path / "stream.yaml"
    p.write_text(
        """
sources:
  gen:
    type: rate
    rows_per_batch: 100
sinks:
  out:
    type: memory
    inputs: [gen]
"""
    )
    frames = cmd_top([str(p)], spark=spark, frames=2)
    assert len(frames) == 2
    for frame in frames:
        assert frame.splitlines()[0].startswith("QUERY")
    # by frame 2 the engine has reported >= 1 deterministic batch; the
    # engine may have run MORE batches than frames rendered, so assert a
    # positive multiple of the exact batch size, not a literal count
    row = next(
        ln for ln in frames[-1].splitlines()[1:] if ln.startswith("out")
    )
    batches, rows = int(row.split()[1]), int(row.split()[2])
    assert batches >= 1 and rows == batches * 100
    # every started query was stopped on exit
    assert not spark.streams.active


def test_top_multi_sink_any_progress(tmp_path, spark):
    """With several streaming sinks, ANY query's progress advances the
    display — the first sink in the dict is not special, and both
    queries appear in the final frame."""
    from vector_spark.cli import cmd_top

    p = tmp_path / "multi.yaml"
    p.write_text(
        """
sources:
  gen_a:
    type: rate
    rows_per_batch: 50
  gen_b:
    type: rate
    rows_per_batch: 70
sinks:
  out_a:
    type: memory
    inputs: [gen_a]
  out_b:
    type: memory
    inputs: [gen_b]
"""
    )
    frames = cmd_top([str(p)], spark=spark, frames=4)
    assert len(frames) == 4
    last = frames[-1].splitlines()
    names = {ln.split()[0] for ln in last[1:]}
    assert {"out_a", "out_b"} <= names
    assert not spark.streams.active


def test_top_surfaces_crashed_topology(tmp_path, spark):
    """A topology whose streaming sink dies must raise (the cmd_run
    awaitAnyTermination analog) — not exit cleanly with no frames."""
    from vector_spark.cli import cmd_top

    p = tmp_path / "crash.yaml"
    p.write_text(
        """
sources:
  gen:
    type: rate
    rows_per_batch: 10
transforms:
  boom:
    type: filter
    inputs: [gen]
    condition: "seq / (seq - seq) > 0"
sinks:
  out:
    type: memory
    inputs: [boom]
"""
    )
    with pytest.raises(RuntimeError, match="failed"):
        cmd_top([str(p)], spark=spark, frames=3, timeout=30.0)
    assert not spark.streams.active


def test_top_rejects_batch_topology(cfg_file, spark):
    from vector_spark.cli import cmd_top

    with pytest.raises(ValueError, match="streaming topology"):
        cmd_top([cfg_file], spark=spark, frames=1)


def test_convert_config_roundtrip(tmp_path, cfg_file):
    """convert-config rewrites a topology between formats; the converted
    file still validates and parses back to the same dict."""
    from vector_spark.cli import cmd_convert_config
    from vector_spark.config.loader import parse_config

    out_json = tmp_path / "topo.json"
    msg = cmd_convert_config(cfg_file, str(out_json))
    assert msg == f"wrote {out_json}"
    assert parse_config(str(out_json)) == parse_config(cfg_file)
    assert "3 components" in cmd_validate([str(out_json)])

    back = tmp_path / "back.yaml"
    cmd_convert_config(str(out_json), str(back))
    assert parse_config(str(back)) == parse_config(cfg_file)

    # r8: .toml is now a supported output (stdlib writer) — roundtrips
    out_toml = tmp_path / "topo.toml"
    cmd_convert_config(cfg_file, str(out_toml))
    assert parse_config(str(out_toml)) == parse_config(cfg_file)

    with pytest.raises(ValueError, match="unsupported output format"):
        cmd_convert_config(cfg_file, str(tmp_path / "topo.ini"))


def test_test_subcommand(tmp_path, spark):
    from vector_spark.cli import cmd_test

    p = tmp_path / "with_tests.yaml"
    p.write_text(
        """
sources:
  in:
    type: values
    rows: [{msg: "unused"}]
transforms:
  up:
    type: remap
    inputs: [in]
    source: '.msg = upcase(.msg)'
tests:
  - name: upcases
    inputs:
      - insert_at: in
        rows:
          - {msg: "hello"}
    outputs:
      - extract_from: up
        conditions: ["msg = 'HELLO'"]
"""
    )
    report, ok = cmd_test([str(p)], spark=spark)
    assert ok and "upcases ... passed" in report


def test_vrl_subcommand_null_fields(spark):
    # review r6: an all-null field must pass through (JSON inference),
    # not crash createDataFrame with CANNOT_DETERMINE_TYPE
    out = cmd_vrl(
        ".x = 1",
        ['{"msg": null}', '{"msg": null, "extra": {"a": 1}}'],
        spark=spark,
    )
    rows = [json.loads(ln) for ln in out]
    assert all(r["x"] == 1 for r in rows)
    assert rows[0]["msg"] is None


def test_validate_requires_sink_type(tmp_path):
    # review r6: run_sinks and start_streaming_sinks have DIFFERENT
    # historical type defaults, so validate must require an explicit one
    from vector_spark.config.loader import TopologyError

    p = tmp_path / "no_type.yaml"
    p.write_text(
        "sources:\n  s:\n    type: rate\n"
        "sinks:\n  out:\n    inputs: [s]\n"
    )
    with pytest.raises(TopologyError, match="missing 'type'"):
        cmd_validate([str(p)])


def test_generate_skeleton_roundtrips_through_validate(tmp_path):
    """`generate` emits the reference topology heuristic (first
    transform consumes all sources, chains after, sinks off the last)
    and its output must validate clean."""
    import yaml

    from vector_spark.cli import cmd_generate

    out = cmd_generate("rate/remap,filter/console")
    cfg = yaml.safe_load(out)
    assert cfg["sources"] == {"source1": {"type": "rate"}}
    assert cfg["transforms"]["transform1"]["inputs"] == ["source1"]
    assert cfg["transforms"]["transform2"]["inputs"] == ["transform1"]
    assert cfg["sinks"]["sink1"]["inputs"] == ["transform2"]
    p = tmp_path / "gen.yaml"
    p.write_text(out)
    assert "4 components" in cmd_validate([str(p)])
    # named components + sink-only expression + unknown type error
    named = yaml.safe_load(cmd_generate("foo:rate//baz:console"))
    assert "foo" in named["sources"] and named["sinks"]["baz"]["inputs"] == ["foo"]
    from vector_spark.config.loader import TopologyError

    with pytest.raises(TopologyError, match="unknown type"):
        cmd_generate("nope_src")


def test_top_unbounded_waits_through_quiet_periods(tmp_path, spark):
    """frames=None is the run-until-interrupted contract (reference
    `vector top`): a healthy-but-idle topology (file source with no new
    data -> no progress events) must NOT exit after one timeout-stale
    frame; `top` keeps waiting and returns only when every query ends."""
    import threading
    import time

    from vector_spark.cli import cmd_top

    d = tmp_path / "in"
    d.mkdir()
    p = tmp_path / "idle.yaml"
    p.write_text(
        f"""
sources:
  tail:
    type: stream_file
    path: {d}
    format: json
    schema: "a long"
sinks:
  out:
    type: memory
    inputs: [tail]
"""
    )
    result: dict = {}

    def run():
        result["frames"] = cmd_top(
            [str(p)], spark=spark, frames=None, timeout=0.2
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # several timeout windows of silence: the old backstop would have
    # exited after ~0.2s with one stale frame
    time.sleep(1.5)
    assert t.is_alive(), "top exited during a quiet period"
    for q in spark.streams.active:
        q.stop()
    t.join(timeout=30)
    assert not t.is_alive() and "frames" in result


def test_convert_config_toml_output(tmp_path):
    """convert-config writes TOML (r8: stdlib-only writer) that
    tomllib-parses back to the identical config — including array-of-
    tables routes with nested inline tables and quoted keys."""
    import tomllib

    from vector_spark.cli import cmd_convert_config, toml_dumps

    src = tmp_path / "topo.yaml"
    src.write_text(
        """
sources:
  logs: {type: demo_logs, count: 5}
transforms:
  r:
    type: route
    inputs: [logs]
    routes:
      - {name: a, condition: "message = 'x'"}
      - {name: b, condition: "true"}
sinks:
  out: {type: console, inputs: [r.a]}
"""
    )
    dst = tmp_path / "topo.toml"
    cmd_convert_config(str(src), str(dst))
    back = tomllib.loads(dst.read_text())
    assert back["transforms"]["r"]["routes"][0]["name"] == "a"
    assert back["sinks"]["out"]["inputs"] == ["r.a"]
    # writer handles every value kind configs use
    rt = tomllib.loads(
        toml_dumps({"a": {"b": 1.5, "s": 'q"uo\nte', "l": [1, "x", True],
                          "t": {"deep": {"k": "v"}}}})
    )
    assert rt["a"]["s"] == 'q"uo\nte' and rt["a"]["t"]["deep"]["k"] == "v"


def test_graph_mermaid_format(tmp_path):
    """graph --output-format mermaid (graph.rs render_mermaid): the
    reference's node shapes and |port| edge labels."""
    from vector_spark.cli import cmd_graph

    p = tmp_path / "t.yaml"
    p.write_text("""
sources:
  in: {type: demo_logs, format: json, count: 1}
transforms:
  r: {type: route, inputs: [in], route: {a: "message like '%a%'"}}
sinks:
  out: {type: console, inputs: [r.a]}
""")
    m = cmd_graph([str(p)], fmt="mermaid")
    assert m.startswith("flowchart TD;")
    assert "in[/in/]" in m          # source shape
    assert "r{r}" in m              # transform shape
    assert "out[\\out\\]" in m      # sink shape
    assert "r -->|a| out" in m      # named-port edge label
    assert "in --> r" in m
