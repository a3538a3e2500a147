"""``python -m vector_spark`` — the engine's command-line face, mirroring
the reference binary's operator-facing subcommands (``src/cli.rs``
SubCommand enum):

- ``run CONFIG...``      execute a topology (batch sinks run to completion;
                         streaming sinks start and block, reference default
                         command semantics)
- ``validate CONFIG...`` structural config check WITHOUT starting a data
                         plane (``src/validate.rs``: component types known,
                         inputs resolve, graph acyclic)
- ``graph CONFIG...``    DOT digraph of the topology (``src/graph.rs``
                         render_dot: component nodes shaped by kind,
                         input edges)
- ``list [--format]``    supported component types (``src/list.rs``: text or
                         json, grouped sources/transforms/sinks/
                         enrichment_tables)
- ``vrl [-p PROGRAM]``   run a VRL program over JSON events from stdin, one
                         event per line (``vector vrl`` non-interactive
                         mode); prints resulting events as JSON lines
- ``tap CONFIG REF``     run the topology in batch and print REF's output
                         as JSON lines (``src/tap/cmd.rs`` sampled-output
                         analog for a batch engine: the tap IS the
                         component's DataFrame)
- ``test CONFIG...``     run the config's ``tests:`` section
                         (``src/unit_test.rs``)
- ``generate EXPR``      emit a YAML skeleton from a
                         ``sources/transforms/sinks`` expression
                         (``src/generate.rs`` topology heuristic)
- ``top CONFIG...``      start the topology's streaming sinks and render a
                         live per-query throughput table from the engine's
                         own progress stream (``src/cli.rs:462`` /
                         ``src/top/cmd.rs``; display re-renders per progress
                         event, never on a wall-clock poll)
- ``convert-config``     convert a topology config between YAML/TOML/JSON
                         (``src/convert_config.rs``; TOML out would need a
                         writer dependency — documented delta)

The type lists in ``list`` are extracted from the loader's dispatch code
itself (self-maintaining — adding a component to the loader adds it to
the CLI listing; pinned by tests/test_cli.py).
"""
from __future__ import annotations

import argparse
import inspect
import json
import re
import sys


def component_types() -> dict[str, list[str]]:
    """Supported component types per kind, scraped from the loader's own
    dispatch functions so the listing can never drift from reality."""
    from vector_spark.config import loader

    def types_in(fn, var: str) -> set[str]:
        return set(re.findall(rf'{var} == "([a-z_0-9]+)"', inspect.getsource(fn)))

    sources = types_in(loader._build_source_raw, "stype")
    transforms = types_in(loader._build_transform, "ttype")
    sinks = (
        types_in(loader.run_sinks, "stype")
        | types_in(loader._run_sinks_inner, "stype")
        | types_in(loader.start_streaming_sinks, "stype")
    )
    # the file-format family is dispatched via membership, not equality
    sinks |= {"parquet", "json", "csv", "orc", "avro"}
    return {
        "sources": sorted(sources),
        "transforms": sorted(transforms),
        "sinks": sorted(sinks),
        "enrichment_tables": ["file"],
    }


def cmd_list(fmt: str = "text") -> str:
    types = component_types()
    if fmt == "json":
        return json.dumps(types)
    lines = []
    for kind in ("sources", "transforms", "sinks", "enrichment_tables"):
        # reference list.rs prints capitalized group headers
        lines.append(kind.replace("_", " ").title() + ":")
        lines.extend(f"- {t}" for t in types[kind])
    return "\n".join(lines)


def _parse_configs(paths: list[str], interpolate: bool = False) -> dict:
    from vector_spark.config.loader import merge_configs, parse_config

    if len(paths) == 1:
        return parse_config(paths[0], interpolate=interpolate)
    return merge_configs(
        [parse_config(p, interpolate=interpolate) for p in paths])


def cmd_validate(paths: list[str], interpolate: bool = False) -> str:
    """Structural validation, no SparkSession: component types known,
    inputs resolve, no cycles, duplicate names rejected. Raises
    TopologyError with the reference-style component-named message."""
    from vector_spark.config.loader import TopologyError, _validate

    cfg = _parse_configs(paths, interpolate=interpolate)
    sources, transforms, sinks = _validate(cfg)
    types = component_types()
    for kind, comps, known in (
        ("source", sources, set(types["sources"])),
        ("transform", transforms, set(types["transforms"])),
        ("sink", sinks, set(types["sinks"])),
    ):
        for name, comp in comps.items():
            # `type` is required, as in the reference config schema —
            # the runtime paths have DIFFERENT historical defaults
            # (run_sinks: parquet, start_streaming_sinks: memory), so a
            # type-less sink passing validate could still die at run
            t = comp.get("type")
            if t is None:
                raise TopologyError(f"{kind} {name!r}: missing 'type'")
            if t not in known:
                raise TopologyError(f"{kind} {name!r}: unknown type {t!r}")
    n = len(sources) + len(transforms) + len(sinks)
    return f"Validated: {n} components ({len(sources)} sources, " \
           f"{len(transforms)} transforms, {len(sinks)} sinks)"


def cmd_graph(paths: list[str], interpolate: bool = False,
              fmt: str = "dot") -> str:
    """Topology rendering. ``dot`` (graph.rs render_dot): sources as
    trapezium, transforms as diamond, sinks as invtrapezium.
    ``mermaid`` (graph.rs render_mermaid, the 0.47 addition):
    flowchart TD with the reference's node shapes — sources `[/x/]`,
    transforms `{x}`, sinks `[\\x\\]` — and `-->|port|` edge labels
    for named-output inputs."""
    from vector_spark.config.loader import _validate

    cfg = _parse_configs(paths, interpolate=interpolate)
    sources, transforms, sinks = _validate(cfg)
    if fmt == "mermaid":
        out = ["flowchart TD;", "", "  %% Sources"]
        for name in sources:
            out.append(f"  {name}[/{name}/]")
        out.append("")
        out.append("  %% Transforms")
        for name, comp in transforms.items():
            out.append(f"  {name}{{{name}}}")
            for inp in comp.get("inputs", []):
                base, _, port = inp.partition(".")
                if port:
                    out.append(f"  {base} -->|{port}| {name}")
                else:
                    out.append(f"  {base} --> {name}")
        out.append("")
        out.append("  %% Sinks")
        for name, comp in sinks.items():
            out.append(f"  {name}[\\{name}\\]")
            for inp in comp.get("inputs", []):
                base, _, port = inp.partition(".")
                if port:
                    out.append(f"  {base} -->|{port}| {name}")
                else:
                    out.append(f"  {base} --> {name}")
        return "\n".join(out)
    if fmt != "dot":
        raise ValueError(f"graph: unknown format {fmt!r}")
    out = ["digraph {"]
    for name in sources:
        out.append(f'  "{name}" [shape=trapezium]')
    for name in transforms:
        out.append(f'  "{name}" [shape=diamond]')
    for name in sinks:
        out.append(f'  "{name}" [shape=invtrapezium]')
    for name, comp in {**transforms, **sinks}.items():
        for inp in comp.get("inputs", []):
            out.append(f'  "{inp.split(".", 1)[0]}" -> "{name}"')
    out.append("}")
    return "\n".join(out)


def _get_spark(cpus: int | None = None):
    from vector_spark.session import get_spark

    return get_spark("vector_spark_cli", cpus=cpus)


def cmd_vrl(program: str, lines: list[str], spark=None) -> list[str]:
    """Apply a VRL program to JSON events (one per input line); returns
    the resulting events as JSON lines. Multi-event emission and dropped
    events follow remap semantics: the primary output stream only."""
    from vector_spark.functions.vrl_compiler import vrl_remap

    spark = spark or _get_spark(cpus=2)
    payload = [ln for ln in lines if ln.strip()]
    if not payload:
        return []
    for ln in payload:
        json.loads(ln)  # fail fast with a line-level JSON error
    # JSON inference, not createDataFrame: an all-null field must type
    # as string (reference `vector vrl` accepts null fields), and nested
    # objects must become structs for `.a.b` paths — same hop the
    # loader's `values` source uses
    df = spark.read.json(spark.sparkContext.parallelize(payload))
    out = vrl_remap(df, program)[""]
    return [
        json.dumps(r.asDict(recursive=True), sort_keys=True, default=str)
        for r in out.collect()
    ]


def cmd_tap(paths: list[str], ref: str, limit: int = 100, spark=None,
            interpolate: bool = False) -> list[str]:
    """Build the topology (batch) and print one component's output as
    JSON lines — the batch-engine `vector tap`: any component's stream
    IS its DataFrame."""
    from vector_spark.config.loader import build_topology

    spark = spark or _get_spark()
    topo = build_topology(
        spark, _parse_configs(paths, interpolate=interpolate))
    rows = topo.output(ref).limit(limit).collect()
    return [
        json.dumps(r.asDict(recursive=True), sort_keys=True, default=str)
        for r in rows
    ]


def _parse_api_url(url: str) -> tuple[str, int]:
    """``--url http://host:port`` → (host, port); bare host:port and
    the reference default (src/config/api.rs default_grpc_url) work."""
    from vector_spark.api_server import parse_address

    stripped = url.split("://", 1)[-1].rstrip("/")
    return parse_address(stripped)


_OBS_BASE = "/vector.observability.v1.ObservabilityService/"


def cmd_tap_remote(url: str, patterns: list[str], limit: int = 100,
                   count: int = 10,
                   interval_ms: int = 500) -> list[str]:
    """``vector tap --url`` against a REMOTE instance's observability
    API (src/tap/cmd.rs): StreamOutputEvents with glob patterns,
    events printed as JSON lines (notifications prefixed ``[tap]``,
    the reference's stderr notifications)."""
    from vector_spark.api_server import OBSERVABILITY_REGISTRY
    from vector_spark.functions.protowire import (
        VECTOR_REGISTRY,
        _value_to_py,
        decode_message,
        encode_message,
    )
    from vector_spark.sources_grpc import grpc_stream_call

    host, port = _parse_api_url(url)
    req = encode_message(
        {"outputs_patterns": patterns, "limit": limit,
         "interval_ms": interval_ms},
        OBSERVABILITY_REGISTRY["StreamOutputEventsRequest"],
        OBSERVABILITY_REGISTRY)
    _st, msgs = grpc_stream_call(
        host, port, _OBS_BASE + "StreamOutputEvents", req,
        max_messages=count)
    out = []
    for m in msgs:
        resp = decode_message(
            m, OBSERVABILITY_REGISTRY["StreamOutputEventsResponse"],
            OBSERVABILITY_REGISTRY)
        if "notification" in resp:
            out.append(resp["notification"].get("message", ""))
            continue
        ev = resp["tapped_event"]
        wrapper = decode_message(ev["event"],
                                 VECTOR_REGISTRY["EventWrapper"],
                                 VECTOR_REGISTRY)
        fields = _value_to_py(wrapper["log"]["value"])
        out.append(json.dumps(
            {"component_id": ev["component_id"], "event": fields},
            sort_keys=True, default=str))
    return out


def cmd_top_remote(url: str, frames: int = 3,
                   interval_ms: int = 1000, out=None) -> list[str]:
    """``vector top --url`` against a REMOTE instance (src/top/cmd.rs):
    GetComponents for the table skeleton, then
    StreamComponentMetrics(SENT_EVENTS_TOTAL) updates rendered one
    frame per full component sweep."""
    from vector_spark.api_server import OBSERVABILITY_REGISTRY
    from vector_spark.functions.protowire import (
        decode_message,
        encode_message,
    )
    from vector_spark.sources_grpc import grpc_stream_call, grpc_unary_call

    def enc(name, obj):
        return encode_message(obj, OBSERVABILITY_REGISTRY[name],
                              OBSERVABILITY_REGISTRY)

    def dec(name, buf):
        return decode_message(buf, OBSERVABILITY_REGISTRY[name],
                              OBSERVABILITY_REGISTRY)

    host, port = _parse_api_url(url)
    st, body = grpc_unary_call(host, port, _OBS_BASE + "GetComponents",
                               [enc("GetComponentsRequest", {})])
    if st != 0:
        raise ConnectionError(f"GetComponents failed: grpc-status {st}")
    comps = dec("GetComponentsResponse", body).get("components", [])
    kinds = {1: "source", 2: "transform", 3: "sink"}
    meta = {c["component_id"]: (kinds.get(c.get("component_type", 0), "?"),
                                c.get("on_type", ""))
            for c in comps}
    n = max(len(meta), 1)
    _st, msgs = grpc_stream_call(
        host, port, _OBS_BASE + "StreamComponentMetrics",
        enc("StreamComponentMetricsRequest",
            {"interval_ms": interval_ms, "metric": 6}),
        max_messages=frames * n)
    rendered: list[str] = []
    totals: dict[str, int] = {}
    seen = 0
    for m in msgs:
        r = dec("StreamComponentMetricsResponse", m)
        totals[r["component_id"]] = int(
            r.get("total", {}).get("value", 0))
        seen += 1
        if seen % n == 0:  # one frame per component sweep
            lines = [f"{'COMPONENT':24s} {'KIND':10s} {'TYPE':16s} "
                     f"{'SENT':>12s}"]
            for cid, (kind, on_type) in meta.items():
                lines.append(f"{cid:24s} {kind:10s} {on_type:16s} "
                             f"{totals.get(cid, 0):>12d}")
            frame = "\n".join(lines)
            rendered.append(frame)
            if out is not None:
                prefix = "\x1b[2J\x1b[H" if out is sys.stdout else ""
                print(f"{prefix}{frame}", file=out, flush=True)
    return rendered


def cmd_generate(expression: str) -> str:
    """``vector generate 'stdin/remap,filter/console'`` (src/generate.rs):
    three slash-divided comma lists — sources / transforms / sinks —
    emitted as a YAML skeleton with the reference's topology heuristic:
    the first transform consumes all sources, each later transform its
    predecessor, every sink the last transform (or all sources if none).
    `name:type` prefixes override the incremental source1/transform1/...
    names. Unknown types are rejected against the loader's dispatch."""
    import yaml

    from vector_spark.config.loader import TopologyError

    known = component_types()
    parts = (expression.split("/") + ["", "", ""])[:3]

    def parse(seg: str, kind: str) -> list[tuple[str, str]]:
        out = []
        for i, item in enumerate(x for x in seg.split(",") if x.strip()):
            item = item.strip()
            name, _, typ = item.rpartition(":")
            name = name or f"{kind}{i + 1}"
            if typ not in known[kind + "s"]:
                raise TopologyError(f"{kind} {name!r}: unknown type {typ!r}")
            out.append((name, typ))
        return out

    sources = parse(parts[0], "source")
    transforms = parse(parts[1], "transform")
    sinks = parse(parts[2], "sink")
    cfg: dict = {}
    if sources:
        cfg["sources"] = {n: {"type": t} for n, t in sources}
    src_names = [n for n, _ in sources]
    prev = src_names
    if transforms:
        cfg["transforms"] = {}
        for n, t in transforms:
            cfg["transforms"][n] = {"type": t, "inputs": list(prev)}
            prev = [n]
    if sinks:
        cfg["sinks"] = {
            n: {"type": t, "inputs": list(prev)} for n, t in sinks
        }
    return yaml.safe_dump(cfg, sort_keys=False)


def cmd_test(paths: list[str], spark=None,
             interpolate: bool = False) -> tuple[str, bool]:
    """``vector test`` (src/unit_test.rs): run the config's `tests:`
    section — insert_at fixture rows through the real topology, output
    assertions per extract_from target. Returns (report, all_passed)."""
    from vector_spark.config.unit_test import run_unit_tests

    spark = spark or _get_spark()
    results = run_unit_tests(
        spark, _parse_configs(paths, interpolate=interpolate))
    lines = []
    ok = True
    for r in results:
        status = "passed" if r.passed else "FAILED"
        ok = ok and r.passed
        lines.append(f"test {r.name} ... {status}")
        for f in r.failures:
            lines.append(f"  {f}")
    lines.append(
        f"{sum(r.passed for r in results)}/{len(results)} tests passed"
    )
    return "\n".join(lines), ok


def _topology_is_streaming(topo) -> bool:
    """True if ANY resolved input of ANY sink is a streaming DataFrame.
    Checking only each sink's first input would route a mixed
    batch+streaming sink down the batch path and die in an engine
    AnalysisException instead of starting streaming sinks."""
    return any(
        topo.outputs[inp].isStreaming
        for s in topo.sinks.values()
        for inp in s.get("inputs", [])
        if inp in topo.outputs
    )


def cmd_run(paths: list[str], spark=None, interpolate: bool = False,
            require_healthy: bool = False) -> dict:
    """Execute the topology: batch sinks run to completion; if any sink
    is streaming, start all streaming sinks and block (reference default
    run semantics). ``require_healthy`` runs every sink's startup
    healthcheck first and refuses to start on failure (src/cli.rs:129
    --require-healthy)."""
    from vector_spark.config.loader import (
        build_topology,
        run_sinks,
        start_streaming_sinks,
    )

    spark = spark or _get_spark()
    topo = build_topology(
        spark, _parse_configs(paths, interpolate=interpolate))
    if require_healthy:
        from vector_spark.healthcheck import healthcheck_sinks

        healthcheck_sinks(
            topo.sinks,
            topo.globals.proxy if topo.globals is not None else None,
            require_healthy=True,
        )
    if _topology_is_streaming(topo):
        qs = start_streaming_sinks(topo)
        spark.streams.awaitAnyTermination()
        return {name: "terminated" for name in qs}
    return {
        name: type(res).__name__ for name, res in run_sinks(topo).items()
    }


def cmd_top(
    paths: list[str],
    spark=None,
    frames: int | None = None,
    out=None,
    timeout: float = 60.0,
    interpolate: bool = False,
) -> list[str]:
    """Live per-component throughput (reference ``vector top``,
    ``src/top/cmd.rs``): start the topology's streaming sinks, attach the
    TopListener, and re-render the QUERY/BATCHES/ROWS/ROWS/S/BATCH MS
    table as the engine's progress stream updates. ``frames`` bounds the
    rendered frames (None = until interrupted or every query ends).
    Event-driven: each frame waits on the ProgressBarrier for the next
    progress event — no wall-clock poll. Returns the frames; also prints
    them to ``out`` when given (stdout gets a clear-screen prefix, the
    reference dashboard behavior)."""
    from vector_spark.config.loader import (
        build_topology,
        start_streaming_sinks,
    )
    from vector_spark.streaming.monitor import attach_barrier, attach_top

    spark = spark or _get_spark()
    topo = build_topology(
        spark, _parse_configs(paths, interpolate=interpolate))
    if not _topology_is_streaming(topo):
        raise ValueError(
            "top needs a streaming topology; use `run` for batch configs"
        )
    listener = attach_top(spark)
    barrier = attach_barrier(spark)
    qs = start_streaming_sinks(topo)

    def emit() -> None:
        frame = listener.render()
        rendered.append(frame)
        if out is not None:
            prefix = "\x1b[2J\x1b[H" if out is sys.stdout else ""
            print(f"{prefix}{frame}", file=out, flush=True)

    rendered: list[str] = []
    try:
        n = 0
        while frames is None or n < frames:
            # progress on ANY query advances the display (a sink dict's
            # first query is not special); all-terminated also wakes the
            # waiter so a finished topology doesn't ride out the backstop
            goal = n + 1

            def progressed() -> bool:
                return (
                    sum(barrier.batches_of(q) for q in qs.values()) >= goal
                )

            def all_done() -> bool:
                return not any(q.isActive for q in qs.values())

            try:
                barrier.wait(
                    predicate=lambda: progressed() or all_done(),
                    timeout=timeout,
                )
            except AssertionError:
                # barrier timeout (no query handle is passed, so this is
                # the only AssertionError the wait can raise)
                if frames is None and not all_done():
                    # run-until-interrupted contract (reference `vector
                    # top`): a quiet-but-healthy topology (trigger
                    # interval > timeout, idle file source) must keep
                    # waiting, not exit after one stale frame — the
                    # timeout is only a re-check cadence here
                    continue
            if not progressed():
                emit()  # topology ended or bounded-mode stall: final frame
                break
            emit()
            n += 1
        # a crashed topology must not exit 0 with a clean screen: surface
        # the first query exception (cmd_run's awaitAnyTermination analog)
        for name, q in qs.items():
            exc = None
            try:
                exc = q.exception()
            except Exception:
                pass
            if exc is not None:
                raise RuntimeError(f"streaming sink '{name}' failed: {exc}")
    finally:
        for q in qs.values():
            try:
                q.stop()
            except Exception:
                pass
        spark.streams.removeListener(listener)
        spark.streams.removeListener(barrier)
    return rendered


def _toml_key(k: str) -> str:
    import re

    return k if re.fullmatch(r"[A-Za-z0-9_-]+", k) else json.dumps(k)


def _toml_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return json.dumps(v)  # TOML basic strings share JSON's escapes
    if isinstance(v, list):
        return "[" + ", ".join(_toml_scalar(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(
                f"{_toml_key(k)} = {_toml_scalar(x)}" for k, x in v.items()
            )
            + "}"
        )
    raise ValueError(f"cannot TOML-encode {type(v).__name__}")


def toml_dumps(cfg: dict) -> str:
    """Minimal TOML writer for topology configs: scalars and inline
    values first, then nested [tables] and [[arrays of tables]] —
    round-trips through ``tomllib`` (pinned in tests). None values are
    omitted (TOML has no null, matching what the TOML reader could ever
    have produced)."""

    def emit(table: dict, prefix: list[str], out: list[str]) -> None:
        scalars, tables, arrays = [], [], []
        for k, v in table.items():
            if v is None:
                continue
            if isinstance(v, dict):
                tables.append((k, v))
            elif isinstance(v, list) and v and all(
                isinstance(x, dict) for x in v
            ):
                arrays.append((k, v))
            else:
                scalars.append((k, v))
        if prefix and (scalars or not (tables or arrays)):
            out.append(f"[{'.'.join(_toml_key(p) for p in prefix)}]")
        for k, v in scalars:
            out.append(f"{_toml_key(k)} = {_toml_scalar(v)}")
        if scalars:
            out.append("")
        for k, v in tables:
            emit(v, prefix + [k], out)
        for k, vs in arrays:
            name = ".".join(_toml_key(p) for p in prefix + [k])
            for v in vs:
                out.append(f"[[{name}]]")
                # item fields are all inline (nested dicts as inline
                # tables) — relative [headers] inside an array item
                # would rebind to the root
                for ik, iv in v.items():
                    if iv is not None:
                        out.append(f"{_toml_key(ik)} = {_toml_scalar(iv)}")
                out.append("")

    lines: list[str] = []
    emit(cfg, [], lines)
    return "\n".join(lines).rstrip() + "\n"


def cmd_convert_config(src: str, dst: str) -> str:
    """Convert a topology config between formats (reference
    ``vector convert-config``, ``src/convert_config.rs``): accepts any
    of YAML/TOML/JSON in and writes YAML, JSON, or TOML out (TOML via
    the stdlib-only writer above — r8 closed the missing-writer
    delta)."""
    from vector_spark.config.loader import parse_config

    cfg = parse_config(src)
    if dst.endswith(".json"):
        text = json.dumps(cfg, indent=2)
    elif dst.endswith((".yaml", ".yml")):
        import yaml

        text = yaml.safe_dump(cfg, sort_keys=False)
    elif dst.endswith(".toml"):
        text = toml_dumps(cfg)
    else:
        raise ValueError(
            f"unsupported output format: {dst} (want .yaml/.yml/.json/.toml)"
        )
    with open(dst, "w") as f:
        f.write(text)
    return f"wrote {dst}"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vector_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("run", help="execute a topology config")
    sp.add_argument("config", nargs="+")
    sp.add_argument("--require-healthy", action="store_true",
                    help="exit on failed sink healthchecks (cli.rs:129)")
    sp.add_argument(
        "--dangerously-allow-env-var-interpolation", action="store_true",
        dest="allow_env_interp",
        help="opt back into ${VAR} config interpolation "
             "(off by default since v0.58, cli.rs:155)")
    sp = sub.add_parser("validate", help="check a config without running")
    sp.add_argument("config", nargs="+")
    sp.add_argument(
        "--dangerously-allow-env-var-interpolation", action="store_true",
        dest="allow_env_interp",
        help="opt back into ${VAR} config interpolation "
             "(off by default since v0.58, cli.rs:155)")
    sp = sub.add_parser("graph", help="print the topology as DOT/mermaid")
    sp.add_argument("config", nargs="+")
    sp.add_argument("--output-format", choices=["dot", "mermaid"],
                    default="dot", dest="graph_fmt")
    sp.add_argument(
        "--dangerously-allow-env-var-interpolation", action="store_true",
        dest="allow_env_interp",
        help="opt back into ${VAR} config interpolation "
             "(off by default since v0.58, cli.rs:155)")
    sp = sub.add_parser("list", help="list supported component types")
    sp.add_argument("--format", choices=["text", "json"], default="text")
    sp = sub.add_parser("vrl", help="run a VRL program over stdin JSON lines")
    sp.add_argument("-p", "--program", required=True)
    sp = sub.add_parser("tap", help="print one component's output as JSON")
    sp.add_argument("config", nargs="*")
    sp.add_argument("--ref", required=True,
                    help="component id (or glob with --url)")
    sp.add_argument("--limit", type=int, default=100)
    sp.add_argument("--url", default=None,
                    help="tap a REMOTE instance's api: endpoint "
                         "(observability gRPC) instead of a config")
    sp.add_argument("--count", type=int, default=10,
                    help="with --url: stop after N stream messages")
    sp = sub.add_parser("test", help="run the config's tests: section")
    sp.add_argument("config", nargs="+")
    sp.add_argument(
        "--dangerously-allow-env-var-interpolation", action="store_true",
        dest="allow_env_interp",
        help="opt back into ${VAR} config interpolation "
             "(off by default since v0.58, cli.rs:155)")
    sp = sub.add_parser(
        "generate", help="emit a config skeleton from 'src/trans/sink'"
    )
    sp.add_argument("expression")
    sp = sub.add_parser(
        "top", help="live per-query throughput for a streaming topology"
    )
    sp.add_argument("config", nargs="*")
    sp.add_argument(
        "--frames", type=int, default=None,
        help="stop after N rendered frames (default: run until terminated)",
    )
    sp.add_argument("--url", default=None,
                    help="watch a REMOTE instance's api: endpoint "
                         "(observability gRPC) instead of a config")
    sp = sub.add_parser(
        "convert-config", help="convert a config between YAML/TOML/JSON"
    )
    sp.add_argument("input")
    sp.add_argument("output")

    args = p.parse_args(argv)
    try:
        if args.cmd == "list":
            print(cmd_list(args.format))
        elif args.cmd == "validate":
            print(cmd_validate(args.config,
                               interpolate=args.allow_env_interp))
        elif args.cmd == "graph":
            print(cmd_graph(args.config,
                            interpolate=args.allow_env_interp,
                            fmt=args.graph_fmt))
        elif args.cmd == "vrl":
            for line in cmd_vrl(args.program, sys.stdin.readlines()):
                print(line)
        elif args.cmd == "tap":
            if args.url:
                lines = cmd_tap_remote(args.url, [args.ref],
                                       args.limit, args.count)
            elif args.config:
                lines = cmd_tap(args.config, args.ref, args.limit)
            else:
                raise ValueError("tap needs a config or --url")
            for line in lines:
                print(line)
        elif args.cmd == "generate":
            print(cmd_generate(args.expression))
        elif args.cmd == "test":
            report, ok = cmd_test(
                args.config, interpolate=args.allow_env_interp)
            print(report)
            if not ok:
                return 1
        elif args.cmd == "run":
            print(json.dumps(cmd_run(
                args.config, require_healthy=args.require_healthy,
                interpolate=args.allow_env_interp)))
        elif args.cmd == "top":
            if args.url:
                cmd_top_remote(args.url, frames=args.frames or 3,
                               out=sys.stdout)
            elif args.config:
                cmd_top(args.config, frames=args.frames, out=sys.stdout)
            else:
                raise ValueError("top needs a config or --url")
        elif args.cmd == "convert-config":
            print(cmd_convert_config(args.input, args.output))
    except Exception as e:  # reference CLI: error to stderr, exit 78
        print(f"error: {e}", file=sys.stderr)
        return 78
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
