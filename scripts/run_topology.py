"""CLI: run a YAML topology (the `vector run` / `vector graph` analog).

Usage:
  python scripts/run_topology.py pipeline.yaml            # batch: run sinks
  python scripts/run_topology.py pipeline.yaml --stream   # start streaming sinks
  python scripts/run_topology.py pipeline.yaml --stream --watch
                                # + live reload on config file change
  python scripts/run_topology.py pipeline.yaml --graph    # print DOT graph
  python scripts/run_topology.py pipeline.yaml --validate # build only
  python scripts/run_topology.py pipeline.yaml --test     # run config unit tests

Reference analogs: `vector run` (src/app.rs:177), `vector graph`
(src/config/dot_graph.rs), `vector validate`, `vector test`
(src/unit_test.rs — config-declared inputs/outputs assertions).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def to_dot(cfg: dict) -> str:
    """Topology → Graphviz DOT (vector `src/config/dot_graph.rs`)."""
    lines = ["digraph topology {", "  rankdir=LR;"]
    for name in cfg.get("sources", {}) or {}:
        lines.append(f'  "{name}" [shape=cylinder];')
    for name, t in (cfg.get("transforms", {}) or {}).items():
        lines.append(f'  "{name}" [shape=box label="{name}\\n({t.get("type")})"];')
    for name in cfg.get("sinks", {}) or {}:
        lines.append(f'  "{name}" [shape=doublecircle];')
    for name, comp in {
        **(cfg.get("transforms", {}) or {}),
        **(cfg.get("sinks", {}) or {}),
    }.items():
        for inp in comp.get("inputs", []):
            lines.append(f'  "{inp.split(".", 1)[0]}" -> "{name}" [label="{inp}"];')
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    import yaml

    args = [a for a in sys.argv[1:]]
    flags = {a for a in args if a.startswith("--")}
    paths = [a for a in args if not a.startswith("--")]
    if not paths:
        print(__doc__)
        sys.exit(2)
    with open(paths[0]) as f:
        cfg = yaml.safe_load(f)

    if "--graph" in flags:
        print(to_dot(cfg))
        return

    from vector_spark.config.loader import (
        build_topology,
        run_sinks,
        start_streaming_sinks,
    )
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-run")
    spark.sparkContext.setLogLevel("ERROR")
    if "--test" in flags:
        from vector_spark.config.unit_test import run_unit_tests

        results = run_unit_tests(spark, cfg)
        for r in results:
            mark = "PASS" if r.passed else "FAIL"
            print(f"{mark} {r.name}")
            for f in r.failures:
                print(f"  - {f}")
        sys.exit(0 if all(r.passed for r in results) else 1)
    topo = build_topology(spark, cfg)
    if "--validate" in flags:
        print(f"OK: {len(topo.outputs)} component outputs built")
        return
    if "--stream" in flags:
        from vector_spark.streaming.monitor import attach_top

        top = attach_top(spark)
        if "--watch" in flags:
            # live reload (vector src/config/watcher.rs): hot-rewires only
            # the sinks whose upstream chain changed on file edit
            from vector_spark.streaming.reload import (
                ConfigWatcher,
                RunningTopology,
            )

            rt = RunningTopology(spark, paths[0])
            watcher = ConfigWatcher(
                rt,
                paths[0],
                on_reload=lambda rep: print(
                    f"reloaded: started={rep.started} "
                    f"stopped={rep.stopped} kept={rep.kept}"
                ),
            ).start()
            print(
                f"started {len(rt.queries)} streaming sink(s), watching "
                f"{paths[0]} for changes; Ctrl-C to stop"
            )
            try:
                spark.streams.awaitAnyTermination()
            except KeyboardInterrupt:
                pass
            finally:
                watcher.stop()
                rt.stop()
                print(top.render())
            return
        queries = start_streaming_sinks(topo)
        print(f"started {len(queries)} streaming sink(s); Ctrl-C to stop")
        try:
            for q in queries.values():
                q.awaitTermination()
        except KeyboardInterrupt:
            pass
        finally:
            print(top.render())  # the `vector top` table on exit
        return
    results = run_sinks(topo)
    for name, info in results.items():
        desc = {k: v for k, v in info.items() if k != "rows"}
        if "rows" in info:
            desc["n_rows"] = len(info["rows"])
        print(f"{name}: {desc}")


if __name__ == "__main__":
    main()
