"""`vector test`-style config-driven unit tests.

Reference: vector `src/config/unit_test/mod.rs:52-60` — a test declares
`inputs` (rows injected `insert_at` a component) and `outputs` (assertions
`extract_from` a component, each a list of conditions that must all pass
for at least one event); `no_outputs_from` asserts a component emits
nothing. The behavior corpus (`tests/behavior/transforms/*.yaml`) is
written in this shape.

Spark form: the topology is built once with test inputs substituted for
the real sources; condition strings are SQL / datadog_search dialects
(vector uses VRL). Example:

    tests:
      - name: filters errors
        inputs:
          - insert_at: logs          # replaces source `logs`
            rows:
              - {seq: 1, level: error}
              - {seq: 2, level: info}
        outputs:
          - extract_from: errs
            conditions:
              - "level = 'error'"
        no_outputs_from: []
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from vector_spark.config.loader import TopologyError, _condition, build_topology


@dataclass
class TestResult:
    name: str
    passed: bool
    failures: list[str]


def run_unit_tests(spark: SparkSession, cfg: dict,
                   max_workers: int = 8) -> list[TestResult]:
    """Run every test under cfg['tests'] against cfg's topology.

    Each test builds the topology with its `insert_at` rows as `values`
    sources (all other sources stay as configured) and evaluates output
    assertions. Returns one TestResult per test, in input order.

    Tests are INDEPENDENT (each builds its own pruned config closure and
    its own enrichment-table instances), so they run from a small driver
    thread pool: Spark schedules several jobs at once, and the per-test
    driver latency (topology build + a handful of tiny counts) overlaps
    instead of serializing (guide SS2.6 "overlap independent jobs" -- the
    91-test reference remap corpus was 100%% driver-latency-bound).
    max_workers<=1 restores the serial path.
    """
    tests = cfg.get("tests") or []
    if max_workers > 1 and len(tests) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return list(
                pool.map(lambda t: _run_one_test(spark, cfg, t), tests)
            )
    return [_run_one_test(spark, cfg, t) for t in tests]


def _run_one_test(spark: SparkSession, cfg: dict, t: dict) -> TestResult:
    failures: list[str] = []
    test_cfg = {
        "sources": dict(cfg.get("sources", {})),
        "transforms": cfg.get("transforms", {}),
        "sinks": cfg.get("sinks", {}) or {},
        "enrichment_tables": cfg.get("enrichment_tables") or {},
    }
    # prune to the test's component closure (the reference builds a
    # reduced graph per test, unit_test/mod.rs): corpus files declare
    # many sibling transforms with empty inputs that only exist for
    # OTHER tests
    touched = set()
    for out in t.get("outputs", []):
        touched.add(out["extract_from"].split(".", 1)[0])
    for ref in t.get("no_outputs_from", []):
        touched.add(ref.split(".", 1)[0])
    for inp in list(t.get("inputs", [])) + (
        [t["input"]] if t.get("input") else []
    ):
        touched.add(inp["insert_at"].split(".", 1)[0])
    closure = set(touched)
    frontier = list(touched)
    graph = {**test_cfg["transforms"], **test_cfg["sinks"]}
    while frontier:
        n = frontier.pop()
        for ref in (graph.get(n) or {}).get("inputs", []):
            base = ref.split(".", 1)[0]
            if base not in closure:
                closure.add(base)
                frontier.append(base)
    test_cfg["transforms"] = {
        k: v for k, v in test_cfg["transforms"].items() if k in closure
    }
    test_cfg["sinks"] = {
        k: v for k, v in test_cfg["sinks"].items() if k in closure
    }
    test_cfg["sources"] = {
        k: v for k, v in test_cfg["sources"].items() if k in closure
    }

    raw_inputs = list(t.get("inputs", []))
    if t.get("input"):  # reference's singular form (unit_test/mod.rs)
        raw_inputs.append(t["input"])
    for inp in raw_inputs:
        at = inp["insert_at"]
        rows = inp.get("rows")
        if rows is None:
            # reference input kinds: raw (value → .message), log
            # (log_fields → event fields)
            ityp = inp.get("type", "raw")
            if ityp == "raw":
                rows = [{"message": inp.get("value", "")}]
            elif ityp == "log":
                # log_fields keys are event PATHS in the reference's
                # harness: 'c.c' means nested .c.c
                flat = dict(inp.get("log_fields") or {"message": ""})
                row: dict = {}
                import re as _re

                for k, v in flat.items():
                    # keys are event PATHS with VRL quoting: a
                    # double-quoted segment is one field name that may
                    # contain dots ('"d.e"' → field d.e; 'a."b.c"' →
                    # nested a → field b.c)
                    parts = [
                        m.group(1) if m.group(1) is not None else m.group(2)
                        for m in _re.finditer(
                            r'"((?:[^"\\]|\\.)*)"|([^."]+)', k
                        )
                    ]
                    d = row
                    for p in parts[:-1]:
                        d = d.setdefault(p, {})
                    d[parts[-1]] = v
                rows = [row]
            elif ityp == "vrl":
                # reference input kind `vrl` (vrl_test_input.yaml):
                # a VRL program RUN AGAINST AN EMPTY EVENT generates
                # the input rows (root replacement builds the event)
                from vector_spark.functions.vrl_compiler import (
                    vrl_remap,
                )

                seed = spark.createDataFrame(
                    [("",)], "message string"
                )
                try:
                    gen = vrl_remap(seed, inp["source"])[""]
                    rows = [
                        {
                            k: v
                            for k, v in r.asDict(recursive=True).items()
                            if k != "_error"
                        }
                        for r in gen.collect()
                    ]
                except Exception as ex:
                    failures.append(
                        f"insert_at {at!r}: vrl input failed: {ex}"
                    )
                    continue
            elif ityp == "metric":
                # metric event → flat row: the value variant's name
                # becomes .type, its value becomes .value (SURVEY
                # §1.3 metric mapping)
                m = dict(inp.get("metric") or {})
                row = {}
                for k, v in m.items():
                    if isinstance(v, dict) and "value" in v:
                        row["type"] = k
                        row["value"] = v["value"]
                    else:
                        row[k] = v
                rows = [row]
            else:
                failures.append(f"insert_at {at!r}: unsupported input type {ityp!r}")
                continue
        if at in test_cfg["transforms"]:
            # insert at a TRANSFORM: the rows become its sole input
            # (the reference feeds the transform directly)
            syn = f"__test_input_{at}"
            test_cfg["sources"][syn] = {"type": "values", "rows": rows}
            test_cfg["transforms"] = dict(test_cfg["transforms"])
            test_cfg["transforms"][at] = {
                **test_cfg["transforms"][at], "inputs": [syn]
            }
        elif at in test_cfg["sources"]:
            test_cfg["sources"][at] = {"type": "values", "rows": rows}
        else:
            failures.append(f"insert_at {at!r}: no such component")
    if failures:
        return TestResult(t.get("name", "?"), False, failures)
    try:
        topo = build_topology(spark, test_cfg)
    except Exception as ex:  # config/VRL-compile errors fail the TEST
        return TestResult(
            t.get("name", "?"), False, [f"topology error: {ex}"]
        )
    for out in t.get("outputs", []):
        ref = out["extract_from"]
        try:
            df = topo.output(ref)
        except TopologyError as ex:
            failures.append(str(ex))
            continue
        if df.count() == 0:
            failures.append(f"{ref}: produced no events")
            continue
        conds = []
        for cond in out.get("conditions", []):
            if isinstance(cond, dict) and cond.get("type") == "vrl":
                # compile against the extracted frame's schema so
                # absent fields read as null and timestamp columns
                # render RFC3339 through to_string (VRL contract)
                from vector_spark.functions.vrl_compiler import (
                    vrl_condition,
                )

                c = vrl_condition(cond["source"], dtypes=dict(df.dtypes))
            else:
                c = _condition(cond)
            if isinstance(c, str):
                c = F.expr(c)
            conds.append((cond, F.coalesce(c, F.lit(False))))
        if not conds:
            continue
        try:
            if out.get("every_event"):
                # opt-in strict mode: every extracted event must satisfy
                # every condition (stronger than the reference)
                for cond, c in conds:
                    n_fail = df.where(~c).count()
                    if n_fail:
                        failures.append(
                            f"{ref}: {n_fail} event(s) failed condition {cond!r}"
                        )
            else:
                # reference semantics (`unit_test/mod.rs`): the output block
                # passes when ALL conditions hold for AT LEAST ONE extracted
                # event — mixed events in an output are valid.
                allc = conds[0][1]
                for _, c in conds[1:]:
                    allc = allc & c
                if df.where(allc).count() == 0:
                    failures.append(
                        f"{ref}: no event satisfied all of "
                        f"{[cond for cond, _ in conds]!r}"
                    )
        except Exception as ex:  # unevaluable condition fails the TEST
            failures.append(f"{ref}: condition error: {ex}")
    for ref in t.get("no_outputs_from", []):
        try:
            if topo.output(ref).count() != 0:
                failures.append(f"{ref}: expected no events")
        except TopologyError as ex:
            failures.append(str(ex))
    return TestResult(t.get("name", "?"), not failures, failures)
