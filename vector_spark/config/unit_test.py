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


def run_unit_tests(spark: SparkSession, cfg: dict) -> list[TestResult]:
    """Run every test under cfg['tests'] against cfg's topology.

    Each test builds the topology with its `insert_at` rows as `values`
    sources (all other sources stay as configured) and evaluates output
    assertions. Returns one TestResult per test.
    """
    tests = cfg.get("tests") or []
    results: list[TestResult] = []
    for t in tests:
        failures: list[str] = []
        test_cfg = {
            "sources": dict(cfg.get("sources", {})),
            "transforms": cfg.get("transforms", {}),
            "sinks": cfg.get("sinks", {}) or {},
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
                    rows = [dict(inp.get("log_fields") or {"message": ""})]
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
            results.append(TestResult(t.get("name", "?"), False, failures))
            continue
        try:
            topo = build_topology(spark, test_cfg)
        except TopologyError as ex:
            results.append(
                TestResult(t.get("name", "?"), False, [f"topology error: {ex}"])
            )
            continue
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
                c = _condition(cond)
                if isinstance(c, str):
                    c = F.expr(c)
                conds.append((cond, F.coalesce(c, F.lit(False))))
            if not conds:
                continue
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
        for ref in t.get("no_outputs_from", []):
            try:
                if topo.output(ref).count() != 0:
                    failures.append(f"{ref}: expected no events")
            except TopologyError as ex:
                failures.append(str(ex))
        results.append(TestResult(t.get("name", "?"), not failures, failures))
    return results
