"""Route / filter / dedupe behavior corpora through the `vector test`
harness.

Cases adapted from the reference's own suites
(`tests/behavior/transforms/{route,filter,dedupe}.yaml`), run through
`config/unit_test.run_unit_tests` — the same insert_at / extract_from /
no_outputs_from shape the reference uses, with SQL condition dialect.
"""

from __future__ import annotations

import yaml

from vector_spark.config.unit_test import run_unit_tests


def _run(spark, text):
    results = run_unit_tests(spark, yaml.safe_load(text))
    failed = [(r.name, r.failures) for r in results if not r.passed]
    assert not failed, failed


# route.yaml: multi-match routing + downstream chaining off one route,
# `third` = is_log (always true for log streams here)
def test_route_corpus(spark):
    _run(
        spark,
        """
sources:
  logs: {type: parquet, path: /replaced/by/test.parquet}
transforms:
  foo:
    type: route
    inputs: [logs]
    routes:
      - {name: first, condition: "message = 'test swimlane 1'"}
      - {name: second, condition: "message = 'test swimlane 2'"}
      - {name: third, condition: "true"}
  bar:
    type: remap
    inputs: [foo.first]
    assign:
      new_field: "'new field added'"
tests:
  - name: route test 1
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, message: test swimlane 1}
    no_outputs_from: [foo.second]
    outputs:
      - extract_from: foo.first
        conditions: ["message = 'test swimlane 1'"]
      - extract_from: bar
        conditions:
          - "message = 'test swimlane 1'"
          - "new_field = 'new field added'"
      - extract_from: foo.third
        conditions: ["message = 'test swimlane 1'"]
  - name: route test 2
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, message: test swimlane 2}
    no_outputs_from: [foo.first, bar]
    outputs:
      - extract_from: foo.second
        conditions: ["message = 'test swimlane 2'"]
      - extract_from: foo.third
        conditions: ["message = 'test swimlane 2'"]
""",
    )


# filter.yaml: exact-match and contains filters, empty-output assertions
def test_filter_corpus(spark):
    _run(
        spark,
        """
sources:
  logs: {type: parquet, path: /replaced/by/test.parquet}
transforms:
  filter_a:
    type: filter
    inputs: [logs]
    condition: "message = 'test filter 1'"
  filter_b:
    type: filter
    inputs: [logs]
    condition: "message LIKE '%test filter%' AND message LIKE '%2%'"
tests:
  - name: filter test 1a
    inputs:
      - insert_at: logs
        rows: [{seq: 1, message: test filter 1}]
    outputs:
      - extract_from: filter_a
        conditions: ["message = 'test filter 1'"]
  - name: filter test 1b
    inputs:
      - insert_at: logs
        rows: [{seq: 1, message: test filter 1}]
    no_outputs_from: [filter_b]
  - name: filter test 2a
    inputs:
      - insert_at: logs
        rows: [{seq: 1, message: test filter 2}]
    no_outputs_from: [filter_a]
  - name: filter test 2b
    inputs:
      - insert_at: logs
        rows: [{seq: 1, message: test filter 2}]
    outputs:
      - extract_from: filter_b
        conditions: ["message = 'test filter 2'"]
""",
    )


# dedupe.yaml: first occurrence per match-key wins; key includes every
# listed field (field ORDER is part of the reference's key encoding; the
# groupBy key set is order-insensitive — same admitted set)
def test_dedupe_corpus(spark):
    _run(
        spark,
        """
sources:
  logs: {type: parquet, path: /replaced/by/test.parquet}
transforms:
  dedupe_simple:
    type: dedupe
    inputs: [logs]
    order_col: seq
    fields:
      match: [a]
  dedupe_two_fields:
    type: dedupe
    inputs: [logs]
    order_col: seq
    fields:
      match: [a, b]
tests:
  - name: dedupe_simple
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, a: 1, b: 2}
          - {seq: 2, a: 1, b: 3}
          - {seq: 3, a: 2, b: 4}
    outputs:
      - extract_from: dedupe_simple
        conditions: ["a = 1 AND b = 2"]
      - extract_from: dedupe_simple
        conditions: ["a = 2 AND b = 4"]
  - name: dedupe_simple drops later duplicate
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, a: 1, b: 2}
          - {seq: 2, a: 1, b: 3}
    outputs:
      - extract_from: dedupe_simple
        conditions: ["b <> 3"]
  - name: dedupe_field_order
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, a: 1, b: 2, c: 3}
          - {seq: 2, b: 2, a: 1, c: 3}
          - {seq: 3, a: 1, b: 3, c: 3}
    outputs:
      - extract_from: dedupe_two_fields
        conditions: ["a = 1 AND b = 2 AND c = 3 AND seq = 1"]
      - extract_from: dedupe_two_fields
        conditions: ["a = 1 AND b = 3 AND c = 3"]
""",
    )


def test_reference_remap_with_drop_corpus(spark):
    """The reference's remap_with_drop.yaml verbatim: an unconditional
    abort under drop_on_abort + reroute_dropped sends the ORIGINAL event
    to the named dropped output and nothing to the primary."""
    import os

    import yaml as _yaml

    from vector_spark.config.unit_test import run_unit_tests

    p = "/root/reference/tests/behavior/transforms/remap_with_drop.yaml"
    if not os.path.exists(p):
        import pytest as _pytest

        _pytest.skip("reference corpus not present")
    with open(p) as f:
        cfg = _yaml.safe_load(f)
    results = run_unit_tests(spark, cfg)
    assert [r.passed for r in results] == [True], results[0].failures


def test_reference_vrl_test_input_corpus(spark):
    """vrl_test_input.yaml verbatim: `type: vrl` inputs — a VRL program
    generates the injected event (root replacement against an empty
    event); remap_test_metadata exercises bare `%` metadata roots and
    whole-event `.` reads (scalar form for message-only events)."""
    import os

    import yaml as _yaml

    from vector_spark.config.unit_test import run_unit_tests

    p = "/root/reference/tests/behavior/transforms/vrl_test_input.yaml"
    if not os.path.exists(p):
        import pytest as _pytest

        _pytest.skip("reference corpus not present")
    with open(p) as f:
        cfg = _yaml.safe_load(f)
    results = {r.name: r for r in run_unit_tests(spark, cfg)}
    assert results["canary"].passed, results["canary"].failures
    assert results["remap_test_metadata"].passed, (
        results["remap_test_metadata"].failures
    )
