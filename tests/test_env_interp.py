"""Config env interpolation (${VAR}, ${VAR:-default}, $VAR, $$ escape)."""

from __future__ import annotations

import pytest

from vector_spark.config.loader import TopologyError, interpolate_env


def test_forms():
    env = {"HOST": "h1", "EMPTY": ""}
    assert interpolate_env("a ${HOST} b", env) == "a h1 b"
    assert interpolate_env("$HOST", env) == "h1"
    assert interpolate_env("${MISSING:-dflt}", env) == "dflt"
    assert interpolate_env("${EMPTY:-dflt}", env) == "dflt"  # :- empty-or-unset
    assert interpolate_env("${EMPTY-dflt}", env) == ""  # - unset only
    assert interpolate_env("${MISSING-dflt}", env) == "dflt"
    assert interpolate_env("cost $$5 ${HOST}", env) == "cost $5 h1"
    assert interpolate_env("no dollars", env) == "no dollars"
    assert interpolate_env("price $5", env) == "price $5"  # digit: not a var


def test_missing_raises():
    with pytest.raises(TopologyError, match="NOPE"):
        interpolate_env("${NOPE}", {})
    with pytest.raises(TopologyError, match="NOPE"):
        interpolate_env("$NOPE", {})


def test_through_topology_yaml(spark, monkeypatch):
    from vector_spark.config.loader import load_topology, run_sinks

    monkeypatch.setenv("TEST_EVT", "keep")
    topo = load_topology(
        spark,
        allow_env_var_interpolation=True,
        path_or_yaml="""
sources:
  in:
    type: values
    rows:
      - {message: "keep 1"}
      - {message: "drop 2"}
    schema: "message string"
transforms:
  f:
    type: filter
    inputs: [in]
    condition: "message like '${TEST_EVT}%'"
sinks:
  out: {type: memory, inputs: [f]}
""",
    )
    rows = run_sinks(topo)["out"]["rows"]
    assert [r["message"] for r in rows] == ["keep 1"]


def test_interpolation_off_by_default(spark):
    """v0.58 disabled env interpolation by default
    (`--dangerously-allow-env-var-interpolation`, cli.rs:155):
    without the opt-in, ${VAR} text passes through literally."""
    import os

    os.environ["LEAK_TEST"] = "leaked"
    from vector_spark.config.loader import parse_config

    cfg = parse_config("""
sources:
  s: {type: values, rows: [{message: "${LEAK_TEST}"}], schema: "message string"}
sinks:
  o: {type: memory, inputs: [s]}
""")
    assert cfg["sources"]["s"]["rows"][0]["message"] == "${LEAK_TEST}"
    # with the opt-in, it resolves
    cfg2 = parse_config("""
sources:
  s: {type: values, rows: [{message: "${LEAK_TEST}"}], schema: "message string"}
sinks:
  o: {type: memory, inputs: [s]}
""", interpolate=True)
    assert cfg2["sources"]["s"]["rows"][0]["message"] == "leaked"
