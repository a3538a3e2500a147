"""Run the reference's OWN remap behavior corpus file
(tests/behavior/transforms/remap.yaml, 91 transforms / ~90 tests) through
this engine's vector-test harness, verbatim.

Every test either passes, or appears in KNOWN_UNSUPPORTED with a reason —
and the list is enforced in BOTH directions (an unsupported test that
starts passing must be removed), so the delta to the reference stays
honest and visible.
"""

from __future__ import annotations

import os

import pytest
import yaml

REF = "/root/reference/tests/behavior/transforms/remap.yaml"

# name → reason. Grouped by root cause; enforced both directions.
KNOWN_UNSUPPORTED = {
    "remap_function_reverse_dns": "live DNS (deliberate opt-in gate)",
}


@pytest.fixture(scope="module")
def corpus():
    if not os.path.exists(REF):
        pytest.skip("reference corpus not present")
    with open(REF) as f:
        cfg = yaml.safe_load(f)
    # the one file-based program: rebase its path onto the reference root
    rf = cfg["transforms"].get("remap_file")
    if rf and "file" in rf:
        rf["file"] = os.path.join("/root/reference", rf["file"])
    for t in (cfg.get("enrichment_tables") or {}).values():
        p = t.get("file", {}).get("path")
        if p:
            t["file"]["path"] = os.path.join(
                "/root/reference", p.lstrip("./")
            )
    return cfg


def test_reference_remap_corpus(spark, corpus):
    from vector_spark.config.unit_test import run_unit_tests

    results = run_unit_tests(spark, corpus)
    failed = {r.name: r.failures for r in results if not r.passed}
    unexpected_fail = {
        n: f for n, f in failed.items() if n not in KNOWN_UNSUPPORTED
    }
    unexpected_pass = [
        n for n in KNOWN_UNSUPPORTED
        if n not in failed and any(r.name == n for r in results)
    ]
    assert not unexpected_fail, unexpected_fail
    assert not unexpected_pass, (
        f"now passing — remove from KNOWN_UNSUPPORTED: {unexpected_pass}"
    )
    n_pass = sum(1 for r in results if r.passed)
    # corpus coverage floor: the harness must actually be running the file
    assert n_pass >= 89, f"only {n_pass} of {len(results)} corpus tests passed"
