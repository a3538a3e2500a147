"""Topology loader tests (the `vector test` harness analog: YAML config +
inline fixture rows + asserted outputs; vector src/config/unit_test/)."""

from __future__ import annotations

import pytest

from vector_spark.config.loader import (
    TopologyError,
    build_topology,
    load_topology,
    run_sinks,
)

TOPOLOGY_YAML = """
sources:
  events:
    type: values
    rows:
      - {seq: 1, level: "error", host: "a", value: 10.0}
      - {seq: 2, level: "info",  host: "a", value: 5.0}
      - {seq: 3, level: "error", host: "b", value: 7.0}
      - {seq: 4, level: "error", host: "a", value: 2.0}
transforms:
  errors:
    type: filter
    inputs: [events]
    condition: "level = 'error'"
  split:
    type: exclusive_route
    inputs: [errors]
    routes:
      - {name: host_a, condition: "host = 'a'"}
  shaped:
    type: remap
    inputs: [split.host_a]
    assign:
      doubled: "value * 2"
sinks:
  out:
    type: memory
    inputs: [shaped]
"""


def test_topology_end_to_end(spark):
    topo = load_topology(spark, TOPOLOGY_YAML)
    results = run_sinks(topo)
    rows = sorted(results["out"]["rows"], key=lambda r: r.seq)
    assert [r.seq for r in rows] == [1, 4]
    assert rows[0].doubled == 20.0


def test_topology_validates_unknown_input(spark):
    with pytest.raises(TopologyError, match="unknown input"):
        build_topology(
            spark,
            {
                "sources": {},
                "transforms": {
                    "t": {"type": "filter", "inputs": ["nope"], "condition": "1=1"}
                },
            },
        )


def test_topology_detects_cycle(spark):
    with pytest.raises(TopologyError, match="cycle"):
        build_topology(
            spark,
            {
                "sources": {},
                "transforms": {
                    "a": {"type": "filter", "inputs": ["b"], "condition": "1=1"},
                    "b": {"type": "filter", "inputs": ["a"], "condition": "1=1"},
                },
            },
        )


def test_topology_multi_input_union(spark):
    topo = build_topology(
        spark,
        {
            "sources": {
                "s1": {"type": "values", "rows": [{"seq": 1, "v": "x"}]},
                "s2": {"type": "values", "rows": [{"seq": 2, "v": "y"}]},
            },
            "transforms": {
                "merged": {"type": "filter", "inputs": ["s1", "s2"], "condition": "true"}
            },
            "sinks": {},
        },
    )
    assert topo.output("merged").count() == 2


def test_topology_datadog_search_condition(spark):
    from vector_spark.config.loader import build_topology

    topo = build_topology(
        spark,
        {
            "sources": {
                "logs": {
                    "type": "values",
                    "rows": [
                        {"seq": 1, "message": "error boom", "service": "api"},
                        {"seq": 2, "message": "all fine", "service": "api"},
                        {"seq": 3, "message": "error here", "service": "web"},
                    ],
                }
            },
            "transforms": {
                "errs": {
                    "type": "filter",
                    "inputs": ["logs"],
                    "condition": {
                        "type": "datadog_search",
                        "source": "error* AND service:api",
                    },
                }
            },
            "sinks": {},
        },
    )
    assert [r.seq for r in topo.output("errs").collect()] == [1]


def test_vector_style_unit_tests(spark):
    """The `vector test` harness shape (unit_test/mod.rs:52-60) over YAML."""
    import yaml

    from vector_spark.config.unit_test import run_unit_tests

    cfg = yaml.safe_load(
        """
sources:
  logs: {type: parquet, path: /nonexistent/replaced-by-test.parquet}
transforms:
  errs:
    type: filter
    inputs: [logs]
    condition: "level = 'error'"
  split:
    type: exclusive_route
    inputs: [errs]
    routes:
      - {name: big, condition: "bytes > 100"}
tests:
  - name: routes big errors
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, level: error, bytes: 500}
          - {seq: 2, level: info, bytes: 900}
          - {seq: 3, level: error, bytes: 5}
    outputs:
      - extract_from: errs
        conditions: ["level = 'error'"]
      - extract_from: split.big
        conditions: ["seq = 1"]
  - name: no big errors when all small
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, level: error, bytes: 5}
    no_outputs_from: [split.big]
  - name: deliberately failing assertion
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, level: error, bytes: 500}
    outputs:
      - extract_from: errs
        conditions: ["bytes < 10"]
  - name: mixed events pass at-least-one semantics
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, level: error, bytes: 500}
          - {seq: 2, level: error, bytes: 5}
    outputs:
      - extract_from: errs
        conditions: ["bytes > 100"]
  - name: strict every-event mode still available
    inputs:
      - insert_at: logs
        rows:
          - {seq: 1, level: error, bytes: 500}
          - {seq: 2, level: error, bytes: 5}
    outputs:
      - extract_from: errs
        every_event: true
        conditions: ["bytes > 100"]
"""
    )
    res = run_unit_tests(spark, cfg)
    # Output assertions use the reference's semantics (unit_test/mod.rs):
    # pass when all conditions hold for AT LEAST ONE extracted event —
    # so a mixed output passes, unless `every_event: true` opts into strict.
    assert [r.passed for r in res] == [True, True, False, True, False]
    assert "no event satisfied" in res[2].failures[0]
    assert "failed condition" in res[4].failures[0]


def test_topology_vrl_remap_with_dropped(spark):
    from vector_spark.config.loader import build_topology

    topo = build_topology(
        spark,
        {
            "sources": {
                "logs": {
                    "type": "values",
                    "rows": [
                        {"seq": 1, "raw": "41"},
                        {"seq": 2, "raw": "nope"},
                    ],
                }
            },
            "transforms": {
                "shaped": {
                    "type": "remap",
                    "inputs": ["logs"],
                    "source": ".n = to_int!(.raw) + 1",
                    "reroute_dropped": True,
                }
            },
            "sinks": {},
        },
    )
    assert [r.n for r in topo.output("shaped").collect()] == [42]
    assert [r.seq for r in topo.output("shaped.dropped").collect()] == [2]


def test_topology_line_agg_delay_enrich_sessionize(spark):
    from vector_spark.config.loader import build_topology

    topo = build_topology(
        spark,
        {
            "sources": {
                "logs": {
                    "type": "values",
                    "rows": [
                        {"seq": 1, "f": "a", "line": "[ts] one"},
                        {"seq": 2, "f": "a", "line": "cont"},
                        {"seq": 3, "f": "a", "line": "[ts] two"},
                    ],
                }
            },
            "transforms": {
                "multi": {
                    "type": "line_agg",
                    "inputs": ["logs"],
                    "group_by": ["f"],
                    "order_col": "seq",
                    "line_col": "line",
                    "mode": "halt_before",
                    "condition": "line LIKE '[ts]%'",
                    "separator": "|",
                },
                "tagged": {
                    "type": "static_enrich",
                    "inputs": ["multi"],
                    "metadata": {"dc": "us-east-1"},
                },
            },
            "sinks": {},
        },
    )
    rows = topo.output("tagged").orderBy("first_seq").collect()
    assert [r.message for r in rows] == ["[ts] one|cont", "[ts] two"]
    assert all(r.dc == "us-east-1" for r in rows)


def test_throttle_templated_key_field(spark):
    """vector key_field is a template (throttle/config.rs): `{{ a }}-{{ b }}`
    composes a throttle key from multiple fields."""
    from vector_spark.config.loader import build_topology, run_sinks

    rows = [
        {"seq": i, "svc": "api" if i % 2 else "db", "region": "us", "ts_s": "2024-01-01 00:00:00"}
        for i in range(10)
    ]
    topo = build_topology(
        spark,
        {
            "sources": {"ev": {"type": "values", "rows": rows}},
            "transforms": {
                "stamped": {
                    "type": "remap",
                    "inputs": ["ev"],
                    "assign": {"ts": "to_timestamp(ts_s)"},
                },
                "lim": {
                    "type": "throttle",
                    "inputs": ["stamped"],
                    "threshold": 2,
                    "window_secs": 3600,
                    "key_field": "{{ svc }}-{{ region }}",
                    "order_cols": ["seq"],
                },
            },
            "sinks": {"out": {"type": "memory", "inputs": ["lim"]}},
        },
    )
    out = run_sinks(topo)["out"]["rows"]
    # 2 per composed key (api-us, db-us) admitted
    assert len(out) == 4
    assert "_tmpl_key" not in out[0].asDict()


def test_source_decoding_codec(spark):
    """The reference's per-source `decoding.codec` option: raw lines
    decode at the source and the parsed fields land as event columns."""
    from vector_spark.config.loader import build_topology, run_sinks

    topo = build_topology(
        spark,
        {
            "sources": {
                "scrape": {
                    "type": "values",
                    "decoding": {"codec": "prometheus"},
                    "rows": [
                        {"seq": 1, "message": 'up{job="api"} 1 1700000000000'},
                        {"seq": 2, "message": 'up{job="db"} 0 1700000000001'},
                    ],
                }
            },
            "transforms": {
                "healthy": {
                    "type": "filter",
                    "inputs": ["scrape"],
                    "condition": "value = 1.0",
                }
            },
            "sinks": {"out": {"type": "memory", "inputs": ["healthy"]}},
        },
    )
    rows = run_sinks(topo)["out"]["rows"]
    assert len(rows) == 1
    assert rows[0].name == "up" and rows[0].labels["job"] == "api"


def test_config_formats_toml_json_and_multifile(spark, tmp_path):
    """The reference accepts YAML/TOML/JSON configs and merges multiple
    files into one graph (src/config/format.rs, loading/mod.rs)."""
    from vector_spark.config.loader import (
        TopologyError,
        load_topology,
        merge_configs,
        parse_config,
    )

    toml_p = tmp_path / "sources.toml"
    toml_p.write_text(
        '[sources.ev]\ntype = "values"\n'
        "rows = [{event_id = 1, value = 150.0}, {event_id = 2, value = 10.0}]\n"
    )
    json_p = tmp_path / "rest.json"
    json_p.write_text(
        '{"transforms": {"big": {"type": "filter", "inputs": ["ev"],'
        ' "condition": "value > 100"}},'
        ' "sinks": {"out": {"type": "memory", "inputs": ["big"]}}}'
    )
    topo = load_topology(spark, [str(toml_p), str(json_p)])
    assert [r["event_id"] for r in topo.output("big").collect()] == [1]

    # duplicate component name across files is an error (same strictness)
    import pytest as _pytest

    dup = tmp_path / "dup.json"
    dup.write_text('{"sources": {"ev": {"type": "values", "rows": []}}}')
    with _pytest.raises(TopologyError, match="more than one file"):
        merge_configs([parse_config(str(toml_p)), parse_config(str(dup))])


def test_incremental_available_now_exactly_once(spark, tmp_path):
    """Trigger.AvailableNow ingest: each run processes exactly the files
    new since the last run (cron-batch exactly-once via the checkpoint)."""
    import json as _json
    import time as _time

    from vector_spark.config.loader import load_topology, start_streaming_sinks

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps({"n": i}) for i in range(5))
    )
    yaml_cfg = f"""
sources:
  files:
    type: stream_file
    path: {src}
    format: json
    schema: "n long"
sinks:
  sink:
    type: parquet
    inputs: [files]
    trigger: available_now
    path: {out}
    checkpoint: {ckpt}
"""

    def run_once():
        qs = start_streaming_sinks(load_topology(spark, yaml_cfg))
        for q in qs.values():
            q.awaitTermination(60)
            assert not q.isActive  # AvailableNow stops by itself
    run_once()
    assert spark.read.parquet(str(out)).count() == 5
    # second run with NO new data: nothing re-processed
    run_once()
    assert spark.read.parquet(str(out)).count() == 5
    # new file appears; third run picks up exactly it
    (src / "b.json").write_text(
        "\n".join(_json.dumps({"n": i}) for i in range(5, 8))
    )
    run_once()
    df = spark.read.parquet(str(out))
    assert df.count() == 8
    assert sorted(r["n"] for r in df.collect()) == list(range(8))


def test_reference_formats_corpus_json_yaml_equivalent(spark, tmp_path):
    """tests/behavior/formats/simple.{json,yaml}: the same topology+test
    in JSON and YAML parses and passes identically through the vector-test
    harness (nested-path remap through the format-agnostic front end)."""
    from vector_spark.config.loader import parse_config
    from vector_spark.config.unit_test import run_unit_tests

    # verbatim corpus content: nested-path remap + VRL condition
    src = ".a.b = 123\n.x.y = 456\n.x.z = 789\n"
    cond = ".a.b == 123 && .x.y == 456 && .x.z == 789"
    body = {
        "transforms": {
            "add_fields_nested": {
                "inputs": [],
                "type": "remap",
                "source": src,
            }
        },
        "tests": [
            {
                "name": "add_fields_nested",
                "input": {
                    "insert_at": "add_fields_nested",
                    "type": "raw",
                    "value": "",
                },
                "outputs": [
                    {
                        "extract_from": "add_fields_nested",
                        "conditions": [{"type": "vrl", "source": cond}],
                    }
                ],
            }
        ],
    }
    import json as _json

    import yaml as _yaml

    jp = tmp_path / "simple.json"
    jp.write_text(_json.dumps(body))
    yp = tmp_path / "simple.yaml"
    yp.write_text(_yaml.safe_dump(body))
    for p in (jp, yp):
        cfg = parse_config(str(p))
        results = run_unit_tests(spark, cfg)
        assert [r.passed for r in results] == [True], (p, results[0].failures)


def test_multifile_merge_keeps_enrichment_tables_and_tests(spark, tmp_path):
    # Review finding r3 (medium): merge_configs only merged component
    # sections, silently discarding enrichment_tables (and tests) from
    # multi-file configs — the reference's --config-dir loading merges
    # them across files (src/config/loading/mod.rs).
    from vector_spark.config.loader import (
        TopologyError,
        load_topology,
        merge_configs,
        parse_config,
    )

    csv = tmp_path / "codes.csv"
    csv.write_text("code,label\n7,seven\n9,nine\n")
    tables = tmp_path / "tables.yaml"
    tables.write_text(
        "enrichment_tables:\n"
        "  codes:\n"
        "    type: file\n"
        f"    file: {{path: {csv}, encoding: {{type: csv}}}}\n"
        "tests:\n"
        "  - name: t1\n"
        "    inputs:\n"
        "      - {insert_at: label, type: log, log_fields: {code: '7'}}\n"
        "    outputs:\n"
        "      - extract_from: label\n"
        "        conditions:\n"
        "          - {type: vrl, source: '.label == \"seven\"'}\n"
    )
    topo_f = tmp_path / "topo.yaml"
    topo_f.write_text(
        "sources:\n"
        "  ev: {type: values, rows: [{code: '7'}]}\n"
        "transforms:\n"
        "  label:\n"
        "    type: remap\n"
        "    inputs: [ev]\n"
        "    source: |\n"
        "      .row = get_enrichment_table_record!(\"codes\", {\"code\": .code})\n"
        "      .label = .row.label\n"
        "      del(.row)\n"
        "sinks:\n"
        "  out: {type: memory, inputs: [label]}\n"
    )
    merged = merge_configs([parse_config(str(tables)), parse_config(str(topo_f))])
    assert "codes" in merged["enrichment_tables"]
    assert len(merged["tests"]) == 1
    topo = load_topology(spark, [str(tables), str(topo_f)])
    assert [r["label"] for r in topo.output("label").collect()] == ["seven"]

    from vector_spark.config.unit_test import run_unit_tests

    results = run_unit_tests(spark, merged)
    assert [r.passed for r in results] == [True], results[0].failures

    dup = tmp_path / "dup.yaml"
    dup.write_text(tables.read_text())
    import pytest as _pytest

    with _pytest.raises(TopologyError, match="more than one file"):
        merge_configs([parse_config(str(tables)), parse_config(str(dup))])


def test_reference_example_configs_validate():
    """Every example config the reference ships (config/examples/*,
    including the namespaced --config-dir layout) validates against
    this loader — the switch-over parity receipt at the config level.
    Spark-free (cmd_validate is structural)."""
    import glob
    import os

    from vector_spark.cli import cmd_validate

    base = "/root/reference/config/examples"
    if not os.path.isdir(base):
        import pytest

        pytest.skip("reference tree not available")
    paths = sorted(glob.glob(os.path.join(base, "*.yaml")))
    assert len(paths) >= 10
    for p in paths:
        out = cmd_validate([p])
        assert out.startswith("Validated:"), p
    # namespaced directory: one component per file under
    # sources/ transforms/ sinks/, named by file stem
    out = cmd_validate([os.path.join(base, "namespacing")])
    assert "5 components" in out


def test_file_source_streams_lines(spark, tmp_path):
    """The reference's `file` source (include globs → message/file/ts
    events): lines written to matching files stream through a topology
    to a memory sink; excluded patterns are dropped."""
    import os
    import time
    import uuid

    from vector_spark.config.loader import (
        load_topology,
        start_streaming_sinks,
    )

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "app.log").write_text("one\ntwo\n")
    (logs / "skip.tmp").write_text("nope\n")
    name = f"file_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  tail:
    type: file
    include: ["{logs}/*.log", "{logs}/*.tmp"]
    exclude: ["*.tmp"]
sinks:
  out:
    type: memory
    inputs: [tail]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        got = []
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            got = sorted(r.message for r in rows)
            if len(got) >= 2:
                break
            time.sleep(0.5)
        assert got == ["one", "two"]
        assert all(r.file.endswith("app.log")
                   for r in spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        for q in queries.values():
            q.stop()


def test_geoip_enrichment_table_in_topology(spark):
    """`enrichment_tables: {type: geoip/mmdb}` (src/enrichment_tables/
    geoip.rs, mmdb.rs) loads a MaxMind database as a range table, and a
    VRL get_enrichment_table_record with an "ip" condition compiles to
    the broadcast containment join."""
    import os

    from vector_spark.config.loader import load_topology, run_sinks

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "geo.mmdb")
    topo = load_topology(
        spark,
        f"""
enrichment_tables:
  geo:
    type: geoip
    path: {fixture}
sources:
  hits:
    type: values
    rows:
      - {{client_ip: "10.0.0.7"}}
      - {{client_ip: "10.40.0.9"}}
      - {{client_ip: "203.0.113.5"}}
transforms:
  located:
    type: remap
    inputs: [hits]
    source: |
      .geo = get_enrichment_table_record!("geo", {{"ip": .client_ip}})
sinks:
  out:
    type: memory
    inputs: [located]
""",
    )
    res = run_sinks(topo)
    def iso(r):
        return r.geo["country.iso_code"] if r.geo is not None else None
    got = {r.client_ip: iso(r) for r in res["out"]["rows"]}
    assert got["10.0.0.7"] == "US"      # 167772160-range (Kansas City)
    assert got["10.40.0.9"] == "DE"     # second /11 block
    assert got["203.0.113.5"] is None   # outside every range


def test_http_config_provider(spark, tmp_path):
    """`provider: {type: http}` bootstrap (src/providers/http.rs): the
    real topology is fetched from an HTTP endpoint — headers forwarded,
    format parsed, env interpolated when asked, recursive providers
    rejected, and poll_provider yields only on content CHANGE."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.config.loader import (
        TopologyError,
        build_topology,
        run_sinks,
    )
    from vector_spark.config.provider import (
        ProviderError,
        load_provider_config,
        poll_provider,
    )

    src = spark.createDataFrame([(i,) for i in range(7)], "seq long")
    path = str(tmp_path / "p.parquet")
    src.write.parquet(path)

    served = {"body": f"""
sources:
  s: {{type: parquet, path: "{path}"}}
sinks:
  k: {{type: blackhole, inputs: [s]}}
""", "auth": []}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            served["auth"].append(self.headers.get("Authorization"))
            body = served["body"].encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/topology.yaml"
    try:
        topo = build_topology(spark, {"provider": {
            "type": "http", "url": url,
            "request": {"headers": {"Authorization": "Bearer tok-1"}},
        }})
        assert run_sinks(topo)["k"]["count"] == 7
        assert served["auth"][-1] == "Bearer tok-1"

        # bootstrap must not ALSO declare components
        with pytest.raises(TopologyError, match="must not also"):
            build_topology(spark, {
                "provider": {"type": "http", "url": url},
                "sources": {"x": {"type": "values", "rows": []}},
            })

        # recursive provider rejected
        served["body"] = 'provider: {type: http, url: "http://x/"}'
        with pytest.raises(ProviderError, match="recursive"):
            load_provider_config({"type": "http", "url": url})

        # env interpolation opt-in
        import os

        os.environ["PROV_PATH"] = path
        served["body"] = """
sources:
  s: {type: parquet, path: "${PROV_PATH}"}
sinks:
  k: {type: blackhole, inputs: [s]}
"""
        cfg = load_provider_config({
            "type": "http", "url": url, "interpolate_env": True})
        assert cfg["sources"]["s"]["path"] == path

        # poll: yields initial config, suppresses unchanged bodies,
        # yields again on change
        bodies = [served["body"], served["body"],
                  served["body"].replace("blackhole", "memory")]
        seen = []

        def fake_sleep(_secs):
            if bodies:
                served["body"] = bodies.pop(0)

        for cfg in poll_provider(
            {"type": "http", "url": url, "poll_interval_secs": 0,
             "interpolate_env": True},
            max_polls=4, sleep=fake_sleep,
        ):
            seen.append(json.dumps(cfg, sort_keys=True))
        assert len(seen) == 2  # initial + the one real change
        assert "memory" in seen[-1]
    finally:
        srv.shutdown()
