"""Topology loader: the engine's "query language" front end.

The reference's query surface is a YAML/TOML config declaring a DAG of
sources → transforms → sinks (vector `src/config/loading/mod.rs:144` →
`src/config/compiler.rs:11` → `src/config/graph.rs:269` cycle check →
`src/topology/builder.rs:181` physical build). We replicate that lifecycle:

  parse YAML → validate names/inputs → cycle-check (DFS) → build one
  DataFrame per component output (topological order) → sinks act.

Catalyst replaces the reference's static type propagation
(`src/topology/schema.rs:21`): chaining DataFrame builders type-checks the
whole plan at build time, before any execution.

Multi-output transforms (route, exclusive_route, remap with reroute_dropped)
expose named outputs addressable as `component.output` in `inputs:` lists,
exactly like the reference (`remap.rs:50` dropped output, route named
outputs). Multiple `inputs:` union (vector's implicit stream merge,
`src/topology/builder.rs` fanout/merge).

Example:

    sources:
      events: {type: parquet, path: /data/events.parquet}
    transforms:
      errors:
        type: filter
        inputs: [events]
        condition: "event_type = 'error'"
      split:
        type: exclusive_route
        inputs: [errors]
        routes:
          - {name: big, condition: "value > 100"}
    sinks:
      out: {type: parquet, inputs: [split.big], path: /tmp/out}
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.operators import (
    dedupe,
    filter_op,
    reduce_op,
    sample,
    throttle,
    window_context,
)
from vector_spark.operators.aggregate import aggregate
from vector_spark.operators.metrics import (
    MetricSpec,
    incremental_to_absolute,
    log_to_metric,
    metric_to_log,
    trace_to_log,
)
from vector_spark.operators.route import exclusive_route, route
from vector_spark.operators.tag_cardinality import tag_cardinality_limit


class TopologyError(ValueError):
    pass


@dataclass
class Topology:
    """Validated component graph + built DataFrames per component output."""

    sources: dict[str, dict]
    transforms: dict[str, dict]
    sinks: dict[str, dict]
    outputs: dict[str, DataFrame] = dc_field(default_factory=dict)
    # `api:` section, when enabled (src/config/api.rs): the live
    # ObservabilityService endpoint + the counters view feeding it
    api: Any = None
    api_view: Any = None
    # top-level GlobalOptions (log_schema/timezone/proxy/data_dir/...,
    # lib/vector-core/src/config/global_options.rs) — parsed in
    # build_topology; sinks consult it for field keys and proxies
    globals: Any = None

    def output(self, ref: str) -> DataFrame:
        if ref not in self.outputs:
            raise TopologyError(f"unknown output: {ref}")
        return self.outputs[ref]


_ENV_RE = None


def interpolate_env(text: str, env: dict | None = None) -> str:
    """Vector's config env interpolation (src/config/loading/mod.rs and
    docs: `${VAR}`, `${VAR:-default}` with empty-or-unset, `${VAR-default}`
    unset-only, `$VAR` bare; `$$` escapes a literal `$`). Unset variables
    without a default raise — same strictness as the reference."""
    import os
    import re

    global _ENV_RE
    if _ENV_RE is None:
        _ENV_RE = re.compile(
            r"\$\$|\$\{([A-Za-z_][A-Za-z0-9_]*)(?:(:?-)([^}]*))?\}"
            r"|\$([A-Za-z_][A-Za-z0-9_]*)"
        )
    env = os.environ if env is None else env

    def repl(m: "re.Match[str]") -> str:
        if m.group(0) == "$$":
            return "$"
        name = m.group(1) or m.group(4)
        op, default = m.group(2), m.group(3)
        val = env.get(name)
        if op == ":-" and not val:  # unset OR empty
            return default
        if op == "-" and val is None:  # unset only
            return default
        if val is None:
            raise TopologyError(
                f"missing environment variable {name!r} (use "
                f"${{{name}:-default}} for a fallback)"
            )
        return val

    return _ENV_RE.sub(repl, text)


def load_config_dir(dir_path: str, interpolate: bool = False) -> dict:
    """Directory (namespaced) config loading — the reference's
    --config-dir layout (src/config/loading/mod.rs, shown in
    config/examples/namespacing/): top-level config files parse as
    whole configs; subdirectories named sources/ transforms/ sinks/
    enrichment_tables/ tests/ contribute ONE component per file, the
    component name being the file stem (apache_logs.yaml under
    sources/ becomes sources.apache_logs)."""
    import os

    exts = (".yaml", ".yml", ".toml", ".json")
    cfgs: list[dict] = []
    namespaced: dict = {}
    for entry in sorted(os.listdir(dir_path)):
        full = os.path.join(dir_path, entry)
        if os.path.isfile(full) and entry.lower().endswith(exts):
            cfgs.append(parse_config(full, interpolate=interpolate))
        elif os.path.isdir(full) and entry in (
                "sources", "transforms", "sinks",
                "enrichment_tables", "tests"):
            for fname in sorted(os.listdir(full)):
                stem, ext = os.path.splitext(fname)
                if ext.lower() not in exts:
                    continue
                comp = parse_config(os.path.join(full, fname),
                                    interpolate=interpolate)
                namespaced.setdefault(entry, {})[stem] = comp
    if namespaced:
        cfgs.append(namespaced)
    if not cfgs:
        raise TopologyError(f"no config files under {dir_path!r}")
    return cfgs[0] if len(cfgs) == 1 else merge_configs(cfgs)


def parse_config(path_or_text: str, interpolate: bool = False) -> dict:
    """Parse a config from a file path or literal text. YAML, TOML, and
    JSON are accepted (the reference's three config formats,
    src/config/format.rs — format from the file extension, YAML for
    literal text since YAML is a JSON superset). `${VAR}` env
    interpolation is OFF unless ``interpolate=True`` — v0.58 disabled
    it by default behind `--dangerously-allow-env-var-interpolation`
    (src/config/loading/mod.rs:313 prepare_input, cli.rs:155); with it
    off, `${VAR}` text passes through literally. A DIRECTORY path
    loads with the namespaced --config-dir layout (load_config_dir)."""
    import os

    import yaml

    fmt = "yaml"
    if os.path.isdir(path_or_text):
        return load_config_dir(path_or_text, interpolate=interpolate)
    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()
        ext = os.path.splitext(path_or_text)[1].lower()
        fmt = {"": "yaml", ".yaml": "yaml", ".yml": "yaml",
               ".toml": "toml", ".json": "yaml"}.get(ext, "yaml")
    else:
        text = path_or_text
    if interpolate:
        text = interpolate_env(text)
    if fmt == "toml":
        import tomllib

        cfg = tomllib.loads(text)
    else:
        cfg = yaml.safe_load(text)
    # SECRET[backend.key] placeholders resolve after env interpolation,
    # before the topology builds (src/secrets/mod.rs lifecycle)
    from vector_spark.config.secrets import resolve_secrets

    return resolve_secrets(cfg)


def merge_configs(cfgs: list[dict]) -> dict:
    """Merge component maps across config files (the reference's
    multi-file/--config-dir loading, src/config/loading/mod.rs: each
    file contributes components into one graph; a component name defined
    twice is an error, same strictness)."""
    comp_sections = ("sources", "transforms", "sinks")
    out: dict = {s: {} for s in comp_sections}
    for cfg in cfgs:
        for section in comp_sections:
            for name, comp in (cfg.get(section) or {}).items():
                if any(name in out[s] for s in comp_sections):
                    raise TopologyError(
                        f"component {name!r} defined in more than one file"
                    )
                out[section][name] = comp
        # Non-component sections merge too — the reference's loader folds
        # enrichment_tables and unit tests from every file into one config
        # (src/config/loading/mod.rs); dropping them would silently break
        # any remap using get_enrichment_table_record from a sibling file.
        for name, tbl in (cfg.get("enrichment_tables") or {}).items():
            tables = out.setdefault("enrichment_tables", {})
            if name in tables:
                raise TopologyError(
                    f"enrichment table {name!r} defined in more than one file"
                )
            tables[name] = tbl
        if cfg.get("tests"):
            out.setdefault("tests", []).extend(cfg["tests"])
    return out


def load_topology(
    spark: SparkSession,
    path_or_yaml: str | list[str],
    allow_env_var_interpolation: bool = False,
) -> Topology:
    """Load a topology from one or many YAML/TOML/JSON file paths (or one
    literal YAML string); multiple files merge into one component graph.
    `${VAR}` env interpolation requires the explicit opt-in, matching
    v0.58's default (`--dangerously-allow-env-var-interpolation`)."""
    interp = allow_env_var_interpolation
    if isinstance(path_or_yaml, list):
        cfg = merge_configs(
            [parse_config(p, interpolate=interp) for p in path_or_yaml])
    else:
        cfg = parse_config(path_or_yaml, interpolate=interp)
    return build_topology(spark, cfg)


def _available_input_refs(sources: dict, transforms: dict,
                          table_source_keys: set) -> list[str]:
    """Every ref an `inputs:` entry may name: component ids plus named
    output ports (route/exclusive_route port names, remap `.dropped`) —
    the reference's available_inputs set (graph.rs:140-190)."""
    refs: list[str] = list(sources) + list(transforms)
    refs.extend(k for k in table_source_keys if k)
    for n, t in transforms.items():
        ttype = t.get("type")
        if ttype == "route":
            refs.extend(f"{n}.{r['name']}" for r in t.get("routes", []))
            if t.get("reroute_unmatched", True):
                refs.append(f"{n}._unmatched")
        elif ttype == "exclusive_route":
            refs.extend(f"{n}.{r['name']}" for r in t.get("routes", []))
            refs.append(f"{n}._default")
        elif ttype == "remap" and t.get("reroute_dropped"):
            refs.append(f"{n}.dropped")
    return refs


def _expand_input_globs(cfg: dict, sources: dict, transforms: dict,
                        sinks: dict, table_source_keys: set) -> None:
    """Glob patterns in `inputs:` expand against the available refs
    (graph.rs add_input). Strict mode (default) errors when a glob
    matches nothing; `wildcard_matching: relaxed` drops it silently
    (global_options.rs:73-79). Rewrites inputs in place."""
    relaxed = cfg.get("wildcard_matching") == "relaxed"
    available = _available_input_refs(sources, transforms,
                                      table_source_keys)
    table_inputs = [
        t for t in (cfg.get("enrichment_tables") or {}).values()
        if t.get("type") == "memory" and t.get("inputs")
    ]
    for cname, comp in ({**transforms, **sinks}.items()):
        comp_list = comp.get("inputs")
        if not comp_list:
            continue
        _rewrite_globs(cname, comp, available, relaxed)
    for t in table_inputs:
        _rewrite_globs("enrichment table", t, available, relaxed)


def _rewrite_globs(cname: str, comp: dict, available: list[str],
                   relaxed: bool) -> None:
    import fnmatch

    out: list[str] = []
    for inp in comp.get("inputs", []):
        if not any(ch in inp for ch in "*?["):
            out.append(inp)
            continue
        # a glob must not match the component itself (graph.rs excludes
        # self-edges from wildcard expansion)
        matches = sorted(m for m in fnmatch.filter(available, inp)
                         if m != cname and m.split(".", 1)[0] != cname)
        if not matches and not relaxed:
            raise TopologyError(
                f"{cname}: input {inp!r} didn't match any components "
                "(set `wildcard_matching: relaxed` to allow)")
        out.extend(m for m in matches if m not in out)
    comp["inputs"] = out


def _validate(cfg: dict) -> tuple[dict, dict, dict]:
    sources = cfg.get("sources", {}) or {}
    transforms = cfg.get("transforms", {}) or {}
    sinks = cfg.get("sinks", {}) or {}
    names = set(sources) | set(transforms) | set(sinks)
    if len(names) != len(sources) + len(transforms) + len(sinks):
        raise TopologyError("duplicate component names")
    # memory enrichment tables expand into sources (config/compiler.rs:
    # 60-77): their source_key is a valid input ref, and the tables'
    # own `inputs` are validated like any sink's
    tables = cfg.get("enrichment_tables") or {}
    table_source_keys = {
        (t.get("source_config") or {}).get("source_key")
        for t in tables.values() if t.get("type") == "memory"
    } - {None}
    # glob patterns in inputs expand against the available refs BEFORE
    # resolution (graph.rs add_input; strict vs relaxed wildcards)
    _expand_input_globs(cfg, sources, transforms, sinks,
                        table_source_keys)
    # input refs resolve (allow `component.output` sub-addressing)
    table_inputs = {
        f"enrichment table {n}": {"inputs": t.get("inputs", [])}
        for n, t in tables.items()
        if t.get("type") == "memory" and t.get("inputs")
    }
    for cname, comp in {**transforms, **sinks, **table_inputs}.items():
        for inp in comp.get("inputs", []):
            base = inp.split(".", 1)[0]
            if (base not in sources and base not in transforms
                    and base not in table_source_keys):
                raise TopologyError(f"{cname}: unknown input {inp!r}")
    # cycle check over transform graph (DFS, mirrors graph.rs:269-321)
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in transforms}

    def dfs(n: str, stack: list[str]) -> None:
        color[n] = GRAY
        for inp in transforms[n].get("inputs", []):
            base = inp.split(".", 1)[0]
            if base in transforms:
                if color[base] == GRAY:
                    raise TopologyError(
                        f"cycle detected: {' -> '.join(stack + [n, base])}"
                    )
                if color[base] == WHITE:
                    dfs(base, stack + [n])
        color[n] = BLACK

    for n in transforms:
        if color[n] == WHITE:
            dfs(n, [])
    return sources, transforms, sinks


# per-source decode layer (the reference's `decoding.codec` source
# option): codec name → parse the message column; struct results flatten
# into top-level fields like the reference's decoded events
_DECODE_CODECS = {
    "syslog": ("vector_spark.functions.vrl", "parse_syslog", True),
    "apache": ("vector_spark.functions.vrl", "parse_apache_log", True),
    "nginx": ("vector_spark.functions.vrl", "parse_nginx_log", True),
    "glog": ("vector_spark.functions.vrl", "parse_glog", True),
    "cef": ("vector_spark.functions.vrl", "parse_cef", True),
    "gelf": ("vector_spark.functions.codecs", "decode_gelf", True),
    "statsd": ("vector_spark.functions.codecs", "decode_statsd", True),
    "influxdb": ("vector_spark.functions.codecs", "decode_influxdb_line", True),
    "prometheus": ("vector_spark.functions.codecs", "decode_prometheus_line", True),
    "logfmt": ("vector_spark.functions.codecs", "decode_logfmt", False),
    "splunk_hec": ("vector_spark.functions.codecs", "decode_splunk_hec", True),
    "native_json": None,  # handled inline (needs a log schema option)
}


def _apply_decoding(df: DataFrame, cfg: dict,
                    msg_key: str = "message") -> DataFrame:
    dec = cfg.get("decoding")
    if not dec:
        return df
    codec = dec["codec"] if isinstance(dec, dict) else dec
    field = (dec.get("field", msg_key) if isinstance(dec, dict) else msg_key)
    if codec not in _DECODE_CODECS:
        raise TopologyError(f"unknown decoding codec {codec!r}")
    if codec == "native_json":
        from vector_spark.functions.codecs import decode_native_json

        schema = dec.get("log_schema", "message string") if isinstance(dec, dict) else "message string"
        parsed = df.withColumn(
            "_decoded", decode_native_json(F.col(field), schema)
        )
        return parsed.select("*", "_decoded.log.*").drop("_decoded")
    mod, fn, is_struct = _DECODE_CODECS[codec]
    decode = getattr(__import__(mod, fromlist=[fn]), fn)
    parsed = df.withColumn("_decoded", decode(F.col(field)))
    if is_struct:
        return parsed.select("*", "_decoded.*").drop("_decoded")
    return parsed.withColumnRenamed("_decoded", "decoded")


def _build_source(spark: SparkSession, name: str, cfg: dict,
                  gl=None) -> DataFrame:
    df = _build_source_raw(spark, name, cfg)
    if gl is not None:
        # global log_schema (log_schema.rs:48-90): sources place the
        # semantic message/timestamp/host/source_type fields under the
        # CONFIGURED keys — applied as a boundary rename so user VRL
        # and downstream codecs see the custom names
        for old, new in gl.log_schema.renames().items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        return _apply_decoding(df, cfg, gl.log_schema.message_key)
    return _apply_decoding(df, cfg)


def _build_source_raw(spark: SparkSession, name: str, cfg: dict) -> DataFrame:
    stype = cfg.get("type", "parquet")
    if stype in ("parquet", "json", "csv", "text", "avro", "orc"):
        if stype == "parquet":
            # TIMESTAMP(NANOS) columns have no Spark type: read nanos as
            # long (same normalization as tables.load_table) and truncate
            # to micros below via the ts-column convention
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.read.format(stype)
        for k, v in (cfg.get("options") or {}).items():
            reader = reader.option(k, v)
        if cfg.get("schema"):
            reader = reader.schema(cfg["schema"])
        df = reader.load(cfg["path"])
        ts_col = cfg.get("ts_col", "ts")
        for fld in df.schema.fields:
            if fld.name == ts_col and fld.dataType.simpleString() == "bigint":
                df = df.withColumn(
                    ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)")
                )
            elif fld.dataType.simpleString() == "timestamp_ntz":
                # naive-as-UTC instant, session-tz-independent (tables.py)
                df = df.withColumn(
                    fld.name, F.expr(f"to_utc_timestamp({fld.name}, 'UTC')")
                )
        return df
    if stype == "demo_logs":
        # synthetic generator (vector src/sources/demo_logs.rs:34); the
        # reference's format variants compose from deterministic columns
        n = int(cfg.get("count", 1000))
        fmt = cfg.get("format", "text")
        base = spark.range(n).select(
            F.col("id").alias("seq"), F.current_timestamp().alias("ts")
        )
        host = F.concat(F.lit("host-"), (F.col("seq") % 10).cast("string"))
        user = F.concat(F.lit("user"), (F.col("seq") % 7).cast("string"))
        status = F.when(F.col("seq") % 10 == 0, 500).when(
            F.col("seq") % 5 == 0, 404
        ).otherwise(200)
        path = F.concat(F.lit("/api/v1/resource/"), (F.col("seq") % 50).cast("string"))
        if fmt == "apache_common":
            msg = F.concat(
                host, F.lit(" - "), user, F.lit(" ["),
                F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss Z"),
                F.lit('] "GET '), path, F.lit(' HTTP/1.1" '),
                status.cast("string"), F.lit(" "),
                ((F.col("seq") * 37) % 9000 + 100).cast("string"),
            )
        elif fmt == "syslog":
            msg = F.concat(
                F.lit("<"), ((F.col("seq") % 8) + 8).cast("string"), F.lit(">"),
                F.date_format("ts", "MMM d HH:mm:ss"), F.lit(" "), host,
                F.lit(" app"), (F.col("seq") % 4).cast("string"),
                F.lit("["), (F.col("seq") % 32768).cast("string"), F.lit("]: "),
                F.lit("request completed status="), status.cast("string"),
            )
        elif fmt == "json":
            msg = F.to_json(
                F.struct(
                    host.alias("host"), user.alias("user"),
                    status.alias("status"), path.alias("path"),
                    F.col("seq").alias("seq"),
                )
            )
        else:
            msg = F.concat(F.lit("demo log line "), F.col("seq").cast("string"))
        return base.select(
            "seq", "ts", msg.alias("message"), F.lit("demo").alias("source_type")
        )
    if stype == "values":
        # inline fixture rows (the `vector test` insert_at analog).
        # Rows containing nested objects go through JSON inference so
        # they become STRUCTS (VRL nested-path access) — createDataFrame
        # would infer dicts as maps, which `.c.c` paths cannot address.
        rows = cfg["rows"]
        if any(
            isinstance(v, (dict, list)) for r in rows for v in r.values()
        ):
            import datetime as _dt
            import json as _json

            # timestamps survive the JSON hop as ISO strings, restored
            # to TimestampType after inference (vrl-generated inputs
            # carry real datetimes, e.g. now())
            ts_cols = sorted(
                {
                    k
                    for r in rows
                    for k, v in r.items()
                    if isinstance(v, _dt.datetime)
                }
            )
            df = spark.read.json(
                spark.sparkContext.parallelize(
                    [_json.dumps(r, default=str) for r in rows]
                )
            )
            for k in ts_cols:
                df = df.withColumn(k, F.col(k).cast("timestamp"))
            return df
        return spark.createDataFrame(rows)
    # streaming sources: same topology YAML, streaming DataFrames out —
    # every downstream operator builder is stream-transparent (pure
    # Column programs); only stateful ops need the streaming variants.
    if stype == "rate":
        from vector_spark.streaming.pipeline import rate_source

        rpb = cfg.get("rows_per_batch")
        return rate_source(
            spark,
            rows_per_second=int(cfg.get("rows_per_second", 1000)),
            num_partitions=cfg.get("num_partitions"),
            rows_per_batch=int(rpb) if rpb is not None else None,
            advance_millis_per_batch=cfg.get("advance_millis_per_batch"),
        )
    if stype == "file":
        # the reference's `file` source (src/sources/file.rs): tail the
        # files matched by `include` globs; each line becomes an event
        # with message / file / ts (the reference's message + file +
        # timestamp keys). Spark's file stream IS the tailer — processed
        # files tracked in the checkpoint (file-source-common
        # checkpointer equivalent). `exclude` filters post-glob on the
        # captured file name; read_from/ignore_older_secs are
        # ingest-time concerns the checkpoint subsumes (documented).
        include = cfg.get("include") or ()
        if isinstance(include, str):
            include = [include]
        if not include:
            raise TopologyError(f"{name}: file source needs include")
        out = None
        for pat in include:
            part = (
                spark.readStream.format("text").load(pat)
                .select(
                    F.col("value").alias("message"),
                    F.input_file_name().alias("file"),
                    F.current_timestamp().alias("ts"),
                )
            )
            out = part if out is None else out.unionByName(part)
        for pat in cfg.get("exclude") or ():
            # input_file_name() yields a file:// URI; match the glob
            # against the PATH part with fnmatch's regex translation
            # (full-match; '*' crosses '/' like the reference's glob)
            import fnmatch as _fnmatch

            path_col = F.regexp_replace(
                F.col("file"), r"^[a-z][a-z0-9+.-]*:(//)?", "")
            out = out.where(
                ~path_col.rlike(r"\A" + _fnmatch.translate(pat)))
        return out
    if stype == "stream_file":
        from vector_spark.streaming.pipeline import file_stream_source

        return file_stream_source(
            spark,
            cfg["path"],
            fmt=cfg.get("format", "json"),
            schema=cfg.get("schema"),
            options=cfg.get("options"),
        )
    if stype == "kafka":
        from vector_spark.streaming.pipeline import kafka_source

        return kafka_source(
            spark,
            bootstrap_servers=cfg["bootstrap_servers"],
            topics=cfg["topics"],
            starting_offsets=cfg.get("starting_offsets", "latest"),
            options=cfg.get("options"),
        )
    if stype == "socket" and not str(cfg.get("mode", "")).startswith("unix"):
        from vector_spark.streaming.pipeline import socket_source

        host, port = _host_port(cfg)
        return socket_source(spark, host, port)
    if stype == "exec":
        from vector_spark.sources_pull import exec_source

        return exec_source(
            spark,
            cfg["command"],
            timeout_secs=float(cfg.get("timeout_secs", 30)),
            include_stderr=bool(cfg.get("include_stderr", False)),
        )
    if stype == "http_client":
        from vector_spark.sources_pull import http_client_source

        return http_client_source(
            spark,
            cfg["url"],
            decode=cfg.get("decode", "lines"),
            timeout_secs=float(cfg.get("timeout_secs", 10)),
            headers=cfg.get("headers"),
            query=cfg.get("query"),
            method=str(cfg.get("method", "GET")).upper(),
            body=cfg.get("body"),
        )
    if stype == "prometheus_scrape":
        from vector_spark.sources_pull import prometheus_scrape_source

        return prometheus_scrape_source(spark, cfg["url"])
    if stype == "apache_metrics":
        from vector_spark.sources_pull import apache_metrics_source

        # reference config takes `endpoints: [...]` (required there too);
        # one poll unions them. `url` accepted as a single-endpoint alias.
        if not cfg.get("endpoints") and not cfg.get("url"):
            raise TopologyError(
                f"source {name!r}: apache_metrics requires 'endpoints'"
            )
        dfs = [
            apache_metrics_source(
                spark, u, namespace=cfg.get("namespace", "apache")
            )
            for u in (cfg.get("endpoints") or [cfg["url"]])
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
    if stype == "nginx_metrics":
        from vector_spark.sources_pull import nginx_metrics_source

        if not cfg.get("endpoints") and not cfg.get("url"):
            raise TopologyError(
                f"source {name!r}: nginx_metrics requires 'endpoints'"
            )
        dfs = [
            nginx_metrics_source(
                spark, u, namespace=cfg.get("namespace", "nginx")
            )
            for u in (cfg.get("endpoints") or [cfg["url"]])
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
    if stype == "redis":
        # reference src/sources/redis/mod.rs: url + key + data_type +
        # list.method + redis_key. Batch model: list drains until empty
        # (or max_events); channel needs max_events to bound the pull.
        from urllib.parse import urlparse

        from vector_spark.sources_brokers import (
            redis_channel_source,
            redis_list_source,
        )

        u = urlparse(cfg["url"]) if cfg.get("url") else None
        host = (u.hostname if u else cfg.get("host")) or "localhost"
        port = int(u.port if u and u.port else cfg.get("port", 6379))
        rk = cfg.get("redis_key", "redis_key")
        if cfg.get("data_type", "list") == "channel":
            if "max_events" not in cfg:
                raise TopologyError(
                    f"source {name!r}: redis channel needs 'max_events'"
                    " to bound the batch subscribe"
                )
            return redis_channel_source(
                spark, host, port, cfg["key"],
                max_events=int(cfg["max_events"]), redis_key_field=rk,
            )
        return redis_list_source(
            spark, host, port, cfg["key"],
            method=(cfg.get("list") or {}).get("method", "lpop"),
            max_events=(
                int(cfg["max_events"]) if "max_events" in cfg else None
            ),
            redis_key_field=rk,
        )
    if stype == "nats":
        # reference src/sources/nats/config.rs: url + subject
        from urllib.parse import urlparse

        from vector_spark.sources_brokers import nats_source

        u = urlparse(cfg["url"])
        if "max_events" not in cfg:
            raise TopologyError(
                f"source {name!r}: nats needs 'max_events' to bound"
                " the batch subscribe"
            )
        return nats_source(
            spark, u.hostname or "localhost", int(u.port or 4222),
            cfg["subject"], max_events=int(cfg["max_events"]),
        )
    if stype == "mqtt":
        # reference src/sources/mqtt/config.rs: host/port/topic
        from vector_spark.sources_brokers import mqtt_source

        if "max_events" not in cfg:
            raise TopologyError(
                f"source {name!r}: mqtt needs 'max_events' to bound"
                " the batch subscribe"
            )
        # `topic` accepts one name or a LIST (the reference's
        # multiple-topics support)
        topic = cfg.get("topic", "vector")
        return mqtt_source(
            spark, cfg.get("host", "localhost"),
            int(cfg.get("port", 1883)), topic,
            max_events=int(cfg["max_events"]),
            client_id=cfg.get("client_id", "vector_spark_source"),
            qos=int(cfg.get("qos", 0)),
        )
    if stype == "amqp":
        # reference src/sources/amqp.rs: connection + queue +
        # routing_key_field
        from vector_spark.sources_brokers import amqp_source

        return amqp_source(
            spark, cfg.get("host", "localhost"),
            int(cfg.get("port", 5672)), cfg.get("queue", "vector"),
            max_events=(
                int(cfg["max_events"]) if "max_events" in cfg else None
            ),
            routing_key_field=cfg.get("routing_key_field", "routing_key"),
            user=cfg.get("user", "guest"),
            password=cfg.get("password", "guest"),
            vhost=cfg.get("vhost", "/"),
        )
    if stype == "pulsar":
        # reference src/sources/pulsar/mod.rs: endpoint + topics +
        # subscription_name
        from urllib.parse import urlparse

        from vector_spark.sources_brokers import pulsar_source

        u = urlparse(cfg["endpoint"]) if cfg.get("endpoint") else None
        topic = cfg.get("topics", cfg.get("topic", "vector"))
        if isinstance(topic, list):
            topic = topic[0]
        if "max_events" not in cfg:
            raise TopologyError(
                f"source {name!r}: pulsar needs 'max_events' to bound"
                " the batch subscribe"
            )
        return pulsar_source(
            spark, (u.hostname if u else cfg.get("host")) or "localhost",
            int(u.port if u and u.port else cfg.get("port", 6650)),
            topic,
            subscription=cfg.get("subscription_name", "vector_spark"),
            max_events=int(cfg["max_events"]),
        )
    if stype == "aws_ecs_metrics":
        from vector_spark.sources_pull import aws_ecs_metrics_source

        return aws_ecs_metrics_source(
            spark, cfg.get("endpoint", "http://169.254.170.2/v4/stats"),
            namespace=cfg.get("namespace", "awsecs"),
        )
    if stype == "host_metrics":
        from vector_spark.sources_pull import host_metrics_source

        return host_metrics_source(
            spark, tuple(cfg.get("collectors", ("cpu", "memory", "load", "network")))
        )
    if stype == "static_metrics":
        from vector_spark.sources_pull import static_metrics_source

        return static_metrics_source(spark, cfg["metrics"])
    if stype == "kubernetes_logs":
        from vector_spark.sources_pull import kubernetes_logs_source

        return kubernetes_logs_source(
            spark, cfg["path"], log_format=cfg.get("format", "cri")
        )
    if stype == "docker_logs":
        from vector_spark.sources_pull import docker_logs_source

        return docker_logs_source(
            spark,
            socket_path=cfg.get("docker_host",
                                "/var/run/docker.sock").removeprefix(
                                    "unix://"),
            include_containers=cfg.get("include_containers"),
            exclude_containers=cfg.get("exclude_containers"),
            include_images=cfg.get("include_images"),
            include_labels=cfg.get("include_labels"),
        )
    if stype == "aws_s3":
        from vector_spark.sources_pull import aws_s3_source

        return aws_s3_source(
            spark, cfg["queue_url"], region=cfg["region"],
            access_key=cfg.get("access_key", ""),
            secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
            max_objects=int(cfg.get("max_objects", 100)),
            s3_endpoint=cfg.get("s3_endpoint"),
        )
    if stype == "aws_sqs":
        from vector_spark.sources_pull import aws_sqs_source

        return aws_sqs_source(
            spark, cfg["queue_url"], region=cfg["region"],
            access_key=cfg.get("access_key", ""),
            secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
            max_events=int(cfg.get("max_events", 1000)),
            delete=bool(cfg.get("delete", True)),
        )
    if stype == "gcp_pubsub":
        from vector_spark.sources_pull import gcp_pubsub_source

        return gcp_pubsub_source(
            spark, cfg["project"], cfg["subscription"],
            endpoint=cfg.get("endpoint", "https://pubsub.googleapis.com"),
            max_events=int(cfg.get("max_events", 1000)),
            auth_token=cfg.get("auth_token"),
            ack=bool(cfg.get("ack", True)),
        )
    if stype == "okta":
        from vector_spark.sources_pull import okta_logs_source

        return okta_logs_source(
            spark, cfg["domain"], cfg["token"],
            since_secs=(
                float(cfg["since_secs"]) if "since_secs" in cfg else None
            ),
        )
    if stype == "journald":
        from vector_spark.sources_pull import journald_source

        return journald_source(
            spark, units=cfg.get("units"),
            max_entries=int(cfg.get("max_entries", 10000)),
        )
    if stype == "internal_metrics":
        from vector_spark.sources_pull import internal_metrics_source

        return internal_metrics_source(spark)
    if stype == "stdin":
        from vector_spark.sources_pull import stdin_source

        return stdin_source(spark)
    if stype == "file_descriptor":
        from vector_spark.sources_pull import file_descriptor_source

        return file_descriptor_source(spark, int(cfg["fd"]))
    if stype == "poll":
        # streaming interval scrape: exec / http_client re-polled per
        # micro-batch (trigger interval = scrape interval)
        from vector_spark.sources_pull import register_poll_source

        register_poll_source(spark)
        reader = spark.readStream.format("poll")
        for k in ("mode", "command", "url", "decode", "min_interval_secs"):
            if cfg.get(k) is not None:
                reader = reader.option(k, str(cfg[k]))
        return reader.load()
    if stype == "socket" and str(cfg.get("mode", "")).startswith("unix"):
        # socket source unix modes (socket/unix.rs): AF_UNIX listener
        # at `path` via the unix_socket DataSource
        from vector_spark.sources import register_sources

        register_sources(spark)
        reader = (
            spark.readStream.format("unix_socket")
            .option("path", cfg["path"])
            .option("mode", str(cfg["mode"]))
        )
        if cfg.get("wal_dir"):
            reader = reader.option("wal_dir", cfg["wal_dir"])
        return reader.load()
    if stype in (
        "syslog_tcp", "statsd_udp", "http_server", "fluent", "logstash",
        "dnstap", "websocket", "vector", "otlp_grpc", "vector_grpc",
    ):
        # wire-protocol server sources (src/sources/syslog.rs:45,
        # src/sources/statsd/, src/sources/fluent/mod.rs,
        # src/sources/logstash.rs, src/sources/dnstap/) via the Python
        # DataSource API
        from vector_spark.sources import register_sources, route_http_endpoints

        register_sources(spark)
        host, port = _host_port(cfg)
        reader = (
            spark.readStream.format(stype)
            .option("host", host)
            .option("port", port)
        )
        if cfg.get("wal_dir"):
            reader = reader.option("wal_dir", cfg["wal_dir"])
        if cfg.get("multicast_groups"):
            # socket/udp.rs multicast config: groups joined at bind
            mg = cfg["multicast_groups"]
            reader = reader.option(
                "multicast_groups",
                ",".join(mg) if isinstance(mg, list) else str(mg))
            if cfg.get("multicast_interface"):
                reader = reader.option("multicast_interface",
                                       str(cfg["multicast_interface"]))
        if stype == "http_server":
            # the reference's request-surface config (http_server.rs
            # SimpleHttpConfig): auth, captured headers/query params,
            # method/path gating, success status
            auth = cfg.get("auth") or {}
            strategy = auth.get("strategy")
            if strategy == "custom" or (
                    strategy is None and auth.get("source") is not None):
                # VRL custom auth (server_auth.rs Custom): compile now
                # so a bad program fails at config build, per the
                # reference's build-time diagnostics
                from vector_spark.functions.vrl_interp import (
                    vrl_auth_matcher,
                )

                vrl_auth_matcher(str(auth.get("source", "")))
                reader = reader.option("auth.source",
                                       str(auth.get("source", "")))
            elif auth.get("username") is not None:
                reader = reader.option("auth.username",
                                       str(auth["username"]))
                reader = reader.option("auth.password",
                                       str(auth.get("password", "")))
            for k in ("headers", "query_parameters"):
                if cfg.get(k):
                    v = cfg[k]
                    reader = reader.option(
                        k, ",".join(v) if isinstance(v, list) else str(v))
            for k in ("method", "path", "strict_path", "response_code"):
                if cfg.get(k) is not None:
                    reader = reader.option(k, str(cfg[k]))
            ack = cfg.get("acknowledgements")
            if isinstance(ack, dict):
                ack = ack.get("enabled")
            if ack:
                # Splunk HEC indexer acknowledgements on the collector
                # endpoints (splunk_hec/acknowledgements.rs)
                reader = reader.option("hec.ack", "true")
        if cfg.get("tls"):
            # reference `tls:` block (src/tls/settings.rs) — flattened
            # to dotted DataSource options; TlsSettings.from_options
            # rebuilds it reader-side
            for k, v in dict(cfg["tls"]).items():
                reader = reader.option(f"tls.{k}", str(v))
        df = reader.load()
        if stype == "http_server" and (
                cfg.get("headers") or cfg.get("query_parameters")):
            # captured headers/query params merge into JSON-object
            # events with the reference's precedence (body beats
            # headers, query beats body)
            from vector_spark.sources import merge_http_meta

            df = merge_http_meta(df)
        if stype == "http_server" and cfg.get("endpoints"):
            # splunk_hec / otlp_logs / json path routing
            df = route_http_endpoints(df, dict(cfg["endpoints"]))
        return df
    raise TopologyError(f"{name}: unknown source type {stype!r}")



def _host_port(cfg: dict, default_host: str = "127.0.0.1") -> tuple[str, int]:
    """Accept the reference's `address: "host:port"` form alongside the
    explicit host/port keys (src/sources/socket/, src/sinks/socket.rs
    configs use address)."""
    if cfg.get("address"):
        host, _, port = str(cfg["address"]).rpartition(":")
        return host or default_host, int(port)
    return cfg.get("host", default_host), int(cfg["port"])


def _request_concurrency(cfg: dict):
    """The reference's `request.concurrency` (src/sinks/util/service.rs
    via configurable Concurrency): "adaptive" | "none" | int. Maps to
    the shared transport's ARC/fixed/serial modes."""
    req = cfg.get("request") or {}
    c = req.get("concurrency")
    if c in (None, "none"):
        return None
    if c == "adaptive":
        return "adaptive"
    return int(c)


def _templated_key(df: DataFrame, key, cfg: dict):
    """vector's throttle/sample `key_field` is a TEMPLATE
    (`src/transforms/throttle/config.rs` key_field: Template): support
    `{{ field }}`/strftime forms by materializing a key column; plain
    column names pass through untouched."""
    if isinstance(key, str) and ("{{" in key or "%" in key):
        from vector_spark.functions.template import template_column

        return (
            df.withColumn(
                "_tmpl_key", template_column(key, ts_col=cfg.get("ts_col", "ts"))
            ),
            "_tmpl_key",
        )
    return df, key


def _inputs_df(outputs: dict[str, DataFrame], cfg: dict, name: str) -> DataFrame:
    inputs = cfg.get("inputs", [])
    if not inputs:
        raise TopologyError(f"{name}: transform/sink needs inputs")
    dfs = [outputs[i] for i in inputs]
    res = dfs[0]
    for d in dfs[1:]:
        res = res.unionByName(d, allowMissingColumns=True)
    return res


def _condition(cond):
    """Condition forms (vector `AnyCondition`, src/conditions/mod.rs:26-50):
    a SQL/VRL-subset expression string, or a typed dict
    {type: vrl|sql, source: expr} / {type: datadog_search, source: query}."""
    if isinstance(cond, dict):
        ctype = cond.get("type", "sql")
        src = cond["source"]
        if ctype == "datadog_search":
            from vector_spark.functions.search import datadog_search

            return datadog_search(src, cond.get("default_field", "message"))
        if ctype == "vrl":
            from vector_spark.functions.vrl_compiler import vrl_condition

            return vrl_condition(src)
        if ctype == "sql":
            return F.expr(src)
        raise TopologyError(f"unknown condition type {ctype!r}")
    return cond


def _condition_col(cond):
    """_condition, then force Column (operators with Column-only params)."""
    c = _condition(cond)
    return F.expr(c) if isinstance(c, str) else c


def _build_transform(
    name: str, cfg: dict, df: DataFrame, enrich_tables: dict | None = None,
    gl=None,
) -> dict[str, DataFrame]:
    """Build one transform; returns {output_ref: DataFrame} (default output
    under `name`, named outputs under `name.out`)."""
    ttype = cfg["type"]
    if ttype == "filter":
        return {name: filter_op(df, _condition(cfg["condition"]))}
    if ttype == "remap":
        if cfg.get("file") and not cfg.get("source"):
            # program from a .vrl file (remap.rs `file` option)
            with open(cfg["file"]) as fh:
                cfg = {**cfg, "source": fh.read()}
        if cfg.get("source"):
            # VRL program text (the reference's primary remap form)
            from vector_spark.functions.vrl import default_timezone
            from vector_spark.functions.vrl_compiler import vrl_remap

            # remap-level timezone overrides the global (remap.rs:105-114)
            tz = cfg.get("timezone") or (gl.timezone if gl else None)
            if tz:
                from vector_spark.config.globals import resolve_timezone

                tz = resolve_timezone(tz)
            with default_timezone(tz):
                outs = vrl_remap(
                    df,
                    cfg["source"],
                    enrichment_tables=enrich_tables,
                    drop_on_abort=cfg.get("drop_on_abort", False),
                    drop_on_error=cfg.get("drop_on_error", False),
                    reroute_dropped=cfg.get("reroute_dropped", False),
                )
            res = {name: outs[""]}
            if "dropped" in outs:
                res[f"{name}.dropped"] = outs["dropped"]
            return res
        out = df
        for col, expr in (cfg.get("assign") or {}).items():
            out = out.withColumn(col, F.expr(expr))
        for col in cfg.get("drop") or []:
            out = out.drop(col)
        if cfg.get("only"):
            out = out.select(*cfg["only"])
        return {name: out}
    if ttype == "route":
        conds = {r["name"]: _condition(r["condition"]) for r in cfg["routes"]}
        outs = route(df, conds, cfg.get("reroute_unmatched", True))
        return {f"{name}.{k}": v for k, v in outs.items()}
    if ttype == "exclusive_route":
        pairs = [(r["name"], _condition(r["condition"])) for r in cfg["routes"]]
        outs = exclusive_route(df, pairs)
        return {f"{name}.{k}": v for k, v in outs.items()}
    if ttype == "sample":
        df, key = _templated_key(df, cfg.get("key_field"), cfg)
        return {
            name: sample(
                df,
                rate=cfg.get("rate"),
                ratio=cfg.get("ratio"),
                key_field=key,
                group_by=cfg.get("group_by"),
                order_col=cfg.get("order_col"),
                exclude=cfg.get("exclude"),
            )
        }
    if ttype == "throttle":
        df, key = _templated_key(df, cfg["key_field"], cfg)
        out = throttle(
            df,
            threshold=cfg["threshold"],
            window_secs=cfg["window_secs"],
            key_field=key,
            ts_col=cfg.get("ts_col", "ts"),
            order_cols=cfg.get("order_cols"),
            exclude=cfg.get("exclude"),
        )
        if key == "_tmpl_key":
            out = out.drop("_tmpl_key")
        return {name: out}
    if ttype == "dedupe":
        fields = cfg.get("fields", {})
        return {
            name: dedupe(
                df,
                match=fields.get("match"),
                ignore=fields.get("ignore"),
                order_col=cfg.get("order_col"),
            )
        }
    if ttype == "reduce":
        strategies = {
            out: (s["strategy"], s["field"])
            for out, s in (cfg.get("merge_strategies") or {}).items()
        }
        return {
            name: reduce_op(
                df,
                group_by=cfg["group_by"],
                merge_strategies=strategies,
                order_col=cfg["order_col"],
            )
        }
    if ttype == "aggregate":
        return {
            name: aggregate(
                df,
                interval_secs=cfg.get("interval_secs", 10),
                series_keys=cfg["series_keys"],
                value_col=cfg.get("value_col", "value"),
                ts_col=cfg.get("ts_col", "ts"),
                order_col=cfg.get("order_col"),
                modes=cfg.get("modes"),
                kind_col=cfg.get("kind_col"),
            )
        }
    if ttype == "window":
        return {
            name: window_context(
                df,
                flush_when=cfg["flush_when"],
                order_col=cfg["order_col"],
                partition_by=cfg.get("partition_by"),
                num_events_before=cfg.get("num_events_before", 100),
                num_events_after=cfg.get("num_events_after", 0),
                forward_when=cfg.get("forward_when"),
            )
        }
    if ttype == "log_to_metric":
        specs = [
            MetricSpec(
                name=m["name"],
                type=m.get("type", "counter"),
                field=m.get("field"),
                increment_by_value=m.get("increment_by_value", False),
                kind=m.get("kind", "incremental"),
                tags=m.get("tags", {}),
            )
            for m in cfg["metrics"]
        ]
        return {
            name: log_to_metric(
                df, specs, ts_col=cfg.get("ts_col", "ts"),
                namespace=cfg.get("namespace"),
            )
        }
    if ttype == "metric_to_log":
        return {name: metric_to_log(df, ts_col=cfg.get("ts_col", "ts"))}
    if ttype == "trace_to_log":
        return {name: trace_to_log(df)}
    if ttype == "incremental_to_absolute":
        return {
            name: incremental_to_absolute(
                df,
                series_keys=cfg["series_keys"],
                value_col=cfg.get("value_col", "value"),
                order_col=cfg.get("order_col", "ts"),
            )
        }
    if ttype == "tag_cardinality_limit":
        return {
            name: tag_cardinality_limit(
                df,
                tag_cols=cfg["tags"],
                limit=cfg["limit"],
                order_col=cfg["order_col"],
                action=cfg.get("action", "drop_tag"),
            )
        }
    if ttype == "delay":
        from vector_spark.operators.delay import delay

        return {
            name: delay(
                df,
                delay_ms=int(cfg["delay_ms"]),
                ts_col=cfg.get("ts_col", "ts"),
                condition=_condition_col(cfg["condition"]) if cfg.get("condition") else None,
            )
        }
    if ttype == "static_enrich":
        from vector_spark.operators.metadata import static_enrich

        return {
            name: static_enrich(
                df, cfg["metadata"], fields=cfg.get("fields"),
                prefix=cfg.get("prefix", ""),
            )
        }
    if ttype == "line_agg":
        from vector_spark.operators.reduce import line_agg

        return {
            name: line_agg(
                df,
                group_by=cfg["group_by"],
                order_col=cfg["order_col"],
                line_col=cfg["line_col"],
                mode=cfg.get("mode"),
                condition=(
                    _condition_col(cfg["condition"]) if cfg.get("condition") else None
                ),
                starts_when=(
                    _condition_col(cfg["starts_when"]) if cfg.get("starts_when") else None
                ),
                separator=cfg.get("separator", "\n"),
            )
        }
    if ttype == "sessionize":
        from vector_spark.operators.reduce import sessionize

        return {
            name: sessionize(
                df,
                group_by=cfg["group_by"],
                order_col=cfg["order_col"],
                starts_when=(
                    _condition_col(cfg["starts_when"]) if cfg.get("starts_when") else None
                ),
                ends_when=(
                    _condition_col(cfg["ends_when"]) if cfg.get("ends_when") else None
                ),
            )
        }
    if ttype == "lua":
        from vector_spark.operators.lua import lua_transform

        return {
            name: lua_transform(
                df,
                source=cfg.get("source"),
                hooks=cfg.get("hooks"),
                version=cfg.get("version", "1" if "hooks" not in cfg
                                else "2"),
                kind=cfg.get("event_kind", "log"),
                schema=cfg.get("schema"),
                timers=cfg.get("timers"),
                timestamp_field=cfg.get("timestamp_field", "timestamp"),
            )
        }
    raise TopologyError(f"{name}: unknown transform type {ttype!r}")


def _load_enrichment_tables(spark: SparkSession, cfg: dict) -> dict:
    """`enrichment_tables:` section (src/enrichment_tables/file.rs): file
    tables load once and register for VRL get/find_enrichment_table_*
    lookups (each compiles to a broadcast join)."""
    out: dict = {}
    for name, tcfg in (cfg.get("enrichment_tables") or {}).items():
        ttype = tcfg.get("type")
        if ttype in ("geoip", "mmdb"):
            # src/enrichment_tables/{geoip,mmdb}.rs: a MaxMind database
            # loaded once as a (lo, hi, fields...) range table; VRL
            # lookups with an "ip" condition compile to the broadcast
            # containment join (vrl_compiler._resolve_enrichment).
            from vector_spark.functions.mmdb import mmdb_table

            sub = tcfg.get(ttype) or {}
            path = tcfg.get("path") or sub.get("path")
            if not path:
                raise TopologyError(
                    f"enrichment table {name!r}: {ttype} needs a path")
            out[name] = mmdb_table(spark, path,
                                   fields=tcfg.get("fields"))
            continue
        if ttype == "memory":
            # src/enrichment_tables/memory/config.rs: a writable KV
            # table; `filter: {type: bloom|cuckoo}` switches it to a
            # probabilistic membership set. The compiler expansion
            # (table-as-sink, table-as-source) happens in
            # build_topology; here we only construct the table.
            from vector_spark.streaming.memory_table import (
                BloomMemoryTable,
                CuckooMemoryTable,
                MemoryTable,
            )

            filt = tcfg.get("filter")
            if filt:
                ft = filt.get("type")
                # validation parity with config.rs:266-284
                if tcfg.get("source_config"):
                    raise TopologyError(
                        f"enrichment table {name!r}: source "
                        f"functionality is not supported for "
                        f"{ft} filter")
                if ft == "bloom":
                    if (tcfg.get("ttl") is not None
                            or tcfg.get("ttl_field")):
                        raise TopologyError(
                            f"enrichment table {name!r}: TTL "
                            "functionality is not supported for "
                            "bloom filter")
                    if tcfg.get("scan_interval") is not None:
                        raise TopologyError(
                            f"enrichment table {name!r}: "
                            "`scan_interval` has no effect for "
                            "bloom filter")
                    out[name] = BloomMemoryTable(
                        max_entries=int(filt["max_entries"]),
                        false_positive_rate=float(filt.get(
                            "false_positive_rate", 0.01)),
                        max_byte_size=tcfg.get("max_byte_size"),
                    )
                elif ft == "cuckoo":
                    out[name] = CuckooMemoryTable(
                        max_entries=int(filt["max_entries"]),
                        fingerprint_bits=int(
                            filt.get("fingerprint_bits", 8)),
                        bucket_size=int(filt.get("bucket_size", 4)),
                        max_kicks=int(filt.get("max_kicks", 500)),
                        ttl=tcfg.get("ttl"),
                    )
                else:
                    raise TopologyError(
                        f"enrichment table {name!r}: unknown filter "
                        f"type {ft!r} (bloom, cuckoo)")
            else:
                out[name] = MemoryTable(
                    key_col=tcfg.get("key_field", "key"),
                    value_col=tcfg.get("value_field", "value"),
                    value_type=tcfg.get("value_type", "string"),
                    # reference default_ttl() = 600 s (config.rs:185)
                    ttl_secs=float(tcfg.get("ttl", 600)),
                    max_byte_size=tcfg.get("max_byte_size"),
                    flush_interval=tcfg.get("flush_interval"),
                    ttl_field=tcfg.get("ttl_field") or None,
                )
            continue
        if ttype != "file":
            raise TopologyError(
                f"enrichment table {name!r}: unsupported type "
                f"{ttype!r} (file, geoip, mmdb, memory)"
            )
        fcfg = tcfg.get("file") or {}
        enc = (fcfg.get("encoding") or {}).get("type", "csv")
        reader = spark.read.format(enc)
        if enc == "csv":
            reader = reader.option("header", "true")
        df = reader.load(fcfg["path"])
        for col, typ in (tcfg.get("schema") or {}).items():
            typ = {"integer": "long"}.get(typ, typ)
            df = df.withColumn(col, F.col(col).cast(typ))
        out[name] = df
    return out


def _references_table(cfg_t: dict, table: str) -> bool:
    """Does a transform config reference an enrichment table by name?
    Conservative over-approximation (word-bounded search over the
    serialized config — a bare substring would deadlock on a table
    named `mem` next to a field named `mem_key`): false positives only
    ADD ordering edges."""
    import json
    import re

    return re.search(
        rf"(?<![A-Za-z0-9_]){re.escape(table)}(?![A-Za-z0-9_])",
        json.dumps(cfg_t, default=str),
    ) is not None


def build_topology(spark: SparkSession, cfg: dict) -> Topology:
    if "provider" in cfg:
        # bootstrap config (src/providers/http.rs): the real topology
        # lives behind the provider's URL — fetch and build THAT
        from vector_spark.config.provider import load_provider_config

        extra = {k for k in cfg if k != "provider"}
        if extra & {"sources", "transforms", "sinks"}:
            raise TopologyError(
                "a provider bootstrap must not also declare components")
        cfg = load_provider_config(cfg["provider"])
    sources, transforms, sinks = _validate(cfg)
    topo = Topology(sources, transforms, sinks)
    # global options (global_options.rs): log_schema / timezone / proxy /
    # data_dir / acknowledgements / expire_metrics_secs
    from vector_spark.config.globals import (
        BufferConfig,
        GlobalOptions,
        GlobalsError,
        HealthcheckOptions,
    )

    try:
        topo.globals = GlobalOptions.parse(cfg)
        # per-sink option shapes fail at LOAD time like the reference's
        # deserializer (healthcheck: sink.rs:211; buffer: lib/
        # vector-buffers config.rs:34-109)
        for name, scfg in sinks.items():
            HealthcheckOptions.parse(scfg.get("healthcheck"))
            BufferConfig.parse(scfg.get("buffer"))
    except GlobalsError as exc:
        raise TopologyError(str(exc)) from exc
    enrich_tables = _load_enrichment_tables(spark, cfg)

    for name, scfg in sources.items():
        topo.outputs[name] = _build_source(spark, name, scfg, topo.globals)

    # memory enrichment tables with `inputs` are implicit SINKS, and
    # with `source_config` implicit SOURCES (src/config/compiler.rs:
    # 60-77 chains table.as_sink/as_source into the graph). Batch
    # analog: apply the table's writes before any transform that reads
    # it builds — the deterministic projection of the reference's live
    # single-writer/snapshot-reader model.
    mem_cfgs = {
        n: t for n, t in (cfg.get("enrichment_tables") or {}).items()
        if t.get("type") == "memory"
    }
    pending_tables = {n: t for n, t in mem_cfgs.items() if t.get("inputs")}
    # tables with no inputs still expose their (empty) source expansion
    for name, tcfg in mem_cfgs.items():
        if name not in pending_tables:
            _expand_table_source(spark, topo, name, tcfg, enrich_tables)

    # build transforms + table writes in dependency order (Kahn)
    pending = dict(transforms)
    while pending or pending_tables:
        progressed = False
        for name in list(pending_tables):
            deps = {i.split(".", 1)[0]
                    for i in pending_tables[name].get("inputs", [])}
            if all(
                d in sources or (d in transforms and d not in pending)
                for d in deps
            ):
                tcfg = pending_tables.pop(name)
                df = _inputs_df(topo.outputs, tcfg, name)
                tbl = enrich_tables[name]
                if hasattr(tbl, "kind"):  # bloom/cuckoo membership set
                    tbl.write_batch(
                        df,
                        key_col=tcfg.get("key_field", "key"),
                        **({"value_col": tcfg.get("value_field")}
                           if tbl.kind == "cuckoo" else {}),
                    )
                else:
                    tbl.write_batch(df)
                    tbl.flush()
                _expand_table_source(spark, topo, name, tcfg, enrich_tables)
                progressed = True
        for name in list(pending):
            deps = {i.split(".", 1)[0] for i in pending[name].get("inputs", [])}
            blocked = (
                any(d in pending_tables or d in pending for d in deps)
                or any(d not in sources and d not in transforms
                       and d not in topo.outputs for d in deps)
                # reading a memory table orders after its writes
                or any(_references_table(pending[name], t)
                       for t in pending_tables)
            )
            if not blocked:
                cfg_t = pending.pop(name)
                df = _inputs_df(topo.outputs, cfg_t, name)
                topo.outputs.update(
                    _build_transform(name, cfg_t, df, enrich_tables,
                                     topo.globals)
                )
                progressed = True
        if not progressed:
            raise TopologyError(
                f"unresolvable components: "
                f"{sorted(pending) + sorted(pending_tables)}")

    # `api:` section (src/config/api.rs; disabled by default, default
    # address 127.0.0.1:8686): a LIVE ObservabilityService gRPC
    # endpoint over this topology — GetMeta/GetComponents, heartbeat/
    # uptime/metric streams, and event tapping (api_server.py). Batch
    # sink runs feed its counters via run_sinks; address ":0" binds an
    # ephemeral port (topo.api.port carries the bound value).
    api_cfg = cfg.get("api") or {}
    if api_cfg.get("enabled"):
        from vector_spark.api_server import TopologyView, start_api_server

        topo.api_view = TopologyView(
            sources, transforms, sinks, topo.outputs,
            expire_metrics_secs=(topo.globals.expire_metrics_secs
                                 if topo.globals is not None else None))
        topo.api = start_api_server(topo.api_view, api_cfg)
        # the VRL internal-metrics functions (get_vector_metric & co,
        # lib/vector-vrl/metrics) read the same counters `vector top`
        # serves — snapshot at plan-build time
        from vector_spark.functions.vrl_metrics import METRICS_STORAGE

        METRICS_STORAGE.attach_view(topo.api_view)
    return topo


def _expand_table_source(spark: SparkSession, topo: "Topology", name: str,
                         tcfg: dict, enrich_tables: dict) -> None:
    """Register a memory table's source expansion outputs
    (config.rs MemorySourceConfig: source_key, export batching,
    remove_after_export, expired output port)."""
    sc = tcfg.get("source_config")
    if not sc:
        return
    tbl = enrich_tables[name]
    key = sc["source_key"]
    if sc.get("export_expired_items"):
        # expired entries route out the `expired` port (source.rs
        # EXPIRED_ROUTE); snapshot first so TTL-dead entries flush
        tbl.expire()
        topo.outputs[f"{key}.expired"] = tbl.expired_items(spark)
    topo.outputs[key] = tbl.export(
        spark,
        batch_size=sc.get("export_batch_size"),
        remove_after_export=bool(sc.get("remove_after_export")),
    )


def run_sinks(topo: Topology) -> dict[str, Any]:
    """Execute each sink (batch mode). Returns sink name → result info."""
    import vector_spark.sinks_services as _svc
    from vector_spark.config.globals import ProxyConfig

    results: dict[str, Any] = {}
    # global log_schema: the sink-side default for the semantic message
    # field follows the configured key (log_schema.rs message_key)
    msg_key = (topo.globals.log_schema.message_key
               if topo.globals is not None else "message")
    _prev_proxy = _svc._PROXY_CFG
    try:
        return _run_sinks_inner(topo, results, msg_key, _svc, ProxyConfig)
    finally:
        _svc._PROXY_CFG = _prev_proxy


def _run_sinks_inner(topo, results, msg_key, _svc, ProxyConfig):
    for name, cfg in topo.sinks.items():
        # effective proxy for this sink: env base, global overrides env,
        # per-component overrides global (proxy.rs:120-123). Scoped via
        # module state — the shared transport resolves per-endpoint
        # DRIVER-side and closure-captures the result.
        _svc._PROXY_CFG = ProxyConfig.merge_with_env(
            topo.globals.proxy if topo.globals is not None
            else ProxyConfig(),
            ProxyConfig.parse(cfg.get("proxy"))
            if cfg.get("proxy") is not None else None,
        )
        df = _inputs_df(topo.outputs, cfg, name)
        stype = cfg.get("type", "parquet")
        if stype in ("parquet", "json", "csv", "orc", "avro") and cfg.get(
            "path_template"
        ):
            # vector sink key templates (`src/sinks/util/partitioner.rs:60-81`):
            # s3-style `{{ field }}` / strftime layout under `path`
            from vector_spark.sinks import write_templated

            results[name] = write_templated(
                df,
                cfg["path"],
                cfg["path_template"],
                fmt=stype,
                ts_col=cfg.get("ts_col", "ts"),
                mode=cfg.get("mode", "overwrite"),
                options=cfg.get("options"),
            )
        elif stype in ("parquet", "json", "csv", "orc", "avro"):
            writer = df.write.mode(cfg.get("mode", "overwrite")).format(stype)
            if cfg.get("partition_by"):
                writer = writer.partitionBy(*cfg["partition_by"])
            for k, v in (cfg.get("options") or {}).items():
                writer = writer.option(k, v)
            writer.save(cfg["path"])
            results[name] = {"path": cfg["path"]}
        elif stype == "console":
            df.show(int(cfg.get("limit", 20)), truncate=False)
            results[name] = {"shown": True}
        elif stype == "memory":
            results[name] = {"rows": df.collect()}
        elif stype == "blackhole":
            results[name] = {"count": df.count()}
        elif stype == "http":
            from vector_spark.sinks import http_sink

            results[name] = {
                "sent": http_sink(
                    df,
                    cfg["url"],
                    encoding=cfg.get("encoding", "json"),
                    value_col=cfg.get("value_col", msg_key),
                    batch_max_events=int(cfg.get("batch_max_events", 500)),
                    concurrency=_request_concurrency(cfg),
                    headers=(cfg.get("request") or {}).get("headers"),
                )
            }
        elif stype == "socket":
            from vector_spark.sinks import socket_sink
            from vector_spark.tls import TlsSettings

            results[name] = {
                "sent": socket_sink(
                    df,
                    *_host_port(cfg),
                    encoding=cfg.get("encoding", "text"),
                    value_col=cfg.get("value_col", msg_key),
                    tls=TlsSettings.from_config(cfg.get("tls")),
                )
            }
        elif stype == "vector":
            from vector_spark.sinks import vector_sink

            # `routing: {endpoints: [addr...], strategy: ...}` — the
            # reference's multi-endpoint config (vector/config.rs:
            # exactly one of `address` or `routing`)
            routing = cfg.get("routing") or {}
            eps = None
            if routing.get("endpoints"):
                if cfg.get("address"):
                    raise TopologyError(
                        f"sink {name!r}: exactly one of address or "
                        "routing (vector/config.rs:63)")
                eps = [
                    (a.rpartition(":")[0], int(a.rpartition(":")[2]))
                    for a in routing["endpoints"]
                ]
            hp = (eps[0] if eps else _host_port(cfg))
            results[name] = {
                "sent": vector_sink(
                    df, *hp,
                    version=int(cfg.get("version", 1)),
                    tls=__import__(
                        "vector_spark.tls", fromlist=["TlsSettings"]
                    ).TlsSettings.from_config(cfg.get("tls")),
                    endpoints=eps,
                    strategy=routing.get("strategy", "load_balance"),
                )
            }
        elif stype == "aws_cloudwatch_metrics":
            from vector_spark.sinks import aws_cloudwatch_metrics_sink

            results[name] = {
                "sent": aws_cloudwatch_metrics_sink(
                    df, cfg.get("default_namespace", "vector"),
                    region=cfg["region"],
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    endpoint=cfg.get("endpoint"),
                    name_col=cfg.get("name_col", "name"),
                    value_col=cfg.get("value_col", "value"),
                    high_resolution=bool(cfg.get("high_resolution")),
                )
            }
        elif stype == "gcp_cloud_storage":
            # reference src/sinks/gcp/cloud_storage/: bucket + prefix
            from vector_spark.sinks import gcs_sink

            results[name] = {
                "objects": gcs_sink(
                    df, cfg["bucket"],
                    prefix=cfg.get("key_prefix", "date=%F/"),
                    endpoint=cfg.get("endpoint",
                                     "https://storage.googleapis.com"),
                    auth_token=cfg.get("auth_token"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "ndjson"),
                    gzip_objects=bool(cfg.get("compression") == "gzip"),
                    content_type=cfg.get("content_type"),
                    content_encoding=cfg.get("content_encoding"),
                    cache_control=cfg.get("cache_control"),
                )
            }
        elif stype == "honeycomb":
            from vector_spark.sinks_services import honeycomb_sink

            results[name] = {
                "sent": honeycomb_sink(
                    df, cfg.get("endpoint", "https://api.honeycomb.io"),
                    cfg["dataset"], cfg["api_key"],
                )
            }
        elif stype == "new_relic":
            # the reference's `api` selector (config.rs:84):
            # logs (default) | events | metrics
            api = cfg.get("api", "logs")
            if api == "events":
                from vector_spark.sinks_services import (
                    new_relic_events_sink,
                )

                results[name] = {
                    "sent": new_relic_events_sink(
                        df, cfg["license_key"],
                        cfg.get("account_id", ""),
                        endpoint=cfg.get("endpoint"),
                        message_col=cfg.get("message_col", "message"),
                    )
                }
            elif api == "metrics":
                from vector_spark.sinks_services import (
                    new_relic_metrics_sink,
                )

                results[name] = {
                    "sent": new_relic_metrics_sink(
                        df, cfg["license_key"],
                        endpoint=cfg.get(
                            "endpoint",
                            "https://metric-api.newrelic.com/metric/v1"),
                        tags_col=cfg.get("tags_col", "tags"),
                        ts_col=cfg.get("ts_col", "ts"),
                        interval_ms_col=cfg.get("interval_ms_col"),
                    )
                }
            else:
                from vector_spark.sinks_services import (
                    new_relic_logs_sink,
                )

                results[name] = {
                    "sent": new_relic_logs_sink(
                        df, cfg["license_key"],
                        endpoint=cfg.get(
                            "endpoint",
                            "https://log-api.newrelic.com/log/v1"),
                    )
                }
        elif stype == "sematext_metrics":
            from vector_spark.sinks_vendors import sematext_metrics_sink

            results[name] = {
                "sent": sematext_metrics_sink(
                    df, cfg["token"],
                    default_namespace=cfg.get("default_namespace",
                                              "vector"),
                    endpoint=cfg.get(
                        "endpoint", "https://spm-receiver.sematext.com"),
                    ts_col=cfg.get("ts_col", "ts"),
                )
            }
        elif stype == "humio_metrics":
            from vector_spark.sinks_vendors import humio_metrics_sink

            results[name] = {
                "sent": humio_metrics_sink(
                    df, cfg["token"],
                    endpoint=cfg.get("endpoint",
                                     "https://cloud.humio.com"),
                    ts_col=cfg.get("ts_col", "ts"),
                )
            }
        elif stype == "gcp_stackdriver_metrics":
            from vector_spark.sinks_vendors import (
                gcp_stackdriver_metrics_sink,
            )

            results[name] = {
                "sent": gcp_stackdriver_metrics_sink(
                    df, cfg["project_id"], cfg.get("auth_token", ""),
                    started_iso=cfg.get(
                        "started_iso", "1970-01-01T00:00:00.000000000Z"),
                    default_namespace=cfg.get("default_namespace",
                                              "namespace"),
                    resource_type=cfg.get("resource_type", "global"),
                    resource_labels=cfg.get("resource_labels"),
                    ts_col=cfg.get("ts_col", "ts"),
                    endpoint=cfg.get(
                        "endpoint", "https://monitoring.googleapis.com"),
                )
            }
        elif stype == "axiom":
            from vector_spark.sinks_vendors import axiom_sink

            results[name] = {
                "sent": axiom_sink(
                    df, cfg["token"], dataset=cfg.get("dataset"),
                    url=cfg.get("url"), org_id=cfg.get("org_id"),
                )
            }
        elif stype == "appsignal":
            from vector_spark.sinks_vendors import appsignal_sink

            results[name] = {
                "sent": appsignal_sink(
                    df, cfg["push_api_key"],
                    endpoint=cfg.get(
                        "endpoint", "https://appsignal-endpoint.net"),
                )
            }
        elif stype == "keep":
            from vector_spark.sinks_vendors import keep_sink

            results[name] = {
                "sent": keep_sink(df, cfg["api_key"], cfg["endpoint"])
            }
        elif stype in ("mezmo", "logdna"):
            from vector_spark.sinks_vendors import mezmo_sink

            results[name] = {
                "sent": mezmo_sink(
                    df, cfg["api_key"], cfg["hostname"],
                    endpoint=cfg.get("endpoint",
                                     "https://logs.mezmo.com"),
                    line_col=cfg.get("line_col", "message"),
                    ts_col=cfg.get("ts_col", "ts"),
                    default_app=cfg.get("default_app", "vector"),
                    default_env=cfg.get("default_env", "production"),
                    tags=cfg.get("tags"),
                )
            }
        elif stype == "sematext_logs":
            from vector_spark.sinks_vendors import sematext_logs_sink

            results[name] = {
                "sent": sematext_logs_sink(
                    df, cfg["token"],
                    endpoint=cfg.get(
                        "endpoint",
                        "https://logsene-receiver.sematext.com"),
                )
            }
        elif stype == "humio_logs":
            from vector_spark.sinks_vendors import humio_logs_sink

            results[name] = {
                "sent": humio_logs_sink(
                    df, cfg["token"],
                    endpoint=cfg.get("endpoint",
                                     "https://cloud.humio.com"),
                )
            }
        elif stype == "papertrail":
            from vector_spark.sinks_vendors import papertrail_sink

            from vector_spark.tls import TlsSettings

            host, _, port = cfg["endpoint"].partition(":")
            # the papertrail service requires TLS syslog; `tls:` absent
            # means system-trust-store verification (reference default
            # for this sink), `enabled: false` opts out for tests
            tls_cfg = cfg.get("tls")
            tls = (TlsSettings.from_config(tls_cfg) if tls_cfg
                   else TlsSettings())
            results[name] = {
                "sent": papertrail_sink(
                    df, host, int(port),
                    message_col=cfg.get("message_col", "message"),
                    ts_col=cfg.get("ts_col", "ts"),
                    tls=tls,
                )
            }
        elif stype == "gcp_stackdriver_logs":
            from vector_spark.sinks_vendors import (
                gcp_stackdriver_logs_sink,
            )

            results[name] = {
                "sent": gcp_stackdriver_logs_sink(
                    df, cfg["log_name"], cfg.get("auth_token", ""),
                    resource_type=cfg.get("resource_type", "global"),
                    resource_labels=cfg.get("resource_labels"),
                    ts_col=cfg.get("ts_col", "ts"),
                    severity_col=cfg.get("severity_col"),
                    endpoint=cfg.get(
                        "endpoint", "https://logging.googleapis.com"),
                )
            }
        elif stype == "gcp_chronicle_unstructured":
            from vector_spark.sinks_vendors import gcp_chronicle_sink

            results[name] = {
                "sent": gcp_chronicle_sink(
                    df, cfg["customer_id"], cfg["log_type"],
                    cfg.get("auth_token", ""),
                    message_col=cfg.get("message_col", "message"),
                    ts_col=cfg.get("ts_col", "ts"),
                    endpoint=cfg.get(
                        "endpoint",
                        "https://malachiteingestion-pa.googleapis.com"),
                )
            }
        elif stype == "datadog_traces":
            from vector_spark.sinks_telemetry import datadog_traces_sink

            results[name] = {
                "sent": datadog_traces_sink(
                    df, cfg["api_key"],
                    endpoint=cfg.get(
                        "endpoint",
                        "https://trace.agent.datadoghq.com"),
                    hostname=cfg.get("hostname", ""),
                    env=cfg.get("env", ""),
                )
            }
        elif stype == "datadog_events":
            from vector_spark.sinks_vendors import datadog_events_sink

            results[name] = {
                "sent": datadog_events_sink(
                    df, cfg["api_key"],
                    endpoint=cfg.get("endpoint",
                                     "https://api.datadoghq.com"),
                    title_col=cfg.get("title_col", "title"),
                    text_col=cfg.get("text_col"),
                    ts_col=cfg.get("ts_col", "ts"),
                    host_col=cfg.get("host_col"),
                )
            }
        elif stype == "azure_monitor_logs":
            from vector_spark.sinks_vendors import (
                azure_monitor_logs_sink,
            )

            results[name] = {
                "sent": azure_monitor_logs_sink(
                    df, cfg["customer_id"], cfg["shared_key"],
                    cfg["log_type"],
                    ts_col=cfg.get("ts_col", "ts"),
                    endpoint=cfg.get("endpoint"),
                    azure_resource_id=cfg.get("azure_resource_id"),
                )
            }
        elif stype == "azure_logs_ingestion":
            from vector_spark.sinks_vendors import (
                azure_logs_ingestion_sink,
            )

            results[name] = {
                "sent": azure_logs_ingestion_sink(
                    df, cfg["endpoint"], cfg["dcr_immutable_id"],
                    cfg["stream_name"],
                    cfg.get("auth_token", ""),
                )
            }
        elif stype == "greptimedb_logs":
            from vector_spark.sinks_vendors import greptimedb_logs_sink

            results[name] = {
                "sent": greptimedb_logs_sink(
                    df, cfg["endpoint"], cfg["dbname"], cfg["table"],
                    pipeline_name=cfg.get("pipeline_name",
                                          "greptime_identity"),
                    pipeline_version=cfg.get("pipeline_version"),
                    username=cfg.get("username", ""),
                    password=cfg.get("password", ""),
                    extra_params=cfg.get("extra_params"),
                )
            }
        elif stype == "doris":
            from vector_spark.sinks_vendors import doris_sink

            endpoints = cfg.get("endpoints") or [cfg["endpoint"]]
            results[name] = {
                "sent": doris_sink(
                    df, endpoints[0], cfg["database"], cfg["table"],
                    username=cfg.get("auth", {}).get("user",
                                                     cfg.get("username",
                                                             "")),
                    password=cfg.get("auth", {}).get("password",
                                                     cfg.get("password",
                                                             "")),
                    label_prefix=cfg.get("label_prefix", "vector"),
                    headers=cfg.get("headers"),
                )
            }
        elif stype == "websocket_server":
            from vector_spark.sinks import WebsocketServerSink

            host, _, port = cfg.get("address",
                                    "127.0.0.1:0").partition(":")
            server = WebsocketServerSink(host, int(port or 0))
            wait = float(cfg.get("wait_for_client_secs", 0))
            if wait:
                server.client_connected.wait(wait)
            results[name] = {
                "sent": server.broadcast(
                    df, encoding=cfg.get("encoding", "json"),
                    value_col=cfg.get("value_col", msg_key),
                ),
                "port": server.port,
            }
            if not cfg.get("keep_open"):
                server.close()
        elif stype == "aws_sns":
            from vector_spark.sinks_vendors import aws_sns_sink

            results[name] = {
                "sent": aws_sns_sink(
                    df, cfg["topic_arn"], cfg["region"],
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    endpoint=cfg.get("endpoint"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "postgres":
            # reference src/sinks/postgres/: endpoint URI + table;
            # COPY FROM STDIN over the v3 wire protocol (sinks_db.py)
            from vector_spark.sinks_db import postgres_sink

            results[name] = {
                "sent": postgres_sink(
                    df, cfg["endpoint"], cfg["table"],
                    columns=cfg.get("columns"),
                )
            }
        elif stype == "databend":
            # reference src/sinks/databend/: DSN endpoint + table;
            # NDJSON staged + INSERT-with-attachment (sinks_db.py)
            from vector_spark.sinks_db import databend_sink

            results[name] = {
                "sent": databend_sink(
                    df, cfg["endpoint"], cfg["table"],
                    database=cfg.get("database"),
                    missing_field_as=cfg.get("missing_field_as",
                                             "NULL"),
                    compression=cfg.get("compression", "gzip"),
                )
            }
        elif stype == "databricks_zerobus":
            # reference src/sinks/databricks_zerobus/: UC-schema-driven
            # Arrow batches over gRPC (sinks_db.py)
            from vector_spark.sinks_db import databricks_zerobus_sink

            results[name] = {
                "sent": databricks_zerobus_sink(
                    df, cfg["ingestion_endpoint"],
                    cfg["unity_catalog_endpoint"], cfg["table_name"],
                    cfg["client_id"], cfg["client_secret"],
                )
            }
        elif stype == "prometheus_remote_write":
            # reference src/sinks/prometheus/remote_write/: snappy
            # WriteRequest protobuf + version header, tenant → OrgID
            from vector_spark.sinks_telemetry import (
                prometheus_remote_write_sink,
            )

            results[name] = {
                "sent": prometheus_remote_write_sink(
                    df, cfg["endpoint"],
                    name_col=cfg.get("name_col", "name"),
                    tags_col=cfg.get("tags_col", "tags"),
                    value_col=cfg.get("value_col", "value"),
                    ts_col=cfg.get("ts_col", "ts"),
                    tenant_id=cfg.get("tenant_id"),
                )
            }
        elif stype == "opentelemetry":
            # reference src/sinks/opentelemetry/: OTLP over HTTP,
            # default JSON protocol
            from vector_spark.sinks_telemetry import (
                opentelemetry_logs_sink,
            )

            results[name] = {
                "sent": opentelemetry_logs_sink(
                    df, cfg["endpoint"],
                    path=cfg.get("path", "/v1/logs"),
                    ts_col=cfg.get("ts_col", "ts"),
                    body_col=cfg.get("body_col",
                                     cfg.get("value_col", msg_key)),
                    resource_attrs=cfg.get("resource_attrs"),
                    protocol=cfg.get("protocol", "json"),
                )
            }
        elif stype == "datadog_metrics":
            # reference src/sinks/datadog/metrics/: v2 series protobuf
            # (+ sketches via mode: sketches)
            if cfg.get("mode") == "sketches":
                from vector_spark.sinks_telemetry import (
                    datadog_sketches_sink,
                )

                results[name] = {
                    "sent": datadog_sketches_sink(
                        df, cfg["api_key"],
                        endpoint=cfg.get("endpoint",
                                         "https://api.datadoghq.com"),
                        metric_col=cfg.get("metric_col", "name"),
                        host_col=cfg.get("host_col"),
                        tags_col=cfg.get("tags_col", "tags"),
                    )
                }
            else:
                from vector_spark.sinks_telemetry import (
                    datadog_metrics_sink,
                )

                results[name] = {
                    "sent": datadog_metrics_sink(
                        df, cfg["api_key"],
                        endpoint=cfg.get("endpoint",
                                         "https://api.datadoghq.com"),
                        metric_col=cfg.get("metric_col", "name"),
                        type_col=cfg.get("type_col"),
                        default_type=cfg.get("default_type", "gauge"),
                        tags_col=cfg.get("tags_col", "tags"),
                        value_col=cfg.get("value_col", "value"),
                        ts_col=cfg.get("ts_col", "ts"),
                        interval=cfg.get("interval"),
                    )
                }
        elif stype == "azure_blob":
            # reference src/sinks/azure_blob/: endpoint + container
            from vector_spark.sinks import azure_blob_sink

            results[name] = {
                "objects": azure_blob_sink(
                    df, cfg["endpoint"], cfg["container"],
                    prefix=cfg.get("prefix", "date=%F/"),
                    sas_token=cfg.get("sas_token", ""),
                    account_name=cfg.get("account_name"),
                    shared_key=cfg.get("shared_key"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "ndjson"),
                    gzip_objects=bool(cfg.get("compression") == "gzip"),
                )
            }
        elif stype == "webhdfs":
            # reference src/sinks/webhdfs/: endpoint + root + prefix
            from vector_spark.sinks import webhdfs_sink

            results[name] = {
                "objects": webhdfs_sink(
                    df, cfg["endpoint"], cfg["root"],
                    prefix=cfg.get("prefix", "date=%F/"),
                    user=cfg.get("user"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "ndjson"),
                )
            }
        elif stype == "influxdb":
            # reference src/sinks/influxdb/: endpoint + org/bucket/token
            from vector_spark.sinks import influxdb_sink

            results[name] = {
                "sent": influxdb_sink(
                    df, cfg["endpoint"],
                    org=cfg.get("org", ""),
                    bucket=cfg.get("bucket", ""),
                    token=cfg.get("token"),
                    measurement_col=cfg.get("measurement_col", "name"),
                    value_col=cfg.get("value_col", "value"),
                )
            }
        elif stype == "influxdb_logs":
            # reference src/sinks/influxdb/logs.rs: measurement (or
            # namespace) + promoted tag fields
            from vector_spark.sinks import influxdb_logs_sink

            results[name] = {
                "sent": influxdb_logs_sink(
                    df, cfg["endpoint"],
                    measurement=cfg.get("measurement"),
                    namespace=cfg.get("namespace"),
                    tag_cols=cfg.get("tags"),
                    org=cfg.get("org", ""),
                    bucket=cfg.get("bucket", ""),
                    ts_col=cfg.get("ts_col", "ts"),
                )
            }
        elif stype == "greptimedb_metrics":
            # reference src/sinks/greptimedb/metrics/: dbname + auth;
            # influx-line HTTP intake (divergence documented in-code)
            from vector_spark.sinks_vendors import (
                greptimedb_metrics_sink,
            )

            results[name] = {
                "sent": greptimedb_metrics_sink(
                    df, cfg["endpoint"],
                    dbname=cfg.get("dbname", "public"),
                    username=cfg.get("username", ""),
                    password=cfg.get("password", ""),
                    ts_col=cfg.get("ts_col", "ts"),
                )
            }
        elif stype == "splunk_hec_metrics":
            # reference src/sinks/splunk_hec/metrics/
            from vector_spark.sinks_services import (
                splunk_hec_metrics_sink,
            )

            results[name] = {
                "sent": splunk_hec_metrics_sink(
                    df, cfg["endpoint"], cfg["default_token"],
                    tags_col=cfg.get("tags_col", "tags"),
                    ts_col=cfg.get("ts_col", "ts"),
                    host_col=cfg.get("host_col"),
                    sourcetype=cfg.get("sourcetype"),
                    index=cfg.get("index"),
                    concurrency=_request_concurrency(cfg),
                    indexer_acknowledgements=bool(
                        (cfg.get("acknowledgements") or {})
                        .get("indexer_acknowledgements_enabled")),
                )
            }
        elif stype == "aws_kinesis_firehose":
            # reference src/sinks/aws_kinesis/firehose/
            from vector_spark.sinks import aws_kinesis_firehose_sink

            results[name] = {
                "sent": aws_kinesis_firehose_sink(
                    df, cfg["stream_name"], region=cfg["region"],
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    endpoint=cfg.get("endpoint"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "statsd":
            # reference src/sinks/statsd/: address
            from vector_spark.sinks import statsd_sink

            results[name] = {
                "sent": statsd_sink(
                    df, cfg.get("host", "127.0.0.1"), int(cfg["port"]),
                    name_col=cfg.get("name_col", "name"),
                    value_col=cfg.get("value_col", "value"),
                )
            }
        elif stype == "aws_cloudwatch_logs":
            # reference src/sinks/aws_cloudwatch_logs/: group + stream
            from vector_spark.sinks import aws_cloudwatch_logs_sink

            results[name] = {
                "sent": aws_cloudwatch_logs_sink(
                    df, cfg["group_name"], cfg["stream_name"],
                    region=cfg["region"],
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    endpoint=cfg.get("endpoint"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "aws_kinesis_streams":
            # reference src/sinks/aws_kinesis/streams/: stream_name
            from vector_spark.sinks import aws_kinesis_sink

            results[name] = {
                "sent": aws_kinesis_sink(
                    df, cfg["stream_name"], region=cfg["region"],
                    partition_key_col=cfg.get("partition_key_field"),
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    endpoint=cfg.get("endpoint"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "aws_sqs":
            # reference src/sinks/aws_sqs/: queue_url + region
            from vector_spark.sinks import aws_sqs_sink

            results[name] = {
                "sent": aws_sqs_sink(
                    df, cfg["queue_url"], region=cfg["region"],
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "gcp_pubsub":
            # reference src/sinks/gcp/pubsub.rs: project + topic
            from vector_spark.sinks import gcp_pubsub_sink

            results[name] = {
                "sent": gcp_pubsub_sink(
                    df, cfg["project"], cfg["topic"],
                    endpoint=cfg.get("endpoint",
                                     "https://pubsub.googleapis.com"),
                    auth_token=cfg.get("auth_token"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "aws_s3":
            # reference src/sinks/aws_s3/config.rs: bucket + key_prefix
            from vector_spark.sinks import s3_sink

            results[name] = {
                "objects": s3_sink(
                    df, cfg["bucket"],
                    key_prefix=cfg.get("key_prefix", "date=%F/"),
                    region=cfg.get("region", "us-east-1"),
                    access_key=cfg.get("access_key", ""),
                    secret_key=cfg.get("secret_key", ""),
                    session_token=cfg.get("session_token"),
                    endpoint=cfg.get("endpoint"),
                    encoding=cfg.get("encoding", "ndjson"),
                    force_path_style=bool(
                        cfg.get("force_path_style", True)),
                    value_col=cfg.get("value_col", msg_key),
                    gzip_objects=bool(cfg.get("compression") == "gzip"),
                )
            }
        elif stype == "redis":
            # reference src/sinks/redis/config.rs: url + key + data_type
            # (list rpush/lpush, channel, sorted_set)
            from urllib.parse import urlparse

            from vector_spark.sources_brokers import redis_sink

            u = urlparse(cfg["url"]) if cfg.get("url") else None
            results[name] = {
                "sent": redis_sink(
                    df,
                    (u.hostname if u else cfg.get("host")) or "localhost",
                    int(u.port if u and u.port else cfg.get("port", 6379)),
                    cfg["key"],
                    data_type=cfg.get("data_type", "list"),
                    method=(cfg.get("list") or {}).get("method", "rpush"),
                    score_col=cfg.get("score_col"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "nats":
            from urllib.parse import urlparse

            from vector_spark.sources_brokers import nats_sink

            u = urlparse(cfg["url"])
            results[name] = {
                "sent": nats_sink(
                    df, u.hostname or "localhost", int(u.port or 4222),
                    cfg["subject"],
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "amqp":
            # reference src/sinks/amqp/config.rs: exchange + routing_key
            from vector_spark.sources_brokers import amqp_sink

            results[name] = {
                "sent": amqp_sink(
                    df, cfg.get("host", "localhost"),
                    int(cfg.get("port", 5672)),
                    exchange=cfg.get("exchange", "vector"),
                    routing_key=cfg.get("routing_key", ""),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                    user=cfg.get("user", "guest"),
                    password=cfg.get("password", "guest"),
                    vhost=cfg.get("vhost", "/"),
                )
            }
        elif stype == "pulsar":
            from urllib.parse import urlparse

            from vector_spark.sources_brokers import pulsar_sink

            u = urlparse(cfg["endpoint"]) if cfg.get("endpoint") else None
            results[name] = {
                "sent": pulsar_sink(
                    df,
                    (u.hostname if u else cfg.get("host")) or "localhost",
                    int(u.port if u and u.port else cfg.get("port", 6650)),
                    cfg.get("topic", "vector"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                )
            }
        elif stype == "mqtt":
            from vector_spark.sources_brokers import mqtt_sink

            results[name] = {
                "sent": mqtt_sink(
                    df, cfg.get("host", "localhost"),
                    int(cfg.get("port", 1883)), cfg.get("topic", "vector"),
                    value_col=cfg.get("value_col", msg_key),
                    encoding=cfg.get("encoding", "text"),
                    client_id=cfg.get("client_id", "vector_spark_sink"),
                    qos=int(cfg.get("qos", 0)),
                )
            }
        elif stype == "websocket":
            from vector_spark.sinks import websocket_sink

            results[name] = {
                "sent": websocket_sink(
                    df,
                    cfg["host"],
                    int(cfg["port"]),
                    path=cfg.get("path", "/"),
                    encoding=cfg.get("encoding", "text"),
                    value_col=cfg.get("value_col", msg_key),
                    tls=__import__(
                        "vector_spark.tls", fromlist=["TlsSettings"]
                    ).TlsSettings.from_config(cfg.get("tls")),
                )
            }
        elif stype == "jdbc":
            # postgres/clickhouse/databend-style sinks: Spark's JDBC writer
            # IS the native path (the reference speaks each wire protocol
            # by hand; Catalyst batches inserts per partition). Needs the
            # driver jar on the classpath — absent here, so this fails at
            # runtime with the standard driver-not-found error, which is
            # the honest env gate.
            writer = (
                df.write.format("jdbc")
                .option("url", cfg["url"])
                .option("dbtable", cfg["table"])
                .mode(cfg.get("mode", "append"))
            )
            for k, v in (cfg.get("options") or {}).items():
                writer = writer.option(k, v)
            writer.save()
            results[name] = {"table": cfg["table"]}
        elif stype == "elasticsearch":
            from vector_spark.sinks_services import elasticsearch_sink

            results[name] = {
                "sent": elasticsearch_sink(
                    df,
                    cfg["endpoint"],
                    index=cfg.get("index", "vector-%Y.%m.%d"),
                    bulk_action=cfg.get("bulk_action", "index"),
                    id_col=cfg.get("id_key"),
                    ts_col=cfg.get("ts_col", "ts"),
                    batch_max_events=int(cfg.get("batch_max_events", 1000)),
                    concurrency=_request_concurrency(cfg),
                )
            }
        elif stype == "loki":
            from vector_spark.sinks_services import loki_sink

            results[name] = {
                "sent": loki_sink(
                    df,
                    cfg["endpoint"],
                    labels=cfg.get("labels", {}),
                    line_col=cfg.get("value_col", msg_key),
                    ts_col=cfg.get("ts_col", "ts"),
                    encoding=cfg.get("encoding", "text"),
                    batch_max_events=int(cfg.get("batch_max_events", 1000)),
                    concurrency=_request_concurrency(cfg),
                )
            }
        elif stype == "clickhouse":
            from vector_spark.sinks_services import clickhouse_sink

            results[name] = {
                "sent": clickhouse_sink(
                    df,
                    cfg["endpoint"],
                    table=cfg["table"],
                    database=cfg.get("database", "default"),
                    skip_unknown_fields=bool(
                        cfg.get("skip_unknown_fields", True)
                    ),
                    concurrency=_request_concurrency(cfg),
                    user_agent=cfg.get("user_agent"),
                    query_settings=cfg.get("query_settings"),
                )
            }
        elif stype == "datadog_logs":
            from vector_spark.sinks_services import datadog_logs_sink

            results[name] = {
                "sent": datadog_logs_sink(
                    df,
                    cfg.get("endpoint", "https://http-intake.logs.datadoghq.com"),
                    api_key=cfg["default_api_key"],
                    message_col=cfg.get("value_col", msg_key),
                    ddsource=cfg.get("ddsource"),
                    ddtags=cfg.get("ddtags"),
                    hostname_col=cfg.get("hostname_col"),
                    service_col=cfg.get("service_col"),
                    concurrency=_request_concurrency(cfg),
                )
            }
        elif stype == "splunk_hec":
            from vector_spark.sinks_services import splunk_hec_sink

            results[name] = {
                "sent": splunk_hec_sink(
                    df,
                    cfg["endpoint"],
                    token=cfg["default_token"],
                    event_col=cfg.get("value_col", msg_key),
                    ts_col=cfg.get("ts_col", "ts"),
                    host_col=cfg.get("host_col"),
                    sourcetype=cfg.get("sourcetype"),
                    index=cfg.get("index"),
                    concurrency=_request_concurrency(cfg),
                    indexer_acknowledgements=bool(
                        (cfg.get("acknowledgements") or {})
                        .get("indexer_acknowledgements_enabled")),
                )
            }
        elif stype == "prometheus_exporter":
            from vector_spark.sinks import prometheus_exporter_sink

            results[name] = {
                "written": prometheus_exporter_sink(
                    df,
                    cfg["path"],
                    name_col=cfg.get("name_col", "name"),
                    value_col=cfg.get("value_col", "value"),
                    tags_col=cfg.get("tags_col", "tags"),
                ),
                "path": cfg["path"],
            }
        else:
            raise TopologyError(f"{name}: unknown sink type {stype!r}")
        if topo.api_view is not None:
            # feed the observability API's counters with whatever the
            # sink result already knows (no extra Spark jobs): counts
            # from blackhole/memory/batched sinks ride their results
            r = results.get(name)
            n = None
            if isinstance(r, dict):
                for key in ("count", "events", "records", "written"):
                    if isinstance(r.get(key), int):
                        n = r[key]
                        break
                if n is None and isinstance(r.get("rows"), list):
                    n = len(r["rows"])
            if n is not None:
                topo.api_view.bump(name, "received_events_total", n)
                topo.api_view.bump(name, "sent_events_total", n)
                for inp in cfg.get("inputs") or []:
                    topo.api_view.bump(inp, "sent_events_total", n)
    return results


def start_streaming_sinks(topo: Topology) -> dict[str, Any]:
    """Start one streaming query per sink for topologies built on streaming
    sources (rate/stream_file/kafka/socket). Returns sink name →
    StreamingQuery. Batch and streaming share the SAME transform builders;
    this is the writeStream counterpart of run_sinks."""
    if topo.api_view is not None and not getattr(
        topo.api_view, "_progress_listener", None
    ):
        # observability API (api:): per-progress numInputRows feed the
        # counters GetComponents / StreamComponentMetrics serve
        from vector_spark.api_server import attach_streaming_counters

        spark = next(iter(topo.outputs.values())).sparkSession
        topo.api_view._progress_listener = attach_streaming_counters(
            spark, topo.api_view)
    return {
        name: start_streaming_sink(topo, name) for name in topo.sinks
    }


def start_streaming_sink(topo: Topology, name: str) -> Any:
    """Start ONE sink's streaming query. The per-sink granularity is what
    live reload needs: a sink-rooted query is Spark's respawn unit
    (vector src/topology/running.rs keeps unchanged tasks running and
    respawns only the diffed components — see streaming/reload.py)."""
    from vector_spark.streaming.pipeline import (
        console_sink,
        kafka_sink,
        memory_sink,
        parquet_sink,
    )

    queries: dict[str, Any] = {}
    msg_key = (topo.globals.log_schema.message_key
               if topo.globals is not None else "message")
    cfg = topo.sinks[name]
    df = _inputs_df(topo.outputs, cfg, name)
    stype = cfg.get("type", "memory")
    if stype == "memory":
        queries[name] = memory_sink(
            df, cfg.get("query_name", name), cfg.get("output_mode", "append")
        )
    elif stype == "console":
        queries[name] = console_sink(df, int(cfg.get("trigger_secs", 1)))
    elif stype == "parquet" and cfg.get("path_template"):
        from vector_spark.sinks import templated_stream_sink

        queries[name] = templated_stream_sink(
            df,
            base_path=cfg["path"],
            path_template=cfg["path_template"],
            checkpoint=cfg["checkpoint"],
            fmt="parquet",
            ts_col=cfg.get("ts_col", "ts"),
            trigger_secs=int(cfg.get("trigger_secs", 1)),
        )
    elif stype == "parquet":
        queries[name] = parquet_sink(
            df, cfg["path"], cfg["checkpoint"],
            int(cfg.get("trigger_secs", 1)),
            available_now=cfg.get("trigger") == "available_now",
        )
    elif stype == "kafka":
        queries[name] = kafka_sink(
            df,
            bootstrap_servers=cfg["bootstrap_servers"],
            topic=cfg["topic"],
            checkpoint=cfg["checkpoint"],
            value_col=cfg.get("value_col", msg_key),
            key_col=cfg.get("key_col"),
        )
    elif stype == "http":
        from vector_spark.config.globals import BufferConfig
        from vector_spark.sinks import http_stream_sink

        queries[name] = http_stream_sink(
            df,
            cfg["url"],
            checkpoint=cfg["checkpoint"],
            encoding=cfg.get("encoding", "json"),
            value_col=cfg.get("value_col", msg_key),
            trigger_secs=int(cfg.get("trigger_secs", 1)),
            buffer=(BufferConfig.parse(cfg.get("buffer"))
                    if cfg.get("buffer") is not None else None),
            data_dir=(topo.globals.data_dir
                      if topo.globals is not None else None),
            sink_name=name,
        )
    elif stype == "blackhole":
        queries[name] = (
            df.writeStream.format("noop")
            .option("checkpointLocation", cfg["checkpoint"])
            .start()
        )
    elif stype == "demux":
        from vector_spark.streaming.pipeline import demux_sink

        queries[name] = demux_sink(
            df,
            routes=[(r["name"], _condition(r["condition"])) for r in cfg["routes"]],
            base_path=cfg["path"],
            checkpoint=cfg["checkpoint"],
            fmt=cfg.get("format", "parquet"),
            trigger_secs=int(cfg.get("trigger_secs", 1)),
        )
    else:
        raise TopologyError(f"{name}: unknown streaming sink {stype!r}")
    return queries[name]
