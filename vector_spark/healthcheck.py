"""Sink healthchecks — the reference runs each sink's healthcheck at
startup (src/topology/builder.rs wires the `Healthcheck` future every
sink factory returns) and, under ``--require-healthy``
(src/cli.rs:129), refuses to start when one fails.

Per-family probe shapes (re-expressed from the reference):

- generic http sink: HEAD the ``healthcheck.uri`` (or the sink's own
  uri), 200 = healthy (src/sinks/http/config.rs:188-203).
- elasticsearch: GET ``<endpoint>/_cluster/health``
  (src/sinks/elasticsearch/common.rs:328-345).
- clickhouse: GET ``<endpoint>/?query=SELECT%201``
  (src/sinks/clickhouse/config.rs:478-501).
- splunk_hec: GET ``<endpoint>/services/collector/health/1.0``
  (src/sinks/splunk_hec/common/util.rs:93).
- loki: GET ``<endpoint>/ready`` (src/sinks/loki/healthcheck.rs:23).
- datadog_*: GET ``<site>/api/v1/validate`` with the DD-API-KEY header
  (src/sinks/datadog/mod.rs:138-170).
- socket / papertrail: TCP connect (the reference's socket sink
  healthcheck is a connect attempt, src/sinks/util/service/net).

Sinks with no probe mapping report ``None`` (no healthcheck) — they
pass, exactly as reference sinks that return ``future::ok(())``.

Every HTTP probe honors the sink's effective proxy (the same
env+global+component merge the transport uses) and the configured
``healthcheck.timeout`` (default 10 s, sink.rs:231)."""

from __future__ import annotations

from typing import Any

from vector_spark.config.globals import (
    HealthcheckOptions,
    ProxyConfig,
    urlopen_via,
)


def _http_probe(url: str, timeout: float, headers: dict | None = None,
                method: str = "GET",
                proxy_url: str | None = None) -> tuple[bool, str]:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers or {}, method=method)
    try:
        resp = urlopen_via(req, timeout, proxy_url)
        code = resp.status
        resp.read()
    except urllib.error.HTTPError as err:
        return False, f"unexpected status {err.code}"
    except Exception as exc:  # URLError, timeout, refused, DNS
        return False, f"unreachable: {exc}"
    if 200 <= code < 300:
        return True, f"status {code}"
    return False, f"unexpected status {code}"


def _tcp_probe(host: str, port: int, timeout: float) -> tuple[bool, str]:
    import socket

    try:
        socket.create_connection((host, port), timeout=timeout).close()
        return True, "connected"
    except Exception as exc:
        return False, f"unreachable: {exc}"


def _endpoint_of(cfg: dict) -> str | None:
    for key in ("endpoint", "url", "uri"):
        if cfg.get(key):
            return str(cfg[key]).rstrip("/")
    return None


def check_sink(name: str, cfg: dict,
               global_proxy: ProxyConfig | None = None) -> dict[str, Any]:
    """Probe one sink. Returns {"enabled", "healthy", "detail"};
    ``healthy`` is None when the family has no probe (passes)."""
    opts = HealthcheckOptions.parse(cfg.get("healthcheck"))
    out: dict[str, Any] = {"enabled": opts.enabled, "healthy": None,
                           "detail": "no healthcheck for this sink type"}
    if not opts.enabled:
        out["detail"] = "disabled"
        return out
    stype = cfg.get("type", "")
    proxy = ProxyConfig.merge_with_env(
        global_proxy or ProxyConfig(),
        ProxyConfig.parse(cfg.get("proxy"))
        if cfg.get("proxy") is not None else None,
    )

    def probe(url: str, headers: dict | None = None,
              method: str = "GET") -> None:
        healthy, detail = _http_probe(
            url, opts.timeout, headers, method, proxy.proxy_url_for(url))
        out["healthy"], out["detail"] = healthy, detail

    ep = _endpoint_of(cfg)
    if opts.uri:
        # explicit healthcheck.uri wins for every family (sink.rs:223)
        probe(opts.uri, method="GET")
        return out
    if stype == "http" and ep:
        probe(ep, method="HEAD")
    elif stype == "elasticsearch" and ep:
        probe(ep + "/_cluster/health")
    elif stype == "clickhouse" and ep:
        probe(ep + "/?query=SELECT%201")
    elif stype in ("splunk_hec", "splunk_hec_metrics") and ep:
        probe(ep + "/services/collector/health/1.0")
    elif stype == "loki" and ep:
        probe(ep + "/ready")
    elif stype in ("datadog_logs", "datadog_metrics", "datadog_traces",
                   "datadog_events"):
        site = (cfg.get("endpoint")
                or f"https://api.{cfg.get('site', 'datadoghq.com')}")
        probe(site.rstrip("/") + "/api/v1/validate",
              headers={"DD-API-KEY": cfg.get("default_api_key",
                                             cfg.get("api_key", ""))})
    elif stype in ("socket", "papertrail"):
        host, port = cfg.get("host"), cfg.get("port")
        if cfg.get("address"):
            host, _, port = str(cfg["address"]).rpartition(":")
        if host and port:
            healthy, detail = _tcp_probe(host, int(port), opts.timeout)
            out["healthy"], out["detail"] = healthy, detail
    return out


def healthcheck_sinks(sinks: dict[str, dict],
                      global_proxy: ProxyConfig | None = None,
                      require_healthy: bool = False) -> dict[str, dict]:
    """Run every sink's healthcheck (topology startup). With
    ``require_healthy`` a failed probe raises instead of reporting —
    the `--require-healthy` CLI behavior."""
    results = {name: check_sink(name, cfg, global_proxy)
               for name, cfg in sinks.items()}
    if require_healthy:
        failed = {n: r for n, r in results.items() if r["healthy"] is False}
        if failed:
            details = "; ".join(f"{n}: {r['detail']}"
                                for n, r in failed.items())
            raise RuntimeError(f"healthcheck failed ({details})")
    return results
