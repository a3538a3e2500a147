"""Config providers: bootstrap configs fetched from elsewhere.

Reference: `src/providers/http.rs` — a bootstrap file containing only

    provider:
      type: http
      url: https://config-server/topology.yaml
      request: {headers: {Authorization: "Bearer ..."}}
      poll_interval_secs: 30
      config_format: yaml        # yaml | toml | json
      interpolate_env: false

makes Vector fetch its REAL config from the URL and re-poll for
changes (feeding the reload signal). Spark mapping: `load_topology`
detects the `provider:` section, fetches/parses the body here, and
builds the fetched topology; `poll_provider` is the re-poll loop the
CLI's `run --watch` analog can drive (yields each CHANGED config —
unchanged bodies are suppressed, matching the reference's
content-hash debounce in its signal handler).

Pure stdlib urllib; https works with the default certificate store,
and `tls: {verify_certificate: false}` maps to an unverified context
(the reference's TlsConfig option), for lab config servers with
self-signed certs.
"""

from __future__ import annotations

import time
import urllib.request
from typing import Callable, Iterator


class ProviderError(ValueError):
    pass


def _fetch(url: str, headers: dict | None, verify: bool,
           timeout: float) -> str:
    req = urllib.request.Request(url, headers=headers or {})
    ctx = None
    if url.startswith("https") and not verify:
        import ssl

        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    with urllib.request.urlopen(req, timeout=timeout,
                                context=ctx) as resp:
        if resp.status != 200:
            raise ProviderError(
                f"http provider: {url} answered {resp.status}")
        return resp.read().decode("utf-8")


def _parse(body: str, fmt: str) -> dict:
    fmt = (fmt or "yaml").lower()
    if fmt == "yaml":
        import yaml

        return yaml.safe_load(body) or {}
    if fmt == "json":
        import json

        return json.loads(body)
    if fmt == "toml":
        import tomllib

        return tomllib.loads(body)
    raise ProviderError(f"http provider: unknown config_format {fmt!r}")


def load_provider_config(provider_cfg: dict,
                         timeout: float = 10.0) -> dict:
    """One fetch+parse of the provider's target config (the build-time
    half of src/providers/http.rs build())."""
    ptype = provider_cfg.get("type")
    if ptype != "http":
        raise ProviderError(f"unknown provider type {ptype!r}")
    url = provider_cfg.get("url")
    if not url:
        raise ProviderError("http provider needs url")
    headers = (provider_cfg.get("request") or {}).get("headers") or {}
    verify = (provider_cfg.get("tls") or {}).get(
        "verify_certificate", True)
    body = _fetch(url, headers, verify, timeout)
    if provider_cfg.get("interpolate_env"):
        from vector_spark.config.loader import interpolate_env

        body = interpolate_env(body)
    cfg = _parse(body, provider_cfg.get("config_format", "yaml"))
    if "provider" in cfg:
        raise ProviderError(
            "http provider: fetched config declares another provider "
            "(recursive providers are rejected, as in the reference)")
    return cfg


def poll_provider(provider_cfg: dict,
                  max_polls: int | None = None,
                  sleep: Callable[[float], None] = time.sleep,
                  ) -> Iterator[dict]:
    """The re-poll half: yields the config once, then again each time
    its content CHANGES, sleeping poll_interval_secs between fetches
    (src/providers/http.rs poll_http). ``max_polls`` bounds the loop
    for tests/batch runs; errors during a re-poll are swallowed and
    retried next tick like the reference (the running topology keeps
    its last good config)."""
    interval = float(provider_cfg.get("poll_interval_secs", 30))
    last: str | None = None
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        try:
            cfg = load_provider_config(provider_cfg)
        except Exception:
            if last is None:
                raise  # first fetch must succeed, as in build()
            sleep(interval)
            continue
        import json

        fingerprint = json.dumps(cfg, sort_keys=True, default=str)
        if fingerprint != last:
            last = fingerprint
            yield cfg
        sleep(interval)
