"""Global config options — the reference's top-level ``GlobalOptions``
(lib/vector-core/src/config/global_options.rs:63-192):

- ``data_dir`` — state directory for disk buffers / checkpoints
  (global_options.rs:71, resolve_and_validate_data_dir :203).
- ``log_schema`` — the event-field names every component uses for the
  semantic message/timestamp/host/source_type/metadata fields
  (lib/vector-core/src/config/log_schema.rs:9-13 defaults ``message`` /
  ``timestamp`` / ``host`` / ``source_type`` / ``metadata``). One
  documented delta: this engine's internal timestamp column is ``ts``;
  the reference's default ``timestamp`` key therefore only takes
  effect when a user explicitly overrides ``timestamp_key`` (renaming
  ``ts`` by default would change every existing config's schema).
- ``timezone`` — default zone applied to timestamp conversions whose
  input carries no explicit zone (global_options.rs:100-109; a
  remap-level ``timezone`` overrides it, src/transforms/remap.rs:105).
  ``local`` means the host zone, else a TZ-database name.
- ``proxy`` — HTTP(S) proxy settings (proxy.rs:52-93) with the
  documented ``no_proxy`` pattern table (domain, ``.wildcard``
  domain+subdomains, IP, CIDR, ``*``) and the env-merge order
  ``from_env().merge(global.merge(component))`` (proxy.rs:120-123):
  explicit config overrides ``http_proxy``/``https_proxy``/
  ``no_proxy`` environment variables, lowercase names win over upper.
- ``acknowledgements`` — default end-to-end ack stance for all sinks
  (bool or ``{enabled: bool}``, global_options.rs:116-128).
- ``expire_metrics_secs`` — internal-metrics expiry window
  (global_options.rs:139-146).

Per-sink option structs that ride the same parse layer:

- ``SinkHealthcheckOptions`` (src/config/sink.rs:211-233): bool or
  ``{enabled, timeout (default 10 s), uri}``.
- ``BufferConfig`` (lib/vector-buffers/src/config.rs:34-109): one
  stage or a list; ``type: memory`` takes ``max_events`` (default
  500), ``type: disk`` REQUIRES ``max_size``; ``when_full`` is
  ``block`` (default) / ``drop_newest`` / ``overflow`` — and the
  reference's deserializer rejects a memory stage that sets
  ``max_size`` and a disk stage that sets ``max_events``
  (config.rs:87-109 treats the wrong-size key as an unknown field).
"""

from __future__ import annotations

import ipaddress
import os
import time
import urllib.parse
from dataclasses import dataclass, field


class GlobalsError(ValueError):
    """Invalid global option (analog of the reference's config build
    errors)."""


# --------------------------------------------------------------------------
# log_schema


@dataclass(frozen=True)
class LogSchema:
    """log_schema.rs:48-90 — semantic field names."""

    message_key: str = "message"
    timestamp_key: str = "ts"  # documented delta: reference default "timestamp"
    host_key: str = "host"
    source_type_key: str = "source_type"
    metadata_key: str = "metadata"

    #: reference defaults — a rename is only applied where the user
    #: moved a key away from what sources already emit
    REFERENCE_DEFAULTS = {
        "message_key": "message",
        "timestamp_key": "ts",
        "host_key": "host",
        "source_type_key": "source_type",
        "metadata_key": "metadata",
    }

    @classmethod
    def parse(cls, cfg: dict | None) -> "LogSchema":
        cfg = cfg or {}
        unknown = set(cfg) - set(cls.REFERENCE_DEFAULTS)
        if unknown:
            raise GlobalsError(
                f"log_schema: unknown field(s) {sorted(unknown)!r}")
        vals = {}
        for k, dflt in cls.REFERENCE_DEFAULTS.items():
            v = cfg.get(k, dflt)
            if not isinstance(v, str) or not v:
                raise GlobalsError(f"log_schema.{k}: expected a non-empty "
                                   f"string, got {v!r}")
            vals[k] = v
        return cls(**vals)

    def renames(self) -> dict[str, str]:
        """Column renames to apply at the source envelope boundary:
        engine-default name -> user-configured name (only for keys the
        user actually moved)."""
        out = {}
        for attr, dflt in self.REFERENCE_DEFAULTS.items():
            cur = getattr(self, attr)
            if cur != dflt:
                out[dflt] = cur
        return out


# --------------------------------------------------------------------------
# proxy


def _host_matches_no_proxy(host: str, port: int | None,
                           patterns: list[str]) -> bool:
    """The documented no_proxy pattern table (proxy.rs:76-92): exact
    domain, ``.domain`` wildcard (base + subdomains), IP, CIDR, ``*``.
    Entries may carry a ``:port`` which must then also match."""
    host = host.lower().rstrip(".")
    try:
        ip: ipaddress.IPv4Address | ipaddress.IPv6Address | None = (
            ipaddress.ip_address(host))
    except ValueError:
        ip = None
    for raw in patterns:
        pat = raw.strip().lower().rstrip(".")
        if not pat:
            continue
        if pat == "*":
            return True
        # split a trailing :port (but not an IPv6 colon)
        pat_port = None
        if ":" in pat and pat.count(":") == 1:
            base, p = pat.rsplit(":", 1)
            if p.isdigit():
                pat, pat_port = base, int(p)
        if pat_port is not None and pat_port != port:
            continue
        if "/" in pat and ip is not None:
            try:
                if ip in ipaddress.ip_network(pat, strict=False):
                    return True
            except ValueError:
                pass
            continue
        if pat.startswith("."):
            if host == pat[1:] or host.endswith(pat):
                return True
            continue
        if host == pat:
            return True
        if ip is None and host.endswith("." + pat):
            # the no_proxy crate treats a bare domain as matching its
            # subdomains too (gitlab no_proxy standardization note,
            # proxy.rs:10)
            return True
    return False


@dataclass(frozen=True)
class ProxyConfig:
    """proxy.rs:52-93."""

    enabled: bool = True
    http: str | None = None
    https: str | None = None
    no_proxy: tuple[str, ...] = ()

    @classmethod
    def parse(cls, cfg: dict | bool | None) -> "ProxyConfig":
        if cfg is None:
            return cls()
        if not isinstance(cfg, dict):
            raise GlobalsError(f"proxy: expected a table, got {cfg!r}")
        unknown = set(cfg) - {"enabled", "http", "https", "no_proxy"}
        if unknown:
            raise GlobalsError(f"proxy: unknown field(s) {sorted(unknown)!r}")
        np = cfg.get("no_proxy") or []
        if isinstance(np, str):
            np = [s for s in np.split(",") if s.strip()]
        return cls(
            enabled=bool(cfg.get("enabled", True)),
            http=cfg.get("http"),
            https=cfg.get("https"),
            no_proxy=tuple(np),
        )

    @classmethod
    def from_env(cls, env: dict | None = None) -> "ProxyConfig":
        """proxy.rs:11-16 + :113-119 — lowercase names first."""
        env = os.environ if env is None else env

        def get(key: str) -> str | None:
            return env.get(key.lower()) or env.get(key.upper()) or None

        np = get("no_proxy")
        return cls(
            enabled=True,
            http=get("http_proxy"),
            https=get("https_proxy"),
            no_proxy=tuple(s for s in (np or "").split(",") if s.strip()),
        )

    def merge(self, other: "ProxyConfig") -> "ProxyConfig":
        """proxy.rs:129-144 — ``other`` (the more specific config) wins
        field-wise; enabled ANDs."""
        return ProxyConfig(
            enabled=self.enabled and other.enabled,
            http=other.http or self.http,
            https=other.https or self.https,
            no_proxy=other.no_proxy if other.no_proxy else self.no_proxy,
        )

    @classmethod
    def merge_with_env(cls, global_cfg: "ProxyConfig",
                       component: "ProxyConfig | None" = None,
                       env: dict | None = None) -> "ProxyConfig":
        """proxy.rs:120-123: env is the base, config overrides it."""
        merged = global_cfg.merge(component) if component else global_cfg
        return cls.from_env(env).merge(merged)

    def proxy_url_for(self, url: str) -> str | None:
        """The effective proxy endpoint for one target URL, or None
        (disabled / no proxy for the scheme / no_proxy match)."""
        if not self.enabled:
            return None
        parsed = urllib.parse.urlsplit(url)
        proxy = self.https if parsed.scheme == "https" else self.http
        if not proxy:
            return None
        host = parsed.hostname or ""
        if _host_matches_no_proxy(host, parsed.port, list(self.no_proxy)):
            return None
        return proxy


def urlopen_via(url_or_req, timeout: float, proxy_url: str | None):
    """``urllib.request.urlopen`` honoring an explicit proxy decision
    (made driver-side at sink build; executors just use the captured
    value). A ``user:pass@`` in the proxy URL becomes Proxy-Authorization
    basic auth (proxy.rs:162-170)."""
    import urllib.request

    if not proxy_url:
        return urllib.request.urlopen(url_or_req, timeout=timeout)
    # userinfo stays IN the proxy URL: ProxyHandler derives the
    # Proxy-Authorization header from it for plain-http requests AND
    # for the CONNECT tunnel of https targets — a manually-added
    # header would miss the tunnel
    handler = urllib.request.ProxyHandler(
        {"http": proxy_url, "https": proxy_url})
    opener = urllib.request.build_opener(handler)
    return opener.open(url_or_req, timeout=timeout)


# --------------------------------------------------------------------------
# sink healthcheck + buffer


@dataclass(frozen=True)
class HealthcheckOptions:
    """src/config/sink.rs:211-233 (bool_or_struct)."""

    enabled: bool = True
    timeout: float = 10.0
    uri: str | None = None

    @classmethod
    def parse(cls, cfg) -> "HealthcheckOptions":
        if cfg is None:
            return cls()
        if isinstance(cfg, bool):
            return cls(enabled=cfg)
        if not isinstance(cfg, dict):
            raise GlobalsError(f"healthcheck: expected bool or table, "
                               f"got {cfg!r}")
        unknown = set(cfg) - {"enabled", "timeout", "uri"}
        if unknown:
            raise GlobalsError(
                f"healthcheck: unknown field(s) {sorted(unknown)!r}")
        return cls(
            enabled=bool(cfg.get("enabled", True)),
            timeout=float(cfg.get("timeout", 10.0)),
            uri=cfg.get("uri"),
        )


@dataclass(frozen=True)
class BufferStage:
    kind: str  # "memory" | "disk"
    max_events: int | None = None
    max_size: int | None = None
    when_full: str = "block"


@dataclass(frozen=True)
class BufferConfig:
    stages: tuple[BufferStage, ...] = ()

    DEFAULT_MEMORY_MAX_EVENTS = 500  # lib/vector-buffers memory default

    @classmethod
    def parse(cls, cfg) -> "BufferConfig":
        if cfg is None:
            return cls()
        items = cfg if isinstance(cfg, list) else [cfg]
        stages = []
        for item in items:
            if not isinstance(item, dict):
                raise GlobalsError(f"buffer: expected a table, got {item!r}")
            unknown = set(item) - {"type", "max_events", "max_size",
                                   "when_full"}
            if unknown:
                raise GlobalsError(
                    f"buffer: unknown field(s) {sorted(unknown)!r}")
            kind = item.get("type", "memory")
            when_full = item.get("when_full", "block")
            if when_full not in ("block", "drop_newest", "overflow"):
                raise GlobalsError(
                    f"buffer.when_full: unknown variant {when_full!r}")
            if kind == "memory":
                # config.rs:87-99: memory + max_size is rejected
                if item.get("max_size") is not None:
                    raise GlobalsError(
                        "buffer: `max_size` is not valid for a memory "
                        "buffer (use max_events)")
                me = int(item.get("max_events",
                                  cls.DEFAULT_MEMORY_MAX_EVENTS))
                if me <= 0:
                    raise GlobalsError("buffer.max_events: must be > 0")
                stages.append(BufferStage("memory", max_events=me,
                                          when_full=when_full))
            elif kind == "disk":
                if item.get("max_events") is not None:
                    raise GlobalsError(
                        "buffer: `max_events` is not valid for a disk "
                        "buffer (use max_size)")
                ms = item.get("max_size")
                if ms is None:
                    raise GlobalsError(
                        "buffer: a disk buffer requires `max_size`")
                ms = int(ms)
                if ms <= 0:
                    raise GlobalsError("buffer.max_size: must be > 0")
                stages.append(BufferStage("disk", max_size=ms,
                                          when_full=when_full))
            else:
                raise GlobalsError(f"buffer.type: unknown variant {kind!r}")
        if stages and stages[-1].when_full == "overflow":
            # overflow routes to the NEXT stage — the final stage has none
            raise GlobalsError(
                "buffer: the last stage cannot use when_full: overflow")
        return cls(tuple(stages))


# --------------------------------------------------------------------------
# the top-level bundle


_KNOWN_GLOBAL_KEYS = {
    "data_dir", "log_schema", "timezone", "proxy", "acknowledgements",
    "expire_metrics_secs", "expire_metrics", "wildcard_matching",
    "telemetry",
}


@dataclass(frozen=True)
class GlobalOptions:
    data_dir: str | None = None
    log_schema: LogSchema = field(default_factory=LogSchema)
    timezone: str | None = None
    proxy: ProxyConfig = field(default_factory=ProxyConfig)
    acknowledgements: bool = False
    expire_metrics_secs: float | None = None

    @classmethod
    def parse(cls, cfg: dict) -> "GlobalOptions":
        tz = cfg.get("timezone")
        if tz is not None:
            resolve_timezone(tz)  # raises on an unknown name
        ack = cfg.get("acknowledgements", False)
        if isinstance(ack, dict):  # bool_or_struct (global_options.rs:122)
            ack = bool(ack.get("enabled", False))
        exp = cfg.get("expire_metrics_secs")
        if exp is None and cfg.get("expire_metrics") is not None:
            # deprecated duration table {secs, nanos}
            em = cfg["expire_metrics"]
            exp = (float(em.get("secs", 0)) + float(em.get("nanos", 0)) / 1e9
                   if isinstance(em, dict) else float(em))
        return cls(
            data_dir=cfg.get("data_dir"),
            log_schema=LogSchema.parse(cfg.get("log_schema")),
            timezone=tz,
            proxy=ProxyConfig.parse(cfg.get("proxy")),
            acknowledgements=bool(ack),
            expire_metrics_secs=float(exp) if exp is not None else None,
        )

    def resolve_data_dir(self, local: str | None = None) -> str:
        """global_options.rs:203-230 — local overrides global; the
        directory must exist-or-be-creatable and writable."""
        d = local or self.data_dir
        if not d:
            raise GlobalsError(
                "missing data_dir: set the global `data_dir` option")
        os.makedirs(d, exist_ok=True)
        if not os.access(d, os.W_OK):
            raise GlobalsError(f"data_dir {d!r} is not writable")
        return d


def resolve_timezone(name: str) -> str:
    """Validate a `timezone:` value and return the IANA name Spark's
    ``to_utc_timestamp`` accepts. ``local`` resolves to the host zone
    (datetime.rs TimeZone::Local)."""
    if name == "local":
        # Spark accepts region-based IDs; /etc/localtime's target is the
        # robust portable answer, TZ env as the override
        tz = os.environ.get("TZ")
        if tz:
            return tz
        lt = "/etc/localtime"
        if os.path.islink(lt):
            target = os.path.realpath(lt)
            for marker in ("/zoneinfo/",):
                if marker in target:
                    return target.split(marker, 1)[1]
        return time.strftime("%Z") or "UTC"
    try:
        import zoneinfo

        zoneinfo.ZoneInfo(name)
    except Exception as exc:
        raise GlobalsError(f"timezone: unknown zone {name!r}") from exc
    return name
