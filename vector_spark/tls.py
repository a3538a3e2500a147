"""TLS for listener sources and raw-TCP sink connections.

Re-expresses the reference's `TlsConfig` / `TlsSettings`
(src/tls/settings.rs — `enabled`, `crt_file`, `key_file`, `key_pass`,
`ca_file`, `verify_certificate`, `verify_hostname`), which virtually
every reference source and sink accepts as a `tls:` block
(src/sources/util/tcp/mod.rs wraps accepted connections;
src/sinks/util/service/net wraps outbound ones). Pure stdlib `ssl`.

Server semantics (listener sources):
- `crt_file` + `key_file` are the server identity (required to enable).
- `ca_file` + `verify_certificate=true` demands and verifies a CLIENT
  certificate (mTLS) — the reference's server-side meaning of
  verify_certificate (settings.rs: SslVerifyMode::PEER | FAIL_IF_NO_PEER_CERT).

Client semantics (socket/papertrail/websocket sinks, gRPC client):
- `verify_certificate=false` disables chain verification entirely
  (the reference's "you are vulnerable to MITM" warning applies).
- `ca_file` pins a custom trust root (self-signed upstreams).
- `verify_hostname=false` keeps chain verification but skips the
  hostname check.
- `crt_file`/`key_file` present a client certificate (mTLS).
"""

from __future__ import annotations

import ssl
from dataclasses import dataclass


def _as_bool(value, default: bool) -> bool:
    if value is None:
        return default
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("1", "true", "yes", "on")


@dataclass
class TlsSettings:
    """Picklable TLS config — contexts are built lazily on the side
    that uses them (executor partitions, listener threads), never
    shipped through cloudpickle."""

    enabled: bool = True
    crt_file: str | None = None
    key_file: str | None = None
    key_pass: str | None = None
    ca_file: str | None = None
    verify_certificate: bool = True
    verify_hostname: bool = True

    @classmethod
    def from_config(cls, cfg) -> "TlsSettings | None":
        """From a YAML/TOML `tls:` mapping in the reference's shape.
        Returns None when the block is absent or `enabled: false`."""
        if not cfg:
            return None
        if not _as_bool(cfg.get("enabled"), True):
            return None
        return cls(
            enabled=True,
            crt_file=cfg.get("crt_file"),
            key_file=cfg.get("key_file"),
            key_pass=cfg.get("key_pass"),
            ca_file=cfg.get("ca_file"),
            verify_certificate=_as_bool(
                cfg.get("verify_certificate"), True),
            verify_hostname=_as_bool(cfg.get("verify_hostname"), True),
        )

    @classmethod
    def from_options(cls, options: dict,
                     prefix: str = "tls.") -> "TlsSettings | None":
        """From a flat string-valued DataSource options dict
        (`tls.crt_file`, `tls.key_file`, ...) — the Python DataSource
        API flattens nested config to dotted string keys."""
        keys = ("enabled", "crt_file", "key_file", "key_pass",
                "ca_file", "verify_certificate", "verify_hostname")
        cfg = {k: options[prefix + k] for k in keys
               if options.get(prefix + k) is not None}
        return cls.from_config(cfg)

    # ------------------------------------------------------------ server

    def server_context(self) -> ssl.SSLContext:
        if not (self.crt_file and self.key_file):
            raise ValueError(
                "server TLS requires tls.crt_file and tls.key_file")
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(self.crt_file, self.key_file,
                            password=self.key_pass)
        if self.ca_file and self.verify_certificate:
            ctx.load_verify_locations(self.ca_file)
            ctx.verify_mode = ssl.CERT_REQUIRED
        return ctx

    def wrap_server_connection(self, conn, timeout: float | None = 10.0):
        """Wrap one ACCEPTED connection (per-connection, in the handler
        thread, so a stalled handshake never blocks the accept loop)."""
        if timeout is not None:
            conn.settimeout(timeout)
        wrapped = self.server_context().wrap_socket(
            conn, server_side=True)
        wrapped.settimeout(None)
        return wrapped

    # ------------------------------------------------------------ client

    def client_context(self) -> ssl.SSLContext:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        if not self.verify_certificate:
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        else:
            if self.ca_file:
                ctx.load_verify_locations(self.ca_file)
            else:
                ctx.load_default_certs(ssl.Purpose.SERVER_AUTH)
            ctx.check_hostname = self.verify_hostname
        if self.crt_file and self.key_file:
            ctx.load_cert_chain(self.crt_file, self.key_file,
                                password=self.key_pass)
        return ctx

    def wrap_client_connection(self, sock, server_hostname: str):
        return self.client_context().wrap_socket(
            sock, server_hostname=server_hostname)
