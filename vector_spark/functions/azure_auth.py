"""Azure Storage SharedKey authorization (clean-room from the
documented "Authorize with Shared Key" rules, 2009-09-19+ format;
reference: src/sinks/azure_common/shared_key_policy.rs).

StringToSign =
  VERB \n Content-Encoding \n Content-Language \n Content-Length \n
  Content-MD5 \n Content-Type \n Date \n If-Modified-Since \n
  If-Match \n If-None-Match \n If-Unmodified-Since \n Range \n
  CanonicalizedHeaders + CanonicalizedResource

Rules mirrored from the policy (shared_key_policy.rs:17-41):
- x-ms-date is set and signed; the standard Date field stays empty
- a Content-Length of "0" canonicalizes as the EMPTY string
- CanonicalizedHeaders: every x-ms-* header, lowercased, sorted by
  name; multi-values sorted, deduped, comma-joined; each "k:v\\n"
- CanonicalizedResource: "/{account}{path}" + per sorted lowercase
  query-param name "\\n{name}:{comma-joined sorted values}"
  (empty-valued params skipped)
- Authorization: SharedKey {account}:{base64(HMAC-SHA256(key, sts))}
  with the account key base64-decoded

Azurite validates SharedKey with this same canonicalization; the test
suite recomputes the signature server-side from the received request
(the Azurite check, in-process)."""

from __future__ import annotations

import base64
import hashlib
import hmac
from collections import defaultdict
from urllib.parse import parse_qsl, urlsplit

DEFAULT_STORAGE_VERSION = "2025-11-05"  # shared_key_policy.rs test pin

_STANDARD_ORDER = (
    "content-encoding", "content-language", "content-length",
    "content-md5", "content-type", "date", "if-modified-since",
    "if-match", "if-none-match", "if-unmodified-since", "range",
)


def string_to_sign(account: str, method: str, url: str,
                   headers: dict[str, str]) -> str:
    """Build the SharedKey StringToSign for one request. ``headers``
    must already include x-ms-date/x-ms-version/content-length (the
    caller signs exactly what goes on the wire)."""
    low = {k.lower(): str(v) for k, v in headers.items()}
    parts = [method.upper()]
    for name in _STANDARD_ORDER:
        v = low.get(name, "")
        if name == "content-length" and v == "0":
            v = ""  # zero length is an EMPTY field (policy rule)
        if name == "date" and "x-ms-date" in low:
            v = ""  # x-ms-date supersedes Date
        parts.append(v)
    s = "\n".join(parts) + "\n"
    # CanonicalizedHeaders
    xms: dict[str, list[str]] = defaultdict(list)
    for k, v in headers.items():
        kl = k.lower()
        if kl.startswith("x-ms-"):
            xms[kl].append(str(v).strip())
    for k in sorted(xms):
        vals = sorted(set(xms[k]))
        s += f"{k}:{','.join(vals)}\n"
    # CanonicalizedResource
    u = urlsplit(url)
    s += f"/{account}{u.path or '/'}"
    if u.query:
        qp: dict[str, list[str]] = defaultdict(list)
        for name, value in parse_qsl(u.query, keep_blank_values=True):
            if value == "":
                continue
            qp[name.lower()].append(value)
        for k in sorted(qp):
            s += f"\n{k}:{','.join(sorted(qp[k]))}"
    return s


def sign(account_key_b64: str, sts: str) -> str:
    key = base64.b64decode(account_key_b64)
    mac = hmac.new(key, sts.encode("utf-8"), hashlib.sha256).digest()
    return base64.b64encode(mac).decode()


def shared_key_headers(account: str, account_key_b64: str, method: str,
                       url: str, body_len: int,
                       headers: dict[str, str] | None = None,
                       now_rfc7231: str | None = None,
                       storage_version: str = DEFAULT_STORAGE_VERSION,
                       ) -> dict[str, str]:
    """Headers for a SharedKey-authorized request: x-ms-date,
    x-ms-version, content-length (preserved if the caller already set
    one — shared_key_policy.rs ensure_signing_headers), Authorization."""
    from datetime import datetime, timezone

    h = dict(headers or {})
    low = {k.lower() for k in h}
    if "x-ms-date" not in low:
        now = now_rfc7231 or datetime.now(timezone.utc).strftime(
            "%a, %d %b %Y %H:%M:%S GMT")
        h["x-ms-date"] = now
    if "x-ms-version" not in low:
        h["x-ms-version"] = storage_version
    if "content-length" not in low:
        h["content-length"] = str(body_len)
    sts = string_to_sign(account, method, url, h)
    h["Authorization"] = f"SharedKey {account}:{sign(account_key_b64, sts)}"
    return h


def verify_shared_key(account: str, account_key_b64: str, method: str,
                      url: str, headers: dict[str, str]) -> bool:
    """Server-side validation (what Azurite does): recompute the
    signature from the received request and compare."""
    auth = None
    for k, v in headers.items():
        if k.lower() == "authorization":
            auth = v
    if not auth or not auth.startswith(f"SharedKey {account}:"):
        return False
    given = auth.split(":", 1)[1]
    unsigned = {k: v for k, v in headers.items()
                if k.lower() != "authorization"}
    sts = string_to_sign(account, method, url, unsigned)
    return hmac.compare_digest(given, sign(account_key_b64, sts))
