"""AWS Signature Version 4 request signing (pure stdlib).

Implements the published SigV4 process (canonical request → string to
sign → derived signing key → HMAC-SHA256), pinned in tests against the
AWS documentation's own worked example (the 20150830 iam ListUsers
request, expected signature 5d672d79...b5d7). This is what lets the
aws_sqs source talk to the real service with plain credentials — no
SDK.
"""

from __future__ import annotations

import hashlib
import hmac
from urllib.parse import quote, urlsplit


def _canonical_query(query: str) -> str:
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        k, _, v = part.partition("=")
        pairs.append((quote(k, safe="-_.~"), quote(v, safe="-_.~")))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def sign_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes,
    access_key: str,
    secret_key: str,
    region: str,
    service: str,
    amz_date: str,
    session_token: str | None = None,
) -> dict[str, str]:
    """Returns the headers to send: the input headers plus x-amz-date
    and the computed Authorization. ``amz_date`` is the ISO-basic
    timestamp (YYYYMMDDTHHMMSSZ) — passed in, not read from the clock,
    so signing is a pure function the tests can pin.

    ``session_token`` adds the temporary-credentials
    `x-amz-security-token` header to the SIGNED set (the SigV4 rule
    for STS credentials; the reference's "allow to provide aws session
    token" 0.48 feature)."""
    parts = urlsplit(url)
    date_stamp = amz_date[:8]
    all_headers = {**{k.lower(): v for k, v in headers.items()},
                   "host": parts.netloc, "x-amz-date": amz_date}
    if session_token:
        all_headers["x-amz-security-token"] = session_token
    signed_names = ";".join(sorted(all_headers))
    canonical = "\n".join([
        method.upper(),
        # the URL's path arrives already URI-encoded (the caller built
        # it with quote); re-encoding would double-escape %XX sequences
        parts.path or "/",
        _canonical_query(parts.query),
        "".join(f"{k}:{' '.join(all_headers[k].split())}\n"
                for k in sorted(all_headers)),
        signed_names,
        hashlib.sha256(payload).hexdigest(),
    ])
    scope = f"{date_stamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest(),
    ])
    key = ("AWS4" + secret_key).encode()
    for part in (date_stamp, region, service, "aws4_request"):
        key = hmac.new(key, part.encode(), hashlib.sha256).digest()
    signature = hmac.new(key, string_to_sign.encode(),
                         hashlib.sha256).hexdigest()
    out = dict(headers)
    out["x-amz-date"] = amz_date
    if session_token:
        out["x-amz-security-token"] = session_token
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_names}, Signature={signature}"
    )
    return out
