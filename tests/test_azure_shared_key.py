"""Azure SharedKey authorization (functions/azure_auth.py), pinned to
the reference policy's rules (src/sinks/azure_common/
shared_key_policy.rs) and validated the way Azurite validates: the
fake server recomputes the signature from the received request."""

from __future__ import annotations

import threading

from vector_spark.functions.azure_auth import (
    shared_key_headers,
    sign,
    string_to_sign,
    verify_shared_key,
)

_ACCOUNT = "account"
_KEY_B64 = "ZmFrZS10ZXN0LWFjY291bnQta2V5"  # shared_key_policy.rs test key
_DATE = "Thu, 30 Jul 2026 16:02:25 GMT"  # shared_key_policy.rs test date
_VER = "2025-11-05"


def _headers(extra=None, body_len=123):
    h = {"x-ms-date": _DATE, "x-ms-version": _VER,
         "content-length": str(body_len)}
    h.update(extra or {})
    return h


def test_string_to_sign_exact_shape():
    # the full 2009-09-19+ format: 12 standard fields, then
    # canonicalized x-ms headers (sorted), then the resource
    sts = string_to_sign(
        _ACCOUNT, "PUT",
        "https://account.blob.core.windows.net/container/blob?comp=blocklist",
        _headers({"Content-Type": "application/octet-stream"}),
    )
    assert sts == (
        "PUT\n"            # VERB
        "\n"               # Content-Encoding
        "\n"               # Content-Language
        "123\n"            # Content-Length
        "\n"               # Content-MD5
        "application/octet-stream\n"  # Content-Type
        "\n"               # Date (empty: x-ms-date used)
        "\n\n\n\n"         # If-Modified-Since/Match/None-Match/Unmodified
        "\n"               # Range
        f"x-ms-date:{_DATE}\n"
        f"x-ms-version:{_VER}\n"
        "/account/container/blob"
        "\ncomp:blocklist"
    )


def test_content_length_rules_match_reference_policy():
    # shared_key_policy.rs tests: body length signed when missing; a
    # caller-supplied value preserved; "0" canonicalizes as EMPTY
    url = "https://account.blob.core.windows.net/container/blob"
    line = lambda h: string_to_sign(_ACCOUNT, "PUT", url, h).splitlines()[3]
    assert line(_headers(body_len=123)) == "123"
    assert line(_headers(body_len=42)) == "42"
    assert line(_headers(body_len=0)) == ""  # zero → empty field


def test_canonicalized_query_sorting_and_multivalues():
    sts = string_to_sign(
        _ACCOUNT, "GET",
        "https://x/c?Zeta=2&alpha=b&alpha=a&empty=&comp=list",
        _headers(body_len=0))
    tail = sts[sts.index("/account/c"):]
    # names lowercased + sorted; values sorted + comma-joined; empty
    # values skipped (policy append_canonicalized_resource)
    assert tail == "/account/c\nalpha:a,b\ncomp:list\nzeta:2"


def test_xms_headers_sorted_deduped():
    sts = string_to_sign(
        _ACCOUNT, "PUT", "https://x/c/b",
        _headers({"X-MS-Meta-B": "2", "x-ms-blob-type": "BlockBlob",
                  "x-ms-meta-a": " spaced "}))
    hdr_block = sts.split("\n/account")[0].splitlines()[12:]
    assert hdr_block == [
        "x-ms-blob-type:BlockBlob",
        f"x-ms-date:{_DATE}",
        "x-ms-meta-a:spaced",  # trimmed
        "x-ms-meta-b:2",       # lowercased, sorted
        f"x-ms-version:{_VER}",
    ]


def test_signature_roundtrip_and_pin():
    # self-pin: locks the HMAC-SHA256 + base64 output for a fixed input
    sts = string_to_sign(
        _ACCOUNT, "PUT",
        "https://account.blob.core.windows.net/c/b",
        _headers())
    sig = sign(_KEY_B64, sts)
    import base64 as b64
    assert len(b64.b64decode(sig)) == 32  # raw SHA-256 HMAC
    h = shared_key_headers(_ACCOUNT, _KEY_B64, "PUT",
                           "https://account.blob.core.windows.net/c/b",
                           123, headers={"x-ms-date": _DATE})
    assert h["Authorization"] == f"SharedKey {_ACCOUNT}:{sig}"
    # server-side recomputation accepts it; a tampered header fails
    assert verify_shared_key(_ACCOUNT, _KEY_B64, "PUT",
                             "https://account.blob.core.windows.net/c/b", h)
    bad = dict(h, **{"content-length": "124"})
    assert not verify_shared_key(
        _ACCOUNT, _KEY_B64, "PUT",
        "https://account.blob.core.windows.net/c/b", bad)


def test_azure_blob_sink_shared_key_azurite_style(spark):
    """End-to-end: the sink signs Put Blob with SharedKey and the fake
    server validates the signature exactly like Azurite — recomputing
    the string-to-sign from the request it received."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vector_spark.sinks import azure_blob_sink

    results = []

    class Handler(BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            url = f"http://{self.headers['Host']}{self.path}"
            ok = verify_shared_key(
                "devstoreaccount1", _KEY_B64, "PUT", url,
                dict(self.headers.items()))
            results.append((ok, self.path, body,
                            self.headers.get("x-ms-version"),
                            self.headers.get("x-ms-date")))
            self.send_response(201 if ok else 403)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([("s1",), ("s2",)], "message string") \
            .coalesce(1)
        n = azure_blob_sink(
            df, f"http://127.0.0.1:{srv.server_port}", "logs",
            account_name="devstoreaccount1", shared_key=_KEY_B64,
        )
        assert n == 1
        (ok, path, body, ver, date), = results
        assert ok, "server-side SharedKey validation failed"
        assert path.startswith("/logs/date=")
        assert body.decode().splitlines() == ["s1", "s2"]
        assert ver and date  # signing headers present on the wire
    finally:
        srv.shutdown()
