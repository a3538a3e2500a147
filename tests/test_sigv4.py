"""SigV4 pinned against the AWS documentation's worked example plus
vectors from the public aws-sig-v4-test-suite (example.amazonaws.com /
service / us-east-1 / 20150830T123600Z)."""

import hashlib
import hmac

from vector_spark.functions.sigv4 import sign_request

_SUITE_SECRET = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
_SUITE_SCOPE = "20150830/us-east-1/service/aws4_request"
_EMPTY_SHA = hashlib.sha256(b"").hexdigest()


def _sig_from_creq(creq: str) -> str:
    """The suite's documented chain: canonical request → string to
    sign → derived key → signature. Used to pin that sign_request's
    CANONICALIZATION (the part that can silently diverge) produces
    exactly the test suite's published canonical request."""
    sts = "\n".join([
        "AWS4-HMAC-SHA256", "20150830T123600Z", _SUITE_SCOPE,
        hashlib.sha256(creq.encode()).hexdigest(),
    ])
    key = ("AWS4" + _SUITE_SECRET).encode()
    for part in _SUITE_SCOPE.split("/"):
        key = hmac.new(key, part.encode(), hashlib.sha256).digest()
    return hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()


def _suite_sign(url: str) -> str:
    out = sign_request(
        "GET", url, {}, b"",
        access_key="AKIDEXAMPLE", secret_key=_SUITE_SECRET,
        region="us-east-1", service="service",
        amz_date="20150830T123600Z",
    )
    return out["Authorization"].rsplit("Signature=", 1)[1]


def test_sigv4_suite_query_order_key_case():
    """get-vanilla-query-order-key-case: parameters arrive as
    Param2 then Param1; the canonical query must be tuple-sorted by
    (name, value) AFTER encoding — Param1 first."""
    creq = "\n".join([
        "GET", "/", "Param1=value1&Param2=value2",
        "host:example.amazonaws.com",
        "x-amz-date:20150830T123600Z",
        "", "host;x-amz-date", _EMPTY_SHA,
    ])
    assert _suite_sign(
        "https://example.amazonaws.com/?Param2=value2&Param1=value1"
    ) == _sig_from_creq(creq)


def test_sigv4_suite_query_order_value():
    """get-vanilla-query-order-value: duplicate parameter name —
    values sort ascending within the name."""
    creq = "\n".join([
        "GET", "/", "Param1=value1&Param1=value2",
        "host:example.amazonaws.com",
        "x-amz-date:20150830T123600Z",
        "", "host;x-amz-date", _EMPTY_SHA,
    ])
    assert _suite_sign(
        "https://example.amazonaws.com/?Param1=value2&Param1=value1"
    ) == _sig_from_creq(creq)


def test_sigv4_suite_query_unreserved():
    """get-vanilla-query-unreserved: every RFC 3986 unreserved char
    passes through the encoder untouched."""
    unres = ("-._~0123456789abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    creq = "\n".join([
        "GET", "/", f"{unres}={unres}",
        "host:example.amazonaws.com",
        "x-amz-date:20150830T123600Z",
        "", "host;x-amz-date", _EMPTY_SHA,
    ])
    assert _suite_sign(
        f"https://example.amazonaws.com/?{unres}={unres}"
    ) == _sig_from_creq(creq)


def test_sigv4_encoded_sort_order():
    """The spec sorts ENCODED names: a non-ASCII key percent-encodes
    to %XX and '%' (0x25) sorts before alphanumerics, so the encoded
    key leads even though the raw codepoint would sort last."""
    creq = "\n".join([
        "GET", "/", "%C3%A4=1&z=2",
        "host:example.amazonaws.com",
        "x-amz-date:20150830T123600Z",
        "", "host;x-amz-date", _EMPTY_SHA,
    ])
    assert _suite_sign(
        "https://example.amazonaws.com/?z=2&ä=1"
    ) == _sig_from_creq(creq)


def test_sigv4_aws_docs_vector():
    """The docs' get-vanilla-query example: GET iam ListUsers,
    20150830T123600Z, AKIDEXAMPLE — expected signature 5d672d79...b5d7."""
    out = sign_request(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        {"content-type":
         "application/x-www-form-urlencoded; charset=utf-8"},
        b"",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        service="iam",
        amz_date="20150830T123600Z",
    )
    assert out["Authorization"] == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400"
        "e06b5924a6f2b5d7"
    )
    assert out["x-amz-date"] == "20150830T123600Z"


def test_sigv4_deterministic_and_payload_sensitive():
    kw = dict(access_key="AK", secret_key="SK", region="eu-west-1",
              service="sqs", amz_date="20240101T000000Z")
    a = sign_request("POST", "http://sqs.local/q", {}, b"{}", **kw)
    b = sign_request("POST", "http://sqs.local/q", {}, b"{}", **kw)
    c = sign_request("POST", "http://sqs.local/q", {}, b"{x}", **kw)
    assert a == b
    assert a["Authorization"] != c["Authorization"]


def test_session_token_signed():
    """STS temporary credentials: x-amz-security-token joins the
    SIGNED header set (the SigV4 rule; the reference's aws session
    token support)."""
    from vector_spark.functions.sigv4 import sign_request

    base = dict(
        method="GET", url="https://s3.us-east-1.amazonaws.com/b/k",
        headers={"x-amz-content-sha256": "e" * 64}, payload=b"",
        access_key="AK", secret_key="SK", region="us-east-1",
        service="s3", amz_date="20150830T123600Z",
    )
    plain = sign_request(**base)
    with_tok = sign_request(**base, session_token="TOKEN123")
    assert "x-amz-security-token" not in plain
    assert with_tok["x-amz-security-token"] == "TOKEN123"
    assert "x-amz-security-token" in with_tok["Authorization"].split(
        "SignedHeaders=")[1].split(",")[0]
    # the token changes the signature (it is inside the canonical form)
    assert plain["Authorization"] != with_tok["Authorization"]
