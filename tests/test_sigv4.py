"""SigV4 pinned against the AWS documentation's worked example."""

from vector_spark.functions.sigv4 import sign_request


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
