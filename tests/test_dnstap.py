"""dnstap codec (functions/dnstap.py): pinned against the reference's
OWN parser test payloads (lib/vector-vrl/dnstap-parser/src/parser.rs
test_parse_dnstap_data_* — public base64 test vectors), plus Frame
Streams framing and the VRL surface."""

from __future__ import annotations

import base64

from vector_spark.functions.dnstap import (
    fstrm_frames,
    frame_fstrm,
    parse_dns_message,
    parse_dnstap,
)

# parser.rs test_parse_dnstap_data_with_query_message (ResolverQuery from
# BIND; the expected values below are that test's own assertions)
QUERY_B64 = (
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zcnoIAxACGAEiEAAAAAAAAA"
    "AAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3WNlI2kwIAAAABAAAAAAABCWZhY2Vib29rMQNjb"
    "20AAAEAAQAAKQIAAACAAAAMAAoACOxjCAG9zVgzWgUDY29tAHgB"
)
# parser.rs test_parse_dnstap_data_lowercase_hostnames (ClientResponse)
RESP_B64 = (
    "Cgw2NzNiNWZiZWI5MmESMkJJTkQgOS4xOC4yMS0xK3VidW50dTIyLjA0LjErZGViLnN1cnkub3JnKzEtVWJ1bnR1cqkBCAYQARgBIgQKWQUeKgQKWQUqMMitAjg1YLXQp68GbZ9tBw9ygwGInoGAAAEABAAAAAEGVmVjdG9yA0RldgAAAQABwAwAAQABAAAAPAAEEvVWOMAMAAEAAQAAADwABBL1VnnADAABAAEAAAA8AAQS9VYSwAwAAQABAAAAPAAEEvVWWQAAKQTQAAAAAAAcAAoAGERDbSN8uKngAQAAAGXp6DXs0fbpv0n9F3gB"
)


def test_reference_query_payload():
    ev = parse_dnstap(base64.b64decode(QUERY_B64))
    assert ev["serverId"] == "james-Virtual-Machine"
    assert ev["serverVersion"] == "BIND 9.16.3"
    assert ev["dataType"] == "Message" and ev["dataTypeId"] == 1
    assert ev["messageType"] == "ResolverQuery" and ev["messageTypeId"] == 3
    assert ev["socketFamily"] == "INET6" and ev["socketProtocol"] == "UDP"
    assert ev["sourceAddress"] == "::" and ev["sourcePort"] == 46835
    assert ev["responseAddress"] == "2001:502:7094::30"
    assert ev["responsePort"] == 53
    assert ev["queryZone"] == "com."
    assert ev["requestMessageSize"] == 54
    assert ev["time"] == 1_593_489_007_920_014_129
    assert ev["timePrecision"] == "ns"
    assert ev["timestamp"].startswith("2020-06-30T03:50:07.920014")
    rq = ev["requestData"]
    assert rq["fullRcode"] == 0 and rq["rcodeName"] == "NoError"
    h = rq["header"]
    assert h["id"] == 37634 and h["opcode"] == 0 and h["rcode"] == 0
    assert h["qr"] == 0 and h["qdCount"] == 1 and h["anCount"] == 0
    assert h["nsCount"] == 0 and h["arCount"] == 1
    assert h["aa"] is False and h["tc"] is False and h["rd"] is False
    assert h["ra"] is False and h["ad"] is False and h["cd"] is False
    [q] = rq["question"]
    assert q == {
        "domainName": "facebook1.com.",
        "questionType": "A",
        "questionTypeId": 1,
        "class": "IN",
    }
    opt = rq["opt"]
    assert opt["do"] is True and opt["ednsVersion"] == 0
    assert opt["extendedRcode"] == 0 and opt["udpPayloadSize"] == 512
    [o] = opt["options"]
    assert o["optCode"] == 10 and o["optName"] == "Cookie"
    assert o["optValue"] == "7GMIAb3NWDM="


def test_reference_response_payload_and_lowercase():
    raw = base64.b64decode(RESP_B64)
    ev = parse_dnstap(raw)
    assert ev["messageType"] == "ClientResponse"
    assert ev["responseData"]["question"][0]["domainName"] == "Vector.Dev."
    assert ev["responseData"]["answers"][0]["domainName"] == "Vector.Dev."
    # A-record rdata renders as the dotted address
    assert ev["responseData"]["answers"][0]["recordType"] == "A"
    assert ev["responseData"]["answers"][0]["rData"].count(".") == 3
    low = parse_dnstap(raw, lowercase_hostnames=True)
    assert low["responseData"]["question"][0]["domainName"] == "vector.dev."
    assert low["responseData"]["answers"][0]["domainName"] == "vector.dev."


def test_fstrm_framing_roundtrip():
    p1, p2 = b"payload-one", b"payload-two-longer"
    control = b"\x00\x00\x00\x00" + b"\x00\x00\x00\x04" + b"\x00\x00\x00\x02"
    blob = control + frame_fstrm(p1) + frame_fstrm(p2) + control
    assert fstrm_frames(blob) == [p1, p2]
    # truncated tail is dropped, not an error
    assert fstrm_frames(blob + b"\x00\x00\x00\xff" + b"xx") == [p1, p2]


def test_dns_name_compression_and_rdata_types():
    import struct

    # hand-built message: question example.com A; answer CNAME via
    # compression pointer; MX record
    name = b"\x07example\x03com\x00"
    hdr = struct.pack(">HHHHHH", 7, 0x8180, 1, 2, 0, 0)
    q = name + struct.pack(">HH", 1, 1)
    ptr = b"\xc0\x0c"  # pointer to offset 12 (the question name)
    cname_rd = b"\x03www" + ptr
    a1 = ptr + struct.pack(">HHIH", 5, 1, 60, len(cname_rd)) + cname_rd
    mx_rd = struct.pack(">H", 10) + b"\x04mail" + ptr
    a2 = ptr + struct.pack(">HHIH", 15, 1, 60, len(mx_rd)) + mx_rd
    msg = parse_dns_message(hdr + q + a1 + a2)
    assert msg["question"][0]["domainName"] == "example.com."
    assert msg["answers"][0]["rData"] == "www.example.com."
    assert msg["answers"][1]["rData"] == "10 mail.example.com."
    assert msg["header"]["qr"] == 1 and msg["rcodeName"] == "NoError"


def test_vrl_parse_dnstap_function(spark):
    """The VRL surface: parse_dnstap over a binary column through the
    compiler, fields via the JSON-text bridge."""
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame(
        [(base64.b64decode(QUERY_B64),)], "frame binary"
    )
    out = vrl_remap(
        df,
        ".ev = parse_dnstap(.frame)\n"
        ".mt = .ev.messageType\n"
        ".qname = .ev.requestData.question[0].domainName\n",
    )[""].collect()[0]
    assert out.mt == "ResolverQuery"
    assert out.qname == "facebook1.com."


def test_dnstap_tcp_source_end_to_end(spark, tmp_path):
    """Topology YAML: a dnstap TCP source through to a memory sink — the
    Frame Streams bidirectional handshake (READY->ACCEPT, STOP->FINISH),
    data frames carrying the reference's own payloads."""
    import socket
    import struct
    import time
    import uuid
    import json as _json

    from vector_spark.config.loader import load_topology, start_streaming_sinks

    def _free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    port = _free_port()
    name = f"dt_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  dns:
    type: dnstap
    port: {port}
sinks:
  out:
    type: memory
    inputs: [dns]
    query_name: {name}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        payload = base64.b64decode(QUERY_B64)
        deadline = time.time() + 30
        sent = False
        while time.time() < deadline and not sent:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=2)
                ctype = b"protobuf:dnstap.Dnstap"
                ready_ctrl = (
                    struct.pack(">I", 4)
                    + struct.pack(">II", 1, len(ctype)) + ctype
                )
                c.sendall(
                    b"\x00\x00\x00\x00"
                    + struct.pack(">I", len(ready_ctrl)) + ready_ctrl
                )
                # expect ACCEPT back (bidirectional contract)
                hdr = c.recv(8)
                assert hdr[:4] == b"\x00\x00\x00\x00"
                aln = struct.unpack(">I", hdr[4:8])[0]
                accept = c.recv(aln)
                assert struct.unpack(">I", accept[:4])[0] == 1
                start_ctrl = struct.pack(">I", 2)
                c.sendall(
                    b"\x00\x00\x00\x00"
                    + struct.pack(">I", len(start_ctrl)) + start_ctrl
                )
                for _ in range(3):
                    c.sendall(struct.pack(">I", len(payload)) + payload)
                stop_ctrl = struct.pack(">I", 3)
                c.sendall(
                    b"\x00\x00\x00\x00"
                    + struct.pack(">I", len(stop_ctrl)) + stop_ctrl
                )
                fin = c.recv(64)
                assert struct.unpack(">I", fin[4:8])[0] == 4
                c.close()
                sent = True
            except OSError:
                time.sleep(0.5)
        assert sent
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c
            if n >= 3:
                break
            time.sleep(1)
        assert n >= 3
        [row] = spark.sql(f"SELECT message FROM {name} LIMIT 1").collect()
        ev = _json.loads(row.message)
        assert ev["messageType"] == "ResolverQuery"
        assert ev["requestData"]["question"][0]["domainName"] == "facebook1.com."
    finally:
        for q in queries.values():
            q.stop()


def test_many_plain_labels_is_not_a_compression_loop():
    import struct

    # ADVICE r4 (low): depth used to count plain labels too, so a legal
    # name with >32 labels tripped the 'compression loop' guard. RFC 1035
    # allows up to 127 labels; only pointer hops should be depth-bounded.
    name = b"".join(b"\x01a" for _ in range(60)) + b"\x00"
    hdr = struct.pack(">HHHHHH", 1, 0x0100, 1, 0, 0, 0)
    q = name + struct.pack(">HH", 1, 1)
    msg = parse_dns_message(hdr + q)
    assert msg["question"][0]["domainName"] == "a." * 60
