"""dnstap source codec: Frame Streams framing + dnstap protobuf + DNS
wire-format parsing — the payload stack of the reference's dnstap source
(`src/sources/dnstap/`, `lib/vector-vrl/dnstap-parser/`), built on this
repo's pure-Python protobuf wire layer (functions/protowire.py).

Three public layers, all from public specs:
- Frame Streams (`fstrm`) framing: data frames are 4-byte BE
  length-prefixed; a zero length escapes a control frame (4-byte control
  length + control payload) — START/STOP/READY/ACCEPT/FINISH are
  transport negotiation and carry no events.
- dnstap protobuf (`lib/vector-vrl/dnstap-parser/proto/dnstap.proto`,
  public frame from the dnstap project): Dnstap{identity, version, type,
  Message{type, socket_*, *_address/port, *_time_sec/nsec,
  query/response_message, query_zone}}.
- DNS wire format (RFC 1035 + EDNS0 RFC 6891): header, question,
  answer/authority/additional sections with name decompression, typed
  rdata for the common record types, OPT pseudo-section.

`parse_dnstap` produces the reference's event field names
(`dnstap-parser/src/schema.rs:308-377`: serverId, messageType,
requestData.header/question/opt, rcodeName, ...), pinned in
tests/test_dnstap.py against the reference's own base64 test payloads.
"""

from __future__ import annotations

import base64
import ipaddress
import struct

from vector_spark.functions.protowire import decode_message

DNSTAP_REGISTRY: dict = {
    "Dnstap": {
        1: ("identity", "bytes"),
        2: ("version", "bytes"),
        3: ("extra", "bytes"),
        15: ("type", "enum"),
        14: ("message", "msg:Message"),
    },
    "Message": {
        1: ("type", "enum"),
        2: ("socket_family", "enum"),
        3: ("socket_protocol", "enum"),
        4: ("query_address", "bytes"),
        5: ("response_address", "bytes"),
        6: ("query_port", "uint32"),
        7: ("response_port", "uint32"),
        8: ("query_time_sec", "uint64"),
        9: ("query_time_nsec", "fixed32"),
        10: ("query_message", "bytes"),
        11: ("query_zone", "bytes"),
        12: ("response_time_sec", "uint64"),
        13: ("response_time_nsec", "fixed32"),
        14: ("response_message", "bytes"),
        16: ("http_protocol", "enum"),
    },
}

_MESSAGE_TYPES = {
    1: "AuthQuery", 2: "AuthResponse", 3: "ResolverQuery",
    4: "ResolverResponse", 5: "ClientQuery", 6: "ClientResponse",
    7: "ForwarderQuery", 8: "ForwarderResponse", 9: "StubQuery",
    10: "StubResponse", 11: "ToolQuery", 12: "ToolResponse",
    13: "UpdateQuery", 14: "UpdateResponse",
}
_SOCKET_FAMILIES = {1: "INET", 2: "INET6"}
_SOCKET_PROTOCOLS = {
    1: "UDP", 2: "TCP", 3: "DOT", 4: "DOH", 5: "DNSCryptUDP",
    6: "DNSCryptTCP", 7: "DOQ",
}

_RCODE_NAMES = {
    0: "NoError", 1: "FormErr", 2: "ServFail", 3: "NXDomain",
    4: "NotImp", 5: "Refused", 6: "YXDomain", 7: "YXRRSet",
    8: "NXRRSet", 9: "NotAuth", 10: "NotZone", 16: "BADVERS",
    17: "BADKEY", 18: "BADTIME", 19: "BADMODE", 20: "BADNAME",
    21: "BADALG", 22: "BADTRUNC", 23: "BADCOOKIE",
}

_RECORD_TYPES = {
    1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
    16: "TXT", 28: "AAAA", 33: "SRV", 35: "NAPTR", 39: "DNAME",
    41: "OPT", 43: "DS", 46: "RRSIG", 47: "NSEC", 48: "DNSKEY",
    50: "NSEC3", 51: "NSEC3PARAM", 52: "TLSA", 65: "HTTPS",
    99: "SPF", 255: "ANY", 257: "CAA",
}
_CLASS_NAMES = {1: "IN", 2: "CS", 3: "CH", 4: "HS", 255: "ANY"}

# EDNS option code names (IANA registry; the subset the reference names)
_OPT_NAMES = {
    3: "NSID", 5: "DAU", 6: "DHU", 7: "N3U", 8: "ClientSubnet",
    9: "EDNSExpire", 10: "Cookie", 11: "EdnsTcpKeepalive",
    12: "Padding", 13: "Chain", 14: "EdnsKeyTag", 15: "EDNSError",
}


# ---- Frame Streams framing ---------------------------------------------


def fstrm_frames(blob: bytes) -> list[bytes]:
    """Concatenated Frame Streams frames → data-frame payloads. Control
    frames (zero-length escape) are consumed and skipped — they carry
    transport negotiation, not events."""
    out: list[bytes] = []
    pos = 0
    n = len(blob)
    while pos + 4 <= n:
        ln = struct.unpack(">I", blob[pos:pos + 4])[0]
        pos += 4
        if ln == 0:  # control frame escape: control length + payload
            if pos + 4 > n:
                break
            cln = struct.unpack(">I", blob[pos:pos + 4])[0]
            pos += 4 + cln
            continue
        if pos + ln > n:
            break
        out.append(blob[pos:pos + ln])
        pos += ln
    return out


def frame_fstrm(payload: bytes) -> bytes:
    """One data frame: 4-byte BE length + payload."""
    return struct.pack(">I", len(payload)) + payload


# ---- DNS wire format ----------------------------------------------------


def _read_name(buf: bytes, pos: int, depth: int = 0) -> tuple[str, int]:
    """Domain name at pos, honoring compression pointers. Returns
    (dotted name with trailing dot, position after the name)."""
    labels: list[str] = []
    while True:
        # depth counts only compression-pointer hops (a legal name may
        # carry up to 127 plain labels — RFC 1035 §3.1 — and must not
        # trip the loop guard); labels are bounded separately
        if depth > 32:
            raise ValueError("compression loop")
        if len(labels) > 127:
            raise ValueError("too many labels")
        ln = buf[pos]
        if ln & 0xC0 == 0xC0:  # compression pointer
            target = ((ln & 0x3F) << 8) | buf[pos + 1]
            tail, _ = _read_name(buf, target, depth + 1)
            name = ".".join(labels) + "." + tail if labels else tail
            return name, pos + 2
        pos += 1
        if ln == 0:
            return (".".join(labels) + "." if labels else "."), pos
        labels.append(buf[pos:pos + ln].decode("ascii", "replace"))
        pos += ln


def _format_rdata(rtype: int, rd: bytes, buf: bytes, rpos: int) -> str:
    """Typed rdata presentation; unknown types render as hex."""
    try:
        if rtype == 1 and len(rd) == 4:
            return str(ipaddress.IPv4Address(rd))
        if rtype == 28 and len(rd) == 16:
            return str(ipaddress.IPv6Address(rd))
        if rtype in (2, 5, 12, 39):  # NS/CNAME/PTR/DNAME: one name
            return _read_name(buf, rpos)[0]
        if rtype == 15:  # MX: preference + exchange
            pref = struct.unpack(">H", rd[:2])[0]
            return f"{pref} {_read_name(buf, rpos + 2)[0]}"
        if rtype == 16:  # TXT: length-prefixed strings
            parts, p = [], 0
            while p < len(rd):
                ln = rd[p]
                parts.append(rd[p + 1:p + 1 + ln].decode("utf-8", "replace"))
                p += 1 + ln
            return " ".join(f'"{t}"' for t in parts)
        if rtype == 6:  # SOA
            m, p2 = _read_name(buf, rpos)
            r, p2 = _read_name(buf, p2)
            serial, refresh, retry, expire, minimum = struct.unpack(
                ">IIIII", buf[p2:p2 + 20]
            )
            return f"{m} {r} {serial} {refresh} {retry} {expire} {minimum}"
        if rtype == 33:  # SRV
            prio, weight, port = struct.unpack(">HHH", rd[:6])
            return f"{prio} {weight} {port} {_read_name(buf, rpos + 6)[0]}"
    except (IndexError, ValueError, struct.error):
        pass
    return rd.hex()


def parse_dns_message(buf: bytes, lowercase_hostnames: bool = False) -> dict:
    """DNS wire message → the reference's requestData/responseData shape
    (header, question, answers/authority/additional, opt, fullRcode,
    rcodeName)."""

    def nm(name: str) -> str:
        return name.lower() if lowercase_hostnames else name

    (mid, flags, qd, an, ns, ar) = struct.unpack(">HHHHHH", buf[:12])
    header = {
        "id": mid,
        "opcode": (flags >> 11) & 0xF,
        "rcode": flags & 0xF,
        "qr": (flags >> 15) & 1,
        "aa": bool((flags >> 10) & 1),
        "tc": bool((flags >> 9) & 1),
        "rd": bool((flags >> 8) & 1),
        "ra": bool((flags >> 7) & 1),
        "ad": bool((flags >> 5) & 1),
        "cd": bool((flags >> 4) & 1),
        "qdCount": qd,
        "anCount": an,
        "nsCount": ns,
        "arCount": ar,
    }
    pos = 12
    question = []
    for _ in range(qd):
        name, pos = _read_name(buf, pos)
        qtype, qclass = struct.unpack(">HH", buf[pos:pos + 4])
        pos += 4
        question.append(
            {
                "domainName": nm(name),
                "questionType": _RECORD_TYPES.get(qtype, str(qtype)),
                "questionTypeId": qtype,
                "class": _CLASS_NAMES.get(qclass, str(qclass)),
            }
        )

    opt = None
    extended_rcode = 0

    def read_records(count: int, pos: int) -> tuple[list[dict], int]:
        nonlocal opt, extended_rcode
        out = []
        for _ in range(count):
            name, pos = _read_name(buf, pos)
            rtype, rclass, ttl, rdlen = struct.unpack(
                ">HHIH", buf[pos:pos + 10]
            )
            pos += 10
            rd = buf[pos:pos + rdlen]
            if rtype == 41:  # OPT pseudo-record (EDNS0, RFC 6891)
                extended_rcode = (ttl >> 24) & 0xFF
                options = []
                p = 0
                while p + 4 <= len(rd):
                    code, oln = struct.unpack(">HH", rd[p:p + 4])
                    options.append(
                        {
                            "optCode": code,
                            "optName": _OPT_NAMES.get(code, str(code)),
                            "optValue": base64.b64encode(
                                rd[p + 4:p + 4 + oln]
                            ).decode(),
                        }
                    )
                    p += 4 + oln
                opt = {
                    "extendedRcode": extended_rcode,
                    "ednsVersion": (ttl >> 16) & 0xFF,
                    "do": bool((ttl >> 15) & 1),
                    "udpPayloadSize": rclass,
                    "options": options,
                }
            else:
                out.append(
                    {
                        "domainName": nm(name),
                        "recordType": _RECORD_TYPES.get(rtype, str(rtype)),
                        "recordTypeId": rtype,
                        "class": _CLASS_NAMES.get(rclass, str(rclass)),
                        "ttl": ttl,
                        "rData": _format_rdata(rtype, rd, buf, pos)
                        if rtype not in (2, 5, 12, 15, 39)
                        else nm(_format_rdata(rtype, rd, buf, pos)),
                    }
                )
            pos += rdlen
        return out, pos

    answers, pos = read_records(an, pos)
    authority, pos = read_records(ns, pos)
    additional, pos = read_records(ar, pos)
    full_rcode = header["rcode"] | (extended_rcode << 4)
    out = {
        "header": header,
        "question": question,
        "answers": answers,
        "authority": authority,
        "additional": additional,
        "fullRcode": full_rcode,
        "rcodeName": _RCODE_NAMES.get(full_rcode, str(full_rcode)),
    }
    if opt is not None:
        out["opt"] = opt
    return out


# ---- dnstap event assembly ---------------------------------------------


def _addr(b: bytes | None) -> str | None:
    if b is None:
        return None
    if len(b) == 4:
        return str(ipaddress.IPv4Address(b))
    if len(b) == 16:
        return str(ipaddress.IPv6Address(b))
    return b.hex()


def parse_dnstap(payload: bytes, lowercase_hostnames: bool = False) -> dict:
    """Dnstap protobuf frame → the reference's flat event
    (schema.rs field names; parser.rs assembly rules: query types take
    query_time, response types response_time, both rendered in ns)."""
    d = decode_message(payload, DNSTAP_REGISTRY["Dnstap"], DNSTAP_REGISTRY)
    ev: dict = {
        "dataType": "Message" if d.get("type") == 1 else str(d.get("type")),
        "dataTypeId": d.get("type"),
    }
    if d.get("identity") is not None:
        ev["serverId"] = d["identity"].decode("utf-8", "replace")
    if d.get("version") is not None:
        ev["serverVersion"] = d["version"].decode("utf-8", "replace")
    m = d.get("message")
    if not m:
        return ev
    mt = m.get("type")
    ev["messageType"] = _MESSAGE_TYPES.get(mt, f"Unknown dnstap message type: {mt}")
    ev["messageTypeId"] = mt
    if m.get("socket_family") is not None:
        ev["socketFamily"] = _SOCKET_FAMILIES.get(m["socket_family"])
    if m.get("socket_protocol") is not None:
        ev["socketProtocol"] = _SOCKET_PROTOCOLS.get(m["socket_protocol"])
    if m.get("query_address") is not None:
        ev["sourceAddress"] = _addr(m["query_address"])
    if m.get("query_port") is not None:
        ev["sourcePort"] = m["query_port"]
    if m.get("response_address") is not None:
        ev["responseAddress"] = _addr(m["response_address"])
    if m.get("response_port") is not None:
        ev["responsePort"] = m["response_port"]
    if m.get("query_zone"):
        try:
            ev["queryZone"] = _read_name(m["query_zone"], 0)[0]
        except (IndexError, ValueError):
            ev["queryZone"] = m["query_zone"].hex()
    is_query = mt in (1, 3, 5, 7, 9, 11, 13)
    sec = m.get("query_time_sec") if is_query else m.get("response_time_sec")
    nsec = (
        m.get("query_time_nsec") if is_query else m.get("response_time_nsec")
    )
    if sec is not None:
        ev["time"] = sec * 1_000_000_000 + (nsec or 0)
        ev["timePrecision"] = "ns"
        import datetime as dt

        ev["timestamp"] = (
            dt.datetime.fromtimestamp(sec, tz=dt.timezone.utc)
            + dt.timedelta(microseconds=(nsec or 0) // 1000)
        ).isoformat()
    for field, key, size_key in (
        ("query_message", "requestData", "requestMessageSize"),
        ("response_message", "responseData", "responseMessageSize"),
    ):
        raw = m.get(field)
        if raw is not None:
            ev[size_key] = len(raw)
            try:
                ev[key] = parse_dns_message(raw, lowercase_hostnames)
            except (IndexError, ValueError, struct.error) as e:
                ev[key] = None
                ev["error"] = f"malformed DNS message: {e}"
                ev["rawData"] = base64.b64encode(raw).decode()
    return ev
