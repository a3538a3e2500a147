"""Pure-Python Snappy raw-format codec (the PUBLIC snappy format
description: github.com/google/snappy/blob/main/format_description.txt).

Why: the reference's prometheus remote_write source/sink
(`src/sources/prometheus/remote_write.rs`) carries snappy-compressed
protobuf bodies, and VRL has encode_snappy/decode_snappy — both were
env-gated because this container ships no snappy library. The format is
small: a uvarint uncompressed length, then literal and back-reference
copy elements.

decompress: full format (literals + 1/2/4-byte-offset copies,
overlapping copies byte-by-byte like the spec requires).
compress: emits LITERAL-ONLY streams — valid snappy any decoder accepts
(the format does not require copies), trading ratio for simplicity; the
docstring-level contract is interoperability, not ratio.
"""

from __future__ import annotations


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("malformed snappy length")


def _write_uvarint(n: int, out: bytearray) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decompress(buf: bytes) -> bytes:
    """Raw snappy block → bytes."""
    total, pos = _read_uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63: length rides in 1..4 extra LE bytes
                extra = ln - 59
                ln = int.from_bytes(buf[pos:pos + extra], "little")
                pos += extra
            ln += 1
            out.extend(buf[pos:pos + ln])
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("invalid snappy copy offset")
        # overlapping copies repeat already-written bytes (spec: copy
        # byte-by-byte, the run-length-encoding trick)
        start = len(out) - offset
        for i in range(ln):
            out.append(out[start + i])
    if len(out) != total:
        raise ValueError(
            f"snappy length mismatch: header {total}, decoded {len(out)}"
        )
    return bytes(out)


def compress(data: bytes) -> bytes:
    """bytes → valid literal-only snappy block (see module docstring)."""
    out = bytearray()
    _write_uvarint(len(data), out)
    pos = 0
    n = len(data)
    while pos < n or (n == 0 and pos == 0):
        chunk = data[pos:pos + 65536]
        ln = len(chunk)
        if n == 0:
            break
        if ln <= 60:
            out.append(((ln - 1) << 2) | 0)
        else:
            out.append((61 << 2) | 0)  # 2-byte LE length
            out.extend((ln - 1).to_bytes(2, "little"))
        out.extend(chunk)
        pos += ln
    return bytes(out)
