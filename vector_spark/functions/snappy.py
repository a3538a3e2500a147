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
compress (REAL since r11, matching the lz4/zstd writers): greedy
4-byte hash-table match finder over the reference implementation's
64 KiB input fragments — offsets always fit copy-with-2-byte-offset
elements, long matches split into ≤64-byte copy elements, short
near matches use the 1-byte-offset form. Incompressible fragments
cost one literal header, so worst case ≈ the old literal-only
writer.
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


def _emit_literal(out: bytearray, lit: bytes) -> None:
    ln = len(lit)
    if ln == 0:
        return
    if ln <= 60:
        out.append((ln - 1) << 2)
    elif ln <= 0x100:
        out.append(60 << 2)
        out.append(ln - 1)
    elif ln <= 0x10000:
        out.append(61 << 2)
        out.extend((ln - 1).to_bytes(2, "little"))
    else:  # fragments are 64 KiB, so this branch never fires here
        out.append(62 << 2)
        out.extend((ln - 1).to_bytes(3, "little"))
    out.extend(lit)


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Split a match into legal copy elements (≤64 bytes each; the
    1-byte-offset form for short near matches, 2-byte otherwise)."""
    while length >= 68:
        out.append(2 | (63 << 2))  # 64-byte copy2
        out.extend(offset.to_bytes(2, "little"))
        length -= 64
    if length > 64:  # leave a ≥4 remainder for the final element
        out.append(2 | (59 << 2))  # 60-byte copy2
        out.extend(offset.to_bytes(2, "little"))
        length -= 60
    if 4 <= length <= 11 and offset < 2048:
        out.append(1 | ((length - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    else:
        out.append(2 | ((length - 1) << 2))
        out.extend(offset.to_bytes(2, "little"))


def _compress_fragment(data: bytes, out: bytearray) -> None:
    """Greedy hash-table matcher over one ≤64 KiB fragment (the C++
    implementation's working unit, so offsets stay < 65536)."""
    n = len(data)
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    limit = n - 4
    while pos <= limit:
        seed = data[pos:pos + 4]
        cand = table.get(seed)
        table[seed] = pos
        if cand is None:
            pos += 1
            continue
        m = pos + 4
        c = cand + 4
        while m < n and data[m] == data[c]:
            m += 1
            c += 1
        _emit_literal(out, data[anchor:pos])
        _emit_copy(out, pos - cand, m - pos)
        if m - 2 > pos:
            table[data[m - 2:m + 2]] = m - 2
        pos = m
        anchor = m
    _emit_literal(out, data[anchor:])


def compress(data: bytes) -> bytes:
    """bytes → really-compressed snappy block (module docstring)."""
    out = bytearray()
    _write_uvarint(len(data), out)
    pos = 0
    n = len(data)
    while pos < n:
        chunk = data[pos:pos + 65536]
        pos += len(chunk)
        _compress_fragment(chunk, out)
    return bytes(out)
