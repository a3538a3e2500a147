"""Pure-Python LZ4 frame codec (REAL compression since r11, full read).

Same stance as functions/snappy.py and functions/zstd.py: no lz4
library ships in this container, but the formats are public
(github.com/lz4/lz4/blob/dev/doc/lz4_Frame_format.md and
lz4_Block_format.md) and VRL has encode_lz4/decode_lz4 — both were
env-gated before this module.

compress: real LZ4 block compression — a greedy 4-byte hash-chain
match finder in the shape of the reference implementation's fast
path (lz4.c LZ4_compress_generic: 64 KiB offset window, MINMATCH 4,
the spec's end-of-block rules: last match starts ≥12 bytes before the
end, final ≥5 bytes are literals). Blocks that don't shrink are
emitted as stored blocks (high bit of the block size), so worst case
equals the r10 store-mode writer. Pure Python trades throughput for
zero dependencies — fine for sink request bodies, which are built
per-partition in parallel workers; wire ratio is what matters at
100 TB egress.

decompress: full frame parsing (magic, descriptor flags, optional
content size / dict id, skippable frames) AND full BLOCK decoding —
token nibbles, LSIC length extension, little-endian match offsets,
overlapping copies. Header/content checksums are xxHash-32; the
descriptor HC byte is stamped with the spec implementation below.
"""

from __future__ import annotations

LZ4_MAGIC = b"\x04\x22\x4d\x18"
_SKIPPABLE_LO = 0x184D2A50
_STORE_CHUNK = 4 * 1024 * 1024  # 4 MiB block-max (BD byte value 7)


def _emit_sequence(out: bytearray, literals: bytes, offset: int,
                   match_len: int) -> None:
    """One LZ4 sequence: token, LSIC literal-length extension,
    literals, 2-byte LE offset, LSIC match-length extension."""
    lit_len = len(literals)
    ml = match_len - 4  # MINMATCH bias
    token = (min(lit_len, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += literals
    out += offset.to_bytes(2, "little")
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def _encode_block(data: bytes) -> bytes | None:
    """Greedy hash-table LZ4 block encode; None when incompressible
    (too short, or the encoded form would not shrink)."""
    n = len(data)
    if n < 13:  # spec minimums leave no room for a match
        return None
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    mflimit = n - 12   # last match must START ≥12 bytes before end
    matchlimit = n - 5  # final 5 bytes are always literals
    while pos < mflimit:
        seq = data[pos:pos + 4]
        cand = table.get(seq)
        table[seq] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        # extend the match forward (the 4-byte seed is equal by key)
        m = pos + 4
        c = cand + 4
        while m < matchlimit and data[m] == data[c]:
            m += 1
            c += 1
        _emit_sequence(out, data[anchor:pos], pos - cand, m - pos)
        # index the position two bytes before the match end — the
        # reference fast path's re-seed that keeps runs chaining
        if m - 2 > pos:
            table[data[m - 2:m + 2]] = m - 2
        pos = m
        anchor = m
        if len(out) >= n:
            return None  # already not shrinking; store instead
    # final literals-only sequence (low nibble 0, no offset)
    lit = data[anchor:]
    lit_len = len(lit)
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lit
    return bytes(out) if len(out) < n else None


def compress(data: bytes) -> bytes:
    """``data`` → one LZ4 frame; each 4 MiB block is really compressed
    when that shrinks it, stored otherwise."""
    out = bytearray(LZ4_MAGIC)
    # FLG: version 01, block-independence set, no checksums/size/dict
    out.append(0x60)
    out.append(0x70)  # BD: block max size 7 (4 MiB)
    # HC byte: second byte of xxh32(FLG+BD) — precomputed for this
    # constant 2-byte descriptor (the reference value any lz4 tool
    # writes for 0x60 0x70).
    out.append(_HC_60_70)
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + _STORE_CHUNK]
        pos += len(chunk)
        enc = _encode_block(chunk)
        if enc is None:
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            out += chunk
        else:
            out += len(enc).to_bytes(4, "little")
            out += enc
    out += b"\x00\x00\x00\x00"  # EndMark
    return bytes(out)


def _decode_block(src: bytes) -> bytes:
    """LZ4 block format: [token | literal-len ext | literals |
    offset(2 LE) | match-len ext] sequences; last sequence is
    literals-only. Overlapping matches copy byte-by-byte."""
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += src[pos:pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # final literals-only sequence
        offset = int.from_bytes(src[pos:pos + 2], "little")
        pos += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: match offset before block start")
        for i in range(match_len):  # overlap-safe byte copy
            out.append(out[start + i])
    return bytes(out)


def decompress(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 4:
            raise ValueError("truncated lz4 frame")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            size = int.from_bytes(data[pos + 4:pos + 8], "little")
            pos += 8 + size
            continue
        if data[pos:pos + 4] != LZ4_MAGIC:
            raise ValueError("bad lz4 magic")
        pos += 4
        flg = data[pos]
        pos += 2  # FLG + BD
        if (flg >> 6) != 1:
            raise ValueError("unsupported lz4 frame version")
        content_size = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        block_checksum = bool(flg & 0x10)
        dict_id = bool(flg & 0x01)
        if content_size:
            pos += 8
        if dict_id:
            raise ValueError("lz4 dictionaries not supported")
        pos += 1  # HC byte (xxh32 — unverified, no xxhash lib)
        while True:
            bsize = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            if bsize == 0:  # EndMark
                break
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            block = data[pos:pos + bsize]
            pos += bsize
            if block_checksum:
                pos += 4
            out += block if stored else _decode_block(block)
        if content_checksum:
            pos += 4
    return bytes(out)


def _xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash-32 (public spec: github.com/Cyan4973/xxHash/blob/dev/
    doc/xxhash_spec.md) — needed only to STAMP the frame-descriptor
    HC byte; full implementation kept for correctness and tests."""
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while pos <= n - 16:
            for i, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[pos + 4 * i:pos + 4 * i + 4],
                                      "little")
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12)
             + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while pos <= n - 4:
        h = (h + int.from_bytes(data[pos:pos + 4], "little") * P3) & M
        h = (rotl(h, 17) * P4) & M
        pos += 4
    while pos < n:
        h = (h + data[pos] * P5) & M
        h = (rotl(h, 11) * P1) & M
        pos += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


#: second byte of xxh32(b"\x60\x70") — the HC stamp for our constant
#: frame descriptor (computed by the spec implementation above).
_HC_60_70 = (_xxh32(b"\x60\x70") >> 8) & 0xFF
