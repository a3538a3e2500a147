"""HPACK (RFC 7541) header compression for the HTTP/2 listener.

Clean-room implementation from the spec: prefix-coded integers (§5.1),
Huffman-coded string literals (§5.2, code table in hpack_huffman.py =
Appendix B), the 61-entry static table (Appendix A), and a dynamic
table with size-based eviction (§4). The decoder handles every
representation a client may send (indexed, literal with/without/never
indexing, table-size update); the encoder emits indexed fields for
static-table hits and raw literals otherwise — always-valid HPACK that
never needs Huffman on the send side.

Pinned against RFC 7541's own worked examples (Appendix C.3 plain and
C.4 Huffman request sequences) in tests/test_hpack.py.
"""

from __future__ import annotations

from vector_spark.functions.hpack_huffman import HUFFMAN_CODES

# RFC 7541 Appendix A — index 1..61
STATIC_TABLE = [
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""),
    ("content-type", ""), ("cookie", ""), ("date", ""), ("etag", ""),
    ("expect", ""), ("expires", ""), ("from", ""), ("host", ""),
    ("if-match", ""), ("if-modified-since", ""), ("if-none-match", ""),
    ("if-range", ""), ("if-unmodified-since", ""), ("last-modified", ""),
    ("link", ""), ("location", ""), ("max-forwards", ""),
    ("proxy-authenticate", ""), ("proxy-authorization", ""),
    ("range", ""), ("referer", ""), ("refresh", ""), ("retry-after", ""),
    ("server", ""), ("set-cookie", ""),
    ("strict-transport-security", ""), ("transfer-encoding", ""),
    ("user-agent", ""), ("vary", ""), ("via", ""),
    ("www-authenticate", ""),
]

_STATIC_FULL = {pair: i + 1 for i, pair in enumerate(STATIC_TABLE)}
_STATIC_NAME = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE):
    _STATIC_NAME.setdefault(_n, _i + 1)

# Huffman decode tree: {(code, bits): symbol}
_HUFF_DECODE = {
    (code, bits): sym for sym, (code, bits) in enumerate(HUFFMAN_CODES)
}
_HUFF_MIN_BITS = min(b for _c, b in HUFFMAN_CODES)


def encode_integer(value: int, prefix_bits: int, top: int = 0) -> bytes:
    """§5.1: integer with an N-bit prefix; `top` holds the
    representation's flag bits already positioned above the prefix."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([top | value])
    out = bytearray([top | limit])
    value -= limit
    while value >= 128:
        out.append((value % 128) | 0x80)
        value //= 128
    out.append(value)
    return bytes(out)


def decode_integer(data: bytes, pos: int,
                   prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, pos
        if shift > 56:
            raise ValueError("HPACK integer overflow")


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    code = 0
    bits = 0
    for byte in data:
        for i in range(7, -1, -1):
            code = (code << 1) | ((byte >> i) & 1)
            bits += 1
            if bits >= _HUFF_MIN_BITS:
                sym = _HUFF_DECODE.get((code, bits))
                if sym is not None:
                    if sym == 256:
                        raise ValueError("EOS symbol in Huffman data")
                    out.append(sym)
                    code = 0
                    bits = 0
    # trailing bits must be a prefix of EOS (all ones), < 8 bits
    if bits >= 8 or code != (1 << bits) - 1:
        raise ValueError("invalid Huffman padding")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for byte in data:
        code, bits = HUFFMAN_CODES[byte]
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append(((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1))
                   & 0xFF)
    return bytes(out)


def _decode_string(data: bytes, pos: int) -> tuple[str, int]:
    huff = bool(data[pos] & 0x80)
    length, pos = decode_integer(data, pos, 7)
    raw = data[pos:pos + length]
    pos += length
    if huff:
        raw = huffman_decode(raw)
    return raw.decode("utf-8", "replace"), pos


def _encode_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return encode_integer(len(b), 7) + b


class HpackDecoder:
    """One decoder per HTTP/2 connection (§2.2: the dynamic table is
    connection state shared across all header blocks)."""

    def __init__(self, max_table_size: int = 4096):
        self.max_size = max_table_size
        self.dynamic: list[tuple[str, str]] = []
        self.size = 0

    def _entry(self, index: int) -> tuple[str, str]:
        if index <= 0:
            raise ValueError("HPACK index 0")
        if index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        didx = index - len(STATIC_TABLE) - 1
        if didx >= len(self.dynamic):
            raise ValueError(f"HPACK index {index} out of range")
        return self.dynamic[didx]

    def _insert(self, name: str, value: str) -> None:
        esize = len(name.encode()) + len(value.encode()) + 32
        self.dynamic.insert(0, (name, value))
        self.size += esize
        while self.size > self.max_size and self.dynamic:
            n, v = self.dynamic.pop()
            self.size -= len(n.encode()) + len(v.encode()) + 32

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        headers: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:                       # indexed (§6.1)
                index, pos = decode_integer(block, pos, 7)
                headers.append(self._entry(index))
            elif b & 0x40:                     # literal + indexing (§6.2.1)
                index, pos = decode_integer(block, pos, 6)
                name = (self._entry(index)[0] if index
                        else None)
                if name is None:
                    name, pos = _decode_string(block, pos)
                value, pos = _decode_string(block, pos)
                self._insert(name, value)
                headers.append((name, value))
            elif b & 0x20:                     # table size update (§6.3)
                size, pos = decode_integer(block, pos, 5)
                self.max_size = size
                while self.size > self.max_size and self.dynamic:
                    n, v = self.dynamic.pop()
                    self.size -= len(n.encode()) + len(v.encode()) + 32
            else:                              # literal, no/never index
                index, pos = decode_integer(block, pos, 4)
                name = self._entry(index)[0] if index else None
                if name is None:
                    name, pos = _decode_string(block, pos)
                value, pos = _decode_string(block, pos)
                headers.append((name, value))
        return headers


class HpackEncoder:
    """Static-table-aware encoder: exact (name, value) static hits emit
    one indexed byte; known names emit literal-without-indexing with the
    name index; everything else is a full raw literal. Stateless (never
    populates the peer's dynamic table), which keeps it valid against
    any decoder."""

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            full = _STATIC_FULL.get((name, value))
            if full:
                out += encode_integer(full, 7, 0x80)
                continue
            nidx = _STATIC_NAME.get(name)
            if nidx:
                out += encode_integer(nidx, 4, 0x00)
            else:
                out += b"\x00" + _encode_string(name)
            out += _encode_string(value)
        return bytes(out)
