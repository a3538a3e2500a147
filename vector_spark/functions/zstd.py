"""Pure-Python Zstandard codec (RFC 8878): store-mode writer, FULL reader.

Same stance as functions/snappy.py and lz4.py: the container ships no
zstd library, but the format is public (RFC 8878). The reference
compresses datadog metrics/sketches bodies with zstd
(src/sinks/datadog/metrics/config.rs) and VRL has
encode_zstd/decode_zstd; lib/codecs decompresses zstd payloads on the
source side, so a peer can legitimately send entropy-coded frames.

compress: store-mode frames — magic, Single_Segment frame header with
explicit Frame_Content_Size, Raw blocks of <=128 KiB, no checksum.
Trades ratio (none) for universal interoperability, exactly like the
literal-only snappy writer.

decompress: the FULL decoder — Raw, RLE and Compressed (entropy-coded)
blocks, i.e. real-world `zstd`-CLI output decodes byte-identically
(pinned in tests/test_zstd_interop.py against /usr/bin-style zstd):

- Literals: Raw / RLE / Huffman-Compressed / Treeless, 1- and 4-stream
  layouts with the jump table (RFC 8878 §3.1.1.3.1).
- Huffman: canonical prefix codes from weights, direct (4-bit nibble)
  or FSE-compressed weight descriptions, table reuse across blocks
  for Treeless literals (§4.2).
- Sequences: FSE-coded literal-length / offset / match-length streams
  with Predefined / RLE / FSE_Compressed / Repeat modes, the three-slot
  repeat-offset history (init {1,4,8}, the ll==0 swap rules), and
  overlapping match copies within the frame window (§3.1.1.3.2, §3.1.1.4-5).
- FSE: accuracy-log-prefixed normalized-count headers (incl. the
  less-than-one -1 probability and 2-bit zero-repeat flags) and the
  spread/baseline table construction (§4.1).
- Frame_Content_Checksum: verified when present (xxHash-64 low 32 bits,
  pure-Python XXH64 below; the xxh32 sibling lives in lz4.py).

Dictionaries (Dictionary_ID != 0) remain unsupported and raise.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_SKIPPABLE_LO = 0x184D2A50  # ..5F, RFC 8878 §3.1.2
_RAW_CHUNK = 128 * 1024  # Block_Maximum_Size ceiling (§3.1.1.2.3)


def compress(data: bytes, level: int = 3) -> bytes:
    """``data`` → one zstd frame. ``level >= 1`` (default) really
    compresses: Compressed blocks with Huffman literals + predefined-
    FSE sequences (functions/zstd_encode.py), falling back to Raw
    blocks wherever encoding doesn't shrink. ``level=0`` forces the
    r10 store-mode writer (Raw blocks only). Inputs under 64 bytes
    always store — the frame+block scaffolding dominates any gain."""
    n = len(data)
    out = bytearray(ZSTD_MAGIC)
    # Frame_Header_Descriptor: Single_Segment_flag (bit 5) set, so the
    # Window_Descriptor is omitted and Frame_Content_Size is explicit;
    # FCS field size picked by the flag in bits 7-6 (§3.1.1.1.1).
    if n < 256:
        out.append(0x20)  # FCS_flag=0 + single segment → 1-byte FCS
        out.append(n)
    elif n < 65536 + 256:
        out.append(0x60)
        out += (n - 256).to_bytes(2, "little")
    elif n < 2 ** 32:
        out.append(0xA0)
        out += n.to_bytes(4, "little")
    else:
        out.append(0xE0)
        out += n.to_bytes(8, "little")
    if n == 0:
        # a frame must still carry a last block: empty Raw block
        out += (1).to_bytes(3, "little")  # last=1, type=Raw, size=0
        return bytes(out)
    encode_block = None
    rep = [1, 4, 8]  # per-frame repeat-offset history (§3.1.1.5)
    if level >= 1 and n >= 64:
        from vector_spark.functions.zstd_encode import compress_block
        encode_block = compress_block
    pos = 0
    while pos < n:
        chunk = data[pos:pos + _RAW_CHUNK]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        enc = (encode_block(chunk, rep)
               if encode_block is not None else None)
        # Block_Header (3 bytes LE): bit0 last, bits1-2 type
        # (0=Raw, 2=Compressed), bits 3..23 Block_Size (§3.1.1.2.1)
        if enc is None:
            out += (last | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
        else:
            out += (last | (2 << 1) | (len(enc) << 3)).to_bytes(
                3, "little")
            out += enc
    return bytes(out)


# ---------------------------------------------------------------------------
# xxHash-64 (public algorithm, xxhash.com spec) — for
# Frame_Content_Checksum verification (low 32 bits, §3.1.1).

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash-64 of ``data`` (reference test vectors pinned in tests)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        end = n - 32
        while pos <= end:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = _xxh64_round(v1, l1)
            v2 = _xxh64_round(v2, l2)
            v3 = _xxh64_round(v3, l3)
            v4 = _xxh64_round(v4, l4)
            pos += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
             + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh64_round(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        h = (_rotl64(h ^ _xxh64_round(0, lane), 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rotl64(h ^ (lane * _P64_1) & _M64, 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl64(h ^ (data[pos] * _P64_5) & _M64, 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Bitstreams. Zstd writes bits LSB-first; FSE table DESCRIPTIONS are
# read forward, everything entropy-coded (Huffman literals, FSE weight
# and sequence payloads) is read BACKWARD from the last byte, whose
# highest set bit is a sentinel marking the end of padding (§4.1.1).


class _FwdBits:
    """Forward LSB-first bit reader (FSE normalized-count headers)."""

    def __init__(self, buf: bytes) -> None:
        self._val = int.from_bytes(buf, "little")
        # +16 slack bits (implicitly zero): the peek-and-rewind scheme
        # may momentarily read 1 bit past the byte-aligned description
        self._nbits = len(buf) * 8 + 16
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > self._nbits:
            raise ValueError("zstd: truncated FSE table description")
        v = (self._val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


class _BackBits:
    """Backward bit reader: consumes the bits just below ``pos``.

    ``read`` zero-pads on underflow and lets ``pos`` go negative —
    callers that must detect exhaustion (FSE weight interleave) check
    ``pos`` afterwards, exactly the educational-decoder contract.
    """

    __slots__ = ("_val", "pos")

    def __init__(self, buf: bytes) -> None:
        self._val = int.from_bytes(buf, "little")
        bl = self._val.bit_length()
        if bl == 0:
            raise ValueError("zstd: bitstream has no sentinel bit")
        self.pos = bl - 1  # sentinel stripped; bits available below

    def read(self, n: int) -> int:
        p = self.pos - n
        self.pos = p
        if p >= 0:
            return (self._val >> p) & ((1 << n) - 1)
        return (self._val << -p) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            return (self._val >> p) & ((1 << n) - 1)
        return (self._val << -p) & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# FSE (§4.1): normalized-count header parsing + decode-table build.


def _fse_read_distribution(bits: _FwdBits, max_symbols: int):
    """Parse an FSE table description → (accuracy_log, [probabilities])."""
    acc_log = bits.read(4) + 5
    if acc_log > 9:
        raise ValueError("zstd: FSE accuracy log > 9")
    remaining = 1 << acc_log
    probs: list[int] = []
    while remaining > 0 and len(probs) < max_symbols:
        nbits = (remaining + 1).bit_length()
        val = bits.read(nbits)
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - (remaining + 1)
        if (val & lower_mask) < threshold:
            bits.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        probs.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            while True:
                rep = bits.read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 0:
        raise ValueError("zstd: corrupt FSE distribution")
    return acc_log, probs


def _fse_build_table(acc_log: int, probs: list[int]):
    """RFC 8878 §4.1.1 table build → list of (symbol, nbits, baseline)."""
    size = 1 << acc_log
    syms = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:  # less-than-one: one cell, placed from the end
            syms[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE spread did not cycle")
    counter = [p if p > 0 else 1 for p in probs]
    table = []
    for state in range(size):
        s = syms[state]
        x = counter[s]
        counter[s] = x + 1
        nb = acc_log - (x.bit_length() - 1)
        baseline = (x << nb) - size
        table.append((s, nb, baseline))
    return table


def _fse_rle_table(symbol: int):
    """Degenerate 1-cell table for RLE symbol-compression mode."""
    return [(symbol, 0, 0)]


# Predefined distributions (§3.1.1.3.2.2). Verbatim spec constants.
_LL_DEFAULT = (6, [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                   2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                   -1, -1, -1, -1])
_ML_DEFAULT = (6, [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1,
                   -1, -1, -1, -1, -1, -1])
_OF_DEFAULT = (5, [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1])

# Code → (baseline, extra_bits) for literal lengths (§3.1.1.3.2.1.1)
_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16)]
# Code → (baseline, extra_bits) for match lengths (§3.1.1.3.2.1.1)
_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16)]

_MAX_LL_SYMBOLS = 36
_MAX_ML_SYMBOLS = 53
_MAX_OF_SYMBOLS = 32  # spec ceiling; predefined table uses 29


# ---------------------------------------------------------------------------
# Huffman (§4.2): weights → canonical table; backward-stream decode.


def _huf_build_table(weights: list[int]):
    """Weights (last one implicit, already appended) → flat lookup
    table of size 2^max_bits holding (symbol, nbits)."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    if (1 << max_bits) != total or max_bits > 11:
        raise ValueError("zstd: invalid Huffman weights")
    table = [(0, 0)] * (1 << max_bits)
    idx = 0
    # ascending weight = descending code length; codes assigned from 0
    for w in range(1, max_bits + 1):
        for s, ws in enumerate(weights):
            if ws == w:
                nb = max_bits + 1 - w
                span = 1 << (max_bits - nb)
                for i in range(idx, idx + span):
                    table[i] = (s, nb)
                idx += span
    if idx != len(table):
        raise ValueError("zstd: Huffman weights don't fill the table")
    return table, max_bits


def _huf_read_tree(data: bytes):
    """Huffman_Tree_Description (§4.2.1) → ((table, max_bits), size)."""
    if not data:
        raise ValueError("zstd: empty Huffman tree description")
    hb = data[0]
    if hb >= 128:  # direct: 4-bit weights, two per byte, high nibble first
        n = hb - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ValueError("zstd: truncated Huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append(b >> 4 if i % 2 == 0 else b & 0x0F)
        desc_size = 1 + nbytes
    else:  # FSE-compressed weights; hb = total compressed size
        if len(data) < 1 + hb:
            raise ValueError("zstd: truncated FSE weight block")
        comp = data[1:1 + hb]
        fwd = _FwdBits(comp)
        acc_log, probs = _fse_read_distribution(fwd, 256)
        if acc_log > 6:
            raise ValueError("zstd: weight FSE accuracy log > 6")
        table = _fse_build_table(acc_log, probs)
        back = _BackBits(comp[fwd.bytes_consumed():])
        s1 = back.read(acc_log)
        s2 = back.read(acc_log)
        if back.pos < 0:
            raise ValueError("zstd: weight stream too short")
        weights = []
        # interleaved 2-state decode; on underflow emit the OTHER
        # state's pending symbol and stop (educational-decoder rule)
        while True:
            sym, nb, base = table[s1]
            weights.append(sym)
            s1 = base + back.read(nb)
            if back.pos < 0:
                weights.append(table[s2][0])
                break
            sym, nb, base = table[s2]
            weights.append(sym)
            s2 = base + back.read(nb)
            if back.pos < 0:
                weights.append(table[s1][0])
                break
            if len(weights) > 255:
                raise ValueError("zstd: >255 Huffman weights")
        desc_size = 1 + hb
    # the LAST weight is implicit: completes the sum to a power of two
    partial = sum(1 << (w - 1) for w in weights if w > 0)
    if partial < 1:
        raise ValueError("zstd: all-zero Huffman weights")
    total = 1 << partial.bit_length()  # next power of two (strictly >)
    last = total - partial
    if last & (last - 1):
        raise ValueError("zstd: non-decodable implicit Huffman weight")
    weights.append(last.bit_length())
    return _huf_build_table(weights), desc_size


def _huf_decode_stream(table, max_bits: int, buf: bytes, count: int) -> bytes:
    out = bytearray(count)
    bits = _BackBits(buf)
    peek = bits.peek
    for i in range(count):
        sym, nb = table[peek(max_bits)]
        bits.pos -= nb
        out[i] = sym
    if bits.pos < 0:
        raise ValueError("zstd: Huffman stream overrun")
    return bytes(out)


# ---------------------------------------------------------------------------
# Literals section (§3.1.1.3.1).


def _decode_literals(block: bytes, state: dict):
    """→ (literals: bytes, bytes_consumed_from_block)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype <= 1:  # Raw / RLE
        if sf in (0, 2):
            regen, hlen = b0 >> 3, 1
        elif sf == 1:
            regen, hlen = (b0 >> 4) | (block[1] << 4), 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hlen = 3
        if ltype == 0:
            return bytes(block[hlen:hlen + regen]), hlen + regen
        return block[hlen:hlen + 1] * regen, hlen + 1
    # Compressed / Treeless
    if sf == 0:
        streams, hlen = 1, 3
        h = int.from_bytes(block[:3], "little")
        regen, comp = (h >> 4) & 0x3FF, (h >> 14) & 0x3FF
    elif sf == 1:
        streams, hlen = 4, 3
        h = int.from_bytes(block[:3], "little")
        regen, comp = (h >> 4) & 0x3FF, (h >> 14) & 0x3FF
    elif sf == 2:
        streams, hlen = 4, 4
        h = int.from_bytes(block[:4], "little")
        regen, comp = (h >> 4) & 0x3FFF, (h >> 18) & 0x3FFF
    else:
        streams, hlen = 4, 5
        h = int.from_bytes(block[:5], "little")
        regen, comp = (h >> 4) & 0x3FFFF, (h >> 22) & 0x3FFFF
    payload = block[hlen:hlen + comp]
    if len(payload) < comp:
        raise ValueError("zstd: truncated literals section")
    if ltype == 2:  # new Huffman table
        (table, max_bits), tsize = _huf_read_tree(payload)
        state["huf"] = (table, max_bits)
        payload = payload[tsize:]
    else:  # Treeless: reuse previous table (within the frame)
        if state.get("huf") is None:
            raise ValueError("zstd: treeless literals with no prior table")
        table, max_bits = state["huf"]
    if streams == 1:
        lit = _huf_decode_stream(table, max_bits, payload, regen)
    else:
        if len(payload) < 6:
            raise ValueError("zstd: truncated literals jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        rest = payload[6:]
        if s1 + s2 + s3 > len(rest):
            raise ValueError("zstd: literals jump table overruns section")
        per = (regen + 3) // 4
        last = regen - 3 * per
        if last < 0:
            raise ValueError("zstd: bad 4-stream literals sizing")
        bufs = (rest[:s1], rest[s1:s1 + s2],
                rest[s1 + s2:s1 + s2 + s3], rest[s1 + s2 + s3:])
        parts = [
            _huf_decode_stream(table, max_bits, bufs[i], per)
            for i in range(3)
        ]
        parts.append(_huf_decode_stream(table, max_bits, bufs[3], last))
        lit = b"".join(parts)
    return lit, hlen + comp


# ---------------------------------------------------------------------------
# Sequences section (§3.1.1.3.2) + execution (§3.1.1.4).


def _read_seq_table(data: bytes, pos: int, mode: int, max_syms: int,
                    default, prev, what: str):
    """One of LL/OF/ML: mode → (decode_table, acc_log, new_pos)."""
    if mode == 0:  # Predefined
        acc_log, probs = default
        return _fse_build_table(acc_log, probs), acc_log, pos
    if mode == 1:  # RLE: one byte = the symbol
        return _fse_rle_table(data[pos]), 0, pos + 1
    if mode == 2:  # FSE_Compressed
        fwd = _FwdBits(data[pos:])
        acc_log, probs = _fse_read_distribution(fwd, max_syms)
        return (_fse_build_table(acc_log, probs), acc_log,
                pos + fwd.bytes_consumed())
    if prev is None:  # Repeat with no previous table
        raise ValueError(f"zstd: {what} Repeat mode with no prior table")
    return prev[0], prev[1], pos


def _decode_sequences(data: bytes, literals: bytes, state: dict,
                      fbuf: bytearray) -> None:
    """Decode + execute sequences, appending regenerated bytes to
    ``fbuf`` (the per-frame window — offsets may reach prior blocks)."""
    if not data:
        raise ValueError("zstd: empty sequences section")
    b0 = data[0]
    if b0 == 0:  # no sequences: the block is just its literals
        fbuf += literals
        return
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        nseq, pos = ((b0 - 128) << 8) | data[1], 2
    else:
        nseq, pos = data[1] | (data[2] << 8) | 0x7F00, 3
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_tab, ll_log, pos = _read_seq_table(
        data, pos, (modes >> 6) & 3, _MAX_LL_SYMBOLS, _LL_DEFAULT,
        state.get("ll"), "literals-length")
    of_tab, of_log, pos = _read_seq_table(
        data, pos, (modes >> 4) & 3, _MAX_OF_SYMBOLS, _OF_DEFAULT,
        state.get("of"), "offset")
    ml_tab, ml_log, pos = _read_seq_table(
        data, pos, (modes >> 2) & 3, _MAX_ML_SYMBOLS, _ML_DEFAULT,
        state.get("ml"), "match-length")
    state["ll"], state["of"], state["ml"] = (
        (ll_tab, ll_log), (of_tab, of_log), (ml_tab, ml_log))

    bits = _BackBits(data[pos:])
    s_ll = bits.read(ll_log)
    s_of = bits.read(of_log)
    s_ml = bits.read(ml_log)
    if bits.pos < 0:
        raise ValueError("zstd: sequence bitstream too short")
    rep = state["rep"]
    lit_pos = 0
    for i in range(nseq):
        of_code = of_tab[s_of][0]
        ml_code = ml_tab[s_ml][0]
        ll_code = ll_tab[s_ll][0]
        if of_code > 31:
            raise ValueError("zstd: offset code overflow")
        # extra bits read in OF → ML → LL order (§3.1.1.3.2.1.2)
        of_value = (1 << of_code) + bits.read(of_code)
        ml_base, ml_extra = _ML_CODE[ml_code]
        ml = ml_base + (bits.read(ml_extra) if ml_extra else 0)
        ll_base, ll_extra = _LL_CODE[ll_code]
        ll = ll_base + (bits.read(ll_extra) if ll_extra else 0)
        if bits.pos < 0:
            raise ValueError("zstd: sequence bitstream exhausted")
        # resolve the offset against the repeat history (§3.1.1.5)
        if of_value > 3:
            offset = of_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        elif ll != 0:
            if of_value == 1:
                offset = rep[0]
            elif of_value == 2:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        else:
            if of_value == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif of_value == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        # execute: literals copy, then (possibly overlapping) match copy
        if ll:
            fbuf += literals[lit_pos:lit_pos + ll]
            lit_pos += ll
        if offset > len(fbuf):
            raise ValueError("zstd: match offset beyond frame window")
        if ml:
            if offset >= ml:
                start = len(fbuf) - offset
                fbuf += fbuf[start:start + ml]
            else:
                start = len(fbuf) - offset
                for j in range(ml):  # overlapping copy, byte-at-a-time
                    fbuf.append(fbuf[start + j])
        # update states LL → ML → OF, except after the last sequence
        if i + 1 < nseq:
            sym, nb, base = ll_tab[s_ll]
            s_ll = base + bits.read(nb)
            sym, nb, base = ml_tab[s_ml]
            s_ml = base + bits.read(nb)
            sym, nb, base = of_tab[s_of]
            s_of = base + bits.read(nb)
            if bits.pos < 0:
                raise ValueError("zstd: sequence state update underrun")
    fbuf += literals[lit_pos:]  # last literals (§3.1.1.4)


def _decode_compressed_block(block: bytes, state: dict,
                             fbuf: bytearray) -> None:
    literals, consumed = _decode_literals(block, state)
    _decode_sequences(block[consumed:], literals, state, fbuf)


def decompress(data: bytes, verify_checksum: bool = True) -> bytes:
    """Decode zstd frames — Raw, RLE AND Compressed (FSE/Huffman)
    blocks; skippable frames skipped; dictionaries rejected."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 4:
            raise ValueError("truncated zstd frame header")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            size = int.from_bytes(data[pos + 4:pos + 8], "little")
            pos += 8 + size
            continue
        if data[pos:pos + 4] != ZSTD_MAGIC:
            raise ValueError("bad zstd magic")
        pos += 4
        if pos >= len(data):
            raise ValueError("truncated zstd frame header")
        desc = data[pos]
        pos += 1
        single_segment = bool(desc & 0x20)
        fcs_flag = desc >> 6
        checksum = bool(desc & 0x04)
        dict_flag = desc & 0x03
        if not single_segment:
            pos += 1  # Window_Descriptor
        dict_len = (0, 1, 2, 4)[dict_flag]
        if dict_len:
            if int.from_bytes(data[pos:pos + dict_len], "little"):
                raise ValueError("zstd dictionaries not supported")
            pos += dict_len
        fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        pos += fcs_len  # size is informative; blocks carry the data
        # per-frame decode state: window buffer, repeat offsets,
        # Huffman table (Treeless reuse), FSE tables (Repeat mode)
        fbuf = bytearray()
        state: dict = {"rep": [1, 4, 8], "huf": None}
        while True:
            if pos + 3 > len(data):
                # without this a torn frame decodes the empty slice as
                # header 0 (last=0, Raw, size 0) and loops forever
                raise ValueError("truncated zstd block header")
            hdr = int.from_bytes(data[pos:pos + 3], "little")
            pos += 3
            last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
            if pos + (1 if btype == 1 else bsize) > len(data):
                raise ValueError("truncated zstd block")
            if btype == 0:  # Raw
                fbuf += data[pos:pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: one byte repeated bsize times
                fbuf += data[pos:pos + 1] * bsize
                pos += 1
            elif btype == 2:  # Compressed: literals + sequences
                _decode_compressed_block(
                    bytes(data[pos:pos + bsize]), state, fbuf)
                pos += bsize
            else:
                raise ValueError("reserved zstd block type")
            if last:
                break
        if checksum:
            if pos + 4 > len(data):
                raise ValueError("truncated zstd content checksum")
            if verify_checksum:
                want = int.from_bytes(data[pos:pos + 4], "little")
                got = xxh64(bytes(fbuf)) & 0xFFFFFFFF
                if got != want:
                    raise ValueError(
                        f"zstd content checksum mismatch: "
                        f"{got:#010x} != {want:#010x}")
            pos += 4
        out += fbuf
    return bytes(out)
