"""Real Zstandard COMPRESSION (RFC 8878 §3-4): Compressed blocks.

r10 gave this repo a full zstd *reader* (functions/zstd.py) but the
writer stayed store-mode — valid frames, ratio 1.0. At 100 TB the sink
egress bytes are the cost that matters (the reference compresses
datadog metrics/sketches bodies with zstd,
src/sinks/datadog/metrics/config.rs), so r11 adds the encode side:

- LZ77 match finding: greedy 4-byte hash-table matcher (same shape as
  functions/lz4.py), offsets within the block, MINMATCH 4.
- Sequences: the spec's PREDEFINED FSE distributions (§3.1.1.3.2.2) —
  no table descriptions on the wire; the encoder walks the SAME
  decode-table construction as zstd.py and runs it backward (states
  assigned to a symbol, sorted ascending, are the FSE next-state
  subrange [f, 2f) — RFC 8878 §4.1.1; encoding is the exact reverse
  of the decoder's baseline+bits transition). Offsets exploit the
  three-slot repeat history (§3.1.1.5) — Offset_Values 1-3 for the
  repeated strides structured data is full of, offset+3 otherwise —
  threaded across blocks per frame exactly like the decoder's state.
- Literals: Huffman-compressed when that pays (canonical code from
  package-merge length-limited (≤11) lengths → zstd weights, direct
  4-bit weight description, 1-stream ≤1023 bytes else 4-stream with
  the jump table), Raw otherwise.
- Every block falls back to a Raw block when the encoded form does
  not shrink, so worst case equals the r10 store-mode writer.

Interop is pinned both directions in tests/test_zstd_interop.py: the
`zstd` CLI decodes these frames byte-identically, and our own reader
(which predates this writer and was itself CLI-pinned) roundtrips.

Pure Python throughput (single thread, log-like data) is a few MB/s —
the honest zero-dependency trade. Sinks build bodies per-partition in
parallel workers, so the cluster-level cost is amortized while egress
drops ~3-10×.

Ratio stance vs the reference encoder (measured, JSON-log corpus):
this writer lands ~0.06-0.11 of raw where `zstd -3` reaches
0.003-0.03 — the gap is the single-probe greedy matcher (no hash
chains/lazy matching), block-local windows, and no custom FSE table
serialization. Those are ratio refinements, not correctness: every
frame is spec-valid and CLI-decodable, and the wire win over the r10
store-mode writer (ratio 1.0) is already the order-of-magnitude that
matters for egress.
"""

from __future__ import annotations

from vector_spark.functions.zstd import (
    _LL_CODE,
    _LL_DEFAULT,
    _ML_CODE,
    _ML_DEFAULT,
    _OF_DEFAULT,
    _fse_build_table,
    _huf_build_table,
)

# ---------------------------------------------------------------------------
# forward LSB-first bit writer; read back-to-front by the decoder


class _BitWriter:
    """Appends value's low ``nb`` bits; ``close`` adds the sentinel 1
    bit and zero-pads to a byte (the §4.1.1 backward-stream framing)."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def add(self, value: int, nb: int) -> None:
        if nb == 0:
            return
        self.acc |= (value & ((1 << nb) - 1)) << self.n
        self.n += nb
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def close(self) -> bytes:
        self.acc |= 1 << self.n
        self.n += 1
        while self.n > 0:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# FSE encoding over the predefined distributions


class _FseEncoder:
    """Encode-side view of an FSE table: for each symbol, its decoder
    states sorted ascending map 1:1 onto the sub-range counter
    [f, 2f) — transition = emit low bits, jump to states[c - f]."""

    __slots__ = ("acc_log", "size", "states", "freq")

    def __init__(self, acc_log: int, probs: list[int]) -> None:
        self.acc_log = acc_log
        self.size = 1 << acc_log
        table = _fse_build_table(acc_log, probs)
        self.states: dict[int, list[int]] = {}
        for state, (sym, _nb, _base) in enumerate(table):
            self.states.setdefault(sym, []).append(state)
        self.freq = {s: len(v) for s, v in self.states.items()}

    def init_state(self, sym: int) -> int:
        """Encoder value in [size, 2*size) for the LAST sequence's
        symbol (the decoder reads it verbatim; any state of ``sym``
        is valid)."""
        return self.size + self.states[sym][0]

    def encode(self, bits: _BitWriter, state: int, sym: int) -> int:
        """Encode ``sym`` from encoder value ``state`` → new value."""
        f = self.freq[sym]
        nb = (state // f).bit_length() - 1
        bits.add(state, nb)
        c = state >> nb  # in [f, 2f)
        return self.size + self.states[sym][c - f]

    def flush(self, bits: _BitWriter, state: int) -> None:
        bits.add(state - self.size, self.acc_log)


_LL_ENC = _FseEncoder(*_LL_DEFAULT)
_ML_ENC = _FseEncoder(*_ML_DEFAULT)
_OF_ENC = _FseEncoder(*_OF_DEFAULT)

# value → (code, baseline) lookups inverted from the decoder tables
_LL_BASELINES = [b for b, _ in _LL_CODE]
_ML_BASELINES = [b for b, _ in _ML_CODE]


def _value_code(value: int, baselines: list[int]) -> int:
    import bisect

    return bisect.bisect_right(baselines, value) - 1


# ---------------------------------------------------------------------------
# match finder (greedy, 4-byte hash table — lz4.py's shape)

_MINMATCH = 4


def _find_sequences(data: bytes):
    """→ (sequences, literals) where sequences is a list of
    (lit_len, offset, match_len) and ``literals`` is the concatenation
    of all sequence literals plus the trailing run (§3.1.1.4's
    last-literals rule)."""
    n = len(data)
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    limit = n - _MINMATCH
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
        ml = m - pos
        of_code = (pos - cand + 3).bit_length() - 1
        # profitability gate: a sequence costs ~36 bits of LL/ML/OF
        # state+value overhead plus of_code offset bits, vs ~6 bits
        # per Huffman-coded literal. Short far matches lose (measured:
        # 8-symbol noise 0.716 → 0.376, at its 3-bit entropy bound).
        if ml * 6 < 36 + of_code:
            pos += 1
            continue
        lits += data[anchor:pos]
        seqs.append((pos - anchor, pos - cand, ml))
        if m - 2 > pos:
            table[data[m - 2:m + 2]] = m - 2
        pos = m
        anchor = m
    lits += data[anchor:]
    return seqs, bytes(lits)


# ---------------------------------------------------------------------------
# sequences section


def _offset_value(offset: int, ll: int, rep: list[int]) -> int:
    """Map an actual offset to its Offset_Value, exploiting the
    three-slot repeat history (§3.1.1.5) and applying the decoder's
    update rules to ``rep`` — fewer offset bits for the repeated
    strides structured data is full of."""
    if ll != 0:
        if offset == rep[0]:
            return 1
        if offset == rep[1]:
            rep[1] = rep[0]
            rep[0] = offset
            return 2
        if offset == rep[2]:
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
            return 3
    else:
        if offset == rep[1]:
            rep[1] = rep[0]
            rep[0] = offset
            return 1
        if offset == rep[2]:
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
            return 2
        if offset == rep[0] - 1:
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
            return 3
    rep[2] = rep[1]
    rep[1] = rep[0]
    rep[0] = offset
    return offset + 3


def _encode_sequences(seqs: list[tuple[int, int, int]],
                      rep: list[int]) -> bytes:
    """Sequences_Section with Predefined_Mode for all three streams
    (§3.1.1.3.2.1): header, modes byte 0, one backward bitstream in
    the reference encoder's write order. ``rep`` is the per-frame
    repeat-offset history, mutated in decode order (it spans blocks
    within one frame, exactly like the decoder's state)."""
    nseq = len(seqs)
    out = bytearray()
    if nseq < 128:
        out.append(nseq)
    elif nseq < 0x7F00:
        out.append((nseq >> 8) + 128)
        out.append(nseq & 0xFF)
    else:
        out.append(255)
        out += (nseq - 0x7F00).to_bytes(2, "little")
    if nseq == 0:
        return bytes(out)
    out.append(0)  # modes: Predefined × 3

    codes = []
    for ll, offset, ml in seqs:
        ll_code = (ll if ll < 16
                   else _value_code(ll, _LL_BASELINES))
        ml_code = (ml - 3 if ml < 35
                   else _value_code(ml, _ML_BASELINES))
        of_value = _offset_value(offset, ll, rep)
        of_code = of_value.bit_length() - 1
        codes.append((ll, ll_code, ml, ml_code, of_value, of_code))

    w = _BitWriter()
    # init states carry the LAST sequence's symbols; its value bits
    # are written first (read last by the backward decoder)
    ll, ll_code, ml, ml_code, of_value, of_code = codes[-1]
    s_ml = _ML_ENC.init_state(ml_code)
    s_of = _OF_ENC.init_state(of_code)
    s_ll = _LL_ENC.init_state(ll_code)
    w.add(ll - _LL_CODE[ll_code][0], _LL_CODE[ll_code][1])
    w.add(ml - _ML_CODE[ml_code][0], _ML_CODE[ml_code][1])
    w.add(of_value - (1 << of_code), of_code)
    for i in range(nseq - 2, -1, -1):
        ll, ll_code, ml, ml_code, of_value, of_code = codes[i]
        s_of = _OF_ENC.encode(w, s_of, of_code)
        s_ml = _ML_ENC.encode(w, s_ml, ml_code)
        s_ll = _LL_ENC.encode(w, s_ll, ll_code)
        w.add(ll - _LL_CODE[ll_code][0], _LL_CODE[ll_code][1])
        w.add(ml - _ML_CODE[ml_code][0], _ML_CODE[ml_code][1])
        w.add(of_value - (1 << of_code), of_code)
    _ML_ENC.flush(w, s_ml)
    _OF_ENC.flush(w, s_of)
    _LL_ENC.flush(w, s_ll)
    out += w.close()
    return bytes(out)


# ---------------------------------------------------------------------------
# Huffman literals


def _limited_lengths(freqs: dict[int, int], maxlen: int):
    """Package-merge length-limited code lengths (Larmore-Hirschberg;
    the standard optimal construction). Returns {symbol: nbits} with
    Kraft equality, or None when it cannot be satisfied."""
    syms = sorted(freqs.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(syms)
    if n == 1:
        return {syms[0][0]: 1}
    if n > (1 << maxlen):
        return None
    prev: list[tuple[int, tuple[int, ...]]] = []
    leaves = [(f, (s,)) for s, f in syms]
    for _ in range(maxlen):
        cur = list(leaves)
        cur.extend(
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        )
        cur.sort(key=lambda x: x[0])
        prev = cur
    lengths = {s: 0 for s, _ in syms}
    for _f, ss in prev[:2 * (n - 1)]:
        for s in ss:
            lengths[s] += 1
    total = sum(1 << (maxlen - ln) for ln in lengths.values())
    if total != (1 << maxlen):
        return None  # defensive; package-merge yields equality
    return lengths


def _huf_encode_literals(lits: bytes):
    """→ compressed literals section (header + tree + stream(s)) or
    None when Huffman does not pay / cannot represent the alphabet."""
    regen = len(lits)
    if regen < 64 or regen > 0x3FFFF:
        return None
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return None  # RLE literals handled by the caller
    max_sym = max(freqs)
    if max_sym > 128:
        # direct weight description carries ≤128 weights (headerByte
        # 128..255); high-byte alphabets would need FSE-coded weights
        return None
    lengths = _limited_lengths(freqs, 11)
    if lengths is None:
        return None
    max_bits = max(lengths.values())
    weights = [0] * (max_sym + 1)
    for s, ln in lengths.items():
        weights[s] = max_bits + 1 - ln
    # tree description: direct 4-bit weights, LAST weight implicit
    nw = max_sym  # weights[0..max_sym-1] transmitted
    tree = bytearray([127 + nw])
    for i in range(0, nw, 2):
        hi = weights[i] << 4
        lo = weights[i + 1] if i + 1 < nw else 0
        tree.append(hi | lo)
    # per-symbol (code, nbits) from the decoder's own table build —
    # guarantees the encode side matches what any decoder reconstructs
    table, tbits = _huf_build_table(weights)
    codes: dict[int, tuple[int, int]] = {}
    idx = 0
    while idx < len(table):
        sym, nb = table[idx]
        codes[sym] = (idx >> (tbits - nb), nb)
        idx += 1 << (tbits - nb)

    def encode_stream(part: bytes) -> bytes:
        w = _BitWriter()
        for b in reversed(part):  # first symbol decoded = last written
            c, nb = codes[b]
            w.add(c, nb)
        return w.close()

    if regen <= 1023:
        streams = encode_stream(lits)
        comp = len(tree) + len(streams)
        if comp >= regen or comp > 1023:
            return None
        h = 2 | (0 << 2) | (regen << 4) | (comp << 14)
        return h.to_bytes(3, "little") + bytes(tree) + streams
    # 4 streams with the 6-byte jump table (§3.1.1.3.1.6)
    per = (regen + 3) // 4
    parts = [lits[i * per:(i + 1) * per] for i in range(3)]
    parts.append(lits[3 * per:])
    encoded = [encode_stream(p) for p in parts]
    if any(len(e) > 0xFFFF for e in encoded[:3]):
        return None
    jump = b"".join(len(e).to_bytes(2, "little") for e in encoded[:3])
    body = bytes(tree) + jump + b"".join(encoded)
    comp = len(body)
    if comp >= regen:
        return None
    if regen <= 1023 or comp > 0x3FFFF:
        return None
    if regen <= 16383 and comp <= 16383:
        h = 2 | (2 << 2) | (regen << 4) | (comp << 18)
        return h.to_bytes(4, "little") + body
    h = 2 | (3 << 2) | (regen << 4) | (comp << 22)
    return h.to_bytes(5, "little") + body


def _raw_literals(lits: bytes) -> bytes:
    regen = len(lits)
    if regen <= 31:
        return bytes([(regen << 3) | 0]) + lits
    if regen <= 4095:
        h = 0 | (1 << 2) | (regen << 4)
        return h.to_bytes(2, "little") + lits
    h = 0 | (3 << 2) | (regen << 4)
    return h.to_bytes(3, "little") + lits


def _rle_literals(lits: bytes) -> bytes:
    regen = len(lits)
    if regen <= 31:
        return bytes([(regen << 3) | 1]) + lits[:1]
    if regen <= 4095:
        h = 1 | (1 << 2) | (regen << 4)
        return h.to_bytes(2, "little") + lits[:1]
    h = 1 | (3 << 2) | (regen << 4)
    return h.to_bytes(3, "little") + lits[:1]


def _encode_literals(lits: bytes) -> bytes:
    if lits and len(set(lits)) == 1:
        return _rle_literals(lits)
    huf = _huf_encode_literals(lits)
    return huf if huf is not None else _raw_literals(lits)


# ---------------------------------------------------------------------------
# block assembly


def compress_block(chunk: bytes, rep: list[int] | None = None
                   ) -> bytes | None:
    """One Compressed_Block body for ``chunk`` (≤128 KiB), or None
    when the encoded form is not smaller (caller stores Raw — in
    which case ``rep`` is left untouched, matching the decoder, which
    only updates its history inside Compressed blocks)."""
    seqs, lits = _find_sequences(chunk)
    trial_rep = list(rep) if rep is not None else [1, 4, 8]
    body = _encode_literals(lits) + _encode_sequences(seqs, trial_rep)
    if len(body) >= len(chunk):
        return None
    if rep is not None:
        rep[:] = trial_rep
    return body
