"""Pure-Python Zstandard store-mode codec (RFC 8878).

Same stance as functions/snappy.py: the container ships no zstd
library, but the FRAME format is public and small, and a frame made of
Raw (uncompressed) blocks is valid Zstandard that ANY decoder accepts
(RFC 8878 §3.1.1.2.2: Raw_Block — "content is stored without
compression"). The reference compresses datadog metrics/sketches
bodies with zstd (src/sinks/datadog/metrics/config.rs) and VRL has
encode_zstd/decode_zstd — both were env-gated before this module.

compress: store-mode frames — magic, Single_Segment frame header with
explicit Frame_Content_Size, Raw blocks of ≤128 KiB, no checksum.
Trades ratio (none) for universal interoperability, exactly like the
literal-only snappy writer.

decompress: Raw and RLE blocks (the store-mode decoder's domain) plus
skippable frames; Compressed blocks (FSE/Huffman) raise a documented
ValueError — decoding entropy-coded zstd without a library is out of
scope, and the error says so rather than silently corrupting.
"""

from __future__ import annotations

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_SKIPPABLE_LO = 0x184D2A50  # ..5F, RFC 8878 §3.1.2
_RAW_CHUNK = 128 * 1024  # Block_Maximum_Size ceiling (§3.1.1.2.3)


def compress(data: bytes) -> bytes:
    """``data`` → one store-mode zstd frame (Raw blocks only)."""
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
    pos = 0
    while pos < n:
        chunk = data[pos:pos + _RAW_CHUNK]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        # Block_Header (3 bytes LE): bit0 last, bits1-2 type(0=Raw),
        # bits 3..23 Block_Size (§3.1.1.2.1)
        out += (last | (len(chunk) << 3)).to_bytes(3, "little")
        out += chunk
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode zstd frames made of Raw/RLE blocks; skip skippable
    frames; reject entropy-coded (Compressed) blocks loudly."""
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
                out += data[pos:pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: one byte repeated bsize times
                out += data[pos:pos + 1] * bsize
                pos += 1
            elif btype == 2:
                raise ValueError(
                    "zstd Compressed (entropy-coded) blocks are not "
                    "supported by this store-mode decoder — only "
                    "Raw/RLE frames (e.g. this repo's own output)")
            else:
                raise ValueError("reserved zstd block type")
            if last:
                break
        if checksum:
            pos += 4  # xxh64 low bytes — not verified (no xxhash lib)
    return bytes(out)
