"""Interop pins for the pure-Python zstd codec (functions/zstd.py).

The compressed-block DECODER (FSE + Huffman, RFC 8878 §4) is pinned
against the real `zstd` CLI: frames the CLI produces at several levels
must decode byte-identically, and frames our store-mode writer
produces must decode via the CLI. This is the same two-way stance as
the lz4 interop tests.

Reference parity: lib/codecs decompresses zstd payloads on the source
side and src/sinks/datadog/metrics/config.rs compresses with zstd on
the sink side — with this decoder both directions handle real-world
(entropy-coded) frames, closing the r10 documented gap
(functions/zstd.py used to reject Compressed blocks).
"""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from vector_spark.functions.zstd import compress, decompress, xxh64

_ZSTD = shutil.which("zstd")

pytestmark = pytest.mark.skipif(_ZSTD is None, reason="zstd CLI not present")


def _cli_compress(data: bytes, level: int = 3, check: bool = True) -> bytes:
    args = [_ZSTD, "-q", f"-{level}", "-c"]
    if not check:
        args.insert(2, "--no-check")
    p = subprocess.run(args, input=data, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def _cli_decompress(frame: bytes) -> bytes:
    p = subprocess.run([_ZSTD, "-d", "-q", "-c"], input=frame,
                       capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def _corpus() -> dict[str, bytes]:
    rng = random.Random(11)
    return {
        "empty": b"",
        "tiny": b"hello zstd",
        "rle": b"A" * 10000,  # RLE literals + repeat-offset matches
        "text": b"the quick brown fox jumps over the lazy dog. " * 400,
        # JSON-ish: FSE-compressed Huffman weights, 4-stream literals
        "json": b"".join(
            b'{"id":%d,"name":"user-%d","tags":["a","b"],"v":%d.5}\n'
            % (i, i % 97, i * 3) for i in range(3000)),
        "random": bytes(rng.randrange(256) for _ in range(5000)),  # raw blocks
        # >128 KiB → multiple blocks; Treeless literals + Repeat FSE modes
        "big_text": b"".join(
            b"line %d: lorem ipsum dolor sit amet elit %d\n" % (i, i % 13)
            for i in range(20000)),
        "semi": bytes(rng.randrange(4) for _ in range(200000)),
    }


@pytest.mark.parametrize("level", [1, 3, 19])
def test_cli_frames_decode_byte_identically(level):
    for name, data in _corpus().items():
        for check in (True, False):
            frame = _cli_compress(data, level, check=check)
            assert decompress(frame) == data, (name, level, check)


def test_our_store_mode_frames_decode_via_cli():
    for name, data in _corpus().items():
        assert _cli_decompress(compress(data)) == data, name


def test_content_checksum_verified():
    frame = bytearray(_cli_compress(b"checksum me " * 500, 3, check=True))
    frame[-1] ^= 0xFF  # flip one checksum byte
    with pytest.raises(ValueError, match="checksum"):
        decompress(bytes(frame))
    # opt-out still decodes (content is intact, only the stored sum lies)
    assert decompress(bytes(frame), verify_checksum=False)


def test_truncated_compressed_block_raises():
    frame = _cli_compress(b"truncate me " * 400, 3)
    with pytest.raises(ValueError):
        decompress(frame[:len(frame) // 2])


def test_fuzz_cli_roundtrips():
    rng = random.Random(42)
    for i in range(60):
        n = rng.randrange(0, 30000)
        kind = rng.randrange(4)
        if kind == 0:
            d = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            d = bytes(rng.randrange(3) for _ in range(n))
        elif kind == 2:
            d = (b"pattern%d " % rng.randrange(10)) * (n // 9)
        else:
            d = b"".join(b"%d,%s\n" % (j, b"v" * (j % 17))
                         for j in range(n // 10))
        lv = rng.choice([1, 3, 9, 19])
        assert decompress(_cli_compress(d, lv)) == d, (i, kind, lv, n)


def test_xxh64_reference_vectors():
    # public vectors from the xxHash specification repository
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # seed variant + length classes (4/8/32+ byte paths)
    assert xxh64(b"abcd") == 0xDE0327B0D25D92CC
    assert xxh64(b"abcdefgh") == 0x3AD351775B4634B7
    # 1 KiB (exercises the 32-byte lane loop): low 32 bits must equal
    # the Content_Checksum the CLI stores for the same payload
    long = bytes(range(256)) * 4
    frame = _cli_compress(long, 3, check=True)
    assert xxh64(long) & 0xFFFFFFFF == int.from_bytes(frame[-4:], "little")


# ---------------------------------------------------------------------------
# r11: the ENCODER writes real Compressed blocks (functions/
# zstd_encode.py — Huffman literals + predefined-FSE sequences). Same
# two-way stance: the CLI must decode our frames byte-identically.


def test_real_compression_ratio_and_cli_decode():
    for name, data in _corpus().items():
        frame = compress(data)
        assert decompress(frame) == data, name
        assert _cli_decompress(frame) == data, name
    # compressible corpora must actually shrink hard now
    for name in ("text", "json", "big_text", "rle"):
        data = _corpus()[name]
        assert len(compress(data)) < len(data) // 4, name
    # 2-bit-entropy noise lands near its bound, not near 1.0
    semi = _corpus()["semi"]
    assert len(compress(semi)) < len(semi) * 0.45


def test_level0_forces_store_mode():
    data = _corpus()["text"]
    frame = compress(data, level=0)
    assert len(frame) > len(data)  # headers only, no compression
    assert decompress(frame) == data
    assert _cli_decompress(frame) == data
    # every block header must say Raw (type bits 00)
    pos = 6  # magic + FHD + 1-byte FCS for this corpus size? compute:
    # re-derive: FHD at offset 4 picks the FCS width
    desc = frame[4]
    fcs_len = (1, 2, 4, 8)[desc >> 6]
    pos = 5 + fcs_len
    while pos < len(frame):
        hdr = int.from_bytes(frame[pos:pos + 3], "little")
        assert (hdr >> 1) & 3 == 0  # Raw
        size = hdr >> 3
        pos += 3 + size
        if hdr & 1:
            break


def test_incompressible_input_stays_raw_blocks():
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(50000))
    frame = compress(data)
    # worst case equals store mode: only the frame/block scaffolding
    assert len(frame) <= len(data) + 16
    assert decompress(frame) == data
    assert _cli_decompress(frame) == data


def test_encoder_fuzz_cli_decodes():
    rng = random.Random(1234)
    for i in range(50):
        n = rng.randrange(0, 150000)
        kind = rng.randrange(5)
        if kind == 0:
            d = bytes(rng.randrange(256) for _ in range(min(n, 20000)))
        elif kind == 1:
            d = bytes(rng.randrange(5) for _ in range(n))
        elif kind == 2:
            unit = bytes(rng.randrange(256)
                         for _ in range(rng.randint(1, 64)))
            d = (unit * (n // max(len(unit), 1) + 1))[:n]
        elif kind == 3:
            d = b"".join(b"k%d=v%d;" % (j % 100, j % 13)
                         for j in range(n // 8))
        else:
            d = bytes(min(255, max(0, 128 + int(40 * rng.gauss(0, 1))))
                      for _ in range(min(n, 20000)))
        frame = compress(d)
        assert decompress(frame) == d, (i, kind, n)
        assert _cli_decompress(frame) == d, (i, kind, n)


def test_encoder_multiblock_boundaries():
    # exactly 1, 2, and 2.5 blocks of 128 KiB; matches never cross the
    # block boundary by construction (block-local tables)
    unit = b"boundary-block payload %d | " 
    for total in (128 * 1024, 256 * 1024, 320 * 1024):
        data = (b"".join(unit % i for i in range(total // 26 + 1)))[:total]
        frame = compress(data)
        assert decompress(frame) == data
        assert _cli_decompress(frame) == data
        assert len(frame) < total // 3
