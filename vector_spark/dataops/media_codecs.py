"""Pure-stdlib media codecs: PNG / PPM / PGM / BMP images and WAV audio.

No PIL/libjpeg in this container (probed — see NOTES_r2.md), but these
formats need nothing beyond zlib + numpy, so image/audio decode can be
REAL here, not a stub: PNG (8-bit gray/RGB/RGBA, non-interlaced — the
overwhelming default), netpbm P5/P6, uncompressed 24-bit BMP, PCM WAV.
JPEG/video stay env-gated (entropy coding needs a codec library).

Reference scope: vector itself never decodes media (events are logs/
metrics/traces); this module serves the training-data-pipeline mandate —
feature extraction / resize / frame ops over multimodal columns
(dataops/multimodal.py drives it through mapInPandas).

Encoders exist for PNG/PPM/WAV so tests can build real fixtures and the
resize path can re-emit bytes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


# ---- sniffing -----------------------------------------------------------

def sniff_media(data: bytes) -> str | None:
    """Magic-byte content sniff → media type (None if unrecognized)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:2] in (b"P5", b"P6") and data[2:3] in b" \t\r\n":
        return "image/x-portable-anymap"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"  # recognized but not decodable here
    return None


# ---- PNG ----------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters (spec §9: None/Sub/Up/Average/Paeth)."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev_row = out[(y - 1) * stride : y * stride] if y else bytes(stride)
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev_row[i]
                c = prev_row[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out[y * stride : (y + 1) * stride] = line
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (h, w) gray or (h, w, 3|4). 8-bit, non-interlaced
    color types 0/2/6 (gray / RGB / RGBA)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = bit_depth = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width * channels
    pixels = _png_unfilter(raw, height, stride, channels)
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def encode_png(img: np.ndarray) -> bytes:
    """uint8 gray/(RGB/RGBA) array → PNG (filter 0 everywhere)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.shape[2] == 3:
        color_type, channels = 2, 3
    elif img.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("unsupported channel count")
    height, width = img.shape[:2]
    raw = b"".join(
        b"\x00" + img[y].tobytes() for y in range(height)
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---- netpbm (PPM / PGM binary) ------------------------------------------

def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm → uint8 array."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    channels = 3 if data[:2] == b"P6" else 1
    arr = np.frombuffer(data, dtype=np.uint8, count=width * height * channels,
                        offset=pos)
    arr = arr.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        header = f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    else:
        header = f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    return header + img.tobytes()


# ---- BMP (uncompressed 24-bit) ------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """BITMAPINFOHEADER, 24bpp, BI_RGB → uint8 RGB array (rows are stored
    bottom-up, padded to 4 bytes)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_offset,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    rows = []
    for y in range(height):
        off = pixel_offset + y * row_size
        row = np.frombuffer(data, dtype=np.uint8, count=width * 3, offset=off)
        rows.append(row.reshape(width, 3)[:, ::-1])  # BGR → RGB
    arr = np.stack(rows)
    return arr[::-1] if flipped else arr


# ---- WAV ----------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV → (sample_rate, int16 samples[n, channels-squeezed])."""
    with wave.open(io.BytesIO(data)) as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    arr = np.frombuffer(raw, dtype=dtype)
    if channels > 1:
        arr = arr.reshape(-1, channels)
    return rate, arr


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    buf = io.BytesIO()
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    channels = samples.shape[1] if samples.ndim > 1 else 1
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


# ---- transforms ---------------------------------------------------------

def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index math (no interpolation lib)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes; PIL (if ever present) extends coverage."""
    try:
        from PIL import Image  # pragma: no cover - not in this container

        return np.asarray(Image.open(io.BytesIO(data)))
    except ImportError:
        pass
    kind = sniff_media(data)
    if kind == "image/png":
        return decode_png(data)
    if kind == "image/x-portable-anymap":
        return decode_ppm(data)
    if kind == "image/bmp":
        return decode_bmp(data)
    if kind == "image/jpeg":
        raise ValueError(
            "JPEG decode requires a codec library (libjpeg/PIL) — env-gated"
        )
    raise ValueError("unrecognized image payload")


# ---- motion-PNG video container ------------------------------------------
# The container lib (mp4/mkv demux + H.26x entropy coding) is env-gated
# like JPEG, but frame-level VIDEO PLUMBING does not need it: this is a
# minimal real container — magic, fps, frame count, then length-prefixed
# PNG frames — so frame sampling, per-frame features, and resize are
# exercised against REAL parseable bytes, not a mock. (Conceptually
# MJPEG with PNG frames; everything stdlib.)

_MJPNG_MAGIC = b"MJPN1"


def encode_mjpng(frames: list[np.ndarray], fps: int) -> bytes:
    """Encode frames (uint8 gray or RGB arrays) at an integer fps."""
    out = [_MJPNG_MAGIC, struct.pack(">HI", fps, len(frames))]
    for f in frames:
        png = encode_png(f)
        out.append(struct.pack(">I", len(png)))
        out.append(png)
    return b"".join(out)


def decode_mjpng(data: bytes) -> tuple[int, list[np.ndarray]]:
    """Decode a motion-PNG container -> (fps, frames)."""
    fps, spans = mjpng_frame_offsets(data)
    return fps, [decode_png(data[off:off + ln]) for off, ln in spans]


def mjpng_frame_offsets(data: bytes) -> tuple[int, list[tuple[int, int]]]:
    """(fps, [(offset, length), ...]) WITHOUT decoding pixels — the
    sampling fast path reads headers and slices only the kept frames."""
    if data[:5] != _MJPNG_MAGIC:
        raise ValueError("not a motion-PNG stream")
    # bounds-check every span against len(data): a truncated/corrupt
    # payload past the magic must raise ValueError (the skip/strict
    # contract sample_frames applies to malformed media), never a raw
    # struct.error that crashes the whole Spark task
    if len(data) < 11:
        raise ValueError("truncated motion-PNG stream")
    fps, n = struct.unpack(">HI", data[5:11])
    spans, off = [], 11
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated motion-PNG stream")
        (ln,) = struct.unpack(">I", data[off:off + 4])
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated motion-PNG stream")
        spans.append((off, ln))
        off += ln
    return fps, spans
