"""Pure-stdlib media codecs + the real multimodal feature path: fixtures
are REAL bytes (PNG built by our encoder, netpbm, BMP, PCM WAV) with
hand-computable statistics."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vector_spark.dataops import media_codecs as mc
from vector_spark.dataops.multimodal import (
    ASSET_SCHEMA,
    documents_as_assets,
    extract_features,
    resize_images,
)


def gradient_rgb(h=8, w=16):
    """Deterministic image: channel c at (y,x) = (x*16 + y + c) % 256."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 16 + y + c) % 256 for c in range(3)], axis=-1)
    return img.astype(np.uint8)


def make_bmp(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24bpp BMP writer (independent of the decoder)."""
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    pixel_data = b""
    for y in range(h - 1, -1, -1):
        row = img[y][:, ::-1].tobytes()  # RGB → BGR
        pixel_data += row + b"\x00" * (row_size - len(row))
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(pixel_data), 0, 0, 54
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                       2835, 2835, 0, 0)
    return header + info + pixel_data


def test_png_roundtrip_gray_rgb_rgba():
    rgb = gradient_rgb()
    assert np.array_equal(mc.decode_png(mc.encode_png(rgb)), rgb)
    gray = rgb[:, :, 0]
    assert np.array_equal(mc.decode_png(mc.encode_png(gray)), gray)
    rgba = np.dstack([rgb, np.full(rgb.shape[:2], 128, np.uint8)])
    assert np.array_equal(mc.decode_png(mc.encode_png(rgba)), rgba)


def test_png_filtered_rows_decode():
    """Exercise the unfilter paths: encode with zlib over Sub/Up/Average/
    Paeth-filtered scanlines and check exact recovery."""
    import zlib

    rgb = gradient_rgb(6, 6)
    h, w = rgb.shape[:2]
    stride, bpp = w * 3, 3
    flat = rgb.reshape(h, stride)
    lines = []
    for y, ftype in zip(range(h), [0, 1, 2, 3, 4, 2]):
        line = bytearray(flat[y])
        prev = flat[y - 1] if y else np.zeros(stride, np.uint8)
        if ftype == 1:
            for i in range(stride - 1, bpp - 1, -1):
                line[i] = (line[i] - line[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride - 1, -1, -1):
                left = flat[y][i - bpp] if i >= bpp else 0
                line[i] = (line[i] - ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride - 1, -1, -1):
                a = int(flat[y][i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(flat[y - 1][i - bpp]) if (i >= bpp and y) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(line))
    raw = zlib.compress(b"".join(lines))

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(png), rgb)


def test_ppm_bmp_png_agree():
    """The same image through three container formats decodes identically."""
    img = gradient_rgb()
    a = mc.decode_png(mc.encode_png(img))
    b = mc.decode_ppm(mc.encode_ppm(img))
    c = mc.decode_bmp(make_bmp(img))
    assert np.array_equal(a, b) and np.array_equal(b, c)


def test_wav_roundtrip_and_stats():
    rate = 8000
    t = np.arange(rate)  # 1 second
    samples = (np.sin(2 * np.pi * 440 * t / rate) * 10000).astype(np.int16)
    data = mc.encode_wav(rate, samples)
    assert mc.sniff_media(data) == "audio/wav"
    got_rate, got = mc.decode_wav(data)
    assert got_rate == rate
    assert np.array_equal(got, samples)


def test_resize_nearest_exact():
    img = gradient_rgb(8, 8)
    half = mc.resize_nearest(img, 4, 4)
    # nearest with integer ratio: picks every other pixel
    assert np.array_equal(half, img[::2, ::2])


def test_sniff():
    assert mc.sniff_media(mc.encode_png(gradient_rgb())) == "image/png"
    assert mc.sniff_media(b"P6 2 2 255 aaabbbcccddd") == "image/x-portable-anymap"
    assert mc.sniff_media(b"\xff\xd8\xff\xe0junk") == "image/jpeg"
    assert mc.sniff_media(b"plain text") is None


def test_jpeg_env_gated():
    with pytest.raises(ValueError, match="env-gated"):
        mc.decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def _asset_df(spark, rows):
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_extract_features_real_images(spark):
    """Through Spark: a constant gray PNG has known mean/std; WAV features
    are RMS/duration."""
    flat = np.full((4, 4), 128, np.uint8)
    png = mc.encode_png(flat)
    rate = 4000
    samples = np.full(2000, 16384, np.int16)  # DC, 0.5s, amplitude 0.5
    wav = mc.encode_wav(rate, samples)
    df = _asset_df(
        spark,
        [
            (1, "image/png", bytearray(png), 4, 4, None),
            (2, "audio/wav", bytearray(wav), None, None, None),
        ],
    )
    rows = {r["asset_id"]: r for r in extract_features(df).collect()}
    assert rows[1]["feat_mean"] == pytest.approx(128 / 255, abs=1e-6)
    assert rows[1]["feat_std"] == pytest.approx(0.0, abs=1e-6)
    assert rows[2]["feat_mean"] == pytest.approx(0.5, abs=1e-3)  # RMS
    assert rows[2]["feat_std"] == pytest.approx(0.5, abs=1e-9)  # duration


def test_extract_features_fallback_and_strict(spark):
    """Text payloads keep the deterministic digest stand-in; strict raises."""
    docs = spark.createDataFrame(
        [(1, "some text", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assets = documents_as_assets(docs)
    out = extract_features(assets).head()
    assert 0.0 <= out["feat_mean"] <= 1.0  # digest-derived
    with pytest.raises(Exception, match="decodable"):
        extract_features(assets, strict=True).collect()


def test_resize_images_spark(spark):
    img = gradient_rgb(8, 16)
    df = _asset_df(spark, [(7, "image/png", bytearray(mc.encode_png(img)), 16, 8, None)])
    out = resize_images(df, 8, 4).head()
    assert (out["width"], out["height"]) == (8, 4)
    got = mc.decode_ppm(bytes(out["data"]))
    assert got.shape == (4, 8, 3)
    assert np.array_equal(got, mc.resize_nearest(img, 8, 4))


def test_mjpng_roundtrip_and_offsets():
    """Motion-PNG container: encode/decode round-trips frames and fps,
    and the offsets fast path slices frame bytes without pixel decode."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    frames = [
        np.full((8, 8), v, dtype=np.uint8) for v in (0, 100, 255, 7)
    ]
    data = mc.encode_mjpng(frames, fps=4)
    fps, got = mc.decode_mjpng(data)
    assert fps == 4 and len(got) == 4
    for a, b in zip(frames, got):
        assert (a == b).all()
    fps2, spans = mc.mjpng_frame_offsets(data)
    assert fps2 == 4 and len(spans) == 4
    for (off, ln), f in zip(spans, frames):
        assert (mc.decode_png(data[off:off + ln]) == f).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="motion-PNG"):
        mc.decode_mjpng(b"not a stream")


def test_mjpng_truncated_payload_contract(spark):
    """A corrupt/truncated payload PAST the magic must raise ValueError
    from the parser (never a raw struct.error), and sample_frames must
    apply the same skip/strict contract it applies to non-video bytes."""
    import numpy as np
    import pytest as _pytest

    from vector_spark.dataops import media_codecs as mc
    from vector_spark.dataops.multimodal import sample_frames

    frames = [np.full((4, 4), v, dtype=np.uint8) for v in (1, 2, 3)]
    data = mc.encode_mjpng(frames, fps=2)
    for bad in (data[:7], data[:15], data[:-3],
                data[:11] + b"\xff\xff\xff\xff"):
        with _pytest.raises(ValueError, match="truncated motion-PNG"):
            mc.mjpng_frame_offsets(bad)
        with _pytest.raises(ValueError, match="truncated motion-PNG"):
            mc.decode_mjpng(bad)

    assets = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(data[:-3]))],
        "asset_id long, data binary",
    )
    out = sample_frames(assets, every_n=1).collect()
    assert {r.asset_id for r in out} == {1} and len(out) == 3
    with _pytest.raises(Exception, match="truncated motion-PNG"):
        sample_frames(assets, every_n=1, strict=True).collect()
