"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side design is the real deliverable here (schema, partitioning,
UDF signature, batch shape); actual codec work is stubbed because media
libraries aren't available in this environment — each decode hook either
raises NotImplementedError (strict mode) or produces a deterministic fake
(test mode), clearly marked below.

At 100 TB: binary payloads dominate row size, so all metadata-only
operations project metadata columns FIRST (never materialize `data` into a
shuffle); feature extraction runs mapInPandas with bounded Arrow batch
sizes (spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory is
payload-bounded, and outputs drop the binary column unless asked.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# envelope for a multimodal asset column
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image/png, audio/wav, ...
        StructField("data", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
    ]
)


def documents_as_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat document text bytes as an opaque binary asset column
    (lets the whole multimodal path be exercised on the synthetic tables)."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("data"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )


def synthesize_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically synthesize REAL media payloads from document rows
    (one per row, keyed by doc_id % 3): solid-gray 16x16 PNG, a ±A square
    wave WAV (2048 samples @ 8kHz), or the raw text bytes.

    The generation parameters are chosen so the REAL decoded features are
    exact in float64 and reproducible from doc_id arithmetic alone (the
    DuckDB oracle recomputes them without touching the binary):
      - PNG: constant pixel a = doc_id % 256 → mean = fl(a/255), std = 0
        (256 = 2^8 identical exact values; pairwise sum is exact)
      - WAV: amplitude A = 500 + (doc_id % 100)*3 ∈ [500, 797] → every
        sample² is the same exact dyadic (A/32768)², so RMS = A/32768
        exactly; 768 = 256·odd (the one value in range whose 7th decimal
        is an exact rounding midpoint) is unreachable since 268 is not
        divisible by 3; duration = 2048/8000 — the same correctly-rounded
        division both engines perform
    """
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            texts = pdf["text"].to_numpy()
            out = {k.name: [] for k in ASSET_SCHEMA.fields}
            for i, t in zip(ids, texts):
                m = int(i) % 3
                if m == 0:
                    a = int(i) % 256
                    img = np.full((16, 16), a, dtype=np.uint8)
                    data, mt, w, h, dur = mc.encode_png(img), "image/png", 16, 16, None
                elif m == 1:
                    amp = 500 + (int(i) % 100) * 3
                    samples = np.tile(
                        np.array([amp, -amp], dtype=np.int16), 1024
                    )
                    data, mt, w, h = mc.encode_wav(8000, samples), "audio/wav", None, None
                    dur = 2048 / 8000
                else:
                    data, mt, w, h, dur = str(t).encode(), "text/plain", None, None, None
                out["asset_id"].append(int(i))
                out["media_type"].append(mt)
                out["data"].append(data)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_s"].append(dur)
            yield pd.DataFrame(out, columns=[f.name for f in ASSET_SCHEMA.fields])

    return docs.select(id_col, "text").mapInPandas(gen, schema=ASSET_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("ts_s", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_png", BinaryType()),
        StructField("frame_mean", DoubleType()),
    ]
)


def synthesize_video_assets(
    docs: DataFrame, id_col: str = "doc_id", n_frames: int = 8, fps: int = 4
) -> DataFrame:
    """Deterministically synthesize REAL video payloads (motion-PNG
    container, media_codecs.encode_mjpng) — one clip per row: n_frames
    8×8 frames, frame f a constant pixel (doc_id + f) % 256, so every
    per-frame feature is exact doc_id arithmetic an independent engine
    recomputes without touching the binary (same discipline as
    synthesize_assets): frame_mean = round(((doc_id+f)%256)/255, 6),
    ts_s = f/fps, duration = n_frames/fps."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in ASSET_SCHEMA.fields}
            for i in pdf[id_col].to_numpy():
                frames = [
                    np.full((8, 8), (int(i) + f) % 256, dtype=np.uint8)
                    for f in range(n_frames)
                ]
                out["asset_id"].append(int(i))
                out["media_type"].append("video/x-motion-png")
                out["data"].append(mc.encode_mjpng(frames, fps))
                out["width"].append(8)
                out["height"].append(8)
                out["duration_s"].append(n_frames / fps)
            yield pd.DataFrame(
                out, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return docs.select(id_col).mapInPandas(gen, schema=ASSET_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n: int = 3, strict: bool = False
) -> DataFrame:
    """Frame sampling over video payloads: keep every n-th frame of each
    clip, emitting (asset_id, frame_index, ts_s, width, height,
    frame_png, frame_mean) — the pretraining-pipeline step that turns
    video into a trainable image stream.

    REAL decode: the motion-PNG container parses header-first
    (mjpng_frame_offsets), so only the KEPT frames' PNG bytes are ever
    decoded — at 100 TB the dominant cost is exactly the frames you
    keep, not the clip length. Non-video payloads are skipped
    (strict=True raises instead); entropy-coded containers (mp4/H.26x)
    stay env-gated like JPEG, documented in media_codecs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vector_spark.dataops import media_codecs as mc

        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}
            for aid, d in zip(pdf["asset_id"], pdf["data"]):
                raw = bytes(d) if d is not None else b""
                if raw[:5] != b"MJPN1":
                    if strict:
                        raise ValueError(
                            f"asset {aid}: not a motion-PNG stream "
                            "(mp4/H.26x need a codec library)"
                        )
                    continue
                try:
                    fps, spans = mc.mjpng_frame_offsets(raw)
                except ValueError:
                    # truncated/corrupt past the magic: same skip/strict
                    # contract as the non-video case — never a raw
                    # struct.error crashing the whole task
                    if strict:
                        raise ValueError(
                            f"asset {aid}: truncated motion-PNG stream"
                        )
                    continue
                for f in range(0, len(spans), every_n):
                    off, ln = spans[f]
                    png = raw[off:off + ln]
                    img = mc.decode_png(png)
                    out["asset_id"].append(int(aid))
                    out["frame_index"].append(f)
                    out["ts_s"].append(f / fps)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["frame_png"].append(png)
                    out["frame_mean"].append(
                        round(float(img.mean()) / 255.0, 6)
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return assets.mapInPandas(fn, schema=FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("window_index", IntegerType()),
        StructField("t0_s", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_windows(
    assets: DataFrame, window_s: float = 0.064, strict: bool = False
) -> DataFrame:
    """Windowed audio feature extraction: REAL WAV decode, fixed-length
    windows (trailing partial window dropped — deterministic row
    counts), per-window RMS in [0, 1] — the audio analog of
    :func:`sample_frames` for a training pipeline that consumes audio
    as framed features. Non-WAV payloads skip (strict=True raises;
    compressed codecs need a library, same env-gate as JPEG/mp4).

    Window timestamps are exact integer arithmetic then one division
    (idx·win/rate), and the synthetic square-wave clips make every RMS
    an exact dyadic (A/32768) — the same engine-replayability
    discipline as synthesize_assets."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vector_spark.dataops import media_codecs as mc

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_WINDOW_SCHEMA.fields}
            for aid, d in zip(pdf["asset_id"], pdf["data"]):
                raw = bytes(d) if d is not None else b""
                if mc.sniff_media(raw) != "audio/wav":
                    if strict:
                        raise ValueError(
                            f"asset {aid}: not a WAV payload (compressed "
                            "audio needs a codec library)"
                        )
                    continue
                rate, samples = mc.decode_wav(raw)
                win = int(round(window_s * rate))
                n = len(samples) // win if win > 0 else 0
                x = samples[: n * win].astype(np.float64) / 32768.0
                for i in range(n):
                    seg = x[i * win:(i + 1) * win]
                    out["asset_id"].append(int(aid))
                    out["window_index"].append(i)
                    out["t0_s"].append(i * win / rate)
                    out["rms"].append(
                        round(float(np.sqrt(np.mean(seg * seg))), 6)
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_WINDOW_SCHEMA.fields]
            )

    return assets.mapInPandas(fn, schema=AUDIO_WINDOW_SCHEMA)


def decode_image(data: bytes) -> "object":
    """REAL for PNG / netpbm / BMP (pure stdlib+numpy decoders in
    dataops/media_codecs.py; PIL extends coverage when present). JPEG and
    video remain env-gated — entropy coding needs a codec library."""
    from vector_spark.dataops.media_codecs import decode_image as _decode

    return _decode(data)


def _fake_decode_features(data: bytes) -> tuple[float, float]:
    """Deterministic fake feature extractor (documented test stand-in):
    derives two floats from the content digest — stable across runs and
    engines, exercising the real batch plumbing."""
    h = hashlib.sha256(data).digest()
    a = int.from_bytes(h[:8], "big") / 2**64
    b = int.from_bytes(h[8:16], "big") / 2**64
    return a, b


def _real_features(data: bytes) -> tuple[float, float] | None:
    """REAL feature extraction for decodable payloads: images → pixel
    mean/std normalized to [0,1]; WAV audio → RMS and duration. Returns
    None when the payload isn't a decodable media format (the synthetic
    text fixtures fall back to the deterministic digest stand-in so the
    oracle value-hash stays stable)."""
    from vector_spark.dataops import media_codecs as mc

    kind = mc.sniff_media(data)
    try:
        if kind in ("image/png", "image/x-portable-anymap", "image/bmp"):
            img = mc.decode_image(data)
            flat = img.astype("float64") / 255.0
            return float(flat.mean()), float(flat.std())
        if kind == "audio/wav":
            rate, samples = mc.decode_wav(data)
            x = samples.astype("float64") / 32768.0
            rms = float((x**2).mean() ** 0.5)
            duration = samples.shape[0] / rate if rate else 0.0
            return rms, float(duration)
    except ValueError:
        return None
    return None


def extract_features(
    assets: DataFrame, batch_size_hint: int = 256, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Decodable media (PNG/netpbm/BMP/WAV — real pure-stdlib decoders) gets
    REAL features; unrecognized payloads use the deterministic digest
    stand-in (strict=True raises for them instead)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = [
                bytes(d) if d is not None else b"" for d in pdf["data"].to_numpy()
            ]
            feats = []
            for d in datas:
                real = _real_features(d)
                if real is None and strict:
                    raise ValueError(
                        "payload is not a decodable media format "
                        "(PNG/netpbm/BMP/WAV here; JPEG/video need a codec "
                        "library)"
                    )
                feats.append(real if real is not None else _fake_decode_features(d))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": [len(d) for d in datas],
                    "content_sha": [hashlib.sha256(d).hexdigest() for d in datas],
                    "feat_mean": [round(m, 6) for m, _ in feats],
                    "feat_std": [round(s, 6) for _, s in feats],
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (netpbm) via
    mapInPandas; non-image payloads pass through untouched. Output keeps
    the asset envelope with refreshed data/width/height."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vector_spark.dataops import media_codecs as mc

        for pdf in batches:
            out_data, out_wc, out_hc, out_mt = [], [], [], []
            for d, mt in zip(pdf["data"], pdf["media_type"]):
                raw = bytes(d) if d is not None else b""
                kind = mc.sniff_media(raw)
                if kind in ("image/png", "image/x-portable-anymap", "image/bmp"):
                    img = mc.resize_nearest(mc.decode_image(raw), out_w, out_h)
                    out_data.append(mc.encode_ppm(img))
                    out_wc.append(out_w)
                    out_hc.append(out_h)
                    out_mt.append("image/x-portable-anymap")
                else:
                    out_data.append(raw)
                    out_wc.append(None)
                    out_hc.append(None)
                    out_mt.append(mt)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": out_mt,
                    "data": out_data,
                    "width": pd.array(out_wc, dtype="Int32"),
                    "height": pd.array(out_hc, dtype="Int32"),
                    "duration_s": pdf["duration_s"],
                }
            )

    return assets.mapInPandas(fn, schema=ASSET_SCHEMA)


def asset_metadata(assets: DataFrame) -> DataFrame:
    """Metadata-only projection — note: no UDF, no binary materialization
    beyond the scan; octet_length is evaluated columnar in the JVM."""
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length("data").cast("long").alias("n_bytes"),
        F.md5("data").alias("content_md5"),
    )


# ---- image perceptual hashing (difference hash) ---------------------------

def synthesize_gradient_images(docs: DataFrame,
                               id_col: str = "doc_id",
                               w: int = 9, h: int = 8) -> DataFrame:
    """Deterministic STRUCTURED images for the dHash oracle: pixel
    (x, y) = (base + x·kx + y·ky) mod 256 with base = doc_id % 256,
    kx = 29 + 2·(doc_id % 100), ky = 31 + 2·(doc_id % 90) — large ODD
    steps wrap mod 256 constantly, so adjacent-pixel comparisons give
    dense, varied bit patterns (small steps made every hash all-ones),
    while staying recomputable from doc_id arithmetic alone — the
    synthesize_assets exact-feature stance. Default 9×8 so an 8×8
    dHash needs no resampling."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in ASSET_SCHEMA.fields}
            for i in pdf[id_col].to_numpy():
                i = int(i)
                base = i % 256
                kx, ky = 29 + 2 * (i % 100), 31 + 2 * (i % 90)
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                img = ((base + xs * kx + ys * ky) % 256).astype(np.uint8)
                out["asset_id"].append(i)
                out["media_type"].append("image/png")
                out["data"].append(mc.encode_png(img))
                out["width"].append(w)
                out["height"].append(h)
                out["duration_s"].append(None)
            yield pd.DataFrame(
                out, columns=[f.name for f in ASSET_SCHEMA.fields])

    return docs.select(id_col).mapInPandas(gen, schema=ASSET_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("dhash_bits", StringType()),   # 64 chars of 0/1
        StructField("dhash_hi", LongType()),        # bits 63..32
        StructField("dhash_lo", LongType()),        # bits 31..0
    ]
)


def image_dhash(assets: DataFrame, grid_w: int = 8,
                grid_h: int = 8) -> DataFrame:
    """Difference hash over REAL decoded pixels (pure-stdlib PNG/BMP
    decode, media_codecs.py): sample a (grid_w+1)×grid_h luminance
    grid (nearest-neighbor when the image isn't already that size),
    bit(x, y) = p(x+1, y) > p(x, y), positions ordered y·grid_w + x.
    Returns the bit string plus two 32-bit halves for LSH banding.
    Non-image rows are dropped. Arrow-batched mapInPandas — the
    binary column never enters a shuffle."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    gw, gh = grid_w, grid_h

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DHASH_SCHEMA.fields}
            for aid, mt, data in zip(pdf["asset_id"], pdf["media_type"],
                                     pdf["data"]):
                if not str(mt).startswith("image/"):
                    continue
                try:
                    img = (mc.decode_png(bytes(data))
                           if str(mt).endswith("png")
                           else mc.decode_bmp(bytes(data)))
                except Exception:
                    continue
                if img.ndim == 3:  # RGB(A) → integer-mean luminance
                    img = img[:, :, :3].mean(axis=2).astype(np.int64)
                ih, iw = img.shape
                xs = (np.arange(gw + 1) * iw) // (gw + 1)
                ys = (np.arange(gh) * ih) // gh
                grid = img[np.ix_(ys, xs)].astype(np.int64)
                bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint8)
                flat = bits.reshape(-1)  # y-major, matching the oracle
                val = 0
                for b in flat:
                    val = (val << 1) | int(b)
                # flat[0] is the MOST significant of the 64 bits
                out["asset_id"].append(int(aid))
                out["dhash_bits"].append(
                    "".join("1" if b else "0" for b in flat))
                out["dhash_hi"].append(val >> 32)
                out["dhash_lo"].append(val & 0xFFFFFFFF)
            yield pd.DataFrame(
                out, columns=[f.name for f in DHASH_SCHEMA.fields])

    return assets.select("asset_id", "media_type", "data").mapInPandas(
        fn, schema=DHASH_SCHEMA)


def image_near_dup_pairs(assets: DataFrame, max_hamming: int = 6,
                         bands: int = 4) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash → split the 64
    bits into ``bands`` equal substrings → candidates share ANY band
    (banded LSH self-join, the SimHash shape: by pigeonhole a pair
    within hamming ≤ bands-1 per band boundary always shares one) →
    exact hamming verify ≤ max_hamming. Candidates carry only
    (id, band, key) — the 100 TB discipline: pixel data and even the
    full hash never transit the join."""
    hashes = image_dhash(assets)
    width = 64 // bands
    sides = []
    for side in ("a", "b"):
        parts = hashes.select(
            F.col("asset_id").alias(f"id_{side}"),
            F.col("dhash_bits").alias(f"bits_{side}"),
        )
        sides.append(parts)
    banded = None
    for i in range(bands):
        key = F.substring("dhash_bits", i * width + 1, width)
        b = hashes.select(
            "asset_id", F.lit(i).alias("band"), key.alias("key"))
        banded = b if banded is None else banded.unionByName(b)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"),
              (F.col("x.band") == F.col("y.band"))
              & (F.col("x.key") == F.col("y.key"))
              & (F.col("x.asset_id") < F.col("y.asset_id")))
        .select(F.col("x.asset_id").alias("id_a"),
                F.col("y.asset_id").alias("id_b"))
        .distinct()
    )
    # hamming via zip of the two bit strings
    joined = cand.join(sides[0], "id_a").join(sides[1], "id_b")
    ham = F.size(F.filter(
        F.zip_with(F.split("bits_a", ""), F.split("bits_b", ""),
                   lambda u, v: u != v),
        lambda x: x,
    ))
    return (
        joined.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---- audio fingerprinting (window-energy delta hash) ----------------------

def synthesize_window_audio(docs: DataFrame, id_col: str = "doc_id",
                            windows: int = 16,
                            window_samples: int = 128) -> DataFrame:
    """Deterministic STRUCTURED audio for the fingerprint oracle: one
    clip per row of ``windows`` back-to-back ±A_w square-wave windows
    with A_w = 50 + (doc_id + 17·w) mod 900 — per-window mean |x| is
    EXACTLY A_w (integers, alternating signs), so every fingerprint
    bit is doc_id arithmetic an independent engine recomputes without
    touching the binary (the synthesize_assets stance)."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in ASSET_SCHEMA.fields}
            for i in pdf[id_col].to_numpy():
                i = int(i)
                chunks = []
                for w in range(windows):
                    amp = 50 + (i + 17 * w) % 900
                    chunks.append(np.tile(
                        np.array([amp, -amp], dtype=np.int16),
                        window_samples // 2))
                samples = np.concatenate(chunks)
                out["asset_id"].append(i)
                out["media_type"].append("audio/wav")
                out["data"].append(mc.encode_wav(8000, samples))
                out["width"].append(None)
                out["height"].append(None)
                out["duration_s"].append(len(samples) / 8000)
            yield pd.DataFrame(
                out, columns=[f.name for f in ASSET_SCHEMA.fields])

    return docs.select(id_col).mapInPandas(gen, schema=ASSET_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("fp_bits", StringType()),  # windows-1 chars of 0/1
        StructField("n_windows", IntegerType()),
    ]
)


def audio_fingerprint(assets: DataFrame,
                      windows: int = 16) -> DataFrame:
    """Energy-delta audio fingerprint over REAL decoded samples (the
    pure-stdlib WAV reader): split the clip into ``windows`` equal
    windows, per-window mean |amplitude|, bit w = energy(w+1) >
    energy(w) — the shape of real acoustic fingerprints (Shazam-style
    band-energy deltas) reduced to one band. Returns a windows-1 bit
    string; pair near-duplicates with the same banded-hamming join as
    image_near_dup_pairs. Non-audio rows drop; the binary column never
    shuffles (mapInPandas)."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FP_SCHEMA.fields}
            for aid, mt, data in zip(pdf["asset_id"], pdf["media_type"],
                                     pdf["data"]):
                if not str(mt).startswith("audio/"):
                    continue
                try:
                    _rate, samples = mc.decode_wav(bytes(data))
                except Exception:
                    continue
                n = (len(samples) // windows) * windows
                if n == 0:
                    continue
                grid = np.abs(
                    samples[:n].astype(np.int64)
                ).reshape(windows, -1).mean(axis=1)
                bits = "".join(
                    "1" if grid[w + 1] > grid[w] else "0"
                    for w in range(windows - 1))
                out["asset_id"].append(int(aid))
                out["fp_bits"].append(bits)
                out["n_windows"].append(windows)
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FP_SCHEMA.fields])

    return assets.select("asset_id", "media_type", "data").mapInPandas(
        fn, schema=AUDIO_FP_SCHEMA)


# ---- video scene-change detection -----------------------------------------

def synthesize_jump_videos(docs: DataFrame, id_col: str = "doc_id",
                           n_frames: int = 12,
                           fps: int = 4) -> DataFrame:
    """Deterministic videos with EXACTLY ONE hard cut for the
    scene-change oracle: frames 0..jump-1 are constant pixel a =
    doc_id % 128, frames jump.. are constant a + 64 + doc_id % 64
    (no mod-256 wrap, so the single luma jump is 64..127 levels) with
    jump = 1 + doc_id % (n_frames - 1) — the boundary position is pure
    doc_id arithmetic."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in ASSET_SCHEMA.fields}
            for i in pdf[id_col].to_numpy():
                i = int(i)
                a = i % 128
                b = a + 64 + i % 64
                jump = 1 + i % (n_frames - 1)
                frames = [
                    np.full((8, 8), a if f < jump else b, dtype=np.uint8)
                    for f in range(n_frames)
                ]
                out["asset_id"].append(i)
                out["media_type"].append("video/x-motion-png")
                out["data"].append(mc.encode_mjpng(frames, fps))
                out["width"].append(8)
                out["height"].append(8)
                out["duration_s"].append(n_frames / fps)
            yield pd.DataFrame(
                out, columns=[f.name for f in ASSET_SCHEMA.fields])

    return docs.select(id_col).mapInPandas(gen, schema=ASSET_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("ts_s", DoubleType()),
        StructField("mean_delta", DoubleType()),
    ]
)


def detect_scene_changes(assets: DataFrame,
                         threshold: float = 0.1) -> DataFrame:
    """Hard-cut (shot boundary) detection over REAL decoded frames:
    per-frame luminance mean, a boundary wherever
    |mean(f) - mean(f-1)| > threshold — the standard
    luma-delta shot detector, emitting (asset_id, frame_index, ts_s,
    mean_delta) per cut. The training-data use: split long videos at
    cuts before frame sampling so clips are single-shot. Non-video
    rows drop; decode is per-frame via the header-first container
    offsets (mapInPandas, binary never shuffles)."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in SCENE_SCHEMA.fields}
            for aid, mt, data in zip(pdf["asset_id"], pdf["media_type"],
                                     pdf["data"]):
                if not str(mt).startswith("video/"):
                    continue
                try:
                    raw = bytes(data)
                    fps, spans = mc.mjpng_frame_offsets(raw)
                except Exception:
                    continue
                prev = None
                for f, (off, ln) in enumerate(spans):
                    img = mc.decode_png(raw[off:off + ln])
                    mean = float(np.asarray(img, dtype=np.float64).mean()
                                 / 255.0)
                    if prev is not None and abs(mean - prev) > threshold:
                        out["asset_id"].append(int(aid))
                        out["frame_index"].append(f)
                        out["ts_s"].append(f / fps)
                        out["mean_delta"].append(round(mean - prev, 6))
                    prev = mean
            yield pd.DataFrame(
                out, columns=[f.name for f in SCENE_SCHEMA.fields])

    return assets.select("asset_id", "media_type", "data").mapInPandas(
        fn, schema=SCENE_SCHEMA)
