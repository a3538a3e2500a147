"""Multimodal column plumbing tests: binary envelope, metadata projection,
mapInPandas feature extraction (deterministic fake decode)."""

from __future__ import annotations

import pytest

from vector_spark.dataops.multimodal import (
    asset_metadata,
    documents_as_assets,
    extract_features,
)


def test_asset_envelope_and_metadata(spark, documents):
    assets = documents_as_assets(documents)
    assert [f.name for f in assets.schema.fields] == [
        "asset_id", "media_type", "data", "width", "height", "duration_s",
    ]
    meta = asset_metadata(assets)
    rows = meta.limit(5).collect()
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in rows)


def test_extract_features_deterministic(spark, documents):
    assets = documents_as_assets(documents.limit(20))
    f1 = {r.asset_id: (r.feat_mean, r.feat_std) for r in extract_features(assets).collect()}
    f2 = {r.asset_id: (r.feat_mean, r.feat_std) for r in extract_features(assets).collect()}
    assert f1 == f2 and len(f1) == 20
    assert all(0 <= a <= 1 and 0 <= b <= 1 for a, b in f1.values())


def test_extract_features_strict_raises(spark, documents):
    assets = documents_as_assets(documents.limit(1))
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(assets, strict=True).collect()


def test_synthesized_assets_real_decode(spark, documents):
    """The multimodal_features query path: synthesized PNG/WAV payloads
    decode through the REAL pure-stdlib decoders, and the features equal
    the closed-form values the DuckDB oracle computes (r2 verdict #2)."""
    from vector_spark.dataops import media_codecs as mc
    from vector_spark.dataops.multimodal import extract_features, synthesize_assets

    assets = synthesize_assets(documents.limit(60))
    rows = {r["asset_id"]: r for r in assets.collect()}
    # payloads are genuine media: sniff + decode agree with the envelope
    png = next(r for r in rows.values() if r["media_type"] == "image/png")
    img = mc.decode_image(bytes(png["data"]))
    assert img.shape == (16, 16) and int(img[0, 0]) == png["asset_id"] % 256
    wav = next(r for r in rows.values() if r["media_type"] == "audio/wav")
    rate, samples = mc.decode_wav(bytes(wav["data"]))
    assert rate == 8000 and samples.shape[0] == 2048
    amp = 500 + (wav["asset_id"] % 100) * 3
    assert int(samples[0]) == amp and int(samples[1]) == -amp

    feats = {r["asset_id"]: r for r in extract_features(assets).collect()}
    f_png = feats[png["asset_id"]]
    assert f_png["feat_mean"] == round((png["asset_id"] % 256) / 255.0, 6)
    assert f_png["feat_std"] == 0.0
    f_wav = feats[wav["asset_id"]]
    assert f_wav["feat_mean"] == round(amp / 32768.0, 6)
    assert f_wav["feat_std"] == 0.256  # 2048 samples / 8000 Hz


def test_sample_frames_indexes_means_and_strict(spark):
    """Frame sampling: every 3rd frame of the 8-frame synthetic clips,
    timestamps f/fps, per-frame means equal to doc_id arithmetic, kept
    frame bytes decode to the right constant image; non-video payloads
    skip (or raise under strict)."""
    import pytest as _pytest

    from vector_spark.dataops import media_codecs as mc
    from vector_spark.dataops.multimodal import (
        documents_as_assets,
        sample_frames,
        synthesize_video_assets,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (0, 7, 250)], "doc_id long, text string"
    )
    clips = synthesize_video_assets(docs)
    rows = sample_frames(clips, every_n=3).collect()
    got = {(r.asset_id, r.frame_index): r for r in rows}
    assert set(got) == {(i, f) for i in (0, 7, 250) for f in (0, 3, 6)}
    for (i, f), r in got.items():
        assert r.ts_s == f / 4
        assert r.frame_mean == round(((i + f) % 256) / 255.0, 6)
        assert r.width == 8 and r.height == 8
        img = mc.decode_png(bytes(r.frame_png))
        assert int(img[0, 0]) == (i + f) % 256
    # non-video assets: skipped silently, strict raises
    text_assets = documents_as_assets(docs)
    assert sample_frames(text_assets, every_n=3).count() == 0
    with _pytest.raises(Exception, match="motion-PNG"):
        sample_frames(text_assets, every_n=3, strict=True).count()


def test_audio_windows_rms_and_strict(spark):
    """Windowed audio: four 512-sample windows per synthetic clip, RMS
    exactly A/32768 per window, timestamps i*512/8000; a trailing
    partial window is dropped; non-WAV payloads skip or raise."""
    import pytest as _pytest

    from vector_spark.dataops.multimodal import (
        audio_windows,
        documents_as_assets,
        synthesize_assets,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 4, 97)], "doc_id long, text string"
    )
    assets = synthesize_assets(docs)  # all ids % 3 == 1 -> WAV clips
    rows = audio_windows(assets, window_s=0.064).collect()
    got = {(r.asset_id, r.window_index): r for r in rows}
    assert set(got) == {(i, w) for i in (1, 4, 97) for w in range(4)}
    for (i, w), r in got.items():
        amp = 500 + (i % 100) * 3
        assert r.rms == round(amp / 32768.0, 6)
        assert r.t0_s == w * 512 / 8000
    # 0.1 s windows (800 samples): 2048 // 800 = 2 full windows, the
    # 448-sample tail drops
    assert audio_windows(assets, window_s=0.1).count() == 6
    text_assets = documents_as_assets(docs)
    assert audio_windows(text_assets).count() == 0
    with _pytest.raises(Exception, match="WAV"):
        audio_windows(text_assets, strict=True).count()


def test_image_dhash_matches_arithmetic(spark, documents):
    """The REAL-decode difference hash equals the doc_id arithmetic
    the generator was designed around (the oracle's math)."""
    from vector_spark.dataops.multimodal import (
        image_dhash,
        synthesize_gradient_images,
    )

    rows = (
        image_dhash(synthesize_gradient_images(documents.limit(64)))
        .collect()
    )
    assert len(rows) == 64

    def expect(i):
        base, kx, ky = i % 256, 29 + 2 * (i % 100), 31 + 2 * (i % 90)
        bits = ""
        for y in range(8):
            for x in range(8):
                a = (base + x * kx + y * ky) % 256
                b = (base + (x + 1) * kx + y * ky) % 256
                bits += "1" if b > a else "0"
        return bits

    for r in rows:
        want = expect(r.asset_id)
        assert r.dhash_bits == want
        assert r.dhash_hi == int(want[:32], 2)
        assert r.dhash_lo == int(want[32:], 2)


def test_image_near_dup_pairs_finds_injected_duplicates(spark):
    """Banded hamming self-join over the dHash: injected exact and
    one-bit-perturbed duplicates are found; unrelated gradients with
    far hashes are not paired at a tight threshold."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc
    from vector_spark.dataops.multimodal import (
        ASSET_SCHEMA,
        image_near_dup_pairs,
    )

    def grad(base, kx, ky, bump=None):
        xs = np.arange(9, dtype=np.int64)[None, :]
        ys = np.arange(8, dtype=np.int64)[:, None]
        img = ((base + xs * kx + ys * ky) % 256).astype(np.uint8)
        if bump:
            y, x = bump
            img[y, x] = (int(img[y, x]) + 128) % 256  # flip ~1 dhash bit
        return mc.encode_png(img)

    rows = [
        (1, "image/png", grad(10, 33, 47), 9, 8, None),
        (2, "image/png", grad(10, 33, 47), 9, 8, None),          # exact dup
        (3, "image/png", grad(10, 33, 47, bump=(3, 4)), 9, 8, None),  # near
        (4, "image/png", grad(200, 111, 93), 9, 8, None),        # unrelated
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_near_dup_pairs(assets, max_hamming=4).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 4
    assert all(4 not in p for p in pairs)


def test_audio_fingerprint_matches_arithmetic(spark, documents):
    """Window-energy fingerprint over real WAV decode equals the
    generator's doc_id arithmetic (the oracle's math)."""
    from vector_spark.dataops.multimodal import (
        audio_fingerprint,
        synthesize_window_audio,
    )

    rows = audio_fingerprint(
        synthesize_window_audio(documents.limit(48))).collect()
    assert len(rows) == 48
    for r in rows:
        want = "".join(
            "1" if (50 + (r.asset_id + 17 * (w + 1)) % 900)
                   > (50 + (r.asset_id + 17 * w) % 900) else "0"
            for w in range(15))
        assert r.fp_bits == want and r.n_windows == 16


def test_scene_change_detection(spark, documents):
    """Hard cuts land exactly where the generator put them; a
    cut-free clip yields no boundaries."""
    import numpy as np

    from vector_spark.dataops import media_codecs as mc
    from vector_spark.dataops.multimodal import (
        ASSET_SCHEMA,
        detect_scene_changes,
        synthesize_jump_videos,
    )

    rows = detect_scene_changes(
        synthesize_jump_videos(documents.limit(40))).collect()
    assert len(rows) == 40  # exactly one cut per clip
    for r in rows:
        assert r.frame_index == 1 + r.asset_id % 11
        assert r.ts_s == (1 + r.asset_id % 11) / 4.0

    flat = mc.encode_mjpng(
        [np.full((8, 8), 90, dtype=np.uint8) for _ in range(6)], 4)
    assets = spark.createDataFrame(
        [(1, "video/x-motion-png", flat, 8, 8, 1.5)], ASSET_SCHEMA)
    assert detect_scene_changes(assets).count() == 0
