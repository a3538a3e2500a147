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
