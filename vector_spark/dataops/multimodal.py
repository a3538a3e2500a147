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


def decode_image(data: bytes) -> "object":
    """STUB — image decode requires a codec library not present here.
    Replace with PIL/turbojpeg on a real cluster."""
    raise NotImplementedError("image decode requires a codec library (e.g. PIL)")


def _fake_decode_features(data: bytes) -> tuple[float, float]:
    """Deterministic fake feature extractor (documented test stand-in):
    derives two floats from the content digest — stable across runs and
    engines, exercising the real batch plumbing."""
    h = hashlib.sha256(data).digest()
    a = int.from_bytes(h[:8], "big") / 2**64
    b = int.from_bytes(h[8:16], "big") / 2**64
    return a, b


def extract_features(
    assets: DataFrame, batch_size_hint: int = 256, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    strict=True uses the real decoder hooks (NotImplementedError here);
    strict=False uses the deterministic fake, keeping plumbing testable.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = [
                bytes(d) if d is not None else b"" for d in pdf["data"].to_numpy()
            ]
            if strict:
                for d in datas:
                    decode_image(d)  # NotImplementedError by design
            feats = [_fake_decode_features(d) for d in datas]
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


def asset_metadata(assets: DataFrame) -> DataFrame:
    """Metadata-only projection — note: no UDF, no binary materialization
    beyond the scan; octet_length is evaluated columnar in the JVM."""
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length("data").cast("long").alias("n_bytes"),
        F.md5("data").alias("content_md5"),
    )
