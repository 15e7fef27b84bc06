"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libraries ship in this
environment — each decoder raises ``NotImplementedError`` unless the
optional library imports, or uses the deterministic fake) but the
Spark-side plumbing is real and tested: schema, partition sizing,
Arrow-batched ``mapInPandas`` signatures, and batch shapes are exactly
what a production decode stage needs.

Pattern: media rows are (id, modality, media binary, meta struct);
feature extraction streams Arrow batches through a pandas iterator so
a 100 TB media table never materializes decoded frames in the plan —
only fixed-size feature vectors come out.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StringType,
                               StructField, StructType)

FEATURE_DIM = 16

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("media", StructType([               # typed metadata
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ])),
    StructField("payload", StringType()),           # placeholder for binary
])


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires PIL/opencv — absent here by design."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode needs PIL; use fake_features for plumbing tests"
        ) from exc
    raise NotImplementedError("wire PIL decode here in a full environment")


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decode → embed': bytes → seeded vector.

    Stands in for decode/resize/frame-sample so the distributed plumbing
    (schema, batching, partitioning) is testable without media libs.
    """
    import hashlib

    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=4).digest(), "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def extract_features(media: DataFrame, payload_col: str = "payload",
                     dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction over opaque payloads.

    Batch shape: one Arrow batch in → one fixed-width feature frame out;
    peak memory is bounded by arrow.maxRecordsPerBatch × payload size,
    never by partition size.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                fake_features(p if isinstance(p, (bytes, bytearray))
                              else str(p).encode("utf-8"), dim).tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "features": feats,
            })

    return media.select("media_id", "modality", payload_col).mapInPandas(
        run, _FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        rows.append((
            i, modality,
            (f"{modality}/fake", int(rng.integers(64, 1920)),
             int(rng.integers(64, 1080)), int(rng.integers(0, 60_000))),
            f"payload-{i}-{int(rng.integers(0, 1 << 30))}",
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
