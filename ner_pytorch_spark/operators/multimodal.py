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
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               StringType, StructField, StructType)

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
    StructField("payload", BinaryType()),           # opaque media bytes
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


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage: target-dimension planning is pure JVM math
    (aspect-preserving fit into ``max_side``); the pixel resample itself
    belongs inside the decode UDF (stubbed here — see
    :func:`decode_image`). At 100 TB the planning columns let partition
    sizing and skew decisions happen BEFORE any decode work."""
    scale = F.when(
        F.greatest("media.width", "media.height") > max_side,
        max_side / F.greatest("media.width", "media.height").cast("double"),
    ).otherwise(F.lit(1.0))
    return (
        media.filter(F.col("modality") == "image")
        .withColumn("target_w", F.greatest(
            F.round(F.col("media.width") * scale).cast("long"), F.lit(1)))
        .withColumn("target_h", F.greatest(
            F.round(F.col("media.height") * scale).cast("long"), F.lit(1)))
    )


_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("ts_ms", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 32,
                  dim: int = FEATURE_DIM) -> DataFrame:
    """Video frame sampling: one input row fans out to ≤ ``max_frames``
    frame rows INSIDE the Arrow batch (variable fan-out is the shape a
    real decoder produces — decoded frames never exist as a column; only
    per-frame feature vectors leave the UDF). Frame features use the
    deterministic fake keyed by (payload, frame_idx)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, feats = [], [], [], []
            for mid, dur, payload in zip(pdf["media_id"],
                                         pdf["duration_ms"], pdf["payload"]):
                payload = bytes(payload)
                n = max(1, min(max_frames, int(int(dur) / 1000.0 * fps)))
                for k in range(n):
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(int(k * 1000.0 / fps))
                    feats.append(fake_features(
                        payload + b":frame:" + str(k).encode(), dim).tolist())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "ts_ms": tss, "features": feats})

    vids = (media.filter(F.col("modality") == "video")
            .select("media_id", F.col("media.duration_ms").alias("duration_ms"),
                    "payload"))
    return vids.mapInPandas(run, _FRAME_SCHEMA)


_WINDOW_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("window_idx", LongType()),
    StructField("start_ms", LongType()),
    StructField("end_ms", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def audio_windows(media: DataFrame, window_ms: int = 1000,
                  hop_ms: int = 500, max_windows: int = 64,
                  dim: int = FEATURE_DIM) -> DataFrame:
    """Audio windowing: overlapping (window, hop) segments per clip with
    per-window feature vectors — the spectrogram-frontend batch shape,
    deterministic-fake featurized."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, feats = [], [], [], [], []
            for mid, dur, payload in zip(pdf["media_id"],
                                         pdf["duration_ms"], pdf["payload"]):
                payload = bytes(payload)
                dur = int(dur)
                k, start = 0, 0
                while start < max(dur, 1) and k < max_windows:
                    ids.append(mid)
                    idxs.append(k)
                    starts.append(start)
                    ends.append(min(start + window_ms, dur))
                    feats.append(fake_features(
                        payload + b":win:" + str(k).encode(), dim).tolist())
                    k += 1
                    start += hop_ms
            yield pd.DataFrame({"media_id": ids, "window_idx": idxs,
                                "start_ms": starts, "end_ms": ends,
                                "features": feats})

    auds = (media.filter(F.col("modality") == "audio")
            .select("media_id", F.col("media.duration_ms").alias("duration_ms"),
                    "payload"))
    return auds.mapInPandas(run, _WINDOW_SCHEMA)


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
            f"payload-{i}-{int(rng.integers(0, 1 << 30))}".encode("utf-8"),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
