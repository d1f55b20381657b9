"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns exactly like
``pages.html`` — the engine never interprets them JVM-side; decode /
feature-extract / resize / frame-sample run as ``mapInPandas`` stages over
Arrow record batches so the bytes cross into Python once per batch.

The actual codecs are NOT available in this environment, so the decode step
is a clearly-marked stub: ``decoder="fake"`` produces a deterministic
feature vector from the payload bytes (so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and testable end-to-end),
and ``decoder="real"`` raises ``NotImplementedError`` at the exact seam
where PIL/ffmpeg would slot in.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feature array<float>, frames_sampled int"
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) matching
    MEDIA_SCHEMA — stands in for a real ingestion of image/audio blobs."""
    import random

    rows = []
    for i in range(n):
        r = random.Random((seed << 16) ^ i)
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(r.getrandbits(8) for _ in range(128 + (i % 5) * 64))
        rows.append(
            (
                i, kind, payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32, 64 + i % 16, (i % 7) * 1000,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes → unit feature vector."""
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
    v = v / np.linalg.norm(v)
    return v


def extract_features(
    media: DataFrame, decoder: str = "fake", dim: int = 8,
    frame_stride_ms: int = 500,
) -> DataFrame:
    """mapInPandas feature extraction. ``decoder='real'`` is the seam where
    PIL/torchaudio/ffmpeg decode would run — unavailable here by design."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                if decoder == "real":
                    raise NotImplementedError(
                        "real media decoding needs PIL/ffmpeg — not present "
                        "in this environment; use decoder='fake'"
                    )
                feat = _fake_decode(payload, dim)
                frames = (
                    max(1, int(row["duration_ms"]) // frame_stride_ms)
                    if row["kind"] == "video"
                    else 1
                )
                out.append(
                    (
                        int(row["media_id"]), row["kind"], len(payload),
                        hashlib.sha1(payload).hexdigest(),
                        [float(x) for x in feat], frames,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "sha1", "feature",
                    "frames_sampled",
                ],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Per-kind rollup of the extracted features — the downstream shape a
    training pipeline filters on."""
    return (
        features.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("frames_sampled"), 6).alias("avg_frames"),
            F.countDistinct("sha1").alias("distinct_payloads"),
        )
        .orderBy("kind")
    )
