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


def synthetic_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic fake media rows (payload = seeded bytes) in
    MEDIA_SCHEMA order. Pure Python — shared by the Spark table builder AND
    the golden-constant oracle (the expected per-kind rollup is computable
    without running Spark at all, because every byte is seed-derived)."""
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
    return rows


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA — stands in for
    a real ingestion of image/audio blobs."""
    return spark.createDataFrame(synthetic_media_rows(n, seed), MEDIA_SCHEMA)


def synthetic_media_summary_rows(
    n: int = 64, seed: int = 42, frame_stride_ms: int = 500
) -> list[tuple]:
    """The expected :func:`media_summary` output over
    ``synthetic_media(n, seed)`` — computed in pure Python from the same
    seeded rows (kind-ordered), for the driver's golden-constant oracle."""
    per: dict[str, list[tuple]] = {}
    for (mid, kind, payload, _m, _w, _h, dur) in synthetic_media_rows(n, seed):
        frames = max(1, dur // frame_stride_ms) if kind == "video" else 1
        per.setdefault(kind, []).append((len(payload), payload, frames))
    out = []
    for kind in sorted(per):
        rows = per[kind]
        out.append(
            (
                kind,
                len(rows),
                sum(r[0] for r in rows),
                round(sum(r[2] for r in rows) / len(rows), 6),
                len({hashlib.sha1(r[1]).hexdigest() for r in rows}),
            )
        )
    return out


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
            if decoder == "real" and len(pdf):
                raise NotImplementedError(
                    "real media decoding needs PIL/ffmpeg — not present "
                    "in this environment; use decoder='fake'"
                )
            # decode is per-item by nature, but the loop is itertuples over
            # the three needed columns — no per-row Series boxing; the
            # frame count is a vectorized column op
            frames = np.where(
                pdf["kind"].to_numpy() == "video",
                np.maximum(
                    1, pdf["duration_ms"].to_numpy() // frame_stride_ms
                ),
                1,
            ).astype("int32")
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                feat = _fake_decode(payload, dim)
                out.append(
                    (
                        int(mid), kind, len(payload),
                        hashlib.sha1(payload).hexdigest(),
                        [float(x) for x in feat],
                    )
                )
            res = pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "sha1", "feature"]
            )
            res["frames_sampled"] = frames
            yield res

    return media.mapInPandas(run, FEATURE_SCHEMA)


# shared SQL text: a deterministic media table derived from `part`, so the
# media pipeline has a DuckDB-checkable oracle. The payload string evaluates
# identically in Spark SQL and DuckDB; Spark additionally encodes it to the
# binary payload column (the oracle only needs its byte length and distinct
# count, both derivable from the string).
MEDIA_PAYLOAD_SQL = (
    "repeat(concat(p_name, '|', CAST(p_partkey AS STRING), '|', p_brand), "
    "CAST(p_partkey % 5 AS INT) + 1)"
)
MEDIA_FROM_PART_SQL = (
    "SELECT p_partkey AS media_id,"
    " CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    "  ELSE 'video' END AS kind,"
    f" {MEDIA_PAYLOAD_SQL} AS payload_str,"
    " CAST(64 + p_partkey % 32 AS INT) AS width,"
    " CAST(64 + p_partkey % 16 AS INT) AS height,"
    " CAST((p_partkey % 7) * 1000 AS INT) AS duration_ms"
    " FROM part"
)


def media_from_part(spark, part_df) -> DataFrame:
    """MEDIA_SCHEMA-shaped table from `part` rows (payload = UTF-8 bytes of
    the shared deterministic string). The part scan is spread first so the
    payload build + downstream hashing parallelize past a single-row-group
    source file."""
    from ..plans.parallelize import spread

    spread(part_df).createOrReplaceTempView("part")
    return spark.sql(MEDIA_FROM_PART_SQL).select(
        "media_id", "kind",
        F.encode(F.col("payload_str"), "utf-8").alias("payload"),
        F.concat(
            F.col("kind"), F.lit("/x-synthetic")
        ).alias("mime"),
        "width", "height", "duration_ms",
    )


MEDIA_SUMMARY_SQL = f"""
WITH media AS ({MEDIA_FROM_PART_SQL})
SELECT kind, count(*) AS n_media,
       CAST(sum(strlen(payload_str)) AS BIGINT) AS total_bytes,
       round(avg(CASE WHEN kind = 'video'
                      THEN greatest(1, duration_ms // 500)
                      ELSE 1 END), 6) AS avg_frames,
       count(DISTINCT payload_str) AS distinct_payloads
FROM media
GROUP BY kind
ORDER BY kind
"""


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
