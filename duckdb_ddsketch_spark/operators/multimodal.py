"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The engine treats media as ``binary`` payload columns plus typed metadata
(the lakehouse-standard layout). The Spark-side machinery here is real and
tested — schemas, Arrow batch shapes, ``mapInPandas`` partition streaming,
partition sizing — while the actual codecs (PIL/librosa/ffmpeg) are not in
this container, so the decode kernels are deterministic fakes behind
``decoder=`` hooks, with the real implementations raising
``NotImplementedError`` where a codec would be invoked.

Scale notes: media rows are large (MBs); the operators below never shuffle
payload bytes — feature extraction is mapInPandas (no shuffle), and any
aggregation happens after projecting payloads away. ``media_repartition``
exists because the right parallelism unit for media is bytes, not rows:
it targets ``spark.sql.files.maxPartitionBytes``-sized partitions using the
metadata size column, without scanning payloads.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "as_media",
    "media_repartition",
    "extract_features",
    "sample_frames",
    "fake_image_decoder",
    "real_image_decoder",
]

# canonical media row: payload + typed metadata (mirrors common lakehouse
# multimodal table layouts)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def as_media(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Normalize an arbitrary binary column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
    )


def media_repartition(df: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Partition media rows by payload *bytes*, not row count.

    Uses the n_bytes metadata column to derive the partition count, so a mix
    of thumbnails and videos still yields even task sizes. At cluster scale
    replace the driver-side sum with a sampled estimate or table statistics.
    """
    total = df.agg(F.sum("n_bytes")).first()[0] or 0
    parts = max(1, int(total // target_bytes) + 1)
    return df.repartition(parts)


def fake_image_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for an image codec (STUB — see module doc).

    Derives pseudo width/height/features from payload bytes so tests can pin
    exact outputs. Replace with ``real_image_decoder`` when PIL exists.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    # 8-dim 'embedding': byte histogram folded mod 8, L1-normalized
    hist = [0.0] * 8
    for b in payload[:4096]:
        hist[b % 8] += 1.0
    s = sum(hist) or 1.0
    return {
        "width": width,
        "height": height,
        "feature": [h / s for h in hist],
    }


def real_image_decoder(payload: bytes) -> dict:  # pragma: no cover
    """Actual codec hook — not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, which are not installed; "
        "pass decoder=fake_image_decoder for the deterministic test path"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict] = fake_image_decoder,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (no shuffle).

    The decoder runs once per row inside Arrow-batched partitions; output
    drops the payload so everything downstream is cheap to move.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload
                if payload is None:
                    out.append((row.media_id, row.modality, row.n_bytes, None, None, None))
                    continue
                d = decoder(bytes(payload))
                out.append(
                    (
                        row.media_id,
                        row.modality,
                        row.n_bytes,
                        d.get("width"),
                        d.get("height"),
                        d.get("feature"),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "modality",
                    "n_bytes",
                    "width",
                    "height",
                    "feature",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id, frame_no,
    frame_payload) rows. The slicing here is byte-striding (STUB for real
    keyframe extraction); the explode/flatMap shape and schema are the real
    design — one output row per frame, payload column stays binary.
    """
    frame_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out.append(
                        (row.media_id, i, payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame_payload"])

    return media.select("media_id", "payload").mapInPandas(run, schema=frame_schema)
