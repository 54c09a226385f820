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
    "default_image_decoder",
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


def _image_codec():
    """Best available image codec module: ('pil', PIL.Image), ('cv2', cv2),
    or None. Import is attempted once per process and cached."""
    global _IMAGE_CODEC
    if _IMAGE_CODEC is _UNSET:
        try:
            from PIL import Image  # noqa: PLC0415

            _IMAGE_CODEC = ("pil", Image)
        except ImportError:
            try:
                import cv2  # noqa: PLC0415

                _IMAGE_CODEC = ("cv2", cv2)
            except ImportError:
                _IMAGE_CODEC = None
    return _IMAGE_CODEC


_UNSET = object()
_IMAGE_CODEC = _UNSET


def real_image_decoder(payload: bytes) -> dict:
    """Actual image decode, capability-gated: uses PIL if installed, else
    OpenCV, else raises. Output shape matches ``fake_image_decoder``
    (width/height plus an 8-bin L1-normalized grayscale histogram as the
    'embedding'), so the two decoders are drop-in interchangeable; the
    oracle-gated driver path stays pinned to the deterministic fake."""
    codec = _image_codec()
    if codec is None:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, which are not installed; "
            "pass decoder=fake_image_decoder for the deterministic test path"
        )
    kind, mod = codec
    if kind == "pil":
        import io  # noqa: PLC0415

        im = mod.open(io.BytesIO(payload))
        width, height = im.size
        hist256 = im.convert("L").histogram()
        hist = [float(sum(hist256[i * 32 : (i + 1) * 32])) for i in range(8)]
    else:  # cv2
        import numpy as np  # noqa: PLC0415

        img = mod.imdecode(
            np.frombuffer(payload, dtype=np.uint8), mod.IMREAD_GRAYSCALE
        )
        if img is None:
            raise ValueError("cv2 could not decode payload")
        height, width = img.shape[:2]
        counts, _edges = np.histogram(img, bins=8, range=(0, 256))
        hist = [float(c) for c in counts]
    s = sum(hist) or 1.0
    return {
        "width": int(width),
        "height": int(height),
        "feature": [h / s for h in hist],
    }


def default_image_decoder() -> Callable[[bytes], dict]:
    """The decoder ``extract_features`` uses when none is passed: the real
    codec when one is installed, the deterministic fake otherwise."""
    return real_image_decoder if _image_codec() is not None else fake_image_decoder


def extract_features(
    media: DataFrame,
    decoder: Optional[Callable[[bytes], dict]] = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (no shuffle).

    The decoder runs once per row inside Arrow-batched partitions; output
    drops the payload so everything downstream is cheap to move. With no
    ``decoder`` the capability-gated default applies (real codec when
    PIL/opencv is installed, deterministic fake otherwise); pass
    ``fake_image_decoder`` explicitly for oracle-pinned results.
    """
    if decoder is None:
        decoder = default_image_decoder()

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
                if not payload:
                    # NULL/empty media yields ZERO frames — fabricating one
                    # empty frame inflated downstream frame counts and
                    # contradicted extract_features' NULL propagation
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out.append(
                        (row.media_id, i, payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame_payload"])

    return media.select("media_id", "payload").mapInPandas(run, schema=frame_schema)
