"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The container has no codec libraries, so the decode step is STUBBED:
``decode`` functions raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by
the content hash) produces correctly-shaped output. Everything
Spark-side is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` iterator plumbing, partition sizing — swapping the stub
for PIL/ffmpeg is a one-function change on the executors.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_image_features",
    "resize_images",
    "sample_video_frames",
]

# canonical media column group: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_table(spark, df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Normalize an arbitrary table into the canonical media schema,
    treating ``payload_col`` (string or binary) as the opaque content."""
    payload = F.col(payload_col)
    content = payload.cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit(mime).alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake feature vector seeded by the content hash —
    stands in for a real image/audio model embedding."""
    digest = hashlib.sha256(content or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    out_dim: int = 32,
    fake: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode → feature-extract each media payload into an
    array<float> column via ``mapInPandas``.

    Real pipeline shape: Arrow batches of (media_id, content) stream
    through the Python worker; the decoder releases each batch before
    pulling the next, so executor memory is bounded by batch size, not
    partition size — the pattern that survives 100 TB of images.

    ``fake=False`` raises NotImplementedError at executor time (no
    codec libs in this container); ``fake=True`` runs the deterministic
    stub end-to-end.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec library (PIL/opencv) on the "
                    "executors; run with fake=True for the deterministic stub"
                )
            feats = [
                _fake_decode(bytes(c) if c is not None else b"", out_dim).tolist()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "features": feats,
                }
            )

    return df.select("media_id", "mime", "content").mapInPandas(_decode, out_schema)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize each image payload; output keeps the media schema with
    updated meta. Stubbed decode (see module docstring)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires a codec library on the executors; "
                    "run with fake=True for the deterministic stub"
                )
            # stub: deterministic truncation/padding of the payload to
            # width*height bytes — preserves the real dataflow shape
            target = width * height
            out = []
            for c in pdf["content"]:
                b = bytes(c) if c is not None else b""
                out.append((b * (target // max(len(b), 1) + 1))[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "content", "mime").mapInPandas(_resize, out_schema)


def sample_video_frames(
    df: DataFrame, every_n: int = 10, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Sample frames from video payloads: one output row per sampled
    frame (media_id, frame_index, frame binary). Stubbed decode."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg on the executors; "
                    "run with fake=True for the deterministic stub"
                )
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                b = bytes(c) if c is not None else b""
                # stub: treat every 64-byte slice as one "frame"
                n_frames = max(len(b) // 64, 1)
                for j, fi in enumerate(range(0, n_frames, every_n)):
                    if j >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * 64 : (fi + 1) * 64])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.select("media_id", "content").mapInPandas(_sample, out_schema)
