"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested -- schemas, Arrow batch
shapes, mapInPandas signatures, partitioning -- while the actual codec
work is stubbed deterministically (image/audio libraries are not in
this container). Swapping ``_decode`` for PIL/ffmpeg is a one-function
change; nothing about the distributed plan moves.

Source pattern at scale: ``spark.read.format("binaryFile")`` yields
(path, modificationTime, length, content: binary); media sits in the
``content`` column and flows through these operators. Binary columns
ride Arrow buffers -- no base64, no row-at-a-time pickling.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, content binary, "
    "width int, height int, n_frames int"
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns every media row carries: size + sha256.

    Pure JVM expressions -- the cheap pass that runs on all 100 TB;
    decode only runs on the (filtered) subset that needs it.
    """
    return df.withColumn("media_bytes", F.length(F.col(content_col))).withColumn(
        "media_sha256", F.sha2(F.col(content_col), 256)
    )


def decode_image_stub(content: bytes) -> np.ndarray:
    """STUB decode: a real implementation returns the pixel array via
    PIL/opencv. The stub derives a deterministic 8x8 grayscale 'image'
    from the byte hash so plumbing tests have stable golden values.
    """
    digest = hashlib.sha256(content or b"").digest()
    vals = np.frombuffer((digest * 2)[:64], dtype=np.uint8)
    return vals.reshape(8, 8)


def extract_image_features(
    df: DataFrame, content_col: str = "content", feature_dim: int = 16
) -> DataFrame:
    """mapInPandas feature extraction over binary image columns.

    Batch shape: one Arrow batch in, same rows out + ``features``
    array<float>. A real model slots into ``_featurize`` unchanged.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf[content_col]:
                img = decode_image_stub(bytes(content) if content is not None else b"")
                flat = img.astype(np.float64).ravel()
                # Deterministic pooled 'feature': strided means.
                pooled = flat[: (64 // feature_dim) * feature_dim].reshape(
                    feature_dim, -1
                ).mean(axis=1)
                norm = np.linalg.norm(pooled)
                feats.append((pooled / norm if norm else pooled).astype(np.float32))
            yield pdf.assign(features=feats)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<float>"
    return df.mapInPandas(_featurize, out_schema)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    n_frames_col: str = "n_frames",
    every_k: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing: explode each video row into frame rows.

    Frame indices are computed JVM-side (sequence + explode); only the
    per-frame decode would call into a codec.

    raises NotImplementedError from the decode UDF if actually decoded
    -- the plumbing (explode fan-out, index arithmetic) is the tested
    part.
    """
    frames = df.withColumn(
        "frame_index",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                F.lit(every_k),
            )
        ),
    )

    @F.udf("binary")
    def decode_frame(content, frame_index):  # pragma: no cover - stub
        raise NotImplementedError(
            "frame decode requires a codec library not present in this image"
        )

    return frames.withColumn(
        "frame_ref",
        F.concat_ws(":", F.sha2(F.col(content_col), 256), F.col("frame_index")),
    )
