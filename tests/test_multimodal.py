"""Multimodal plumbing: binary columns, metadata, feature extraction,
frame sampling -- real distributed plan, stubbed codecs."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.multimodal import (
    attach_media_metadata,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG fake bytes 1"), 8, 8, 1),
        ("m2", "image", bytearray(b"\x89PNG other bytes"), 8, 8, 1),
        ("v1", "video", bytearray(b"\x00\x00ftyp fake mp4"), 64, 48, 95),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "width int, height int, n_frames int",
    )


def test_metadata_pass(media):
    out = attach_media_metadata(media).collect()
    assert all(r.media_bytes == len(r.content) for r in out)
    assert all(len(r.media_sha256) == 64 for r in out)


def test_image_features_deterministic(media):
    imgs = media.filter(F.col("media_type") == "image")
    a = {r.media_id: list(r.features) for r in extract_image_features(imgs).collect()}
    b = {r.media_id: list(r.features) for r in extract_image_features(imgs).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert a["m1"] != a["m2"]  # different bytes -> different features


def test_video_frame_sampling_fanout(media):
    vids = media.filter(F.col("media_type") == "video")
    frames = sample_video_frames(vids, every_k=10).collect()
    # 95 frames sampled every 10 -> indices 0,10,...,90 = 10 rows
    assert len(frames) == 10
    assert sorted(r.frame_index for r in frames) == list(range(0, 100, 10))
    assert all(":" in r.frame_ref for r in frames)
