from .binary_ops import (
    attach_media_metadata,
    decode_image,
    decode_image_stub,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "attach_media_metadata",
    "decode_image",
    "decode_image_stub",
    "extract_image_features",
    "sample_video_frames",
]
