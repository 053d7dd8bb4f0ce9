from .binary_ops import (
    attach_media_metadata,
    decode_audio,
    decode_image,
    decode_image_stub,
    extract_audio_features,
    extract_resized_features,
    extract_image_features,
    resize_image,
    sample_video_frames,
)

__all__ = [
    "attach_media_metadata",
    "decode_audio",
    "decode_image",
    "decode_image_stub",
    "extract_audio_features",
    "extract_resized_features",
    "extract_image_features",
    "resize_image",
    "sample_video_frames",
]
