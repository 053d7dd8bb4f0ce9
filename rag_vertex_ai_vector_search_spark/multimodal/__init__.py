from .binary_ops import (
    attach_media_metadata,
    decode_audio,
    decode_image,
    decode_image_stub,
    extract_audio_features,
    extract_audio_spectral_features,
    extract_gif_frame_features,
    extract_resized_features,
    extract_image_features,
    extract_video_frame_features,
    resize_image,
    sample_video_frames,
)
from .flac import (
    decode_flac,
    encode_flac,
)
from .gif import (
    decode_gif,
    encode_gif,
    iter_gif_frames,
    probe_gif,
)
from .jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)
from .mjpeg import (
    decode_video_frame,
    decode_video_frames,
    encode_mjpeg_avi,
    probe_mjpeg_avi,
)

__all__ = [
    "attach_media_metadata",
    "decode_audio",
    "decode_image",
    "decode_image_stub",
    "decode_flac",
    "encode_flac",
    "decode_gif",
    "decode_jpeg_baseline",
    "encode_gif",
    "iter_gif_frames",
    "probe_gif",
    "decode_video_frame",
    "decode_video_frames",
    "encode_jpeg_baseline",
    "encode_jpeg_progressive",
    "encode_mjpeg_avi",
    "extract_audio_features",
    "extract_audio_spectral_features",
    "extract_gif_frame_features",
    "extract_resized_features",
    "extract_image_features",
    "extract_video_frame_features",
    "probe_mjpeg_avi",
    "resize_image",
    "sample_video_frames",
]
