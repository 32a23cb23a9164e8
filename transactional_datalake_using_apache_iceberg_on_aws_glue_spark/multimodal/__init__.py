"""Multimodal column plumbing (build brief M4).

Images/audio/video ride through the lake as opaque ``binary`` columns
with typed metadata structs. The Spark-side machinery — schemas,
partition-aware batching, Arrow-batched Pandas-UDF signatures — is real
and tested; the actual codec calls are stubbed (image/audio libraries
are not in this environment) behind deterministic fakes or
NotImplementedError, clearly marked.
"""

from .media import (
    IMAGE_META_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_images,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_META_SCHEMA",
    "attach_fake_media",
    "decode_images",
    "extract_image_features",
    "sample_video_frames",
]
