from .multimodal import (
    MEDIA_SCHEMA,
    decode_image_batch,
    extract_image_features,
    frame_sample,
    make_media_table,
    resize_images,
)
from .retry import retry_with_backoff

__all__ = [
    "MEDIA_SCHEMA",
    "decode_image_batch",
    "extract_image_features",
    "frame_sample",
    "make_media_table",
    "resize_images",
    "retry_with_backoff",
]
