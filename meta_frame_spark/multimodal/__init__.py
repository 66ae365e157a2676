"""Multimodal (image/audio/video) column support.

No equivalent exists in the reference (`/root/reference` is scalar-only,
SURVEY.md §1.1); this package supplies the training-data-pipeline side:
opaque ``binary`` payloads + typed metadata structs, with decode /
feature-extract / resize / frame-sample implemented as Arrow-batched
``mapInPandas`` stages (the containers have no image/audio codec libs,
so decoding is a clearly-marked deterministic byte-interpretation fake;
real-codec hooks are gated behind import-try).
"""

from meta_frame_spark.multimodal.assets import (
    ASSET_FIELDS,
    attach_fake_image_assets,
    audio_window_rms,
    byte_stats,
    decode_pixels,
    frame_dedup_stats,
    image_ahash,
    image_pixel_stats,
    phash_dup_groups,
    resize_pixel_stats,
    sample_frames,
)

__all__ = [
    "ASSET_FIELDS",
    "attach_fake_image_assets",
    "audio_window_rms",
    "byte_stats",
    "decode_pixels",
    "frame_dedup_stats",
    "image_ahash",
    "image_pixel_stats",
    "phash_dup_groups",
    "resize_pixel_stats",
    "sample_frames",
]
