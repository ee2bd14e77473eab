from mindb_spark.multimodal.columns import (
    binary_metadata,
    decode_images,
    resize_images,
    sample_frames,
    sniff_mime,
)

__all__ = [
    "binary_metadata",
    "decode_images",
    "resize_images",
    "sample_frames",
    "sniff_mime",
]
