from mindb_spark.multimodal.columns import (
    binary_metadata,
    audio_container_meta,
    video_container_meta,
    decode_audio,
    decode_images,
    resample_audio,
    resize_images,
    sample_frames,
    sniff_mime,
)

__all__ = [
    "binary_metadata",
    "audio_container_meta",
    "video_container_meta",
    "decode_audio",
    "decode_images",
    "resample_audio",
    "resize_images",
    "sample_frames",
    "sniff_mime",
]
