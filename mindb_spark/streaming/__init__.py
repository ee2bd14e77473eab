from mindb_spark.streaming.ingest import (
    run_stream_to_memory,
    stream_ingest_vectors,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "stream_ingest_vectors",
    "streaming_dedup",
    "windowed_event_counts",
    "run_stream_to_memory",
]
