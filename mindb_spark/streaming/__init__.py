from mindb_spark.streaming.ingest import (
    run_stream_to_memory,
    sessionized_event_stats,
    stream_ingest_vectors,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "sessionized_event_stats",
    "stream_ingest_vectors",
    "streaming_dedup",
    "windowed_event_counts",
    "run_stream_to_memory",
]
