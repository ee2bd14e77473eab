from mindb_spark.streaming.ingest import (
    interval_join_attribution,
    run_stream_to_memory,
    sessionized_event_stats,
    stream_ingest_vectors,
    stream_shuffle_partitions,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "interval_join_attribution",
    "sessionized_event_stats",
    "stream_ingest_vectors",
    "stream_shuffle_partitions",
    "streaming_dedup",
    "windowed_event_counts",
    "run_stream_to_memory",
]
