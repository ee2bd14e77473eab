from mindb_spark.sources.readers import (
    ingest_file,
    normalize_ts,
    read_events,
    read_vectors_csv,
    read_vectors_json,
    read_vectors_parquet,
)

__all__ = [
    "ingest_file",
    "normalize_ts",
    "read_events",
    "read_vectors_csv",
    "read_vectors_json",
    "read_vectors_parquet",
]
