from mindb_spark.sources.readers import (
    ingest_file,
    normalize_ts,
    read_events,
    read_vectors_csv,
    read_vectors_json,
    read_vectors_parquet,
)
from mindb_spark.sources.sinks import write_table

__all__ = [
    "ingest_file",
    "normalize_ts",
    "read_events",
    "read_vectors_csv",
    "read_vectors_json",
    "read_vectors_parquet",
    "write_table",
]
