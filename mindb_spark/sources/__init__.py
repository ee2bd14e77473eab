from mindb_spark.sources.readers import (
    ingest_file,
    read_vectors_csv,
    read_vectors_json,
    read_vectors_parquet,
)

__all__ = [
    "ingest_file",
    "read_vectors_csv",
    "read_vectors_json",
    "read_vectors_parquet",
]
