"""Vector-data source readers: parquet / CSV / JSON -> canonical schema.

The reference ingests only via its Python API (clients load pickles/Arrow
themselves — e.g. its wikipedia example notebook loads client-side and
POSTs batches). A Spark engine ingests files directly; these readers map
common on-disk layouts to the canonical ``(vector array<double>,
metadata string)`` shape that ``VectorDB.add_dataframe`` consumes, keeping
the scan declarative so Catalyst prunes and pushes down.

- parquet: vector already an array column — a projection, nothing more.
- CSV: vectors as delimited strings ("0.1|0.2|...") — split + cast, all
  JVM expressions.
- JSON (jsonl): vector as a JSON array — native array read.

Each reader validates dimensional consistency the same batch-atomic way
the engine's add() does: one aggregate pass; any ragged row fails the
whole read (reference semantic: ``mindb.py:175-178``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mindb_spark.core import validation as V


def _canonical(
    df: DataFrame, vector_expr, metadata_cols: list[str], validate: bool
) -> DataFrame:
    meta = (
        F.to_json(F.struct(*[F.col(c) for c in metadata_cols]))
        if metadata_cols
        else F.lit("{}")
    )
    out = df.select(vector_expr.alias("vector"), meta.alias("metadata"))
    if validate:
        dims = out.select(F.size("vector").alias("d")).agg(
            F.min("d").alias("lo"), F.max("d").alias("hi")
        ).first()
        if dims.lo is None:
            return out
        if dims.lo != dims.hi:
            raise V.ValidationError(
                f"inconsistent vector dimensions in source: {dims.lo} != {dims.hi}"
            )
        if dims.lo == 0:
            raise V.ValidationError("source contains empty vectors")
    return out


def read_vectors_parquet(
    spark: SparkSession,
    path: str,
    vector_col: str = "vector",
    metadata_cols: list[str] | None = None,
    validate: bool = True,
) -> DataFrame:
    """Parquet with a native array vector column (the fast path: columnar
    scan, column pruning — only the projected columns are read)."""
    df = spark.read.parquet(path)
    return _canonical(
        df, F.col(vector_col).cast("array<double>"), metadata_cols or [], validate
    )


def read_vectors_csv(
    spark: SparkSession,
    path: str,
    vector_col: str = "vector",
    delimiter: str = "|",
    metadata_cols: list[str] | None = None,
    header: bool = True,
    validate: bool = True,
) -> DataFrame:
    """CSV with the vector packed as a delimited string per row."""
    df = spark.read.option("header", str(header).lower()).csv(path)
    vec = F.transform(
        F.split(F.col(vector_col), F.lit("\\" + delimiter) if delimiter in ".|^$*+?" else F.lit(delimiter)),
        lambda x: x.cast("double"),
    )
    return _canonical(df, vec, metadata_cols or [], validate)


def read_vectors_json(
    spark: SparkSession,
    path: str,
    vector_col: str = "vector",
    metadata_cols: list[str] | None = None,
    validate: bool = True,
) -> DataFrame:
    """JSON-lines with the vector as a native JSON array."""
    df = spark.read.json(path)
    return _canonical(
        df, F.col(vector_col).cast("array<double>"), metadata_cols or [], validate
    )


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Schema-drift-tolerant event-time normalization to TimestampType.

    The harness testdata has shipped ``events.ts`` in two physical shapes
    across regenerations: int64 epoch-nanos (parquet TIMESTAMP(NANOS),
    readable only via ``spark.sql.legacy.parquet.nanosAsLong``) and
    ``timestamp[us]`` (surfacing as TIMESTAMP_NTZ). Branch on the *read*
    schema so both — plus plain TIMESTAMP, DATE and ISO strings — load
    identically. Pure column expressions, so it composes with both batch
    and streaming relations.

    NTZ wall-clock is interpreted as UTC (callers pin the session timezone)
    so epoch values agree with engines that treat naive timestamps as UTC.
    """
    from pyspark.sql.types import (
        DateType,
        LongType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return df
    if isinstance(dt, (TimestampNTZType, DateType, StringType)):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(dt, LongType):
        # int64 nanos: integer division — routing through a double would
        # drop precision (53-bit mantissa < ~61 bits of 2024-epoch nanos)
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    raise TypeError(f"unsupported dtype for event-time column {col!r}: {dt}")


def read_events(
    spark: SparkSession,
    sf_dir: str,
    ts_col: str = "ts",
    pin_session_utc: bool = True,
) -> DataFrame:
    """Load ``events.parquet`` with a normalized TimestampType ``ts``.

    SESSION-WIDE side effects, deliberate and documented: enables
    ``nanosAsLong`` (required at read time for the TIMESTAMP(NANOS)
    physical shape; inert otherwise) and — unless ``pin_session_utc`` is
    False — pins the session timezone to UTC so NTZ wall-clock and
    ``unix_timestamp`` round-trips are deterministic regardless of host
    TZ (the correctness-harness contract). Callers embedding this in an
    application with its own timezone discipline should pass
    ``pin_session_utc=False`` and manage the conf themselves.
    """
    if pin_session_utc:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"), ts_col)


def ingest_file(
    db,
    path: str,
    fmt: str = "parquet",
    vector_col: str = "vector",
    metadata_cols: list[str] | None = None,
    **reader_kwargs,
) -> int:
    """One-call file -> VectorDB ingest. Returns rows added."""
    readers = {
        "parquet": read_vectors_parquet,
        "csv": read_vectors_csv,
        "json": read_vectors_json,
    }
    if fmt not in readers:
        raise V.ValidationError(f"unsupported source format: {fmt!r}")
    df = readers[fmt](
        db.spark, path, vector_col=vector_col, metadata_cols=metadata_cols, **reader_kwargs
    )
    return db.add_dataframe(
        df, vector_col="vector", metadata_col="metadata", metadata_is_json=True
    )
