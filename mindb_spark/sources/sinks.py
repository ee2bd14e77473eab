"""Layout-aware batch sinks.

The write-side twin of ``readers.py``: what decides scan cost at 100 TB is
the LAYOUT chosen at write time — partition directories prune whole
subtrees, and sorting rows inside each file tightens parquet row-group
min/max stats so predicate pushdown skips pages without reading them.
The reference persists through LMDB puts (``mindb/utils/lmdb_utils.py``);
here persistence IS the table layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

_FORMATS = ("parquet", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a table with an explicit, scan-friendly layout.

    - ``partition_by``: hive-style directory partitioning — equality and
      IN filters on these columns prune entire directories at plan time
      (shows up as ``PartitionFilters`` in the scan). The frame is
      repartitioned on these columns first so each partition directory is
      written by the tasks that own its rows (no small-file spray where
      every task writes a sliver of every partition).
    - ``sort_by``: ``sortWithinPartitions`` before the write — parquet
      row-group min/max stats over a sorted file are tight, so range
      predicates on these columns skip row groups instead of scanning
      them. A local sort only; no global ordering, no extra shuffle
      beyond the partition_by clustering.
    - ``max_records_per_file``: bounds file size (compaction lever).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported sink format: {fmt!r} (use {_FORMATS})")
    out = df
    if partition_by:
        out = out.repartition(*[out[c] for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)
