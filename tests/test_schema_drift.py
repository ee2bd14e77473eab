"""Driver-data drift robustness: the events loader must accept every ts
physical shape the testdata generator has shipped (int64 epoch-nanos and
timestamp[us]) and produce identical TimestampType instants.

Round-2 postmortem: a testdata regeneration flipped ts from nanos-as-long
to timestamp[us] and a dtype-assuming loader took down 5 correctness rows
and the whole bench. This pins the contract.
"""

import datetime
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from mindb_spark.sources import normalize_ts, read_events

EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_003_600_000_000]


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="drift_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_events(path: str, ts_array: pa.Array) -> str:
    os.makedirs(path, exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["click", "error", "click"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(t, f"{path}/events.parquet")
    return path


def _load_epochs(spark, sf_dir: str) -> list[int]:
    ev = read_events(spark, sf_dir)
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    rows = ev.orderBy("event_id").select(
        (F.unix_timestamp("ts") * 1_000_000
         + F.date_format("ts", "SSSSSS").cast("long")).alias("us")
    ).collect()
    return [r.us for r in rows]


def test_read_events_timestamp_us(spark, tmpdir):
    d = _write_events(
        os.path.join(tmpdir, "us"), pa.array(EPOCH_US, pa.timestamp("us"))
    )
    assert _load_epochs(spark, d) == EPOCH_US


def test_read_events_int64_nanos(spark, tmpdir):
    d = _write_events(
        os.path.join(tmpdir, "ns"),
        pa.array([v * 1000 for v in EPOCH_US], pa.int64()),
    )
    assert _load_epochs(spark, d) == EPOCH_US


def test_read_events_timestamp_nanos_physical(spark, tmpdir):
    # TIMESTAMP(NANOS) physical — only readable via nanosAsLong
    d = _write_events(
        os.path.join(tmpdir, "nsp"),
        pa.array([v * 1000 for v in EPOCH_US], pa.timestamp("ns")),
    )
    assert _load_epochs(spark, d) == EPOCH_US


def test_read_events_timestamp_tz(spark, tmpdir):
    d = _write_events(
        os.path.join(tmpdir, "tz"), pa.array(EPOCH_US, pa.timestamp("us", tz="UTC"))
    )
    assert _load_epochs(spark, d) == EPOCH_US


def test_both_shapes_agree_end_to_end(spark, tmpdir):
    """The sessionize-shaped pipeline gives identical output on both shapes."""
    from mindb_spark.operators.temporal import session_stats

    a = _write_events(os.path.join(tmpdir, "a"), pa.array(EPOCH_US, pa.timestamp("us")))
    b = _write_events(
        os.path.join(tmpdir, "b"), pa.array([v * 1000 for v in EPOCH_US], pa.int64())
    )
    out = []
    for d in (a, b):
        df = session_stats(read_events(spark, d), gap_seconds=1800)
        out.append(sorted(tuple(r) for r in df.collect()))
    assert out[0] == out[1]


def test_normalize_ts_rejects_unsupported(spark):
    df = spark.createDataFrame([(1, [1.0])], "event_id long, ts array<double>")
    with pytest.raises(TypeError, match="unsupported dtype"):
        normalize_ts(df)
