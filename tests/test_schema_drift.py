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


# --------------------------------------------------------- embeddings drift
def _write_embeddings(path: str, elem_type, id_type) -> str:
    os.makedirs(path, exist_ok=True)
    vecs = [[float(i) + j / 10.0 for j in range(4)] for i in range(6)]
    t = pa.table(
        {
            "vec_id": pa.array(list(range(6)), id_type),
            "embedding": pa.array(vecs, pa.list_(elem_type)),
            "label": pa.array([i % 3 for i in range(6)], pa.int32()),
        }
    )
    pq.write_table(t, f"{path}/embeddings.parquet")
    return path


@pytest.mark.parametrize(
    "elem,idt",
    [
        (pa.float32(), pa.int64()),   # shipped shape today
        (pa.float64(), pa.int64()),   # element-width drift
        (pa.float32(), pa.int32()),   # id-width drift
    ],
    ids=["f32-i64", "f64-i64", "f32-i32"],
)
def test_vector_paths_tolerate_embedding_dtype_drift(spark, tmpdir, elem, idt):
    """Every vector path casts to double at the expression level, so the
    parquet element width must not matter: normalization, exact kNN, and
    the SQ8 grid all produce identical results for f32 vs f64 files."""
    _write_embeddings(tmpdir, elem, idt)
    emb = spark.read.parquet(f"{tmpdir}/embeddings.parquet")

    from mindb_spark.functions.vector import l2_normalize
    from mindb_spark.index.sq import encode_query, sq_encode, sq_train
    from mindb_spark.operators.topk import knn_batch

    norm = emb.select("vec_id", l2_normalize("embedding", "double").alias("vector"))
    q = [float(x) for x in emb.where(F.col("vec_id") == 2).first().embedding]
    top = knn_batch(norm, [(0, q)], k=3, id_col="vec_id").collect()
    assert [r.vec_id for r in top][0] == 2  # self-hit first

    vdf = emb.select("vec_id", F.col("embedding").alias("vector"))
    mins, maxs = sq_train(vdf)
    codes = {r.vec_id: list(r.codes) for r in sq_encode(vdf, mins, maxs).collect()}
    assert codes[2] == encode_query(q, mins, maxs)


def test_documents_extra_and_absent_columns_are_ignored(spark, tmpdir):
    """Corpus operators reference (doc_id, text) only — regenerated
    documents files with extra columns or without n_chars must not break
    dedup / contamination / bm25."""
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma delta", "alpha beta gamma delta", "other words here now"]),
            "brand_new_col": pa.array([1, 2, 3], pa.int64()),  # future drift
        }
    )
    pq.write_table(t, f"{tmpdir}/documents.parquet")
    docs = spark.read.parquet(f"{tmpdir}/documents.parquet")

    from mindb_spark.operators.corpus import incremental_dedup, ngram_contamination
    from mindb_spark.operators.dedup import dedup_exact
    from mindb_spark.operators.search import bm25_scores

    assert dedup_exact(docs).count() == 2
    out = ngram_contamination(
        docs.where(F.col("doc_id") > 0), docs.where(F.col("doc_id") == 0), k=3
    ).collect()
    assert {r.doc_id for r in out} == {1, 2}
    assert bm25_scores(docs, ["alpha"]).count() == 2
    st = {r.doc_id: r.status for r in incremental_dedup(
        docs.where(F.col("doc_id") < 2), docs.where(F.col("doc_id") >= 2)).collect()}
    assert st == {2: "novel"}
