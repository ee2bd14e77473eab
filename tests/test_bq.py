"""Binary quantization (index/bq.py): packing exactness, Hamming search,
rerank quality vs exact kNN."""

from __future__ import annotations

import numpy as np
import pytest

from mindb_spark.index import bq


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_encode_matches_python_packing(spark, emb):
    rows = emb.limit(20).collect()
    enc = {
        r.vec_id: (r.bq_w0, r.bq_w1)
        for r in bq.bq_encode(emb.limit(20), dim=64).collect()
    }
    for r in rows:
        exp = bq.encode_query(list(r.embedding), 64)
        assert list(enc[r.vec_id]) == exp, r.vec_id


def test_word_count_and_range(spark, emb):
    enc = bq.bq_encode(emb, dim=64)
    assert [c for c in enc.columns if c.startswith("bq_w")] == ["bq_w0", "bq_w1"]
    stats = enc.selectExpr(
        "min(bq_w0) a", "max(bq_w0) b", "min(bq_w1) c", "max(bq_w1) d"
    ).first()
    for v in stats:
        assert 0 <= v < (1 << 32)  # 32-bit words, never negative


def test_hamming_zero_for_self(spark, emb):
    row = emb.limit(1).collect()[0]
    enc = bq.bq_encode(emb, dim=64)
    out = bq.bq_knn(
        enc, emb, [(int(row.vec_id), list(row.embedding))], dim=64, k=1, rerank=5
    ).collect()
    assert out[0].vec_id == row.vec_id  # self is its own nearest
    assert out[0].score == pytest.approx(1.0, abs=1e-9)


def test_recall_vs_exact(spark, emb):
    """BQ top-10 after rerank must recover most of the exact top-10."""
    corpus = emb.collect()
    ids = np.array([r.vec_id for r in corpus])
    mat = np.array([r.embedding for r in corpus], dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(3)
    q_idx = rng.integers(0, len(ids), size=8)
    queries = [(int(i), mat[q_idx[i]].tolist()) for i in range(8)]

    enc = bq.bq_encode(emb, dim=64)
    got = bq.bq_knn(enc, emb, queries, dim=64, k=10, rerank=100).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)

    qn = matn[q_idx]
    truth = np.argsort(-(matn @ qn.T), axis=0)[:10].T
    recalls = [
        len(by_q[i] & set(ids[truth[i]].tolist())) / 10 for i in range(8)
    ]
    assert float(np.mean(recalls)) >= 0.8, recalls


def test_declarative_plan_stage1_is_codegen_no_python(spark, emb):
    enc = bq.bq_encode(emb, dim=64).localCheckpoint()
    row = emb.limit(1).collect()[0]
    out = bq.bq_knn(
        enc, emb, [(0, list(row.embedding))], dim=64, k=5, rerank=20, partial=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_partial_scale_path_is_bit_identical(spark, emb):
    """The Arrow partial-top-R stage-1 cut must reproduce the declarative
    path exactly, ties included (composite-key order == (hamming, id))."""
    enc = bq.bq_encode(emb, dim=64).localCheckpoint()
    rows = emb.limit(3).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in rows]

    def canon(df):
        return sorted(
            (r.query_id, r.vec_id, round(r.score, 9)) for r in df.collect()
        )

    a = canon(bq.bq_knn(enc, emb, queries, dim=64, k=10, rerank=30, partial=True))
    b = canon(bq.bq_knn(enc, emb, queries, dim=64, k=10, rerank=30, partial=False))
    assert a == b
    assert len(a) == 30  # 3 queries x k=10


def test_nan_dims_encode_identically(spark):
    """Spark SQL's ``NaN > 0`` is true while Python's is false; the
    isnan guard keeps bq_encode and encode_query bit-identical (NaN
    dims leave the bit unset on both paths)."""
    vec = [1.0, -1.0, float("nan"), 0.5] + [0.0] * 60
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    row = bq.bq_encode(df, 64).first()
    assert [row.bq_w0, row.bq_w1] == bq.encode_query(vec, 64)


def test_partial_topk_rejects_out_of_range_ids(spark, emb):
    """The stage-1 composite key is (hamming, id)-order-equivalent only
    for ids in [0, 2**44); out-of-range ids must fail loudly."""
    bad = emb.limit(5).selectExpr(
        "vec_id + cast(pow(2, 44) as long) as vec_id", "embedding"
    )
    enc = bq.bq_encode(bad, 64)
    q = [(0, [1.0] * 64)]
    with pytest.raises(Exception, match=r"2\*\*44"):
        bq.bq_knn(enc, bad, q, 64, k=2, rerank=3).collect()
