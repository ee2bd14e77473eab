"""Covering codes table + fused small-Q rescore path.

The reference keeps full-precision vectors in Faiss RAM next to the
pickled store (``mindb/mindb.py``) — its rerank never re-reads the data
file. The Spark-native counterpart is a COVERING index: ``train(
covering=True)`` stores (vector, metadata) beside each PQ code, and
small query batches exact-rerank inside the pruned stage-1 scan
(``ivf.search`` fused path) instead of re-scanning the whole data table.
These tests pin: the on-disk schema, bit-exact equality between the
fused and the classic two-stage path, tail handling, the post-remove
fallback (dead codes rows must never resurface), and the covering
``index_tail`` append.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.core.database import VectorDB

N, D, K = 6000, 16, 12


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    centers = rng.normal(size=(K, D)) * 3.0
    mat = (centers[rng.integers(0, K, N)] + rng.normal(size=(N, D))).astype(
        np.float32
    )
    return mat


@pytest.fixture(scope="module")
def cov_db(spark, tmp_path_factory, corpus):
    base = str(tmp_path_factory.mktemp("covdb"))
    db = VectorDB(spark, "cov", base_path=base)
    df = spark.createDataFrame(
        [(row.tolist(), {"i": str(i)}) for i, row in enumerate(corpus)],
        "vector array<float>, meta map<string,string>",
    )
    db.add_dataframe(df, metadata_col="meta")
    db.train(covering=True, use_two_level_clustering=False)
    assert db.is_trained
    return db


def _norm(mat):
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def test_codes_table_is_covering(spark, cov_db):
    codes = spark.read.parquet(os.path.join(cov_db._index_dir, "codes"))
    assert "vector" in codes.columns and "metadata" in codes.columns
    assert cov_db._manifest["covering"] is True
    # the stored vector is the ingested (normalized) vector, verbatim
    row = codes.where(F.col("id") == 17).first()
    live = cov_db.vectors().where(F.col("id") == 17).first()
    assert row["vector"] == live["vector"]


def test_fused_matches_twostage_bitexact(spark, cov_db, corpus):
    """Fused rescore-from-codes == classic two-stage: same (query_id, id)
    sets AND exactly equal scores (same float64 einsum on the same
    stored values)."""
    from mindb_spark.index import ivf
    from mindb_spark.index.build import IndexArtifacts

    codes = spark.read.parquet(os.path.join(cov_db._index_dir, "codes"))
    artifacts = IndexArtifacts.load(
        os.path.join(cov_db._index_dir, "artifacts.npz")
    )
    qn = _norm(corpus[[5, 77, 123]].astype(np.float64))
    queries = [(i, qn[i]) for i in range(3)]
    kw = dict(
        preliminary_top_k=100, final_top_k=10,
        n_probe=cov_db.index_params["n_probe"],
        n_buckets=cov_db._manifest["n_buckets"],
        extra_cols=("metadata",),
    )
    fused = ivf.search(codes, cov_db.vectors(), artifacts, queries, **kw)
    assert "score" not in fused.columns  # public schema is the classic one
    classic = ivf.search(
        codes, cov_db.vectors(), artifacts, queries,
        rescore_from_codes=False, **kw,
    )
    fr = {(r.query_id, r.id): (r.cosine_similarity, r.metadata)
          for r in fused.collect()}
    cr = {(r.query_id, r.id): (r.cosine_similarity, r.metadata)
          for r in classic.collect()}
    assert fr.keys() == cr.keys() and len(fr) == 30
    for k in fr:
        assert fr[k][0] == cr[k][0], (k, fr[k], cr[k])  # bit-exact
        assert fr[k][1] == cr[k][1]
    # and the plan really skipped the data table: the only scanned
    # relation is the codes parquet (AQE prints the scan once per plan
    # section, so assert on paths, not occurrence counts)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "index/v1/codes" in plan
    assert "/cov/data" not in plan, plan


def test_db_query_fused_self_match(cov_db, corpus):
    res = cov_db.query(corpus[42].tolist(), preliminary_top_k=100,
                       final_top_k=5)
    assert res["ids"][0] == 42
    assert res["metadata"][0] == {"i": "42"}
    got = res["cosine_similarity"][0]
    assert got == pytest.approx(1.0, abs=1e-6)


def test_fused_tail_rows_surface(cov_db, corpus):
    """Rows added after training are exactly-searched and win the fused
    merge when they are the true nearest."""
    rng = np.random.default_rng(33)
    novel = rng.normal(size=D).astype(np.float32) * 9.0
    (new_id,) = cov_db.add([(novel.tolist(), {"tag": "tail"})])
    try:
        res = cov_db.query(novel.tolist(), preliminary_top_k=100,
                           final_top_k=3)
        assert res["ids"][0] == new_id
        assert res["metadata"][0] == {"tag": "tail"}
    finally:
        cov_db.remove([new_id])


def test_removed_rows_never_resurface(spark, tmp_path, corpus):
    """After remove(), the dead id still sits in the covering codes table
    — the DB must fall back to the two-stage path (inner join drops it)."""
    db = VectorDB(spark, "covrm", base_path=str(tmp_path))
    df = spark.createDataFrame(
        [(row.tolist(),) for row in corpus], "vector array<float>"
    )
    db.add_dataframe(df)
    db.train(covering=True, use_two_level_clustering=False)
    res = db.query(corpus[7].tolist(), preliminary_top_k=100, final_top_k=3)
    assert res["ids"][0] == 7
    db.remove([7])
    assert db._manifest["num_trained_vectors_removed"] == 1
    res2 = db.query(corpus[7].tolist(), preliminary_top_k=100, final_top_k=10)
    assert 7 not in res2["ids"]
    # the dead row is really still in the codes table (proving the
    # fallback, not a codes rewrite, is what hid it)
    codes = spark.read.parquet(os.path.join(db._index_dir, "codes"))
    assert codes.where(F.col("id") == 7).count() == 1


def test_index_tail_append_is_covering(spark, cov_db, corpus):
    """add(add_to_index=True) on a covering DB writes covering tail codes
    (vector + metadata present), keeping later fused reads whole."""
    rng = np.random.default_rng(44)
    vec = rng.normal(size=D).astype(np.float32)
    (nid,) = cov_db.add([(vec.tolist(), {"k": "tail-idx"})],
                        add_to_index=True)
    try:
        codes = spark.read.parquet(os.path.join(cov_db._index_dir, "codes"))
        row = codes.where(F.col("id") == nid).first()
        assert row is not None and row["vector"] is not None
        assert len(row["vector"]) == D
        # the id is now <= watermark: served by the FUSED path, exactly
        res = cov_db.query(vec.tolist(), preliminary_top_k=100, final_top_k=3)
        assert res["ids"][0] == nid
        assert res["metadata"][0] == {"k": "tail-idx"}
    finally:
        cov_db.remove([nid])
