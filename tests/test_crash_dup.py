"""Crash-dup insurance through the window-based dedup (round 6).

A codes append whose manifest save never landed can leave the same id
twice in the codes table; a tail append racing a query can put an id in
both stage-1 and the exact tail search. The old dropDuplicates shuffle
was replaced by row_number windows sharing the rank window's exchange —
these tests pin that a duplicated id still occupies exactly ONE
final_top_k slot on both the fused and the two-stage path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.core.heuristics import IndexParams
from mindb_spark.index import ivf
from mindb_spark.index.build import build_index

N, D = 400, 16


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(N, D))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return mat


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    vdf = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(corpus)],
        "id long, vector array<double>",
    ).localCheckpoint()
    idx = str(tmp_path_factory.mktemp("dupidx"))
    params = IndexParams(
        num_clusters=8, n_probe=8, pca_dimension=D, opq_dimension=None,
        compressed_vector_bytes=8, omit_opq=True,
    )
    arts, _ = build_index(vdf, params, idx, n_buckets=4, carry_cols=("vector",))
    codes = spark.read.parquet(f"{idx}/codes")
    return vdf, arts, codes


def _dup_codes(codes, victim: int):
    """Codes table with the victim id's row duplicated (crash shape)."""
    return codes.unionByName(codes.where(F.col("id") == victim))


def _query_set(corpus, k=3):
    return [(int(i), corpus[i]) for i in range(k)]


def test_fused_dedups_duplicated_codes_row(spark, corpus, built):
    vdf, arts, codes = built
    queries = _query_set(corpus)
    clean = ivf.search(
        codes, vdf, arts, queries, preliminary_top_k=50, final_top_k=5,
        n_probe=8, max_trained_id=None, n_buckets=4, approx_rows=1,
    ).collect()
    victim = clean[0].id
    dup = ivf.search(
        _dup_codes(codes, victim), vdf, arts, queries,
        preliminary_top_k=50, final_top_k=5,
        n_probe=8, max_trained_id=None, n_buckets=4, approx_rows=1,
    ).collect()
    per_q: dict[int, list[int]] = {}
    for r in dup:
        per_q.setdefault(r.query_id, []).append(r.id)
    for q, ids in per_q.items():
        assert len(ids) == len(set(ids)) == 5, f"dup id leaked for query {q}"
    # identical results to the clean table — the duplicate is invisible
    assert {(r.query_id, r.id, r.cosine_similarity) for r in dup} == {
        (r.query_id, r.id, r.cosine_similarity) for r in clean
    }


def test_two_stage_rerank_dedups_duplicate_candidates(spark, corpus, built):
    vdf, arts, codes = built
    qids = np.array([0, 1], dtype=np.int64)
    qmat = corpus[:2]
    cand = spark.createDataFrame(
        # query 0 proposes id 7 twice (both-sources shape); query 1 clean
        [(0, 7), (0, 7), (0, 11), (1, 7), (1, 3)],
        "query_id long, id long",
    )
    out = ivf.rerank_exact(cand, vdf, qids, qmat, final_top_k=5).collect()
    per_q: dict[int, list[int]] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.id)
    assert sorted(per_q[0]) == [7, 11]
    assert sorted(per_q[1]) == [3, 7]
