"""Reference-scale recall evaluation at the HEURISTIC probe budget.

The reference's correctness bar is recall > 0.97 @ 50 on a 30,000-vector
corpus with the heuristic nprobe (``tests/integration/test_full_eval.py:75-78``,
``training_utils.py:11-32``). This mirrors it on the FIXTURES.md-prescribed
synthetic corpus: 30,000 x 64, 32 Gaussian clusters (so the index has real
structure to exploit), queries drawn from the same clusters, ground truth
by exact brute force — and crucially n_probe comes from ``get_n_probe``
(selective: ~37% of cells at k≈455), NOT a pinned exhaustive scan.
"""

from __future__ import annotations

import numpy as np
import pytest

from mindb_spark.core.database import VectorDB


N, D, K_CLUSTERS, N_QUERIES, TOP_K = 30_000, 64, 32, 50, 50


@pytest.fixture(scope="module")
def eval_corpus():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(K_CLUSTERS, D)) * 4.0
    assign = rng.integers(0, K_CLUSTERS, size=N)
    mat = (centers[assign] + rng.normal(size=(N, D))).astype(np.float32)
    # queries: perturbed corpus members (near neighbors exist), plus a few
    # uniform adversarial ones
    q_idx = rng.integers(0, N, size=N_QUERIES - 5)
    queries = np.vstack(
        [
            mat[q_idx] + 0.3 * rng.normal(size=(N_QUERIES - 5, D)).astype(np.float32),
            rng.normal(size=(5, D)).astype(np.float32),
        ]
    )
    return mat, queries.astype(np.float32)


@pytest.mark.slow
def test_heuristic_nprobe_recall_at_50(spark, tmp_path, eval_corpus):
    mat, queries = eval_corpus
    db = VectorDB(spark, "evaldb", base_path=str(tmp_path))
    # NOTE: no repartition — createDataFrame preserves row order across its
    # partitions and the offset-based id assignment preserves it too, so
    # db id == corpus row index (the ground-truth correspondence)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in mat], "vector array<float>"
    )
    db.add_dataframe(df)
    db.train(use_two_level_clustering=False)
    assert db.is_trained
    ip = db.info()["index_params"]
    # the heuristic must be SELECTIVE here — this is the 100x-scale plan,
    # not a near-exhaustive pin
    assert ip["n_probe"] < 0.5 * ip["num_clusters"], ip

    # exact ground truth on normalized vectors (the engine normalizes on
    # ingest, so cosine == dot)
    norm = mat.astype(np.float64)
    norm /= np.linalg.norm(norm, axis=1, keepdims=True)
    qn = queries.astype(np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    gt = np.argsort(-(norm @ qn.T), axis=0)[:TOP_K].T  # (nq, TOP_K)

    out = db.query_df(queries, preliminary_top_k=500, final_top_k=TOP_K).collect()
    by_q: dict[int, set] = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(r.id)
    recalls = [
        len(by_q.get(i, set()) & set(gt[i].tolist())) / TOP_K
        for i in range(len(queries))
    ]
    mean_recall = float(np.mean(recalls))
    # reference contract: > 0.97 @ 50 at the heuristic probe budget
    assert mean_recall > 0.97, f"recall {mean_recall} at n_probe={ip['n_probe']}"
    db.delete()


def test_sparse_probe_scan_exact_over_probed_subset(spark, tmp_path):
    """Probe-aware (sparse) ADC path correctness, pinned EXACTLY.

    With preliminary_top_k >= every probed row, stage 1 passes ALL probed
    rows to the exact rerank, so the final top-k must equal brute-force
    cosine over exactly the rows whose cell any given query probes — for
    every query, bit-for-bit on ids. The scenario forces the sparse path
    (low probe density: few cells probed of many)."""
    import os

    from mindb_spark.core.heuristics import resolve_index_params
    from mindb_spark.index import build as B, ivf

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(48, 16)) * 4.0
    assign = rng.integers(0, 48, size=3000)
    mat = (centers[assign] + 0.3 * rng.normal(size=(3000, 16))).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)], "id long, vector array<double>"
    ).localCheckpoint()
    params = resolve_index_params(3000, 16)
    idx = str(tmp_path / "sparse_idx")
    arts, _ = B.build_index(vdf, params, idx, n_buckets=8)
    codes_rows = spark.read.parquet(os.path.join(idx, "codes")).select(
        "id", "cluster_id"
    ).collect()
    cell_of = {r.id: r.cluster_id for r in codes_rows}

    n_probe = 5  # of params.num_clusters cells -> low density, sparse path
    queries_m = mat[rng.integers(0, 3000, size=24)] + 0.05 * rng.normal(size=(24, 16))
    queries = [(int(i), queries_m[i]) for i in range(24)]
    # rank on NORMALIZED queries — ivf.search normalizes internally, and
    # L2 centroid ranking is not scale-invariant, so an unnormalized
    # oracle could disagree about which cells were actually probed
    qn = queries_m / np.linalg.norm(queries_m, axis=1, keepdims=True)
    probed = ivf.rank_centroids(arts, qn, n_probe)

    out = ivf.search(
        spark.read.parquet(os.path.join(idx, "codes")), vdf, arts, queries,
        preliminary_top_k=3000, final_top_k=10, n_probe=n_probe,
        max_trained_id=None, n_buckets=8,
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, []).append((r.id, r.cosine_similarity))

    for qi in range(24):
        cells = set(int(c) for c in probed[qi])
        member = np.array([i for i in range(3000) if cell_of[i] in cells])
        assert member.size > 10
        sims = mat[member] @ qn[qi]
        order = np.lexsort((member, -sims))[:10]
        expect = [int(member[j]) for j in order]
        got_ids = [i for i, _ in sorted(got[qi], key=lambda t: (-t[1], t[0]))]
        assert got_ids == expect, f"query {qi}"
