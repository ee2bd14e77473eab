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
