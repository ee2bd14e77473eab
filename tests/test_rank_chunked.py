"""Chunked driver-side centroid ranking (stage-1 probe selection).

The reference ranks coarse centroids with a dense query-x-centroid
distance matrix (mindb/utils/lmdb_utils.py / faiss internals); at its own
heuristic operating point of C = 200,000 clusters for 1e8 vectors
(mindb/utils/training_utils.py:5-9) a dense (Q=512, C) float64 matrix is
~800 MB in ONE driver allocation. rank_centroids_chunked replaces it with
a chunked running top-n_probe merge whose peak memory is O(Q x chunk),
independent of C. These tests pin (a) exact agreement with the dense
computation, (b) deterministic tie handling, (c) the memory bound at the
200k-cluster regime itself.
"""

import numpy as np
import pytest

from mindb_spark.index.ivf import rank_centroids_chunked


def _dense_rank(proj, C, n_probe):
    """Reference implementation: full (Q, C) matrix, (d2, id) tie order."""
    d2 = (
        (proj**2).sum(axis=1, keepdims=True)
        - 2.0 * proj @ C.T
        + (C**2).sum(axis=1)[None, :]
    )
    k = min(n_probe, C.shape[0])
    ids = np.empty((proj.shape[0], k), dtype=np.int64)
    dists = np.empty((proj.shape[0], k), dtype=np.float64)
    for q in range(proj.shape[0]):
        order = np.lexsort((np.arange(C.shape[0]), d2[q]))[:k]
        ids[q] = order
        dists[q] = d2[q, order]
    return ids, dists


@pytest.mark.parametrize("chunk", [7, 64, 1000, 100000])
def test_chunked_matches_dense(chunk):
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((17, 12))
    C = rng.standard_normal((931, 12))
    want_i, want_d = _dense_rank(proj, C, 25)
    got_i, got_d = rank_centroids_chunked(proj, C, 25, chunk=chunk)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-10, atol=1e-9)


def test_n_probe_larger_than_centroids():
    rng = np.random.default_rng(1)
    proj = rng.standard_normal((5, 8))
    C = rng.standard_normal((10, 8))
    ids, d = rank_centroids_chunked(proj, C, 50, chunk=4)
    assert ids.shape == (5, 10) and d.shape == (5, 10)
    # every centroid present exactly once, best-first
    assert all(sorted(row) == list(range(10)) for row in ids)
    assert (np.diff(d, axis=1) >= 0).all()


def test_exact_ties_break_on_lower_id():
    # duplicate centroids straddling a chunk boundary: the lower id wins
    C = np.zeros((6, 4))
    C[3:] = 1.0  # ids 0,1,2 identical; ids 3,4,5 identical
    proj = np.zeros((2, 4))
    ids, _ = rank_centroids_chunked(proj, C, 4, chunk=2)
    np.testing.assert_array_equal(ids, [[0, 1, 2, 3], [0, 1, 2, 3]])


def test_200k_cluster_regime_memory_bound():
    """The reference golden point: 1e8 vectors -> 200,000 clusters. Rank
    512 queries under a driver-memory budget far below the ~800 MB the
    dense (Q, C) float64 matrix would need (plus its argsort temporaries).
    tracemalloc sees numpy buffers (numpy >= 1.22 registers its allocator),
    so the peak-delta bound is real."""
    import tracemalloc

    rng = np.random.default_rng(2)
    C = rng.standard_normal((200_000, 32)).astype(np.float32)
    proj = rng.standard_normal((512, 32))
    n_probe = 1024

    tracemalloc.start()
    tracemalloc.reset_peak()
    ids, d = rank_centroids_chunked(proj, C, n_probe)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    assert ids.shape == (512, n_probe)
    assert (np.diff(d, axis=1) >= 0).all()
    # sanity on a few queries against the dense answer
    want_i, _ = _dense_rank(proj[:3], C, n_probe)
    np.testing.assert_array_equal(ids[:3], want_i)
    assert peak < 400 * 1024 * 1024, f"peak {peak / 1e6:.0f} MB over budget"
