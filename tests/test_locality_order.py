"""Space-filling cell ordering (index/order.py): permutation validity,
determinism, run merging, and the property that motivates it — a probe
ball's cell ids merge into far fewer contiguous runs than under the raw
k-means labeling."""

import numpy as np

from mindb_spark.index.order import locality_order, probed_id_runs


def test_is_deterministic_permutation():
    rng = np.random.default_rng(0)
    c = rng.standard_normal((1000, 16))
    o1 = locality_order(c)
    o2 = locality_order(c)
    np.testing.assert_array_equal(o1, o2)
    assert sorted(o1) == list(range(1000))


def test_tiny_inputs():
    assert locality_order(np.zeros((0, 4))).size == 0
    np.testing.assert_array_equal(locality_order(np.zeros((1, 4))), [0])
    # identical rows: degenerate axis, still a valid permutation
    assert sorted(locality_order(np.zeros((10, 4)))) == list(range(10))


def test_probed_id_runs():
    assert probed_id_runs([]) == []
    assert probed_id_runs([5]) == [(5, 5)]
    assert probed_id_runs([1, 2, 3, 7, 9, 10]) == [(1, 3), (7, 7), (9, 10)]
    assert probed_id_runs(np.arange(100)) == [(0, 99)]


def test_probe_ball_locality():
    """A query's nearest-cell set under the locality order merges into
    FAR fewer id runs than under the arbitrary k-means labeling — the
    property that turns stage 1 into a range-pruned scan."""
    rng = np.random.default_rng(7)
    # clustered corpus: cells from k-means on blobs have real geometry
    centers = rng.standard_normal((40, 24)) * 4.0
    c = np.concatenate(
        [ctr + 0.5 * rng.standard_normal((64, 24)) for ctr in centers]
    )  # 2560 "centroids"
    c = c[rng.permutation(len(c))]  # raw labels arbitrary, like k-means output
    perm = locality_order(c)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)  # original idx -> new id

    run_counts_new, run_counts_raw = [], []
    for qi in range(32):
        q = c[rng.integers(0, len(c))] + 0.1 * rng.standard_normal(24)
        d = ((c - q) ** 2).sum(axis=1)
        probe = np.argsort(d)[:64]  # n_probe = 64 nearest cells
        run_counts_raw.append(len(probed_id_runs(np.sort(probe))))
        run_counts_new.append(len(probed_id_runs(np.sort(inv[probe]))))
    raw, new = float(np.mean(run_counts_raw)), float(np.mean(run_counts_new))
    # raw labels: ~1 run per cell (ids are arbitrary). Locality order
    # must cut the run count by at least 3x on this clustered geometry.
    assert new < raw / 3.0, f"locality order did not compact runs: {new} vs {raw}"
