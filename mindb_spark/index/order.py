"""Geometric (space-filling) ordering of IVF cells for scan-range locality.

Why: the codes table is written cell-clustered with tight ``cluster_id``
row-group stats (build.py), so a *contiguous* set of probed cell ids
prunes the parquet scan down to the probed rows via pushed-down range
predicates. But cluster ids straight out of k-means are arbitrary: one
query's ``n_probe`` nearest cells are scattered across the id space
(measured on the 10M two-level index: 1779 probed cells merge into 554
id-intervals of ~3.2 cells under parent-major ids — a query covers ~150
coarse parents only partially, so parent order alone cannot produce
compact ranges; PERF_NOTES.md "codes layout" section). The fix is to
relabel cells so that cells CLOSE IN CENTROID SPACE get CLOSE IDS; a
query's probe ball then maps to a few long runs and stage 1 becomes a
row-group-pruned range scan instead of a full codes scan.

How: a PCA-tree leaf order — recursively split the centroid set in
(balanced) halves along the subset's dominant principal axis and
concatenate the leaves. Unlike a Morton/Hilbert key over a few fixed
projected dimensions, the split axis adapts per subset, so locality is
preserved in the full projected dimensionality (64-256 dims) where a
bit-interleaved curve over 2-3 dims loses it. The recursion depth is
log2(C); cost O(C · p · log C) driver-side at build time (~1 s at the
reference heuristic's 200k clusters).

The relabeling is a pure permutation of the centroid array: cluster id
IS the row position of a centroid in ``artifacts.centroids``, so every
downstream stage (assignment, residual PQ, ADC ranking, probing) is
automatically consistent — no id map is stored or consulted at query
time.

Reference parity note: the reference (Faiss IVF lists, mindb/mindb.py)
has no analogous need — its inverted lists are pointer-addressed, not
range-scanned. This ordering exists purely for the parquet/row-group
execution model.
"""

from __future__ import annotations

import numpy as np

# power-iteration sweeps for the dominant principal axis of a subset;
# the split only needs an approximate axis, not an exact eigenvector
_POWER_ITERS = 8


def _dominant_axis_projection(x: np.ndarray) -> np.ndarray:
    """Project rows of ``x`` onto the subset's dominant principal axis
    (deterministic power iteration; falls back to dim 0 on degenerate
    inputs such as all-identical rows)."""
    xc = x - x.mean(axis=0)
    v = np.ones(x.shape[1], dtype=np.float64) / np.sqrt(x.shape[1])
    for _ in range(_POWER_ITERS):
        w = xc.T @ (xc @ v)
        nw = float(np.linalg.norm(w))
        if nw <= 1e-12:
            return xc[:, 0].astype(np.float64)
        v = w / nw
    return xc @ v


def locality_order(centroids: np.ndarray, leaf: int = 8) -> np.ndarray:
    """Permutation of ``range(len(centroids))`` whose consecutive ids are
    geometrically close centroids (PCA-tree leaf order).

    Deterministic: splits are balanced exact halves of the subset sorted
    by (axis projection, original id), so equal projections tie-break on
    the original id.
    """
    n = int(centroids.shape[0])
    c = np.asarray(centroids, dtype=np.float64)
    out = np.empty(n, dtype=np.int64)
    pos = 0

    # explicit stack (depth ~ log2 n, but avoid recursion limits anyway);
    # children pushed right-then-left so ids fill left-to-right
    stack: list[np.ndarray] = [np.arange(n, dtype=np.int64)]
    while stack:
        idx = stack.pop()
        if idx.size <= leaf:
            if idx.size > 2:
                p = _dominant_axis_projection(c[idx])
                idx = idx[np.lexsort((idx, p))]
            out[pos : pos + idx.size] = idx
            pos += idx.size
            continue
        p = _dominant_axis_projection(c[idx])
        order = np.lexsort((idx, p))
        half = idx.size // 2
        stack.append(idx[order[half:]])
        stack.append(idx[order[:half]])
    return out


def probed_id_runs(cids: "list[int] | np.ndarray") -> list[tuple[int, int]]:
    """Merge a sorted, deduplicated id list into inclusive [lo, hi] runs.

    Diagnostic companion to :func:`locality_order`: the run count is the
    locality metric scale probes report (fewer runs = tighter probe
    span = more effective range/bucket pruning). The pruning itself uses
    one global BETWEEN over the span plus range-bucket partition filters
    — a per-run OR-disjunction was measured SLOWER than no pruning
    (~0.7 s/1M rows of per-row predicate evaluation; see PERF_NOTES
    round 5), which is why adc_candidates does not consume these runs
    directly.
    """
    a = np.asarray(cids, dtype=np.int64)
    if a.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(a) > 1)
    starts = np.r_[0, breaks + 1]
    ends = np.r_[breaks, a.size - 1]
    return [(int(a[s]), int(a[e])) for s, e in zip(starts, ends)]
