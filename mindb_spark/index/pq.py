"""Product-quantization kernels (numpy; used inside Arrow-batched UDFs).

The reference gets PQ from Faiss (factory string ``...IVF{k},PQ{m}`` built at
``mindb/utils/training_utils.py:34-56``). We implement the same math
directly: split the (PCA-projected, residual) vector into ``m`` subspaces,
learn a 256-centroid codebook per subspace, store one uint8 per subspace,
and score queries against codes with asymmetric distance computation (ADC)
lookup tables.

Everything here is driver-or-executor-local numpy — the distributed parts
(sampling, the full encode pass, ADC scans) live in ``build.py`` / ``ivf.py``
and call into these kernels from ``mapInPandas``.

Like the reference (PQ trained on a 64*256-row sample,
``two_level_clustering.py:143-185``), codebooks are trained on a bounded
sample, so this never needs to scale beyond a few MB of driver memory.
"""

from __future__ import annotations

import contextlib
import threading

import numpy as np

N_CENTROIDS = 256  # 8-bit codes, same as Faiss PQ{m} default


_BLAS_CTL = None  # memoized (handle, set_fn, get_fn) pairs — see below


def _blas_controls():
    """Discover the loaded OpenBLAS libraries' thread setters, ONCE.

    The /proc/<pid>/maps scan + ctypes loads cost ~0.8 ms — fine for a
    training fit, but the resident point-query path enters the pin on
    EVERY query (round 7), and the set of loaded BLAS libraries never
    changes after numpy import, so the handles are process-lifetime
    memoizable."""
    global _BLAS_CTL
    if _BLAS_CTL is not None:
        return _BLAS_CTL
    controls = []
    try:
        import ctypes
        import os

        with open(f"/proc/{os.getpid()}/maps") as f:
            libs = {line.strip().split()[-1] for line in f if "openblas" in line}
        for lib in libs:
            h = ctypes.CDLL(lib)
            for set_fn, get_fn in (
                ("openblas_set_num_threads64_", "openblas_get_num_threads64_"),
                ("openblas_set_num_threads", "openblas_get_num_threads"),
            ):
                # only pin when the matching getter exists too — pinning
                # without a way to restore would leave the whole process
                # single-threaded past this block
                if hasattr(h, set_fn) and hasattr(h, get_fn):
                    controls.append((h, set_fn, get_fn))
                    break
    except OSError:
        pass
    _BLAS_CTL = controls
    return controls


_TPC = None  # cached threadpoolctl controller (fallback path) + probe flag
_TPC_TRIED = False


def _tpc_controller():
    """Cache a threadpoolctl ThreadpoolController ONCE (round-8 ADVICE):
    per-call ``threadpool_limits(...)`` re-scans every loaded thread pool,
    overhead on the same order as the fork/join the pin avoids. The
    controller's ``limit()`` context reuses the scan."""
    global _TPC, _TPC_TRIED
    if not _TPC_TRIED:
        _TPC_TRIED = True
        try:
            from threadpoolctl import ThreadpoolController

            _TPC = ThreadpoolController()
        except Exception:
            _TPC = None
    return _TPC


_PIN_LOCK = threading.Lock()
_PIN_DEPTH = 0
_PIN_RESTORE = None  # zero-arg undo for the ACTIVE pin (depth > 0)


def _apply_pin():
    """Pin BLAS to one thread NOW; return a zero-arg restore callable.

    Prefers the memoized ctypes/OpenBLAS handles (no per-call scan);
    falls back to the cached threadpoolctl controller; no-op when
    neither is available."""
    controls = _blas_controls()
    if controls:
        prev = []
        for h, set_fn, get_fn in controls:
            p = getattr(h, get_fn)()
            # pin only when the getter reports a restorable value (> 0):
            # pinning on a bogus reading would leave the process
            # single-threaded forever, since restore only replays
            # positive counts
            if p > 0:
                getattr(h, set_fn)(1)
                prev.append((h, set_fn, p))

        def _restore() -> None:
            for h, set_fn, p in prev:
                getattr(h, set_fn)(p)

        return _restore
    ctl = _tpc_controller()
    if ctl is None:
        return lambda: None
    cm = ctl.limit(limits=1, user_api="blas")
    cm.__enter__()
    return lambda: cm.__exit__(None, None, None)


@contextlib.contextmanager
def _wide_blas(n_threads: int | None = None):
    """Scoped BLAS thread-pool RAISE for driver-side training GEMMs.

    The session builder exports ``OMP_NUM_THREADS=1`` before the JVM
    launches (executor Python workers must not nest BLAS pools under
    Spark's task parallelism), which also nails the DRIVER's pool to one
    thread — so the coarse k-means fit, a pure driver-side GEMM loop
    running between Spark jobs on an otherwise idle machine, was
    single-threaded (round 13, VERDICT r12 #5; measured ~3x on the 30k
    fixture's assignment GEMM at 32 threads).

    Bit-identity: OpenBLAS partitions these GEMMs over OUTPUT tiles
    (M=sample rows), keeping each element's K-loop sequential, so the
    raised-pool result is BIT-IDENTICAL to the single-threaded one —
    asserted for the training shapes in
    tests/test_pq.py::test_kmeans_bit_identical_across_blas_threads.
    Do not wrap reductions whose output is smaller than the thread count
    (split-K risk) without extending that test.

    No-ops (yields) when the pool is already wider than one thread, when
    no control handle is available, or when a ``_single_threaded_blas``
    pin is active (never fight the pin — it exists to protect executor
    workers and the m-way book pool).
    """
    import os

    n = n_threads or os.cpu_count() or 1
    with _PIN_LOCK:
        pinned = _PIN_DEPTH > 0
    controls = _blas_controls()
    prev = []
    if not pinned and controls:
        for h, set_fn, get_fn in controls:
            p = getattr(h, get_fn)()
            if 0 < p < n:
                getattr(h, set_fn)(n)
                prev.append((h, set_fn, p))
    try:
        yield
    finally:
        for h, set_fn, p in prev:
            getattr(h, set_fn)(p)


@contextlib.contextmanager
def _single_threaded_blas():
    """Pin the BLAS pool to one thread for the duration of the block.

    The per-book Lloyd GEMMs are thin ((n, dsub) x (dsub, 256) with dsub
    of ~4) — BLAS's own threading over them is pure overhead, and nested
    under the m-way book pool it oversubscribes the machine (measured 5x:
    4.4 s -> 0.8 s for a 14-book fit on 32 cores). Scoped to the book
    pool ONLY — the single large coarse k-means is 2x faster WITH BLAS
    threading.

    Thread-safe (round-8 ADVICE): the pin state is process-global, and
    the resident serving snapshot enters this block per point query,
    plausibly from concurrent request threads — two interleaved
    pin/restore cycles could each read the other's 1 as "prev" and leave
    the whole process single-threaded. A depth counter under a lock
    makes concurrent/nested entries share ONE pin/restore cycle: first
    in pins, last out restores.
    """
    global _PIN_DEPTH, _PIN_RESTORE
    with _PIN_LOCK:
        _PIN_DEPTH += 1
        if _PIN_DEPTH == 1:
            # roll the increment back if pinning itself raises (round-9
            # ADVICE): the raising entrant never reaches the finally, so
            # without this the depth stays >= 1 with no active restore
            # and every later entry silently skips pinning for the life
            # of the process
            try:
                _PIN_RESTORE = _apply_pin()
            except BaseException:
                _PIN_DEPTH -= 1
                raise
    try:
        yield
    finally:
        with _PIN_LOCK:
            _PIN_DEPTH -= 1
            if _PIN_DEPTH == 0:
                restore, _PIN_RESTORE = _PIN_RESTORE, None
                restore()


def _kmeans(data: np.ndarray, k: int, n_iter: int = 25, seed: int = 42) -> np.ndarray:
    """Plain seeded Lloyd's k-means; returns (k, d) centroids.

    Small-scale only (PQ codebooks / sub-cluster refinement); the IVF coarse
    quantizer at scale is trained by MLlib KMeans instead.
    """
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    if n <= k:
        # degenerate: every point its own centroid, pad by resampling
        pad = data[rng.integers(0, n, size=k - n)] if n < k else np.empty((0, data.shape[1]))
        return np.vstack([data, pad]).astype(np.float32)
    # distance math in float32 (faiss convention — 2x the GEMM throughput,
    # assignment ties are noise at k-means granularity); mean ACCUMULATION
    # stays float64 so centroids don't drift with sample order
    d32 = np.asarray(data, dtype=np.float32)
    d64 = np.asarray(data, dtype=np.float64)
    d = d32.shape[1]
    centroids = d32[rng.choice(n, size=k, replace=False)].copy()
    # ONE (chunk, k) score buffer reused across all iterations (round 13):
    # the assignment expression `c2 - 2.0*(chunk @ centroids.T)` allocated
    # three fresh (chunk, k) arrays per chunk per iteration — 25x per fit —
    # and fresh-page faults dominate at training sizes. np.matmul(out=) +
    # in-place scale/shift write the same IEEE values into the same buffer
    # (-2*g is an exact sign flip; a + (-b) == a - b exactly), so
    # assignments are bit-identical to the allocating form.
    g_buf = np.empty((min(n, 65536), k), dtype=np.float32)
    assign = np.empty(n, dtype=np.int64)
    for _ in range(n_iter):
        # assignment via the GEMM identity argmin ||x-c||^2 = argmin c2 - 2x.c
        # (BLAS inner loop; never materializes an (n, k, d) tensor)
        c2 = (centroids**2).sum(axis=1)
        for start in range(0, n, 65536):
            chunk = d32[start : start + 65536]
            g = g_buf[: chunk.shape[0]]
            # same transposed-view GEMM as `chunk @ centroids.T` (same
            # BLAS kernel variant and accumulation order), just writing
            # into the reused buffer
            np.matmul(chunk, centroids.T, out=g)
            g *= -2.0
            g += c2[None, :]
            assign[start : start + 65536] = np.argmin(g, axis=1)
        # means via bincount scatter (one pass per dim, not one mask per cluster)
        counts = np.bincount(assign, minlength=k)
        sums = np.empty((k, d), dtype=np.float64)
        for j in range(d):
            sums[:, j] = np.bincount(assign, weights=d64[:, j], minlength=k)
        new = np.where(
            counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], 0.0
        ).astype(np.float32)
        empty = np.nonzero(counts == 0)[0]
        if empty.size:
            new[empty] = d32[rng.integers(0, n, size=empty.size)]
        if np.allclose(new, centroids, atol=1e-6):
            centroids = new
            break
        centroids = new
    return centroids.astype(np.float32)


def _fit_books(
    training_vectors: np.ndarray, m: int, seed: int, n_iter: int = 25
) -> np.ndarray:
    """Fit the m per-subspace codebooks concurrently (threads).

    Each book's Lloyd iteration is a thin float32 GEMM + bincount scatter
    (see ``_kmeans``); the runs are independent, numpy kernels drop the
    GIL, and results are written by subspace index so output matches the
    sequential loop for the same seeds. (A fully batched variant — one
    (m, n, k) stacked GEMM per iteration — was measured SLOWER: the thin
    batched matmul is memory-bound on its 100s-of-MB output, while the
    per-book (n, k) buffers stay cache-resident.)
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    n, d = training_vectors.shape
    dsub = d // m
    books = np.empty((m, N_CENTROIDS, dsub), dtype=np.float32)

    def fit(i: int) -> None:
        sub = training_vectors[:, i * dsub : (i + 1) * dsub]
        books[i] = _kmeans(sub, N_CENTROIDS, n_iter=n_iter, seed=seed + i)

    with _single_threaded_blas():
        with ThreadPoolExecutor(max_workers=min(m, os.cpu_count() or 4)) as ex:
            list(ex.map(fit, range(m)))
    return books


def train_codebooks(
    training_vectors: np.ndarray, m: int, seed: int = 42
) -> np.ndarray:
    """Learn PQ codebooks. Returns (m, 256, dsub) float32.

    ``training_vectors``: (n, d) residual sample, ``d % m == 0`` (the
    reference enforces the same divisibility: ``input_validation.py:47-49``).
    """
    n, d = training_vectors.shape
    if d % m != 0:
        raise ValueError(f"dimension {d} not divisible by num_subquantizers {m}")
    return _fit_books(np.asarray(training_vectors), m, seed)


def fit_opq(
    sample: np.ndarray,
    m: int,
    opq_dim: int,
    seed: int = 42,
    n_iter: int = 8,
    kmeans_iter: int = 10,
) -> np.ndarray:
    """OPQ: learn a (p, opq_dim) orthonormal-column rotation minimizing PQ
    reconstruction error, by alternating PQ fit and Procrustes solve.

    The reference gets this from faiss's ``OPQ{m}_{opq_dim}`` pre-transform
    (``training_utils.py:44-46``); here it is the standard OPQ-NP
    alternation (Ge et al., CVPR'13): rotate → fit codebooks → decode →
    ``R = UVᵀ`` from the SVD of ``XᵀX̂``. The rotation is FOLDED into the
    projection matrix downstream, so centroids/residuals/ADC all operate in
    the rotated space with no extra per-row work at search time.

    ``sample``: (n, p) projected training rows (PCA space);
    ``opq_dim`` ≤ p, divisible by ``m``.
    """
    n, p = sample.shape
    if opq_dim > p:
        raise ValueError(f"opq_dim {opq_dim} exceeds input dimension {p}")
    if opq_dim % m != 0:
        raise ValueError(f"opq_dim {opq_dim} not divisible by num_subquantizers {m}")
    X = np.asarray(sample, dtype=np.float64)
    # identity-truncation init: sample arrives in PCA order (energy-ranked),
    # so the first opq_dim coordinates are the best unrotated start
    R = np.eye(p)[:, :opq_dim]
    for _ in range(n_iter):
        Xr = (X @ R).astype(np.float32)
        books = _fit_books(Xr, m, seed, n_iter=kmeans_iter)
        xhat = decode(encode(Xr, books), books)  # (n, opq_dim)
        # orthogonal Procrustes: max tr(Rᵀ X̂ᵀX) over R with orthonormal cols
        u, _, vt = np.linalg.svd(X.T @ xhat.astype(np.float64), full_matrices=False)
        R = u @ vt
    return R


def encode(vectors: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Encode (n, d) vectors -> (n, m) uint8 codes."""
    n, d = vectors.shape
    m, _, dsub = codebooks.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for i in range(m):
        sub = vectors[:, i * dsub : (i + 1) * dsub]  # (n, dsub)
        book = codebooks[i]  # (256, dsub)
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c drops ||x||^2
        dots = sub @ book.T  # (n, 256)
        c2 = (book**2).sum(axis=1)  # (256,)
        # in place on the GEMM output (round 13): saves two fresh (n, 256)
        # temps per book per batch in the full-corpus encode pass;
        # bit-identical (IEEE: -2*dots is an exact sign flip,
        # a + (-b) == a - b exactly)
        dots *= -2.0
        dots += c2[None, :]
        codes[:, i] = np.argmin(dots, axis=1)
    return codes


def adc_table(query: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """ADC lookup table for one query (residual, same space as codes).

    Returns (m, 256) float32 of squared L2 distances from the query's i-th
    subvector to every codeword of subspace i. The L2 metric matches the
    reference index (``two_level_clustering.py:156`` asserts METRIC_L2);
    over unit-normalized vectors L2 ordering == cosine ordering.
    """
    m, _, dsub = codebooks.shape
    q = query.reshape(m, dsub)
    # (m, 256): ||q_i - c_ij||^2
    return ((codebooks - q[:, None, :]) ** 2).sum(axis=2).astype(np.float32)


def adc_scan(codes: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Approximate squared distances for (n, m) uint8 codes via one LUT."""
    m = codes.shape[1]
    return table[np.arange(m)[None, :], codes].sum(axis=1)


def adc_tables(queries: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Batched ADC tables: (Q, d) residual queries -> (Q, m, 256) float32.

    One broadcasted subtraction instead of Q calls to ``adc_table`` — the
    cross-query vectorization that keeps the IVF scan off the Python-loop
    floor when many queries probe the same cell.
    """
    nq = queries.shape[0]
    m, _, dsub = codebooks.shape
    q = np.asarray(queries, dtype=np.float32).reshape(nq, m, 1, dsub)
    return ((codebooks[None, :, :, :] - q) ** 2).sum(axis=3).astype(np.float32)


def adc_scan_multi(codes: np.ndarray, tables: np.ndarray) -> np.ndarray:
    """Score (n, m) uint8 codes against (Q, m, 256) tables -> (n, Q).

    One fancy-indexed gather + in-place accumulation per subspace (m is
    8-64): every (code row, query) pair is scored without any per-query
    Python work. Equivalent to stacking ``adc_scan`` over queries.
    """
    return adc_scan_multi_t(codes, np.ascontiguousarray(tables.transpose(1, 2, 0)))


def adc_scan_multi_t(codes: np.ndarray, tables_t: np.ndarray) -> np.ndarray:
    """``adc_scan_multi`` over pre-transposed (m, 256, Q) tables — hoist the
    transpose out of per-batch loops when the tables are fixed."""
    n, m = codes.shape
    out = np.zeros((n, tables_t.shape[2]), dtype=np.float32)
    for j in range(m):
        out += tables_t[j, codes[:, j]]
    return out


def adc_query_tables(queries_proj: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    r"""Cell-INDEPENDENT ADC component (faiss's precomputed-table trick).

    For IVF-PQ over residuals, the per-(query, cell) lookup table decomposes
    exactly (expand the square):

        ||(q-c)_j - cb[j,k]||^2
          = ||q-c||^2_(j)  +  (||cb[j,k]||^2 - 2 q_j.cb[j,k])  +  2 c_j.cb[j,k]
            \__ scalar __/     \________ per QUERY: A ________/   \_ per CELL _/

    Summed over subspaces j at gather time: ``||q-c||^2`` is the coarse
    distance already computed when ranking centroids, the A term is this
    (Q, m, 256) table, and the cell term depends only on (cell, code) so it
    is PRECOMPUTED AT BUILD TIME as the ``bterm`` column of the codes table
    (:func:`cell_code_term`). The scan then needs no per-cell tables at all
    — memory and Python-loop cost stop scaling with cells x queries.
    """
    nq = queries_proj.shape[0]
    m, _, dsub = codebooks.shape
    q = np.asarray(queries_proj, dtype=np.float64).reshape(nq, m, dsub)
    dots = np.einsum("qjd,jkd->qjk", q, codebooks.astype(np.float64))
    c2 = (codebooks.astype(np.float64) ** 2).sum(axis=2)  # (m, 256)
    # in place on the einsum output (round 13): saves two (Q, m, 256)
    # float64 temps per query batch; bit-identical (exact sign flip +
    # IEEE a + (-b) == a - b)
    dots *= -2.0
    dots += c2[None, :, :]
    return dots.astype(np.float32)


def cell_code_term(
    codes: np.ndarray, cluster_ids: np.ndarray, centroids: np.ndarray,
    codebooks: np.ndarray,
) -> np.ndarray:
    """Query-independent ADC term per code row: ``2 * c . decode(code)``.

    (n,) float32 for (n, m) codes in cells ``cluster_ids``. Stored in the
    codes table at build time; see :func:`adc_query_tables` for the algebra.
    """
    decoded = decode(codes, codebooks).astype(np.float64)  # (n, d)
    return (2.0 * np.einsum(
        "nd,nd->n", decoded, centroids[cluster_ids].astype(np.float64)
    )).astype(np.float32)


def decode(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Reconstruct (n, d) approximate vectors from codes (for testing)."""
    n, m = codes.shape
    dsub = codebooks.shape[2]
    out = np.empty((n, m * dsub), dtype=np.float32)
    for i in range(m):
        out[:, i * dsub : (i + 1) * dsub] = codebooks[i][codes[:, i]]
    return out
