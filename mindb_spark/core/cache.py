"""Memory-bounded LRU registry for open databases (O23, SURVEY §2.1).

Reference parity: ``mindb/cache/cache.py:5-138``. The reference caps
driver RAM because every open database pins a Faiss index in process
memory; its LRU evicts the least-recently-used database whose training
is not in flight. In this engine the data and the codes table live in
parquet and executors' cached blocks belong to the Spark block manager
— what an open handle pins on the DRIVER is its manifest plus the
memoized dense index artifacts (mean / PCA / centroids / codebooks used
to plan every trained-path query). Evicting a handle releases that
driver copy; re-opening is a manifest read plus one npz load.

Eviction weights use the reference's serving-footprint formulas
(``cache.py:105-138``) rather than the (much smaller) artifact byte
counts, so the observable LRU behavior — including the golden flat
estimate ``n*d*4 + 240090`` pinned by the reference's
``tests/unit/test_cache.py:81`` — matches the reference exactly. The
estimate reads only manifest counters: weighing a database never costs
a Spark job.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

# reference cache.py:110 — a handle with no vectors yet
_EMPTY_DB_BYTES = 48
# reference cache.py:118 — flat (untrained) serving overhead
_FLAT_OVERHEAD_BYTES = 240_090
# reference cache.py:126-135 — measured per-dimension trained-index
# overheads, with the ~4 KB/dim extrapolation for other dimensions
_TRAINED_OVERHEAD = {256: 1_479_168, 512: 2_529_792, 768: 4_104_704, 1024: 6_203_904}


def estimate_memory_usage(db) -> int:
    """Serving-footprint estimate for one open database, in bytes.

    Reference-parity formulas (``cache.py:105-138``):

    - no vectors yet            -> 48
    - untrained (flat serving)  -> n * d * 4 + 240090
    - trained (IVF-PQ serving)  -> n * (pq_bytes + 8) + overhead(d)

    Derived from manifest counters only — O(1), no Spark job, so the
    cache can re-weigh on every mutation the way the reference does.
    Reads the counters LOCK-FREE (``manifest_counters_lockfree``: a
    plain JSON read, safe because the manifest writer swaps atomically
    via tmp+rename): the cache-wide lock is held while weighing, and a
    database's shared path lock can be held across a Spark job
    (``index_tail``'s counter rebase) — nesting cache lock → path lock
    here would stall get/put on EVERY database behind one database's
    job.
    """
    snap = getattr(db, "manifest_counters_lockfree", None)
    if callable(snap):
        m = snap()
        d = m.get("vector_dimension")
        n = (
            m.get("num_vectors_trained_on", 0)
            - m.get("num_trained_vectors_removed", 0)
            + m.get("num_new_vectors", 0)
        )
        trained = m.get("index_version") is not None
        params = m.get("index_params") or {}
    else:  # plain objects (tests' fakes): attribute protocol
        d = db.vector_dimension
        n = db.num_vectors_fast
        trained = db.is_trained
        params = db.index_params or {}
    if d is None or n <= 0:
        return _EMPTY_DB_BYTES
    if not trained:
        return n * d * 4 + _FLAT_OVERHEAD_BYTES
    pq_bytes = params.get("compressed_vector_bytes") or d // 4
    overhead = _TRAINED_OVERHEAD.get(d, d * 4092)
    return n * (pq_bytes + 8) + overhead


def _evictable(key: str, operations: dict | None) -> bool:
    """A database may be evicted unless a training run is in flight.

    The reference skips any key whose operations-dict status is neither
    "complete" nor "untrained" (``cache.py:19-25``) — i.e. "in progress"
    and "failed" both pin. We keep exactly that rule: a failed train may
    still hold state worth inspecting, and an in-flight one must not
    lose its handle mid-build.
    """
    if not operations or key not in operations:
        return True
    return operations[key] in ("complete", "untrained")


class LRUCache:
    """LRU of open database handles with memory-estimate eviction.

    ``max_memory_usage=None`` means unbounded (a plain recency-ordered
    registry — the default; pass the reference's 1 GiB server default,
    ``fastapi.py:21``, when hosting many databases behind REST). All
    methods are thread-safe; eviction calls ``release()`` on the evicted
    handle so memoized index artifacts are dropped with it.
    """

    def __init__(self, max_memory_usage: int | None = None):
        self.max_memory_usage = max_memory_usage
        self._cache: "OrderedDict[str, object]" = OrderedDict()
        self._lock = threading.RLock()
        self.current_memory_usage = 0

    # ------------------------------------------------------------- core
    def get(self, key: str):
        """Return the cached handle (refreshing recency), or None."""
        with self._lock:
            db = self._cache.get(key)
            if db is not None:
                self._cache.move_to_end(key)
            return db

    def put(self, key: str, db, operations: dict | None = None):
        """Insert a handle, evicting LRU entries to fit the budget.

        Returns the handle NOW CACHED under ``key`` — when two threads
        race a cold ``get``-then-``put``, the loser's handle is discarded
        and both callers must share the winner's (two live handles for one
        database would each hold a private in-memory max_id and allocate
        duplicate ids). Like the reference's ``put`` (``cache.py:69-94``),
        insertion happens even if the budget cannot be met by evicting
        (every remaining entry pinned): correctness first, the cap is
        advisory under contention.
        """
        with self._lock:
            existing = self._cache.get(key)
            if existing is not None:
                self._cache.move_to_end(key)
                return existing
            self._refresh_usage()
            incoming = estimate_memory_usage(db)
            if self.max_memory_usage is not None:
                self._evict_until(self.max_memory_usage - incoming, operations)
            self._cache[key] = db
            self.current_memory_usage += incoming
            return db

    def remove(self, key: str) -> bool:
        with self._lock:
            db = self._cache.pop(key, None)
            if db is None:
                return False
            _release(db)
            self._refresh_usage()
            return True

    def keys(self) -> list:
        with self._lock:
            return list(self._cache)

    def __contains__(self, key: str) -> bool:
        with self._lock:
            return key in self._cache

    def __len__(self) -> int:
        with self._lock:
            return len(self._cache)

    # ----------------------------------------------------------- memory
    def check_memory_usage(self, operations: dict | None = None) -> None:
        """Re-weigh everything and evict down to the budget.

        The reference runs this from ``get(check_memory_usage=True)`` on
        the non-latency-sensitive paths (add / remove); the engine calls
        it after mutations for the same reason — query paths never pay
        for a re-weigh.
        """
        with self._lock:
            self._refresh_usage()
            if self.max_memory_usage is not None:
                self._evict_until(self.max_memory_usage, operations)

    def update_max_memory_usage(
        self, max_memory_usage: int | None, operations: dict | None = None
    ) -> None:
        """Reference ``cache.py:11-28``: shrink the budget and evict."""
        with self._lock:
            self.max_memory_usage = max_memory_usage
            self.check_memory_usage(operations)

    def _refresh_usage(self) -> None:
        self.current_memory_usage = sum(
            estimate_memory_usage(db) for db in self._cache.values()
        )

    def _evict_until(self, budget: int, operations: dict | None) -> None:
        """Pop oldest evictable entries until usage fits ``budget``."""
        while self.current_memory_usage > budget and self._cache:
            victim = next(
                (k for k in self._cache if _evictable(k, operations)), None
            )
            if victim is None:  # everything pinned by in-flight training
                break
            db = self._cache.pop(victim)
            self.current_memory_usage -= estimate_memory_usage(db)
            _release(db)


def _release(db) -> None:
    release = getattr(db, "release", None)
    if callable(release):
        release()
