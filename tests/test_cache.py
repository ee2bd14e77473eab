"""Memory-bounded LRU registry (O23) — reference test parity.

Mirrors the reference's ``tests/unit/test_cache.py``: the golden flat
memory-estimate value ``n*d*4 + 240090`` (:81), LRU eviction order, the
pinned-while-training eviction scenario (:146-155: the LRU entry is "in
progress" so the MORE recently used unpinned one is evicted instead),
and budget shrinking via ``update_max_memory_usage`` (:157+). Unit tests
run against lightweight fake handles — the estimator reads only manifest
counters, by design — plus one Engine-level test over real Spark DBs.
"""

from __future__ import annotations

import pytest

from mindb_spark.core.cache import LRUCache, estimate_memory_usage

MB = 1024 * 1024


class FakeDB:
    def __init__(self, n=0, d=None, trained=False, pq_bytes=32):
        self.num_vectors_fast = n
        self.vector_dimension = d
        self.is_trained = trained
        self.index_params = (
            {"compressed_vector_bytes": pq_bytes} if trained else None
        )
        self.released = False

    def release(self):
        self.released = True


def test_estimate_empty_db_is_48_bytes():
    # ref cache.py:110
    assert estimate_memory_usage(FakeDB()) == 48


def test_estimate_flat_golden_value():
    # ref tests/unit/test_cache.py:81 — (n * d * 4) + 240090
    db = FakeDB(n=15000, d=768)
    assert estimate_memory_usage(db) == 15000 * 768 * 4 + 240090


def test_estimate_trained_formula():
    # ref cache.py:137 — n * (pq_bytes + 8) + per-dimension overhead
    db = FakeDB(n=15000, d=768, trained=True, pq_bytes=32)
    assert estimate_memory_usage(db) == 15000 * (32 + 8) + 4_104_704
    # non-tabled dimension falls back to ~4 KB/dim (ref cache.py:135)
    db = FakeDB(n=100, d=100, trained=True, pq_bytes=16)
    assert estimate_memory_usage(db) == 100 * (16 + 8) + 100 * 4092


def test_lru_evicts_oldest_first_and_releases():
    one = estimate_memory_usage(FakeDB(n=15000, d=768))
    cache = LRUCache(max_memory_usage=int(one * 2.5))  # fits two, not three
    dbs = {k: FakeDB(n=15000, d=768) for k in ("a", "b", "c")}
    for k in ("a", "b", "c"):
        cache.put(k, dbs[k])
    assert cache.keys() == ["b", "c"]  # "a" was LRU
    assert dbs["a"].released and not dbs["b"].released
    assert cache.current_memory_usage == 2 * one


def test_get_refreshes_recency():
    one = estimate_memory_usage(FakeDB(n=15000, d=768))
    cache = LRUCache(max_memory_usage=int(one * 2.5))
    dbs = {k: FakeDB(n=15000, d=768) for k in ("a", "b", "c")}
    cache.put("a", dbs["a"])
    cache.put("b", dbs["b"])
    assert cache.get("a") is dbs["a"]  # now "b" is LRU
    cache.put("c", dbs["c"])
    assert cache.keys() == ["a", "c"]
    assert dbs["b"].released


def test_in_progress_training_pins_against_eviction():
    # ref test_cache.py:146-155 — "a" is LRU but training is in flight,
    # so the more recently used unpinned "b" is evicted instead
    one = estimate_memory_usage(FakeDB(n=15000, d=768))
    cache = LRUCache(max_memory_usage=int(one * 2.5))
    ops = {"a": "in progress", "b": "complete", "c": "untrained"}
    dbs = {k: FakeDB(n=15000, d=768) for k in ("a", "b", "c")}
    cache.put("a", dbs["a"], operations=ops)
    cache.put("b", dbs["b"], operations=ops)
    cache.put("c", dbs["c"], operations=ops)
    assert cache.keys() == ["a", "c"]
    assert dbs["b"].released and not dbs["a"].released


def test_all_pinned_overflows_rather_than_refusing():
    # correctness first: when every entry is pinned the insert still
    # happens and usage exceeds the cap (ref put loops break, :87-88)
    one = estimate_memory_usage(FakeDB(n=15000, d=768))
    cache = LRUCache(max_memory_usage=one)
    ops = {"a": "in progress", "b": "in progress"}
    cache.put("a", FakeDB(n=15000, d=768), operations=ops)
    cache.put("b", FakeDB(n=15000, d=768), operations=ops)
    assert len(cache) == 2
    assert cache.current_memory_usage > cache.max_memory_usage


def test_update_max_memory_usage_shrinks_and_evicts():
    one = estimate_memory_usage(FakeDB(n=15000, d=768))
    cache = LRUCache(max_memory_usage=None)  # unbounded
    dbs = {k: FakeDB(n=15000, d=768) for k in ("a", "b", "c")}
    for k in ("a", "b", "c"):
        cache.put(k, dbs[k])
    assert len(cache) == 3
    cache.update_max_memory_usage(int(one * 1.5))
    assert cache.keys() == ["c"]
    assert dbs["a"].released and dbs["b"].released


def test_remove_drops_and_reweighs():
    cache = LRUCache(max_memory_usage=None)
    db = FakeDB(n=15000, d=768)
    cache.put("a", db)
    assert cache.remove("a") and db.released
    assert not cache.remove("a")
    assert cache.current_memory_usage == 0


# ------------------------------------------------------- engine integration
@pytest.fixture()
def engine(spark, tmp_path):
    from mindb_spark.core.engine import Engine

    return Engine(spark, base_path=str(tmp_path))


def test_engine_lru_eviction_is_transparent(engine):
    """Evicting a handle must not lose data: write-through manifests mean
    a re-open sees everything; the evicted handle only loses its memo."""
    import numpy as np

    rng = np.random.default_rng(7)
    for name in ("db_a", "db_b"):
        engine.create_db(name)
        engine.add(name, [(rng.random(8).tolist(), {"i": i}) for i in range(3)])
    # shrink to below one flat estimate: everything idle is evictable
    engine.update_max_memory_usage(48)
    assert engine.open_databases() == []
    info = engine.cache_info()
    assert info["max_memory_usage"] == 48
    # data survives eviction; handle re-opens lazily from the manifest
    assert engine.get_db("db_a").num_vectors_fast == 3
    res = engine.query("db_b", rng.random(8).tolist(), final_top_k=2)
    assert len(res["ids"]) == 2


def test_rest_update_max_memory_route(spark, tmp_path):
    import http.client
    import json as _json

    from mindb_spark.api.rest import serve
    from mindb_spark.core.engine import Engine

    server = serve(Engine(spark, base_path=str(tmp_path)), port=0)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    try:

        def call(method, path, body=None):
            conn.request(method, path, body=_json.dumps(body) if body is not None else None)
            r = conn.getresponse()
            return r.status, _json.loads(r.read() or b"{}")

        assert call("POST", "/db/create", {"name": "cachedb"})[0] == 200
        status, payload = call("GET", "/db/view_cache")
        assert status == 200
        assert payload["cache_keys"] == ["cachedb"]
        assert payload["current_memory_usage"] == 48  # empty-db estimate
        status, _ = call("POST", "/db/update_max_memory_usage", {"max_memory_usage": 0})
        assert status == 200
        assert call("GET", "/db/view_cache")[1]["cache_keys"] == []
        # validation: missing / bad budget rejected
        assert call("POST", "/db/update_max_memory_usage", {})[0] == 400
        assert call("POST", "/db/update_max_memory_usage", {"max_memory_usage": -1})[0] == 400
    finally:
        conn.close()
        server.stop()
