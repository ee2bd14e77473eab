"""Multi-process resident serving (round 9, VERDICT r8 #7): snapshot
save/load round-trip and worker-pool result parity.

The pool spawns real OS processes that load the snapshot via mmap and
run the SAME query kernel — so every pin here is bit-equality with the
in-process snapshot, which tests/test_resident.py in turn pins
bit-equal to the Spark two-stage path.
"""

import os
import threading

import numpy as np
import pytest

from mindb_spark.api.workers import ResidentWorkerPool
from mindb_spark.core.database import VectorDB
from mindb_spark.core.resident import ResidentSnapshot


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(13)
    centers = rng.normal(size=(25, 16)) * 3.0
    # 6000 rows: above the reference's < 5000 stay-flat training rule,
    # so train() actually builds an index for the snapshot to serve
    assign = rng.integers(0, 25, size=6000)
    return (centers[assign] + rng.normal(size=(6000, 16))).astype(np.float32)


@pytest.fixture(scope="module")
def snap(spark, tmp_path_factory, corpus):
    db = VectorDB(
        spark, "wpool", base_path=str(tmp_path_factory.mktemp("wpool"))
    )
    db.add([(v, {"i": int(i)}) for i, v in enumerate(corpus)])
    db.train(use_two_level_clustering=False)
    s = ResidentSnapshot.build(db, max_bytes=None)
    assert s is not None
    return s


def _res_eq(a: list[dict], b: list[dict]) -> None:
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x["ids"] == y["ids"]
        assert x["cosine_similarity"] == y["cosine_similarity"]  # bit-equal
        assert list(x["metadata"]) == list(y["metadata"])


def test_save_load_roundtrip_bit_equal(snap, tmp_path, corpus):
    d = str(tmp_path / "snapdir")
    snap.save(d)
    loaded = ResidentSnapshot.load(d, mmap=True)
    assert loaded.fingerprint == snap.fingerprint
    assert loaded.ids.size == snap.ids.size
    rng = np.random.default_rng(5)
    qmat = corpus[:6] + rng.normal(size=(6, 16)).astype(np.float32)
    _res_eq(
        loaded.query(qmat, preliminary_top_k=150, final_top_k=10),
        snap.query(qmat, preliminary_top_k=150, final_top_k=10),
    )


def test_save_mask_free_over_masked_dir_clears_stale_mask(snap, tmp_path, corpus):
    """ADVICE r9: re-saving a mask-free snapshot into a directory that
    previously held a masked one must remove the stale live_mask.npy —
    load() must not resurrect old tombstones and drop live rows."""
    import copy

    d = str(tmp_path / "snapdir")
    masked = copy.copy(snap)
    mask = np.ones(snap.ids.size, dtype=bool)
    mask[:10] = False
    masked.live_mask = mask
    masked.save(d)
    assert os.path.exists(os.path.join(d, "live_mask.npy"))

    assert snap.live_mask is None  # the fixture snapshot is mask-free
    snap.save(d)
    assert not os.path.exists(os.path.join(d, "live_mask.npy"))
    loaded = ResidentSnapshot.load(d, mmap=True)
    assert loaded.live_mask is None
    qmat = corpus[:3]
    _res_eq(
        loaded.query(qmat, preliminary_top_k=150, final_top_k=10),
        snap.query(qmat, preliminary_top_k=150, final_top_k=10),
    )


def test_worker_pool_parity_and_concurrency(snap, corpus):
    rng = np.random.default_rng(9)
    qmat = corpus[:8] + rng.normal(size=(8, 16)).astype(np.float32)
    want = snap.query(qmat, preliminary_top_k=150, final_top_k=10)
    with ResidentWorkerPool.from_snapshot(snap, 2) as pool:
        assert pool.n_workers == 2 and pool.rows == snap.ids.size
        assert pool.fingerprint == snap.fingerprint
        # every worker serves the identical answer
        for w in range(pool.n_workers):
            _res_eq(
                pool.query_on(w, qmat, preliminary_top_k=150, final_top_k=10),
                want,
            )
        # concurrent round-robin callers: results stay per-call correct
        errs: list = []

        def drive(qi: int) -> None:
            try:
                got = pool.query(
                    qmat[qi], preliminary_top_k=150, final_top_k=10
                )
                _res_eq(got, [want[qi]])
            except Exception as exc:  # surface across the thread boundary
                errs.append(exc)

        threads = [
            threading.Thread(target=drive, args=(qi,)) for qi in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs


def test_worker_pool_rejects_bad_sizes(snap):
    with pytest.raises(ValueError, match="n_workers"):
        ResidentWorkerPool.from_snapshot(snap, 0)


def test_worker_pool_close_is_idempotent(snap):
    pool = ResidentWorkerPool.from_snapshot(snap, 1)
    pool.close()
    pool.close()
    assert pool.n_workers == 0


def test_rest_workers_mode_parity_and_staleness(spark, tmp_path, corpus):
    """REST `--workers N` prototype: /resident {"workers": 2} serves
    point queries from the process pool (same answers as the Spark
    path), and a mutation drops the pool so the next query sees the
    new row."""
    import http.client
    import json as _json

    from mindb_spark.api.rest import serve
    from mindb_spark.core.engine import Engine

    base = str(tmp_path / "restw")
    db = VectorDB(spark, "wdb", base_path=base)
    db.add([(v, {"i": int(i)}) for i, v in enumerate(corpus)])
    db.train(use_two_level_clustering=False)

    server = serve(Engine(spark, base_path=base), port=0)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)

    def call(method, path, body=None):
        conn.request(
            method, path, body=_json.dumps(body) if body is not None else None
        )
        resp = conn.getresponse()
        return resp.status, _json.loads(resp.read() or b"{}")

    try:
        q = corpus[11].tolist()
        status, spark_ans = call(
            "POST", "/db/wdb/query", {"query_vector": q, "final_top_k": 5}
        )
        assert status == 200

        status, out = call(
            "POST", "/db/wdb/resident", {"workers": 2, "max_bytes": None}
        )
        assert status == 200 and out["enabled"] and out["workers"] == 2
        assert "wdb" in server._pools

        status, pooled = call(
            "POST", "/db/wdb/query", {"query_vector": q, "final_top_k": 5}
        )
        assert status == 200
        assert pooled == spark_ans  # bit-equal through the pool

        # batch route through the pool (Q <= _POOL_MAX_Q)
        status, batched = call(
            "POST", "/db/wdb/batch_query",
            {"query_vectors": [q, corpus[3].tolist()], "final_top_k": 5},
        )
        assert status == 200
        assert batched["results"][0] == spark_ans

        # a mutation stales the pool fingerprint: the next query must
        # drop the pool and serve the NEW row through a fresh path
        probe = np.full(16, 0.5, dtype=float)
        status, _ = call(
            "POST", "/db/wdb/add",
            {"add_data": [[probe.tolist(), {"new": True}]]},
        )
        assert status == 200
        status, fresh = call(
            "POST", "/db/wdb/query",
            {"query_vector": probe.tolist(), "final_top_k": 3},
        )
        assert status == 200
        assert fresh["ids"][0] == len(corpus)  # the just-added id
        assert fresh["metadata"][0] == {"new": True}
        assert "wdb" not in server._pools  # stale pool was dropped

        # disable closes and clears
        status, out = call("POST", "/db/wdb/resident", {"enable": False})
        assert status == 200 and out["workers"] == 0
    finally:
        conn.close()
        server.stop()


def test_worker_pool_respawns_dead_worker(snap, corpus):
    """VERDICT r9 #7: a transient worker kill (the OOM reaper) must not
    permanently degrade the pool — the dead worker is respawned in place
    and the retried answer stays bit-equal."""
    rng = np.random.default_rng(21)
    qmat = corpus[:4] + rng.normal(size=(4, 16)).astype(np.float32)
    want = snap.query(qmat, preliminary_top_k=150, final_top_k=10)
    with ResidentWorkerPool.from_snapshot(snap, 2) as pool:
        pool._procs[0].kill()
        pool._procs[0].wait(timeout=10)
        got = pool.query_on(0, qmat, preliminary_top_k=150, final_top_k=10)
        _res_eq(got, want)
        assert pool.respawn_count == 1
        assert pool.n_workers == 2
        # the respawned worker keeps serving; the untouched one never
        # noticed
        _res_eq(
            pool.query_on(0, qmat, preliminary_top_k=150, final_top_k=10),
            want,
        )
        _res_eq(
            pool.query_on(1, qmat, preliminary_top_k=150, final_top_k=10),
            want,
        )
        assert pool.respawn_count == 1


def test_worker_pool_init_failure_cleans_up(tmp_path):
    """ADVICE r9: a worker that cannot load the snapshot must not leak
    the socket temp dir or already-spawned processes."""
    import glob
    import tempfile

    bad = str(tmp_path / "not_a_snapshot")
    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "mindb_pool_*")))
    with pytest.raises(RuntimeError, match="failed to load snapshot"):
        ResidentWorkerPool(bad, 2)
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "mindb_pool_*")))
    assert after == before  # socket dir removed on the failure path


def test_rest_pool_worker_death_respawns_then_degrades(spark, tmp_path, corpus):
    """A dead worker must not surface a 500. First line of defense is an
    in-place respawn (pool stays registered, answers bit-equal); when
    even the respawn fails (snapshot dir gone) the REST layer drops the
    pool and serves through the in-process/Spark path."""
    import http.client
    import json as _json
    import shutil as _shutil

    from mindb_spark.api.rest import serve
    from mindb_spark.core.engine import Engine

    base = str(tmp_path / "restkill")
    db = VectorDB(spark, "kdb", base_path=base)
    db.add([(v, {"i": int(i)}) for i, v in enumerate(corpus)])
    db.train(use_two_level_clustering=False)

    server = serve(Engine(spark, base_path=base), port=0)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)

    def call(method, path, body=None):
        conn.request(
            method, path, body=_json.dumps(body) if body is not None else None
        )
        resp = conn.getresponse()
        return resp.status, _json.loads(resp.read() or b"{}")

    try:
        status, out = call(
            "POST", "/db/kdb/resident", {"workers": 1, "max_bytes": None}
        )
        assert status == 200 and out["workers"] == 1
        q = corpus[5].tolist()
        status, want = call(
            "POST", "/db/kdb/query", {"query_vector": q, "final_top_k": 5}
        )
        assert status == 200

        # kill the worker out from under the pool -> respawn, not drop
        pool = server._pools["kdb"]
        for p in pool._procs:
            p.terminate()
            p.wait(timeout=10)

        status, got = call(
            "POST", "/db/kdb/query", {"query_vector": q, "final_top_k": 5}
        )
        assert status == 200
        assert got == want                     # bit-equal via the respawn
        assert server._pools.get("kdb") is pool  # pool survived the kill
        assert pool.respawn_count == 1

        # now make respawn impossible: kill again AND remove the saved
        # snapshot -> the pool is genuinely unhealthy, REST degrades
        _shutil.rmtree(pool.snapshot_dir)
        for p in pool._procs:
            p.terminate()
            p.wait(timeout=10)
        status, got = call(
            "POST", "/db/kdb/query", {"query_vector": q, "final_top_k": 5}
        )
        assert status == 200          # degraded, not 500
        assert got == want            # same answer via the fallback path
        assert "kdb" not in server._pools  # dead pool was dropped
    finally:
        conn.close()
        server.stop()
