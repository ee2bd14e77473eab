"""REST layer: the reference's route surface over a real HTTP socket.

Drives the stdlib server with http.client exactly as the reference's
integration suite drives uvicorn (``tests/integration/test_fastapi.py``):
create → add → query → train lifecycle → remove → delete, plus the cache
and error routes.
"""

from __future__ import annotations

import http.client
import json
import time

import numpy as np
import pytest

from mindb_spark.api.rest import serve
from mindb_spark.core.database import VectorDB
from mindb_spark.core.engine import Engine


@pytest.fixture()
def client(spark, tmp_path):
    server = serve(Engine(spark, base_path=str(tmp_path)), port=0)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)

    def call(method: str, path: str, body: dict | None = None):
        conn.request(
            method, path, body=json.dumps(body) if body is not None else None
        )
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read() or b"{}")

    yield call
    conn.close()
    server.stop()


def test_rest_full_lifecycle(client):
    assert client("GET", "/health") == (200, {"status": "healthy"})
    assert client("GET", "/test")[0] == 200

    status, _ = client("POST", "/db/create", {"name": "restdb"})
    assert status == 200
    # duplicate create is a 400 (reference fastapi.py:110-112)
    status, out = client("POST", "/db/create", {"name": "restdb"})
    assert status == 400 and "exists" in out["detail"]

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(50, 8)).astype(float)
    add_data = [[v.tolist(), {"i": i}] for i, v in enumerate(vecs)]
    status, out = client("POST", "/db/restdb/add", {"add_data": add_data})
    assert status == 200 and "successfully" in out["message"]

    status, out = client("GET", "/db/restdb/info")
    assert status == 200
    info = json.loads(out["db_info"])
    assert info["num_vectors"] == 50 and info["max_id"] == 49
    assert info["n_total"] == 50

    status, out = client("POST", "/db/restdb/query",
                         {"query_vector": vecs[7].tolist(), "final_top_k": 5})
    assert status == 200
    assert out["ids"][0] == 7
    assert out["cosine_similarity"][0] == pytest.approx(1.0, abs=1e-6)
    assert out["metadata"][0] == {"i": 7}

    # train (async route) + status polling; 50 vectors -> flat path, fast
    status, out = client("POST", "/db/restdb/train", {})
    assert status == 200 and out["status"] == "training successfully initiated"
    import time

    for _ in range(120):
        status, out = client("GET", "/db/restdb/train")
        if out["status"] in ("complete", "failed"):
            break
        time.sleep(0.5)
    assert out["status"] == "complete"

    status, out = client("POST", "/db/restdb/remove", {"ids": [0, 1]})
    assert status == 200 and out["message"].startswith("2 vectors")
    _, out = client("GET", "/db/restdb/info")
    assert json.loads(out["db_info"])["num_vectors"] == 48

    # cache routes
    _, out = client("GET", "/db/view_cache")
    assert "restdb" in out["cache_keys"]
    assert client("POST", "/db/restdb/remove_from_cache")[1]["message"]
    assert client("POST", "/db/restdb/reload")[0] == 200
    assert client("POST", "/db/restdb/save")[0] == 200
    assert client("GET", "/db/find_indexes_to_train")[0] == 200
    assert client("GET", "/db/get_initial_training_queue")[0] == 200
    assert client("POST", "/db/update_max_memory_usage",
                  {"max_memory_usage": 1 << 30})[0] == 200

    assert client("POST", "/db/restdb/delete")[0] == 200
    assert client("GET", "/db/restdb/info")[0] == 404


def test_rest_error_paths(client):
    assert client("GET", "/db/nosuch/info") == (404, {"detail": "Database not found"})
    assert client("POST", "/db/nosuch/query", {"query_vector": [1.0]})[0] == 404
    assert client("GET", "/nope")[0] == 404
    assert client("POST", "/db/create", {})[0] == 400
    # malformed body
    client_status, out = client("POST", "/db/create", {"name": "x", "bad": 1})
    assert client_status == 200
    assert client("POST", "/db/x/add", {"add_data": "notalist"})[0] == 400
    # dimension mismatch surfaces as a 400 ValidationError
    client("POST", "/db/x/add", {"add_data": [[[1.0, 2.0], {}]]})
    status, out = client("POST", "/db/x/query", {"query_vector": [1.0, 2.0, 3.0]})
    assert status == 400 and "size" in out["detail"].lower()


@pytest.mark.slow
def test_rest_async_train_polling_while_serving(client):
    """End-to-end async-train lifecycle over a real socket, mirroring the
    reference's threading suite (tests/integration/test_fastapi_threading.py:
    57-170): add -> train(async) -> observe "in progress" -> concurrent
    query + add WHILE training -> duplicate train rejected -> poll to
    "complete" -> query the trained index -> remove."""
    import time

    assert client("POST", "/db/create", {"name": "asyncdb"})[0] == 200

    rng = np.random.default_rng(3)
    n, d = 6000, 16  # above FLAT_INDEX_CUTOFF so a real IVF train runs
    vecs = rng.normal(size=(n, d)).astype(float)
    for lo in range(0, n, 2000):
        batch = [[v.tolist(), {"i": int(lo + j)}] for j, v in enumerate(vecs[lo:lo + 2000])]
        assert client("POST", "/db/asyncdb/add", {"add_data": batch})[0] == 200

    status, out = client("POST", "/db/asyncdb/train", {})
    assert status == 200 and "initiated" in out["status"]

    # the state flips to "in progress" synchronously with the POST
    status, out = client("GET", "/db/asyncdb/train")
    assert (status, out["status"]) == (200, "in progress")

    # a second train while one is running is rejected (reference semantics)
    status, out = client("POST", "/db/asyncdb/train", {})
    assert status == 400 and "training already" in out["detail"]

    # the server keeps serving DURING training: query (exact fallback) + add
    status, out = client(
        "POST", "/db/asyncdb/query", {"query_vector": vecs[11].tolist(), "final_top_k": 3}
    )
    assert status == 200 and out["ids"][0] == 11
    extra = [[v.tolist(), {"i": int(n + j)}] for j, v in enumerate(vecs[:100])]
    assert client("POST", "/db/asyncdb/add", {"add_data": extra})[0] == 200

    final = None
    for _ in range(360):
        status, out = client("GET", "/db/asyncdb/train")
        final = out["status"]
        if final in ("complete", "failed"):
            break
        time.sleep(0.5)
    assert final == "complete"

    status, out = client("GET", "/db/asyncdb/info")
    info = json.loads(out["db_info"])
    assert info["num_vectors"] == n + 100
    assert info["num_vectors_trained_on"] >= n

    # trained-path query still finds the identity neighbor
    status, out = client(
        "POST", "/db/asyncdb/query", {"query_vector": vecs[42].tolist(), "final_top_k": 5}
    )
    assert status == 200 and out["ids"][0] == 42
    assert out["cosine_similarity"][0] == pytest.approx(1.0, abs=1e-6)

    assert client("POST", "/db/asyncdb/remove", {"ids": [0, 1, 2]})[0] == 200
    assert client("POST", "/db/asyncdb/delete")[0] == 200


def test_rest_add_trips_auto_train(client, monkeypatch):
    """Reference semantics (fastapi.py:173-186): a POST /add that pushes the
    database over the training cutoff starts a BACKGROUND train without any
    explicit /train call."""
    import time

    import mindb_spark.core.heuristics as H

    monkeypatch.setattr(H, "TRAINING_CUTOFF", 40)

    assert client("POST", "/db/create", {"name": "autodb"})[0] == 200
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 8)).astype(float)
    add_data = [[v.tolist(), {"i": i}] for i, v in enumerate(vecs)]
    assert client("POST", "/db/autodb/add", {"add_data": add_data})[0] == 200

    final = None
    for _ in range(240):
        status, out = client("GET", "/db/autodb/train")
        final = out["status"]
        if final in ("complete", "failed"):
            break
        time.sleep(0.5)
    assert final == "complete"  # never POSTed /train — the add triggered it

    status, out = client("GET", "/db/autodb/info")
    info = json.loads(out["db_info"])
    assert info["num_vectors_trained_on"] == 60
    assert client("POST", "/db/autodb/delete")[0] == 200


def test_rest_query_metadata_filter(client):
    """Beyond-reference: /query accepts a metadata_filter SQL expression
    (the reference README's declared next feature)."""
    assert client("POST", "/db/create", {"name": "filterdb"})[0] == 200
    rng = np.random.default_rng(8)
    vecs = rng.normal(size=(30, 8)).astype(float)
    add_data = [[v.tolist(), {"lang": "en" if i % 3 == 0 else "de"}] for i, v in enumerate(vecs)]
    assert client("POST", "/db/filterdb/add", {"add_data": add_data})[0] == 200

    status, out = client(
        "POST", "/db/filterdb/query",
        {"query_vector": vecs[1].tolist(), "final_top_k": 5,
         "metadata_filter": "get_json_object(metadata, '$.lang') = 'en'"},
    )
    assert status == 200 and len(out["ids"]) == 5
    assert all(m["lang"] == "en" for m in out["metadata"])
    assert 1 not in out["ids"]  # the query vector itself is lang=de, filtered out
    # malformed filter surfaces as a 500 with detail, not a hang
    status, out = client(
        "POST", "/db/filterdb/query",
        {"query_vector": vecs[0].tolist(), "metadata_filter": "no such ("},
    )
    assert status == 500 and "detail" in out
    assert client("POST", "/db/filterdb/delete")[0] == 200


def test_rest_batch_query(client):
    """Beyond-reference batch route: N vectors in one Spark job, results
    in input order with the reference's per-query shape."""
    assert client("POST", "/db/create", {"name": "batchdb"})[0] == 200
    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(40, 8)).astype(float)
    add_data = [[v.tolist(), {"i": i, "par": i % 2}] for i, v in enumerate(vecs)]
    assert client("POST", "/db/batchdb/add", {"add_data": add_data})[0] == 200

    status, out = client(
        "POST", "/db/batchdb/batch_query",
        {"query_vectors": [vecs[3].tolist(), vecs[17].tolist(), vecs[29].tolist()],
         "final_top_k": 4},
    )
    assert status == 200 and len(out["results"]) == 3
    for want, res in zip((3, 17, 29), out["results"]):
        assert res["ids"][0] == want
        assert res["cosine_similarity"][0] == pytest.approx(1.0, abs=1e-6)
        assert res["metadata"][0]["i"] == want
        assert len(res["ids"]) == 4

    # with a metadata filter: only matching rows, still per-query shaped
    status, out = client(
        "POST", "/db/batchdb/batch_query",
        {"query_vectors": [vecs[4].tolist()], "final_top_k": 3,
         "metadata_filter": "get_json_object(metadata, '$.par') = '0'"},
    )
    assert status == 200
    res = out["results"][0]
    assert res["ids"][0] == 4 and all(m["par"] == 0 for m in res["metadata"])

    assert client("POST", "/db/batchdb/batch_query", {"query_vectors": []})[0] == 400
    assert client("POST", "/db/batchdb/delete")[0] == 200


def test_rest_metadata_filter_rejects_dangerous_expressions(client):
    """The filter validation gate: expression-injection primitives are
    refused with a 400 before reaching the SQL parser."""
    assert client("POST", "/db/create", {"name": "fsecdb"})[0] == 200
    rng = np.random.default_rng(2)
    add_data = [[v.tolist(), {}] for v in rng.normal(size=(5, 4))]
    assert client("POST", "/db/fsecdb/add", {"add_data": add_data})[0] == 200
    for bad in (
        "cast(reflect('java.lang.System','getenv','HOME') as int) is null",
        "java_method('java.lang.Runtime','getRuntime') is not null",
        "1=1; drop table x",
        "x" * 3000,
    ):
        status, out = client(
            "POST", "/db/fsecdb/query",
            {"query_vector": [1.0, 0.0, 0.0, 0.0], "metadata_filter": bad},
        )
        assert status == 400 and "disallowed" in out["detail"], bad
    assert client("POST", "/db/fsecdb/delete")[0] == 200


def test_rest_keyword_and_hybrid_query(client):
    client("POST", "/db/create", {"name": "kwdb", "vector_dimension": 4})
    docs = [
        ([1.0, 0.0, 0.0, 0.0], {"text": "spark hash join strategies"}),
        ([0.9, 0.1, 0.0, 0.0], {"text": "hash table implementation notes"}),
        ([0.0, 1.0, 0.0, 0.0], {"text": "unrelated cooking recipe"}),
        ([0.0, 0.0, 1.0, 0.0], {"text": "hash hash hash spam"}),
        ([0.0, 0.0, 0.9, 0.1], {"nottext": "no text field here"}),
    ]
    st, _ = client("POST", "/db/kwdb/add", {"add_data": docs})
    assert st == 200

    # keyword: docs without the field never match; scores rank by BM25
    st, res = client("POST", "/db/kwdb/keyword_query",
                     {"terms": ["hash", "join"], "final_top_k": 10})
    assert st == 200
    assert 2 not in res["ids"] and 4 not in res["ids"]
    assert set(res["ids"]) == {0, 1, 3}
    assert res["ids"][0] == 0  # both terms -> top
    assert res["score"] == sorted(res["score"], reverse=True)

    # hybrid: vector close to doc 1, keywords favor doc 0 -> both surface
    st, res = client("POST", "/db/kwdb/hybrid_query",
                     {"query_vector": [1.0, 0.05, 0.0, 0.0],
                      "terms": ["hash", "join"], "final_top_k": 3})
    assert st == 200
    assert set(res["ids"][:2]) == {0, 1}
    assert all(isinstance(b, bool) for b in res["in_both"])

    # metadata filter composes with keyword search
    st, res = client("POST", "/db/kwdb/keyword_query",
                     {"terms": ["hash"],
                      "metadata_filter":
                          "get_json_object(metadata, '$.text') like '%table%'"})
    assert st == 200
    assert res["ids"] == [1]

    # validation errors
    st, _ = client("POST", "/db/kwdb/keyword_query", {"terms": []})
    assert st == 400
    st, _ = client("POST", "/db/kwdb/keyword_query",
                   {"terms": ["x"], "field": "bad; drop"})
    assert st == 400
    st, _ = client("POST", "/db/kwdb/hybrid_query",
                   {"query_vector": [1.0, 0.0, 0.0, 0.0], "terms": "hash"})
    assert st == 400
    st, _ = client("POST", "/db/missing/keyword_query", {"terms": ["x"]})
    assert st == 404

    client("POST", "/db/kwdb/delete", {})


def test_rest_add_to_new_faiss_index_flag(client, spark, tmp_path):
    # flat DB: flag is accepted and harmless
    client("POST", "/db/create", {"name": "fidx"})
    st, _ = client("POST", "/db/fidx/add",
                   {"add_data": [([1.0, 0.0], {}), ([0.0, 1.0], {})],
                    "add_to_new_faiss_index": True})
    assert st == 200
    st, res = client("POST", "/db/fidx/query",
                     {"query_vector": [1.0, 0.0], "final_top_k": 1})
    assert st == 200 and res["ids"] == [0]
    client("POST", "/db/fidx/delete", {})


def test_rest_concurrent_adds_yield_gapless_unique_ids(spark, tmp_path):
    """Add storm from multiple HTTP clients racing a background train:
    every id allocated exactly once, no gaps, counters exact (the
    reference's threading suite shape, driven through the shared-lock
    path-state machinery)."""
    import threading

    import numpy as np

    server = serve(Engine(spark, base_path=str(tmp_path)), port=0)
    try:
        def call(method, path, body=None):
            conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
            try:
                conn.request(
                    method, path, body=json.dumps(body) if body is not None else None
                )
                r = conn.getresponse()
                return r.status, json.loads(r.read() or b"{}")
            finally:
                conn.close()

        assert call("POST", "/db/create", {"name": "storm"})[0] == 200
        rng = np.random.default_rng(5)
        seed_batch = [[v.tolist(), {}] for v in rng.normal(size=(5200, 8)).astype(float)]
        assert call("POST", "/db/storm/add", {"add_data": seed_batch})[0] == 200

        # background train via REST while clients keep adding
        assert call("POST", "/db/storm/train", {})[0] == 200

        errors: list = []

        def adder(t):
            try:
                r = np.random.default_rng(100 + t)
                for _ in range(4):
                    batch = [[v.tolist(), {"t": t}] for v in r.normal(size=(25, 8)).astype(float)]
                    st, payload = call("POST", "/db/storm/add", {"add_data": batch})
                    assert st == 200, payload
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=adder, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors

        # wait for the background train to settle
        for _ in range(600):
            st, s = call("GET", "/db/storm/train")
            if s["status"] in ("complete", "failed", "untrained"):
                break
            time.sleep(0.5)
        assert s["status"] == "complete", s

        db = VectorDB(spark, "storm", base_path=str(tmp_path))
        ids = [r.id for r in db.vectors().select("id").collect()]
        n_total = 5200 + 4 * 4 * 25
        assert len(ids) == len(set(ids)) == n_total       # unique
        assert sorted(ids) == list(range(n_total))        # gapless
        st, info = call("GET", "/db/storm/info")
        assert json.loads(info["db_info"])["num_vectors"] == n_total
    finally:
        server.stop()
