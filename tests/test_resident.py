"""RAM-resident serving snapshot: bit-equality with the Spark path,
tail refresh on adds, rebuild on deletes, budget gating.

The snapshot (core/resident.py) replays the scan kernels' exact math
driver-side, so results must be IDENTICAL (ids and float64 scores) to
the Spark two-stage path — not merely close.
"""

import numpy as np
import pytest

from mindb_spark.core.database import VectorDB


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(30, 24)) * 3.0
    assign = rng.integers(0, 30, size=6000)
    mat = centers[assign] + rng.normal(size=(6000, 24))
    return mat.astype(np.float32)


@pytest.fixture()
def trained_db(spark, tmp_path, corpus):
    db = VectorDB(spark, "resdb", base_path=str(tmp_path))
    db.add([(v, {"i": int(i)}) for i, v in enumerate(corpus)])
    db.train(use_two_level_clustering=False)
    return db


def _spark_results(db, queries, prelim, k):
    """Reference answers through the Spark path (resident disabled)."""
    db.disable_resident_serving()
    return [
        db.query(q, preliminary_top_k=prelim, final_top_k=k) for q in queries
    ]


def test_resident_bit_equality(trained_db, corpus):
    db = trained_db
    rng = np.random.default_rng(11)
    queries = [corpus[i] + rng.normal(size=24).astype(np.float32) for i in range(5)]
    want = _spark_results(db, queries, 200, 10)

    assert db.enable_resident_serving() is True
    info = db.resident_info()
    assert info["rows"] == 6000 and info["tail_rows"] == 0 and info["bytes"] > 0
    for q, w in zip(queries, want):
        got = db.query(q, preliminary_top_k=200, final_top_k=10)
        assert got["ids"] == w["ids"]
        assert got["cosine_similarity"] == w["cosine_similarity"]  # bit-equal
        assert got["metadata"] == w["metadata"]


def test_resident_tail_refresh_on_add(trained_db):
    db = trained_db
    assert db.enable_resident_serving() is True
    probe = np.ones(24, dtype=np.float32)
    new_ids = db.add([(probe, {"tail": True})])
    # snapshot is stale by adds only -> tail refresh, not a rebuild
    got = db.query(probe, final_top_k=5)
    assert got["ids"][0] == new_ids[0]
    assert got["cosine_similarity"][0] == pytest.approx(1.0, abs=1e-6)
    assert db.resident_info()["tail_rows"] == 1
    # and the refreshed snapshot still matches the Spark path exactly
    want = _spark_results(db, [probe], 200, 5)[0]
    db.enable_resident_serving()
    got2 = db.query(probe, preliminary_top_k=200, final_top_k=5)
    assert got2["ids"] == want["ids"]
    assert got2["cosine_similarity"] == want["cosine_similarity"]


def test_resident_tombstone_mask_on_trained_delete(trained_db, corpus):
    """A sparse trained-row delete is absorbed by the tombstone mask —
    shared arrays, one id-column scan — and the masked results are
    bit-identical to both a fresh full rebuild and the Spark path."""
    db = trained_db
    q = corpus[0]
    assert db.enable_resident_serving() is True
    before = db.query(q, final_top_k=3)
    victim = before["ids"][0]
    db.remove([victim])
    after = db.query(q, preliminary_top_k=500, final_top_k=3)
    assert victim not in after["ids"]
    info = db.resident_info()
    # mask, not rebuild: the snapshot still HOLDS all 6000 indexed rows,
    # one of them tombstoned
    assert info["rows"] == 6000 and info["masked_rows"] == 1
    want = _spark_results(db, [q], 500, 3)[0]
    db.enable_resident_serving()  # fresh FULL rebuild (5999 live rows)
    assert db.resident_info()["masked_rows"] == 0
    got = db.query(q, preliminary_top_k=500, final_top_k=3)
    # masked == rebuilt == Spark, ids and float64 scores
    assert after["ids"] == got["ids"] == want["ids"]
    assert (
        after["cosine_similarity"]
        == got["cosine_similarity"]
        == want["cosine_similarity"]
    )


def test_resident_mask_then_add_keeps_mask(trained_db, corpus):
    """Adds after a masked delete take the tail-refresh path and must
    PRESERVE the tombstone mask (the indexed set didn't change)."""
    db = trained_db
    q = corpus[2]
    assert db.enable_resident_serving() is True
    victim = db.query(q, final_top_k=3)["ids"][0]
    db.remove([victim])
    db.query(q, final_top_k=3)  # absorbs the delete into the mask
    assert db.resident_info()["masked_rows"] == 1
    probe = np.full(24, -0.5, dtype=np.float32)
    db.add([(probe, {"tail": True})])
    got = db.query(q, preliminary_top_k=500, final_top_k=3)
    info = db.resident_info()
    assert info["masked_rows"] == 1 and info["tail_rows"] == 1
    assert victim not in got["ids"]
    want = _spark_results(db, [q], 500, 3)[0]
    assert got["ids"] == want["ids"]
    assert got["cosine_similarity"] == want["cosine_similarity"]


def test_tight_prelim_semantics(trained_db, corpus):
    """Saturated-prelim caveat pinned (resident.query docstring): with
    trained-row deletes the Spark path lets dead ids occupy stage-1
    prelim slots (dropped only at the stage-2 join), while the masked
    snapshot prelim-cuts over LIVE rows only — so under a tight
    preliminary_top_k the mask matches a fresh rebuild, which can hold
    MORE live results than the slot-starved Spark answer."""
    db = trained_db
    q = corpus[0]
    db.disable_resident_serving()
    before = db.query(q, preliminary_top_k=10, final_top_k=10)
    assert len(before["ids"]) == 10  # prelim==k: results ARE the prelim slots

    assert db.enable_resident_serving() is True
    victims = before["ids"][:9]
    db.remove(victims)
    masked = db.query(q, preliminary_top_k=10, final_top_k=10)
    assert db.resident_info()["masked_rows"] == 9
    assert not set(victims) & set(masked["ids"])
    assert len(masked["ids"]) == 10  # live-row prelim cut: full k returned

    spark_after = _spark_results(db, [q], 10, 10)[0]
    assert not set(victims) & set(spark_after["ids"])
    # the 9 dead ids still held their stage-1 slots on the Spark path
    assert len(spark_after["ids"]) < 10

    db.enable_resident_serving()  # fresh full rebuild over live rows
    assert db.resident_info()["masked_rows"] == 0
    rebuilt = db.query(q, preliminary_top_k=10, final_top_k=10)
    assert masked["ids"] == rebuilt["ids"]
    assert masked["cosine_similarity"] == rebuilt["cosine_similarity"]


def test_resident_dense_deletes_force_rebuild(trained_db, corpus):
    """Past _REBUILD_DEAD_FRACTION the mask refuses and the serve path
    falls through to a full rebuild (RAM reclaimed, mask cleared)."""
    db = trained_db
    assert db.enable_resident_serving() is True
    q = corpus[1]
    db.query(q, final_top_k=3)
    victims = list(range(700))  # >10% of 6000
    db.remove(victims)
    got = db.query(q, preliminary_top_k=500, final_top_k=3)
    info = db.resident_info()
    assert info["rows"] == 6000 - 700 and info["masked_rows"] == 0
    want = _spark_results(db, [q], 500, 3)[0]
    assert got["ids"] == want["ids"]
    assert got["cosine_similarity"] == want["cosine_similarity"]


def test_resident_budget_and_filter_fallback(trained_db, corpus):
    db = trained_db
    # a 10-byte budget cannot hold the snapshot -> stays on Spark path
    assert db.enable_resident_serving(max_bytes=10) is False
    assert db.resident_info() is None
    res = db.query(corpus[0], final_top_k=3)
    assert len(res["ids"]) == 3
    # metadata_filter always takes the Spark path, resident or not
    assert db.enable_resident_serving() is True
    res = db.query(
        corpus[0], final_top_k=3,
        metadata_filter="get_json_object(metadata, '$.i') = '0'",
    )
    assert res["ids"] and all(
        m == {"i": 0} for m in res["metadata"]
    )


def test_resident_batch_routing(trained_db, corpus):
    """Big batches route to Spark (query_batch_local -> None): the
    resident serve is single-core with no batch amortization, so beyond
    ~_RESIDENT_MAX_PAIRS estimated gather pairs the Spark path wins."""
    db = trained_db
    assert db.enable_resident_serving() is True
    params = db.index_params
    rows_per_q = params["n_probe"] * max(1, 6000 // params["num_clusters"])
    q_over = db._RESIDENT_MAX_PAIRS // rows_per_q + 1
    assert db.query_batch_local(corpus[:1]) is not None
    big = np.repeat(corpus[:1], min(q_over, 4096), axis=0)
    assert db.query_batch_local(big) is None


def test_resident_concurrent_adds(trained_db):
    """Queries keep succeeding (resident or Spark fallback, both correct)
    while another thread mutates the DB; the snapshot converges to
    include the adds. Also exercises the lock discipline: staleness
    resolution must not deadlock against the mutator's path lock."""
    import threading

    db = trained_db
    assert db.enable_resident_serving() is True
    probe = np.full(24, 0.5, dtype=np.float32)
    added: list[int] = []
    err: list[Exception] = []

    def mutate():
        try:
            for _ in range(3):
                added.extend(db.add([(probe, {"storm": True})]))
        except Exception as e:  # pragma: no cover - fails the test below
            err.append(e)

    t = threading.Thread(target=mutate)
    t.start()
    for _ in range(5):
        res = db.query(probe, final_top_k=3)
        assert len(res["ids"]) == 3
    t.join()
    assert not err
    final = db.query(probe, final_top_k=3)
    assert final["ids"][0] in added  # exact-match adds outrank everything
    assert final["cosine_similarity"][0] == pytest.approx(1.0, abs=1e-6)


def test_resident_sees_other_handle_mutations(spark, trained_db, corpus):
    """A remove() through ANOTHER handle of the same path must stale the
    snapshot: the fingerprint check reads the (memoized) on-disk
    manifest, not just this handle's in-memory copy."""
    db = trained_db
    assert db.enable_resident_serving() is True
    q = corpus[1]
    victim = db.query(q, final_top_k=3)["ids"][0]
    import os

    other = VectorDB(spark, db.name, base_path=os.path.dirname(db.path))
    other.remove([victim])
    after = db.query(q, final_top_k=3)
    assert victim not in after["ids"]


def test_resident_refuses_deleted_db(spark, tmp_path, corpus):
    """A handle outliving delete() must not keep serving from RAM."""
    from mindb_spark.core.validation import ValidationError

    db = VectorDB(spark, "deadres", base_path=str(tmp_path))
    db.add([(v, {}) for v in corpus[:5100]])
    db.train(use_two_level_clustering=False)
    assert db.enable_resident_serving() is True
    db.delete()
    with pytest.raises(ValidationError, match="deleted"):
        db.query(corpus[0], final_top_k=3)


def test_resident_tail_budget(spark, tmp_path, corpus):
    """A post-train add storm must not blow the byte budget through the
    tail collect: the refresh/rebuild bound includes the tail."""
    db = VectorDB(spark, "tailbudget", base_path=str(tmp_path))
    db.add([(v, {}) for v in corpus[:5100]])
    db.train(use_two_level_clustering=False)
    from mindb_spark.core.resident import ResidentSnapshot

    d = 24
    base = ResidentSnapshot.estimate_bytes(5100, d, db._load_artifacts().m)
    # budget fits the indexed part + a small tail, not a large one
    budget = base + ResidentSnapshot.estimate_tail_bytes(100, d)
    assert db.enable_resident_serving(max_bytes=budget) is True
    db.add([(corpus[0], {}) for _ in range(500)])  # tail bound >> 100 rows
    assert db.query_batch_local(corpus[:1]) is None  # over budget -> Spark
    assert db.resident_info() is None  # disabled, no rebuild storm


def test_resident_untrained_returns_false(spark, tmp_path):
    db = VectorDB(spark, "untrained", base_path=str(tmp_path))
    rng = np.random.default_rng(1)
    db.add([(v, {}) for v in rng.normal(size=(50, 8)).astype(np.float32)])
    assert db.enable_resident_serving() is False
    assert db.resident_info() is None
