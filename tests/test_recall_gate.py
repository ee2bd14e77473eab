"""Post-train recall gate (round 8, VERDICT r7 #2).

The reference trains blind: its fixed query defaults
(``preliminary_top_k=500``, heuristic n_probe — ``mindb.py:368-373``,
``training_utils.py:11-32``) silently miss its own CI recall contract
(> 0.97@50, ``tests/integration/test_full_eval.py:75-78``) on
flat-spectrum data — measured 0.457@50 at 1M x 768 (prelim-bound,
tools/scale_probe_768d.py) and 0.885@50 at 6k x 64 (probe-bound, this
file). ``VectorDB.train`` now self-measures after every IVF build and
records a measured-sufficient (preliminary_top_k, n_probe) pair in the
manifest as the query-time default.
"""

from __future__ import annotations

import numpy as np
import pytest

from mindb_spark.core.database import VectorDB


def _flat_db(spark, tmp_path, name="gatedb", n=6000, d=64, seed=3):
    """Flat-spectrum (isotropic) corpus: the shape where the reference's
    fixed defaults measurably under-recall."""
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)).astype(np.float32)
    db = VectorDB(spark, name, base_path=str(tmp_path))
    db.add_dataframe(
        spark.createDataFrame([(r.tolist(),) for r in mat], "vector array<float>")
    )
    return db


@pytest.mark.slow
def test_gate_boosts_flat_spectrum_to_target(spark, tmp_path):
    """On isotropic 6k x 64 the heuristic defaults read ~0.885@50 (the
    missed neighbors' cells are never probed); the gate must find a
    budget pair whose MEASURED recall meets the 0.97 target and record
    it as the manifest query-time default."""
    db = _flat_db(spark, tmp_path)
    db.train(use_two_level_clustering=False)
    mr = db._manifest.get("measured_recall")
    assert mr is not None, "gate did not record a measurement"
    assert mr["recall"] >= 0.97, mr
    # the boost is real: defaults alone are insufficient on this data
    base_np = db._manifest["index_params"]["n_probe"]
    blind = db.evaluate_recall(preliminary_top_k=500)  # uses gate n_probe
    boosted = (
        db._manifest["preliminary_top_k_default"],
        db._manifest["n_probe_default"],
    )
    assert boosted != (500, base_np), (
        "this corpus is expected to need a boost; if the defaults now "
        f"suffice the fixture lost its point (gate chose {boosted})"
    )
    # unparameterized queries pick the recorded defaults up end-to-end
    assert db.evaluate_recall() >= 0.97
    assert blind >= 0.97  # n_probe_default applies even at explicit prelim
    db.delete()


@pytest.mark.slow
def test_gate_keeps_defaults_on_easy_data(spark, tmp_path):
    """Clustered data passes at the heuristic defaults: the gate must
    record exactly (500, heuristic n_probe) — no silent over-probing."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(16, 32)) * 4.0
    mat = (
        centers[rng.integers(0, 16, size=6000)] + rng.normal(size=(6000, 32))
    ).astype(np.float32)
    db = VectorDB(spark, "easydb", base_path=str(tmp_path))
    db.add_dataframe(
        spark.createDataFrame([(r.tolist(),) for r in mat], "vector array<float>")
    )
    db.train(use_two_level_clustering=False)
    assert db._manifest["preliminary_top_k_default"] == 500
    assert (
        db._manifest["n_probe_default"]
        == db._manifest["index_params"]["n_probe"]
    )
    assert db._manifest["measured_recall"]["recall"] >= 0.97
    db.delete()


def test_gate_disabled_is_reference_blind(spark, tmp_path):
    """recall_target=None restores the reference's train-blind behavior:
    no measurement, no manifest defaults, queries run at (500, heuristic)."""
    db = _flat_db(spark, tmp_path, name="blinddb")
    db.train(use_two_level_clustering=False, recall_target=None)
    assert "measured_recall" not in db._manifest
    assert "preliminary_top_k_default" not in db._manifest
    assert db._default_prelim() == 500
    db.delete()


def test_info_exposes_gate_results(spark, tmp_path):
    """Operators read the gate's verdict through the public surface:
    info() carries measured_recall and the effective query defaults
    (and the REST /info route serializes info() verbatim)."""
    import json

    db = _flat_db(spark, tmp_path, name="infodb")
    info = db.info()
    assert info["measured_recall"] is None
    assert info["query_defaults"]["preliminary_top_k"] == 500
    db.train(use_two_level_clustering=False)
    info = db.info()
    assert info["measured_recall"]["recall"] >= 0.97
    assert info["query_defaults"] == {
        "preliminary_top_k": db._manifest["preliminary_top_k_default"],
        "n_probe": db._manifest["n_probe_default"],
    }
    json.dumps(info)  # REST-serializable
    db.delete()


@pytest.mark.slow
def test_retrain_drops_stale_gate_defaults(spark, tmp_path):
    """Measured defaults belong to the index they were measured on: a
    gate-DISABLED retrain must not inherit the previous index's boost,
    and a downgrade to the flat path must clear them too."""
    db = _flat_db(spark, tmp_path, name="staledb")
    db.train(use_two_level_clustering=False)
    assert "measured_recall" in db._manifest  # gate recorded something
    db.train(use_two_level_clustering=False, recall_target=None)
    assert "measured_recall" not in db._manifest
    assert "preliminary_top_k_default" not in db._manifest
    assert db._default_prelim() == 500
    db.train(force_flat=True)
    assert "measured_recall" not in db._manifest
    db.delete()


def test_gate_skipped_on_flat_path(spark, tmp_path):
    """Below FLAT_INDEX_CUTOFF the exact path needs no gate."""
    db = _flat_db(spark, tmp_path, name="tinydb", n=200)
    db.train()
    assert not db.is_trained
    assert "measured_recall" not in db._manifest
    db.delete()


@pytest.mark.slow
def test_auto_budget_reaches_target_on_budget_starved_corpus(spark, tmp_path):
    """round 9 (VERDICT r8 #1): when even the gate's 4x4 query-budget
    combo misses the target — the binding constraint is the TRAIN-time
    PCA/PQ budget, which no query knob can fix — train(auto_budget=True)
    must retrain with the escalation the warning names (2x pca, then 2x
    pq bytes) and land at measured >= target with NO operator action.

    Fixture: isotropic 6k x 64 trained at a deliberately starved budget
    (pca 16, pq 8). Measured: the starved index caps at ~0.87@50 even at
    (prelim 2000, n_probe=k); one escalation step (pca 32) reaches
    ~0.978."""
    import warnings as W

    db = _flat_db(spark, tmp_path, name="autodb")
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        db.train(
            use_two_level_clustering=False,
            pca_dimension=16,
            compressed_vector_bytes=8,
            auto_budget=True,
        )
    mr = db._manifest["measured_recall"]
    ip = db._manifest["index_params"]
    assert mr["recall"] >= 0.97, (mr, ip)
    # the budget actually grew past the starved starting point
    assert (ip["pca_dimension"], ip["compressed_vector_bytes"]) != (16, 8)
    assert ip["pca_dimension"] % ip["compressed_vector_bytes"] == 0
    # the escalation was announced, naming the params it retrained with
    msgs = [str(x.message) for x in rec]
    assert any("auto_budget" in m and "retraining" in m for m in msgs), msgs
    # out-of-the-box queries see the remediated index end-to-end
    assert db.evaluate_recall() >= 0.97
    db.delete()


@pytest.mark.slow
def test_auto_budget_noop_when_gate_passes(spark, tmp_path):
    """auto_budget must not touch a budget the gate already measures as
    sufficient: on this corpus the gate finds a passing query-budget
    pair, so no retrain happens and the trained params are exactly the
    requested ones."""
    db = _flat_db(spark, tmp_path, name="autonoop")
    db.train(use_two_level_clustering=False, auto_budget=True)
    ip = db._manifest["index_params"]
    # the heuristic default for 64-d data — unchanged by auto_budget
    from mindb_spark.core import heuristics as H

    want = H.resolve_index_params(6000, 64)
    assert ip["pca_dimension"] == want.pca_dimension
    assert ip["compressed_vector_bytes"] == want.compressed_vector_bytes
    assert db._manifest["measured_recall"]["recall"] >= 0.97
    db.delete()


@pytest.mark.slow
def test_self_id_exclusion_changes_the_measurement(spark, tmp_path):
    """round 9 (VERDICT r8 #2): queries sampled from stored vectors carry
    their own id at rank 1 of both truth and results — a guaranteed
    match that inflates recall by up to 1/k. Reconstruct the old biased
    measure (self-id left in both sets) and prove it reads strictly
    higher than the de-biased one whenever recall < 1."""
    db = _flat_db(spark, tmp_path, name="biasdb")
    db.train(use_two_level_clustering=False, recall_target=None)
    st = db._recall_sample_truth(16, 50, seed=7)
    qmat, truth, qids = st
    # every truth set had its own-id removed (k-1 remain)
    assert all(qids[qi] not in truth[qi] for qi in truth)
    biased_truth = {qi: truth[qi] | {qids[qi]} for qi in truth}
    np0 = db._manifest["index_params"]["n_probe"]
    # starve the candidate budget so recall is well below 1
    unbiased = db._measured_recall(qmat, truth, 100, 50, n_probe=np0, qids=qids)
    biased = db._measured_recall(qmat, biased_truth, 100, 50, n_probe=np0)
    assert unbiased < 1.0, "fixture must measure below 1.0 to show the bias"
    # (h+1)/k > h/(k-1) for every query with h < k-1 matches
    assert biased > unbiased, (biased, unbiased)
    db.delete()


@pytest.mark.slow
def test_gate_record_race_skips_stale_defaults(spark, tmp_path, monkeypatch):
    """round 9 (ADVICE): the gate runs after the index mutex is released,
    so a retrain can land between its measurements and the manifest
    write. Defaults measured against index vN must never be recorded
    against vN+1 — the compare-and-swap on index_version must skip the
    write. Interleave: hijack the gate's sampling step to run a whole
    gate-disabled retrain (bumping the version) before measurement
    returns."""
    db = _flat_db(spark, tmp_path, name="racedb")
    orig = VectorDB._recall_sample_truth
    fired = {}

    def hijack(self, n_queries, final_top_k, seed):
        st = orig(self, n_queries, final_top_k, seed)
        if "x" not in fired:
            fired["x"] = True
            # concurrent retrain: new index version, gate disabled (so
            # IT records nothing either)
            self.train(use_two_level_clustering=False, recall_target=None)
        return st

    monkeypatch.setattr(VectorDB, "_recall_sample_truth", hijack)
    db.train(use_two_level_clustering=False)
    assert fired, "interleaved retrain did not run"
    # the stale measurement was discarded: no gate defaults recorded
    assert "measured_recall" not in db._manifest
    assert "preliminary_top_k_default" not in db._manifest
    assert db._default_prelim() == 500
    db.delete()


@pytest.mark.slow
def test_gate_failure_cannot_fail_a_committed_train(spark, tmp_path, monkeypatch):
    """round 9 (ADVICE): the index is committed before the gate runs; a
    measurement error must surface as a warning, not unwind train()."""
    import warnings as W

    def boom(self, *a, **k):
        raise RuntimeError("synthetic gate failure")

    monkeypatch.setattr(VectorDB, "_recall_sample_truth", boom)
    db = _flat_db(spark, tmp_path, name="gatefaildb")
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        db.train(use_two_level_clustering=False)  # must NOT raise
    assert db.is_trained
    assert any("recall gate failed" in str(x.message) for x in rec)
    assert "measured_recall" not in db._manifest
    assert db._default_prelim() == 500
    db.delete()
