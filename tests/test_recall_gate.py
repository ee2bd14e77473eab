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
