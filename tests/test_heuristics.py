"""Golden-value tests for the tuning heuristics.

Values ported verbatim from the reference's unit suite
(``tests/unit/test_utils.py``) — these formulas are engine behavior.
"""

import pytest

from mindb_spark.core import heuristics as H


def test_num_clusters_golden():
    assert H.get_num_clusters(10_000) == 200
    assert H.get_num_clusters(1_000_000) == 6324
    assert H.get_num_clusters(100_000_000) == 200_000


def test_n_probe_golden():
    assert H.get_n_probe(200) == 100
    assert H.get_n_probe(1000) == 250
    assert H.get_n_probe(6350) == 444
    assert H.get_n_probe(200_000) == 6000


def test_n_probe_extremes():
    # below the first anchor the fraction pins at 0.5; above the last, 0.03
    assert H.get_n_probe(100) == 50
    assert H.get_n_probe(400_000) == 12_000


@pytest.mark.parametrize(
    "trained,new,removed,expected",
    [
        (100_000, 0, 0, 1.0),
        (100_000, 100_000, 0, 0.5),
        (0, 100_000, 0, 0.0),
        (100_000, 0, 50_000, 0.5),
        (100_000, 60_000, 20_000, 0.5),
    ],
)
def test_coverage_ratio_golden(trained, new, removed, expected):
    assert H.coverage_ratio(trained, new, removed) == pytest.approx(expected)


def test_default_index_params_bands():
    assert H.get_default_index_params(64) == {
        "pca_dimension": 64,
        "opq_dimension": 64,
        "compressed_vector_bytes": 16,
    }
    assert H.get_default_index_params(768) == {
        "pca_dimension": 256,
        "opq_dimension": 128,
        "compressed_vector_bytes": 32,
    }
    assert H.get_default_index_params(1536) == {
        "pca_dimension": 512,
        "opq_dimension": 256,
        "compressed_vector_bytes": 32,
    }


def test_auto_train_policy():
    assert not H.needs_initial_training(24_999, False, False)
    assert H.needs_initial_training(25_000, False, False)
    assert not H.needs_initial_training(25_000, True, False)
    assert not H.needs_initial_training(25_000, False, True)

    assert H.needs_retraining(25_000, 0.4, False)
    assert not H.needs_retraining(25_000, 0.6, False)
    assert not H.needs_retraining(10_000, 0.1, False)
    assert not H.needs_retraining(25_000, 0.4, True)


def test_strategy_chooser_memory_model():
    # ported cases: 5M vectors under a 4GB cap -> two-level; 1M -> subsampling
    gb4 = 4 * 1024**3
    assert H.use_two_level_clustering(5_000_000, 768, gb4) is True
    assert H.use_two_level_clustering(1_000_000, 768, gb4) is False
    # no-cap branch (this engine's build-cost chooser): two-level from
    # ~500k — measured 7.4x faster at 1M with identical recall
    assert H.use_two_level_clustering(1_000_000, 64, None) is True
    assert H.use_two_level_clustering(100_000, 64, None) is False


def test_resolve_index_params():
    p = H.resolve_index_params(10_000, 64)
    assert p.num_clusters == 200
    assert p.n_probe == 100
    assert p.pca_dimension == 64
    assert p.compressed_vector_bytes == 16


def test_resolve_index_params_num_clusters_override():
    """train(num_clusters=...) pins k and n_probe follows it (ref mindb.py:231)."""
    from mindb_spark.core.heuristics import get_n_probe, resolve_index_params

    p = resolve_index_params(50_000, 64, num_clusters=123)
    assert p.num_clusters == 123
    assert p.n_probe == max(1, get_n_probe(123))
    # unset still follows the size heuristic
    assert resolve_index_params(50_000, 64).num_clusters != 123
