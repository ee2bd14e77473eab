"""Cost-based fused-vs-two-stage routing (index/ivf.route_fused).

The fused covering path ships every scanned row's stored vector through
Arrow; the router fuses only when the estimated ship volume (probed-cell
union x d x 8 bytes) is under the measured crossover. Pure math — no
Spark session needed.
"""

import numpy as np

from mindb_spark.index.ivf import _FUSED_MAX_SHIP_BYTES, route_fused


def test_small_corpus_always_fuses():
    # 30k x 64-d at full probe density ships ~15 MB — the bench flagship
    assert route_fused(30_000, 169, 455, 512, 64, 500) is True


def test_large_corpus_large_batch_two_stage():
    # 1M x 64-d at Q=512 ships ~512 MB (measured fused 11.1 vs
    # two-stage 7.1 ms/q) — must route two-stage
    assert route_fused(1_000_000, 445, 6324, 512, 64, 500) is False
    # 10M mid-Q: probe union is ~100%, ~5 GB ship — two-stage
    assert route_fused(10_000_000, 790, 20_000, 128, 64, 500) is False


def test_large_corpus_point_query_fuses():
    # Q=1 scans only the probed cells (~7% of 1M -> ~36 MB): fuse
    assert route_fused(1_000_000, 445, 6324, 1, 64, 500) is True


def test_unknown_rows_falls_back_to_small_q_gate():
    assert route_fused(None, 169, 455, 8, 64, 500) is True  # 8*500 <= 4096
    assert route_fused(None, 169, 455, 9, 64, 500) is False


def test_union_saturates_monotonically():
    # the estimated ship volume must be non-decreasing in Q, so the
    # router can only switch fused -> two-stage as batches grow
    p = 445 / 6324
    ship = [
        1_000_000 * (1 - (1 - p) ** q) * 64 * 8 for q in (1, 2, 8, 64, 512)
    ]
    assert all(a <= b for a, b in zip(ship, ship[1:]))
    assert ship[-1] <= 1_000_000 * 64 * 8 + 1e-6  # capped by the corpus


def test_crossover_threshold_is_the_documented_one():
    # pin the knob so a silent constant change shows up in review
    assert _FUSED_MAX_SHIP_BYTES == 256 << 20
