"""Cost-based fused-vs-two-stage routing (index/ivf.route_fused).

The fused covering path ships every scanned row's stored vector through
Arrow; two-stage instead pays a full vectors-table scan plus fixed
stage-2 overhead. Both sides scale with n x d, so the router compares
modeled TIMES (round 7 — a fixed ship-bytes cap misrouted the 1M x
768-d point query to two-stage at 2x the latency). Every assertion
below pins a decision against a measured curve point
(tools/midq_curve_probe.py at d=64, tools/scale_probe_768d.py at
d=768). Pure math — no Spark session needed.
"""

import numpy as np

from mindb_spark.index.ivf import (
    _ARROW_SEC_PER_BYTE,
    _SCAN_SEC_PER_BYTE,
    _STAGE2_FIXED_SEC,
    route_fused,
)


def test_small_corpus_always_fuses():
    # 30k x 64-d at full probe density ships ~15 MB — the bench flagship
    # (measured fused 1.05 s vs two-stage 1.67 s at Q=512)
    assert route_fused(30_000, 169, 455, 512, 64, 500) is True


def test_large_corpus_large_batch_two_stage():
    # 1M x 64-d at Q=512 ships ~512 MB (measured fused 11.1 vs
    # two-stage 7.1 ms/q) — must route two-stage
    assert route_fused(1_000_000, 445, 6324, 512, 64, 500) is False
    # 10M mid-Q: probe union is ~100%, ~5 GB ship — two-stage
    # (measured 34.1 two-stage vs 47.0 fused ms/q at Q=128)
    assert route_fused(10_000_000, 790, 20_000, 128, 64, 500) is False


def test_large_corpus_point_query_fuses():
    # Q=1 scans only the probed cells (~7% of 1M -> ~36 MB): fuse
    # (measured fused 1.08 s vs two-stage 2.0 s)
    assert route_fused(1_000_000, 445, 6324, 1, 64, 500) is True


def test_768d_point_query_fuses():
    # the round-7 retune case: 1M x 768-d Q=1 ships ~412 MB — over the
    # old 256 MB cap — but two-stage's alternative is a 5.9 GB stage-2
    # scan (measured fused 1.59 s vs two-stage 3.10 s). Must fuse.
    assert route_fused(1_000_000, 445, 6324, 1, 768, 500) is True


def test_768d_batch_two_stage():
    # 1M x 768-d at Q=128/512 the probe union is ~100% (~5.9 GB ship);
    # measured two-stage 26.2 vs fused 28.4 ms/q (Q=128) and 11.1 vs
    # 26.6 (Q=512). Must route two-stage.
    assert route_fused(1_000_000, 445, 6324, 128, 768, 500) is False
    assert route_fused(1_000_000, 445, 6324, 512, 768, 500) is False


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


def test_model_constants_are_the_documented_ones():
    # pin the knobs so a silent constant change shows up in review
    assert _ARROW_SEC_PER_BYTE == 4e-9
    assert _SCAN_SEC_PER_BYTE == 0.8e-9
    assert _STAGE2_FIXED_SEC == 1.3


def test_d64_crossover_stays_in_measured_band():
    # at 1M x 64 the measured crossover is ~300-400 MB shipped; the
    # modeled threshold (ship_sec == stage2_sec) must stay in that
    # neighborhood so the d=64 curve points keep routing as measured
    n, d = 1_000_000, 64
    thresh_bytes = (
        n * d * 8 * _SCAN_SEC_PER_BYTE + _STAGE2_FIXED_SEC
    ) / _ARROW_SEC_PER_BYTE
    assert 250 << 20 <= thresh_bytes <= 500 << 20
