"""Gated similarity-join lanes at half-million-row scale (round 10).

Round 9 flagged the LSH/IVF linear lanes for shipping blind (0.76/0.85
pair recall at the bench shape, no contract); round 10 added the
measured recall gate. This probe is the SCALE evidence for the gate:
plant known near-duplicate pairs in a corpus two orders of magnitude
past the bench shape, run both gated lanes at ``pair_recall_target``,
and verify the recall they certify on a seeded sample HOLDS on the full
planted ground truth — the property a 100 TB dedup user depends on.

Corpus design (nothing scales with n on the driver): vector(id) is a
pure function of id — ``default_rng(SEED + id)`` draws a unit 64-d
vector — generated executor-side via mapInPandas. Ids < N_PAIRS are
"twins": vector(i) = normalize(vector(base) + eps * noise(i)) with
base = i + N_PAIRS, giving cos(twin, base) ~ 0.93 +- 0.02, all above
tau = 0.8. Ambient pairs are ~6 sigma below tau at 64-d (random cosine
std ~ 1/8), so the planted (i, i + N_PAIRS) pairs ARE the ground truth,
reconstructable driver-side from ids alone. Both lanes exact-verify
candidates, so emitted pairs are true pairs; recall on planted pairs is
the only open question — exactly what the gate certifies.

Host sentinel readings bracket the run (the r10 bench instrument), so
walls carry their own weather context.

Usage: python tools/similarity_gate_scale_probe.py [n_rows] [target]
  default n_rows=550_000 (10%% twins -> 50_000 planted pairs), 0.95.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 550_000
TARGET = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
DIM = 64
TAU = 0.8
EPS = 0.4  # twin = normalize(base + EPS*noise): cos ~ 1/sqrt(1+EPS^2) ~ 0.93
SEED = 77
N_PAIRS = N_ROWS // 11  # ids [0, N_PAIRS) are twins of [N_PAIRS, 2*N_PAIRS)


def _vec(i: int) -> np.ndarray:
    """Deterministic unit vector for an id (executor & driver agree)."""
    g = np.random.default_rng(SEED + i)
    v = g.normal(size=DIM)
    if i < N_PAIRS:
        base = _vec(i + N_PAIRS)
        v = base + EPS * (v / np.linalg.norm(v))
    return v / np.linalg.norm(v)


def corpus(spark):
    from pyspark.sql import functions as F

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # twins regenerate their base vector (one extra draw); the
            # per-row rng keyed by id keeps generation embarrassingly
            # parallel and driver-reconstructable
            vecs = [_vec(int(i)).tolist() for i in ids]
            yield pd.DataFrame({"id": ids, "vector": vecs})

    return (
        spark.range(N_ROWS).repartition(64)
        .mapInPandas(gen, "id long, vector array<double>")
    )


def main() -> None:
    import bench
    from mindb_spark.operators.similarity import (
        cosine_pairs_ivf,
        cosine_pairs_lsh,
    )
    from mindb_spark.session import get_spark

    spark = get_spark("similarity-gate-scale-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sent0 = bench._host_sentinel(spark)

    df = corpus(spark).persist()
    n = df.count()
    # ground truth: every planted pair, verified >= TAU driver-side from
    # ids alone (N_PAIRS regenerations, bounded, no n^2 anywhere)
    planted = set()
    for i in range(N_PAIRS):
        c = float(_vec(i) @ _vec(i + N_PAIRS))
        if c >= TAU:
            planted.add((min(i, i + N_PAIRS), max(i, i + N_PAIRS)))
    out = {"n_rows": n, "dim": DIM, "tau": TAU, "planted_pairs": len(planted),
           "target": TARGET, "sentinel_start": sent0["host_index"]}

    for lane, fn, kw in (
        ("lsh", cosine_pairs_lsh, {"dim": DIM, "n_bits": 8, "n_bands": 4}),
        ("ivf", cosine_pairs_ivf, {"n_assign": 2}),
    ):
        report: dict = {}
        t0 = time.time()
        pairs = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            # gate_sample 32768 (16 MB driver collect): a pair needs BOTH
            # endpoints sampled, so at 550k rows the default 8192 catches
            # only ~11 planted pairs — too thin to certify on
            for r in fn(
                df, TAU, assume_normalized=True,
                pair_recall_target=TARGET, gate_report=report,
                gate_sample=32768, **kw
            ).collect()
        }
        wall = round(time.time() - t0, 1)
        extra = {p for p in pairs if p not in planted}
        out[lane] = {
            "wall_sec": wall,
            "gate": report,
            "emitted_pairs": len(pairs),
            "planted_recall": round(
                len(pairs & planted) / max(1, len(planted)), 4
            ),
            # emitted-but-unplanted pairs are ambient true >= tau pairs
            # (both lanes exact-verify); count them for context
            "ambient_pairs": len(extra),
        }
        print(lane, out[lane], flush=True)

    out["sentinel_end"] = bench._host_sentinel(spark)["host_index"]
    df.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
