"""OPQ keep-or-cut evidence (VERDICT r5 item 8): measured recall@50 of
plain PCA-PQ vs OPQ at the SAME byte budget (m=8 bytes/vector) on
correlated anisotropic data (steep 1/i^2 spectrum under a random
orthogonal mix — the regime OPQ exists for, Ge et al. CVPR'13).

Same corpus/params as tests/test_opq_recall.py, but end-to-end through
build_index -> ivf.search at several preliminary_top_k budgets, printing
the measured recalls for PERF_NOTES / README.

Run:  python tools/opq_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mindb_spark.core.heuristics import IndexParams
from mindb_spark.index import ivf
from mindb_spark.index.build import build_index
from mindb_spark.session import get_spark

N, D, M_BYTES, K_CELLS = 8000, 64, 8, 16


def recall_at_50(spark, mat, omit_opq: bool, prelim: int) -> float:
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        "id long, vector array<float>",
    )
    params = IndexParams(
        num_clusters=K_CELLS, n_probe=K_CELLS, pca_dimension=D,
        opq_dimension=D, compressed_vector_bytes=M_BYTES,
        omit_opq=omit_opq,
    )
    idx = f"/tmp/opq_probe_{'plain' if omit_opq else 'opq'}"
    arts, _ = build_index(df, params, idx, n_buckets=4, seed=5)
    codes = spark.read.parquet(os.path.join(idx, "codes"))
    qn = mat[:50].astype(np.float64)
    true = np.argsort(-(mat.astype(np.float64) @ qn.T), axis=0)[:50].T
    out = ivf.search(
        codes, df, arts, [(i, qn[i]) for i in range(50)],
        preliminary_top_k=prelim, final_top_k=50, n_probe=K_CELLS,
        max_trained_id=None, n_buckets=4,
    ).collect()
    by_q: dict[int, set] = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(r.id)
    return float(
        np.mean([len(by_q.get(i, set()) & set(true[i].tolist())) / 50 for i in range(50)])
    )


def main() -> None:
    spark = get_spark("opq-probe", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(3)
    lam = 1.0 / np.arange(1, D + 1) ** 2
    z = rng.normal(size=(N, D)) * np.sqrt(lam)
    qmix, _ = np.linalg.qr(rng.normal(size=(D, D)))
    x = z @ qmix.T
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    mat = x.astype(np.float32)
    print(f"n={N} d={D} m={M_BYTES}B k={K_CELLS} (n_probe=k: quantization-only error)")
    for prelim in (60, 150, 500):
        r_plain = recall_at_50(spark, mat, omit_opq=True, prelim=prelim)
        r_opq = recall_at_50(spark, mat, omit_opq=False, prelim=prelim)
        print(
            f"prelim={prelim:4d}  recall@50 plain={r_plain:.4f}  opq={r_opq:.4f}"
            f"  gain={r_opq - r_plain:+.4f}"
        )


if __name__ == "__main__":
    main()
