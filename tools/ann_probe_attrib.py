"""Attribute the 30k clustered-probe q512 latency (VERDICT r5 item 1).

Builds the exact bench corpus/index (bench.py's clustered probe), then
times each phase of the two-stage search separately, best-of-N:

  stage1_scan   adc_candidates' mapInPandas output, NO global window
                (count only — measures scan kernel + Arrow + task cut)
  stage1_full   adc_candidates().count() (adds the global top-prelim
                window: shuffle + row_number sort)
  full_search   ivf.search(...).count()  (adds stage 2 rerank)

Run:  python tools/ann_probe_attrib.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mindb_spark.core.heuristics import resolve_index_params
from mindb_spark.index import ivf
from mindb_spark.index.build import build_index
from mindb_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ann-attrib", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(32, 64)) * 4.0
    assign = rng.integers(0, 32, size=30_000)
    mat = (centers[assign] + rng.normal(size=(30_000, 64))).astype(np.float32)
    norm = mat.astype(np.float64)
    norm /= np.linalg.norm(norm, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(norm)],
        "id long, vector array<double>",
    ).localCheckpoint()
    params = resolve_index_params(30_000, 64)
    idx_dir = "/tmp/attrib_idx"
    t0 = time.time()
    arts, _ = build_index(vdf, params, idx_dir, n_buckets=16)
    print(f"build: {time.time()-t0:.2f}s  clusters={params.num_clusters} n_probe={params.n_probe} m={arts.m}")
    codes = spark.read.parquet(f"{idx_dir}/codes")

    nq = 512
    bq = rng.integers(0, 30_000, size=nq)
    bqueries = [(int(i), norm[bq[i]] + 0.05 * rng.normal(size=64)) for i in range(nq)]
    qids = np.array([q for q, _ in bqueries], dtype=np.int64)
    qmat = np.array([v for _, v in bqueries])
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def timed(label, fn, warm=1):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            n = fn()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{label:14s} best={ts[0]*1000:8.1f}ms  med={ts[len(ts)//2]*1000:8.1f}ms  all={[round(t*1000) for t in ts]}  (rows={n})")
        return ts[0]

    # phase A: driver-side centroid ranking only
    def rank_only():
        proj = arts.project(qnorm)
        ivf.rank_centroids_chunked(proj, arts.centroids, params.n_probe)
        return 0
    timed("rank_driver", rank_only)

    # phase B: stage-1 scan only (raw mapInPandas output, no global window)
    def stage1_scan():
        return ivf.adc_candidates(
            codes, arts, qids, qnorm, params.n_probe, 500,
            n_buckets=16, _emit_raw=True,
        ).count()
    t_scan = timed("stage1_scan", stage1_scan)

    def stage1_full():
        return ivf.adc_candidates(
            codes, arts, qids, qnorm, params.n_probe, 500,
            n_buckets=16,
        ).count()
    t_s1 = timed("stage1+window", stage1_full)

    def full():
        return ivf.search(
            codes, vdf, arts, bqueries, preliminary_top_k=500,
            final_top_k=10, n_probe=params.n_probe,
            max_trained_id=None, n_buckets=16,
        ).count()
    t_full = timed("full_search", full)

    print(f"\nwindow (s1full - scan) ~= {(t_s1 - t_scan)*1000:.0f}ms")
    print(f"stage2 (full - stage1) ~= {(t_full - t_s1)*1000:.0f}ms")
    print(f"ms/query full = {t_full/nq*1000:.2f}")


if __name__ == "__main__":
    main()
