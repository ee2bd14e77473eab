"""Concurrent resident serving under the round-8 shared BLAS pin.

Round-8 ADVICE made ``_single_threaded_blas`` concurrency-safe with a
process-wide depth counter: concurrent point queries share one
pin/restore cycle instead of interleaving (which could leave the whole
process BLAS-1 forever). The trade this probe measures: while ANY
small-batch query holds the pin, every thread's BLAS runs
single-threaded — fine for point-query GEMMs (they are tiny, the pin
exists because the fork/join cost dominated them), but worth a number:
aggregate point-query throughput at 1/2/4/8 serving threads, plus the
invariant that the pool's thread count is restored once drained.

Usage: python tools/resident_concurrency_probe.py [n] [d]  (30k x 64)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
QUERIES_PER_THREAD = 200


def main() -> None:
    from mindb_spark.core.heuristics import resolve_index_params
    from mindb_spark.core.resident import ResidentSnapshot
    from mindb_spark.index import pq as pqmod
    from mindb_spark.index.build import build_index, default_n_buckets
    from mindb_spark.session import get_spark

    spark = get_spark("resident-concurrency-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(32, D)) * 4.0
    mat = centers[rng.integers(0, 32, size=N)] + rng.normal(size=(N, D))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)],
        "id long, vector array<double>",
    ).localCheckpoint()
    params = resolve_index_params(N, D)
    nb = default_n_buckets(params.num_clusters)
    idx = f"/tmp/resident_conc_probe_{N}_{D}"
    arts, _ = build_index(vdf, params, idx, n_buckets=nb, carry_cols=("vector",))
    codes = spark.read.parquet(f"{idx}/codes")
    table = (
        codes.select("cluster_id", "id", "code", "bterm", "vector")
        .orderBy("cluster_id", "id")
        .toArrow()
    )
    snap = ResidentSnapshot.assemble_from_arrow(
        arts, params.n_probe, table, D, arts.codebooks.shape[0], True
    )

    controls = pqmod._blas_controls()
    before = [getattr(h, g)() for h, _s, g in controls]

    qpool = mat[rng.integers(0, N, size=1024)] + 0.05 * rng.normal(
        size=(1024, D)
    )
    for i in range(8):  # warm
        snap.query(qpool[i : i + 1], preliminary_top_k=500, final_top_k=10)

    out = {"n": N, "d": D, "per_thread": QUERIES_PER_THREAD, "threads": {}}
    for nt in (1, 2, 4, 8):
        err: list = []

        def worker(tid: int) -> None:
            try:
                r = np.random.default_rng(tid)
                for _ in range(QUERIES_PER_THREAD):
                    qi = int(r.integers(0, 1024))
                    snap.query(
                        qpool[qi : qi + 1], preliminary_top_k=500, final_top_k=10
                    )
            except Exception as e:  # noqa: BLE001
                err.append(repr(e))

        threads = [threading.Thread(target=worker, args=(t,)) for t in range(nt)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.time() - t0
        assert not err, err
        total = nt * QUERIES_PER_THREAD
        out["threads"][str(nt)] = {
            "total_qps": round(total / dt),
            "ms_per_query_per_thread": round(dt / QUERIES_PER_THREAD * 1000, 2),
        }
        print(f"# {nt} threads: {out['threads'][str(nt)]}", file=sys.stderr)

    after = [getattr(h, g)() for h, _s, g in controls]
    out["blas_threads_restored"] = after == before
    out["pin_depth_zero"] = pqmod._PIN_DEPTH == 0
    assert out["blas_threads_restored"] and out["pin_depth_zero"], (before, after)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
