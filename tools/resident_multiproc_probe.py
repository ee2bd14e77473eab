"""Multi-process resident serving at the FIQA shape (round 9, VERDICT r8 #7).

Round 8 proved threads cap at ~2x aggregate qps (GIL thrash —
tools/resident_concurrency_probe.py); this probe measures the honest
scale-out: N worker PROCESSES over one mmap-shared saved snapshot
(api/workers.py), each driven by its own client thread. Expect
near-linear qps to 4 workers (separate GILs, separate BLAS pools,
shared page cache), flattening when memory bandwidth binds.

Shape defaults to the reference's own benchmark corpus: 57,600 x 768
(BASELINE.md's FIQA set; single-query mean there is 5.04 ms). Also
records the in-process snapshot baseline and RSS-relevant snapshot
bytes so the "N processes ~ 1 copy of the big arrays" claim is visible.

Usage: python tools/resident_multiproc_probe.py [n] [d]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 57_600
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
QUERIES_PER_CLIENT = 200


def main() -> None:
    from mindb_spark.api.workers import ResidentWorkerPool
    from mindb_spark.core.heuristics import resolve_index_params
    from mindb_spark.core.resident import ResidentSnapshot
    from mindb_spark.index.build import build_index, default_n_buckets
    from mindb_spark.session import get_spark

    spark = get_spark("resident-multiproc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(64, D)) * 4.0
    mat = centers[rng.integers(0, 64, size=N)] + rng.normal(size=(N, D))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)],
        "id long, vector array<double>",
    ).localCheckpoint()
    params = resolve_index_params(N, D)
    nb = default_n_buckets(params.num_clusters)
    idx = f"/tmp/resident_mp_probe_{N}_{D}"
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
    qpool = mat[rng.integers(0, N, size=1024)] + 0.05 * rng.normal(
        size=(1024, D)
    )

    # in-process single-thread baseline
    for i in range(8):
        snap.query(qpool[i : i + 1], preliminary_top_k=500, final_top_k=10)
    t0 = time.time()
    for i in range(QUERIES_PER_CLIENT):
        snap.query(qpool[i % 1024 : i % 1024 + 1], preliminary_top_k=500,
                   final_top_k=10)
    base_qps = QUERIES_PER_CLIENT / (time.time() - t0)
    out = {
        "n": N, "d": D, "per_client": QUERIES_PER_CLIENT,
        "snapshot_bytes": snap.nbytes(),
        "inprocess_qps": round(base_qps, 1),
        "inprocess_ms_per_query": round(1000 / base_qps, 2),
        "workers": {},
    }
    print(f"# in-process baseline: {out['inprocess_qps']} qps", file=sys.stderr)

    expected = None
    for nw in (1, 2, 4, 8):
        with ResidentWorkerPool.from_snapshot(snap, nw) as pool:
            # warm every worker + pin result parity once per pool size
            for w in range(nw):
                got = pool.query_on(
                    w, qpool[0], preliminary_top_k=500, final_top_k=10
                )
                if expected is None:
                    expected = got
                assert got[0]["ids"] == expected[0]["ids"]
                assert (
                    got[0]["cosine_similarity"]
                    == expected[0]["cosine_similarity"]
                )
            errs: list = []

            def client(w: int) -> None:
                try:
                    r = np.random.default_rng(w)
                    for _ in range(QUERIES_PER_CLIENT):
                        qi = int(r.integers(0, 1024))
                        pool.query_on(
                            w, qpool[qi], preliminary_top_k=500,
                            final_top_k=10,
                        )
                except Exception as e:  # noqa: BLE001
                    errs.append(repr(e))

            threads = [
                threading.Thread(target=client, args=(w,)) for w in range(nw)
            ]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.time() - t0
            assert not errs, errs
            total = nw * QUERIES_PER_CLIENT
            out["workers"][str(nw)] = {
                "total_qps": round(total / dt),
                "ms_per_query_per_client": round(
                    dt / QUERIES_PER_CLIENT * 1000, 2
                ),
                "speedup_vs_1": None,  # filled below
            }
            print(f"# {nw} workers: {out['workers'][str(nw)]}", file=sys.stderr)
    one = out["workers"]["1"]["total_qps"]
    for nw, row in out["workers"].items():
        row["speedup_vs_1"] = round(row["total_qps"] / one, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
