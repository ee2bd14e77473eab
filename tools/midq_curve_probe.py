"""Mid-Q batch-latency curve at large N (VERDICT r5 item 5).

Round 5 measured the 10M batch curve as two-stage and found Q=128 at
65.6 ms/query vs 29-55 at Q=512 — mid-size batches paid stage 2's full
vectors-table fetch without Q=512's amortization. Round 6 opened the
fused covering path to every batch size (ivf.search), which removes
that fetch entirely; this probe records the resulting Q-curve
(best-of-2 per point, fused and two-stage side by side) so the curve's
shape — no interior per-query maximum on the fused path — is measured,
not argued.

Usage: python tools/midq_curve_probe.py [n_vectors] [best_of] [q_list]
Reuses the corpus/index under /tmp/midq_probe when present (delete the
dir to force a rebuild). ~30 min at 10M on local[32] (covering build
dominates); 1M runs in ~3 min. ``best_of`` (default 2) repeats each
(Q, mode) cell that many times and keeps the minimum — VERDICT r6 #6
asks for best-of-4 at Q in {64,128,256} to separate router error from
host noise; ``q_list`` is comma-separated (default 1,32,64,128,256,512).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
BEST_OF = int(sys.argv[2]) if len(sys.argv) > 2 else 2
Q_LIST = (
    tuple(int(x) for x in sys.argv[3].split(","))
    if len(sys.argv) > 3
    else (1, 32, 64, 128, 256, 512)
)
D, C, N_PARTS = 64, 256, 64
WORK = "/tmp/midq_probe"


def main() -> None:
    from mindb_spark.session import get_spark

    spark = get_spark("midq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from mindb_spark.core.heuristics import (
        resolve_index_params,
        use_two_level_clustering,
    )
    from mindb_spark.index import build as B
    from mindb_spark.index import ivf

    rng = np.random.default_rng(11)
    centers = (rng.normal(size=(C, D)) * 4.0).astype(np.float32)
    bc = spark.sparkContext.broadcast(centers)
    base, rem = divmod(N, N_PARTS)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for pid in pdf["id"]:
                per = base + (1 if pid < rem else 0)
                if per == 0:
                    continue
                start = pid * base + min(pid, rem)
                r = np.random.default_rng(1000 + pid)
                a = r.integers(0, C, size=per)
                m = bc.value[a] + r.normal(size=(per, D)).astype(np.float32)
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                ids = np.arange(start, start + per, dtype=np.int64)
                yield pd.DataFrame({"id": ids, "vector": list(m.astype(np.float64))})

    params = resolve_index_params(N, D)
    two_level = use_two_level_clustering(N, D, None)
    n_buckets = B.default_n_buckets(params.num_clusters)

    if not os.path.isdir(f"{WORK}/idx/codes"):
        t0 = time.time()
        (
            spark.range(N_PARTS).repartition(N_PARTS, "id")
            .mapInPandas(gen, schema="id long, vector array<double>")
            .write.mode("overwrite").parquet(f"{WORK}/vectors")
        )
        print(f"gen+write: {time.time() - t0:.1f}s for {N} x {D}", flush=True)
        vdf = spark.read.parquet(f"{WORK}/vectors")
        t0 = time.time()
        B.build_index(
            vdf, params, f"{WORK}/idx", n_buckets=n_buckets,
            use_two_level=two_level, carry_cols=("vector",),
        )
        dt = time.time() - t0
        print(f"covering build: {dt:.1f}s = {dt / N * 1000:.3f} ms/vector", flush=True)
    vdf = spark.read.parquet(f"{WORK}/vectors")
    from mindb_spark.index.build import IndexArtifacts

    arts = IndexArtifacts.load(f"{WORK}/idx/artifacts.npz")
    codes = spark.read.parquet(f"{WORK}/idx/codes")
    print(
        f"k={params.num_clusters} n_probe={params.n_probe} "
        f"buckets={n_buckets} two_level={two_level}", flush=True,
    )

    r = np.random.default_rng(1000)
    qm = centers[r.integers(0, C, size=512)] + r.normal(size=(512, D)).astype(np.float32)
    qm = qm.astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    queries = [(i, qm[i]) for i in range(512)]

    def run(nq, mode):
        # "fused": force the fused path (approx_rows=1 -> ~zero estimated
        # ship). "two_stage": force classic. "auto": the production
        # router (approx_rows=N cost model) — records which side it picks.
        kw = dict(
            preliminary_top_k=500, final_top_k=50, n_probe=params.n_probe,
            max_trained_id=None, n_buckets=n_buckets,
        )
        if mode == "fused":
            kw["approx_rows"] = 1
        elif mode == "two_stage":
            kw["rescore_from_codes"] = False
        else:
            kw["approx_rows"] = N
        t0 = time.time()
        ivf.search(codes, vdf, arts, queries[:nq], **kw).count()
        return time.time() - t0

    run(8, "fused")  # warm kernels + page cache
    run(8, "two_stage")
    print(
        f"Q      fused_ms/q   two_stage_ms/q   routed_ms/q   (best-of-{BEST_OF})",
        flush=True,
    )
    for nq in Q_LIST:
        out = []
        for mode in ("fused", "two_stage", "auto"):
            best = None
            for _ in range(BEST_OF):
                dt = run(nq, mode)
                best = dt if best is None else min(best, dt)
            out.append(best / nq * 1000)
        delta = (out[2] - min(out[0], out[1])) / max(min(out[0], out[1]), 1e-9)
        print(
            f"{nq:<6d} {out[0]:10.1f}   {out[1]:10.1f}   {out[2]:10.1f}"
            f"   routed-vs-best {delta * 100:+.0f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
