"""1M-vector ANN scale probe — the 100x evidence behind PERF_NOTES.

Generates a clustered 1M x 64-d corpus ON EXECUTORS (seeded per
partition, nothing large ships from the driver), builds the IVF-PQ
index with the default heuristics, then measures build rate, amortized
batch-search latency, and recall@50 against exact brute force (streamed
driver-side GEMM over the corpus).

Usage: python tools/scale_probe_1m.py [n_vectors]
Writes work files under /tmp/scale_probe_idx; prints one summary line
per phase. Takes ~8 minutes at 1M on local[32].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, C, N_PARTS, Q = 64, 256, 64, 512
WORK = "/tmp/scale_probe_idx"


def main() -> None:
    from mindb_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from mindb_spark.core.heuristics import resolve_index_params
    from mindb_spark.index import build as B
    from mindb_spark.index import ivf

    rng = np.random.default_rng(11)
    centers = (rng.normal(size=(C, D)) * 4.0).astype(np.float32)
    bc = spark.sparkContext.broadcast(centers)
    # exact-N split: the first N % N_PARTS partitions carry one extra row
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

    t0 = time.time()
    (
        spark.range(N_PARTS).repartition(N_PARTS, "id")
        .mapInPandas(gen, schema="id long, vector array<double>")
        .write.mode("overwrite").parquet(f"{WORK}/vectors")
    )
    print(f"gen+write: {time.time() - t0:.1f}s for {N} x {D}", flush=True)
    vdf = spark.read.parquet(f"{WORK}/vectors")

    from mindb_spark.core.heuristics import use_two_level_clustering

    params = resolve_index_params(N, D)
    # with no memory cap this returns True past 500k vectors, so at 1M
    # the probe exercises the TWO-LEVEL build path (not subsampling) —
    # numbers are not comparable to pre-500k-threshold probe runs
    two_level = use_two_level_clustering(N, D, None)
    print(
        f"k={params.num_clusters} n_probe={params.n_probe} "
        f"two_level={two_level}",
        flush=True,
    )
    n_buckets = B.default_n_buckets(params.num_clusters)
    t0 = time.time()
    # COVERING build (vectors stored beside the codes): lets the probe
    # measure the fused small-Q path; column pruning keeps the classic
    # two-stage scans unaffected by the extra column
    arts, _ = B.build_index(
        vdf, params, f"{WORK}/idx", n_buckets=n_buckets,
        use_two_level=two_level, carry_cols=("vector",),
    )
    dt = time.time() - t0
    print(
        f"build (covering, {n_buckets} buckets): {dt:.1f}s = "
        f"{dt / N * 1000:.3f} ms/vector", flush=True,
    )

    codes = spark.read.parquet(f"{WORK}/idx/codes")
    r = np.random.default_rng(1000)
    qm = centers[r.integers(0, C, size=Q)] + r.normal(size=(Q, D)).astype(np.float32)
    qm = qm.astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    queries = [(i, qm[i]) for i in range(Q)]

    def run(nq, fused=True):
        t0 = time.time()
        out = ivf.search(
            codes, vdf, arts, queries[:nq], preliminary_top_k=500, final_top_k=50,
            n_probe=params.n_probe, max_trained_id=None, n_buckets=n_buckets,
            rescore_from_codes=fused,
        ).collect()
        return time.time() - t0, out

    run(8)  # warm the kernels
    # small-Q floor: with space-filling cell ids one query's probed cells
    # merge into few id runs -> pushed-down BETWEEN predicates prune the
    # codes scan to ~probed rows (report the run count alongside)
    from mindb_spark.index.order import probed_id_runs

    probed1 = ivf.rank_centroids(arts, qm[:1], params.n_probe)
    runs1 = probed_id_runs(sorted({int(c) for c in probed1[0]}))
    print(
        f"probe locality: Q=1 probes {probed1.shape[1]} cells in "
        f"{len(runs1)} id-runs", flush=True,
    )
    for nq in (1, 1, 8, 128, Q, Q):  # repeats: first run pays page-cache misses
        dt, out = run(nq)
        mode = "fused" if nq * 500 <= 4096 else "two-stage"
        print(
            f"search Q={nq} ({mode}): {dt:.1f}s = {dt / nq * 1000:.1f} ms/query",
            flush=True,
        )
    for nq in (1, 1):  # the classic path on the same index, for the delta
        dt, out = run(nq, fused=False)
        print(
            f"search Q={nq} (two-stage): {dt:.1f}s = {dt / nq * 1000:.1f} ms/query",
            flush=True,
        )

    # exact ground truth for 64 queries: streamed driver-side GEMM
    qf = qm[:64].astype(np.float32)
    scores = np.full((64, 50), -2.0, dtype=np.float32)
    ids = np.zeros((64, 50), dtype=np.int64)

    def fold(buf_v, buf_i):
        V = np.asarray(buf_v, dtype=np.float32)
        I = np.asarray(buf_i, dtype=np.int64)
        S = qf @ V.T
        for qi in range(64):
            s = np.concatenate([scores[qi], S[qi]])
            ii = np.concatenate([ids[qi], I])
            keep = np.argsort(-s)[:50]
            scores[qi], ids[qi] = s[keep], ii[keep]

    t0 = time.time()
    buf_v, buf_i = [], []
    for row in vdf.toLocalIterator(prefetchPartitions=True):
        buf_v.append(row.vector)
        buf_i.append(row.id)
        if len(buf_v) >= 100_000:
            fold(buf_v, buf_i)
            buf_v, buf_i = [], []
    if buf_v:
        fold(buf_v, buf_i)
    print(f"brute-force ground truth: {time.time() - t0:.1f}s", flush=True)

    got: dict[int, set] = {}
    for rrow in ivf.search(
        codes, vdf, arts, queries[:64], preliminary_top_k=500, final_top_k=50,
        n_probe=params.n_probe, max_trained_id=None, n_buckets=n_buckets,
    ).collect():
        got.setdefault(rrow.query_id, set()).add(rrow.id)
    recs = [len(got.get(qi, set()) & set(ids[qi].tolist())) / 50 for qi in range(64)]
    print(f"recall@50: {float(np.mean(recs)):.4f}", flush=True)


if __name__ == "__main__":
    main()
