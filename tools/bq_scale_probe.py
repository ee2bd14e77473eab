"""Binary-quantization scale probe: encode + Hamming search at 1M+ vectors.

Vectors are generated ON EXECUTORS (seeded per-id expressions — nothing
scales with n on the driver), encoded to sign-bit words, then searched:
Hamming top-50 for a Q-query batch, reranked to exact-cosine top-10.
Records encode rate, stage-1 scan rate (rows x queries / sec), end-to-end
latency, and recall@10 vs exact cosine on a 100k-row verification slice.

Usage: python tools/bq_scale_probe.py [n] [q]   (default 1_000_000, 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DIM = 64


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from mindb_spark.index import bq
    from mindb_spark.session import get_spark

    spark = get_spark("bq-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # executor-side deterministic vectors: dim j of row i is a hash-derived
    # uniform in [-1, 1) — structureless, the worst case for any sign-bit
    # bucketing (real embeddings cluster, which only helps)
    cols = [
        (
            (F.xxhash64(F.col("id"), F.lit(j)) % 1_000_000) / 500_000.0
        ).alias(f"d{j}")
        for j in range(DIM)
    ]
    vecs = (
        spark.range(N)
        .select(F.col("id"), F.array(*cols).alias("embedding"))
    )
    t0 = time.time()
    enc = bq.bq_encode(vecs, DIM, id_col="id").localCheckpoint()
    n_enc = enc.count()
    enc_s = time.time() - t0
    print(
        f"encode n={n_enc}: {enc_s:.1f}s = {n_enc / enc_s / 1e6:.2f}M vecs/s "
        f"({enc_s / n_enc * 1e6:.3f} us/vec)", flush=True,
    )

    rng = np.random.default_rng(11)
    q_ids = rng.integers(0, N, size=Q)
    qvecs = (
        vecs.where(F.col("id").isin([int(i) for i in q_ids]))
        .collect()
    )
    queries = [(int(i), list(r.embedding)) for i, r in enumerate(qvecs)]

    # warm pass then timed pass (steady state is the serving number)
    raw = vecs.localCheckpoint()
    bq.bq_knn(enc, raw, queries[:2], DIM, k=10, rerank=50, id_col="id").count()
    t0 = time.time()
    out = bq.bq_knn(enc, raw, queries, DIM, k=10, rerank=50, id_col="id")
    n_out = out.count()
    dt = time.time() - t0
    print(
        f"search Q={Q} k=10 rerank=50: {dt:.2f}s end-to-end "
        f"= {dt / Q * 1000:.0f} ms/q; stage-1 rate "
        f"{N * Q / dt / 1e6:.0f}M hamming rows/s; {n_out} result rows",
        flush=True,
    )

    # recall vs exact cosine on a verification slice (exact over all N is
    # the O(N*Q*dim) oracle — bounded here to keep the probe < minutes)
    slice_n = min(N, 100_000)
    sl = raw.where(F.col("id") < slice_n)
    sl_enc = enc.where(F.col("id") < slice_n)
    got = bq.bq_knn(sl_enc, sl, queries, DIM, k=10, rerank=100, id_col="id").collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.id)
    mat = np.array(
        [r.embedding for r in sl.orderBy("id").collect()], dtype=np.float64
    )
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qm = np.array([v for _, v in queries], dtype=np.float64)
    qmn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    truth = np.argsort(-(matn @ qmn.T), axis=0)[:10].T
    recalls = [
        len(by_q.get(i, set()) & set(truth[i].tolist())) / 10 for i in range(Q)
    ]
    print(
        f"recall@10 (rerank=100, {slice_n}-row slice, structureless worst "
        f"case): {float(np.mean(recalls)):.3f}", flush=True,
    )


if __name__ == "__main__":
    main()
