"""Drill into stage-2 rerank cost at q512 (flagship regression, r6).

Times, on the 30k bench corpus:
  A. rerank_exact on a MATERIALIZED candidate set (isolates stage 2)
  B. full two-stage search (baseline)
  C. fused covering search at q512 (stage 2 eliminated; requires the
     fused gate to admit large Q)
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
    spark = get_spark("s2-probe", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
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
    arts, _ = build_index(vdf, params, "/tmp/s2_idx", n_buckets=16)
    codes = spark.read.parquet("/tmp/s2_idx/codes")
    arts_cov, _ = build_index(
        vdf, params, "/tmp/s2_idx_cov", n_buckets=16, carry_cols=("vector",)
    )
    codes_cov = spark.read.parquet("/tmp/s2_idx_cov/codes")

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
        print(f"{label:22s} best={ts[0]*1000:8.1f}ms  all={[round(t*1000) for t in ts]}  (rows={n})")
        return ts[0]

    # materialized candidates (what stage 1 hands stage 2)
    cand = ivf.adc_candidates(
        codes, arts, qids, qnorm, params.n_probe, 500, n_buckets=16
    ).select("query_id", "id").localCheckpoint()
    print(f"candidates: {cand.count()} rows")

    timed("A_rerank_only", lambda: ivf.rerank_exact(
        cand, vdf, qids, qnorm, 10
    ).count())

    timed("B_two_stage_full", lambda: ivf.search(
        codes, vdf, arts, bqueries, preliminary_top_k=500, final_top_k=10,
        n_probe=params.n_probe, max_trained_id=None, n_buckets=16,
    ).count())

    # fused at q512 over the covering table (bypass the small-Q gate by
    # calling adc_candidates with rescore directly)
    def fused():
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        scored = ivf.adc_candidates(
            codes_cov, arts_cov, qids, qnorm, params.n_probe, 500,
            n_buckets=16, rescore=True,
        ).select("query_id", "id", F.col("score").alias("cosine_similarity"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine_similarity"), F.col("id")
        )
        return (
            scored.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= 10).drop("_rank")
        ).count()

    timed("C_fused_covering", fused)


if __name__ == "__main__":
    main()
