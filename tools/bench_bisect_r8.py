"""Round-8 regression attribution probe (VERDICT r7 demand #1).

BENCH_r06 -> BENCH_r07 showed the headline total +8% and six queries
+29..44% — but round 7 only touched the ANN/resident hot files, and
several regressed queries (multi_join_revenue, sessionize,
shuffle_order) never enter that code. This probe re-measures the
regressed set at best-of-4 on the SAME host so code-vs-host variance
can be attributed: run it once from HEAD and once from a round-6
worktree (PYTHONPATH pointing at the checkout), then diff the JSON.

Usage:
    python tools/bench_bisect_r8.py [label]
Environment:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# the six >25% regressions from VERDICT r7 + two stable controls
PROBE_QUERIES = [
    "dedup_jaccard",
    "shuffle_order",
    "multi_join_revenue",
    "sessionize",
    "ann_clustered_query",
    "pack_shards",
    # controls that held steady r6->r7 (within a few %):
    "tfidf_top_terms",
    "agg_rollup",
]
RUNS = 4


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    import __spark_entry__ as E
    from mindb_spark.session import get_spark

    spark = get_spark("bisect-r8", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()

    qs = E.queries()
    out: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        fn = qs[name]
        ts = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            fn(spark, SF_DIR).count()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"best": min(ts), "all": ts}
        print(f"# {name}: best {min(ts)} of {ts}", file=sys.stderr)

    # steady-state ANN amortized curve, best-of-3 per Q with a warm pass
    # (the bench's single-run version is what regressed 69-75%)
    ann: dict[str, float] = {}
    pin = E._sf_fallback_probe(spark, SF_DIR)
    E._ann_search(spark, SF_DIR, n_queries=16, n_probe=pin).count()  # warm
    for nq in (16, 128, 512):
        best = None
        for _ in range(3):
            t0 = time.time()
            E._ann_search(spark, SF_DIR, n_queries=nq, n_probe=pin).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ann[f"q{nq}"] = round(best / nq * 1000, 2)
        print(f"# ann q{nq}: {ann[f'q{nq}']} ms/q", file=sys.stderr)

    print(json.dumps({"label": label, "queries": out, "ann_ms_per_query": ann}))
    spark.stop()


if __name__ == "__main__":
    main()
