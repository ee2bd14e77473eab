"""Round-10 regression attribution probe (VERDICT r9 #1, "What's wrong" #1).

BENCH_r08 -> BENCH_r09 showed the headline +46% and the raw ANN curve
roughly doubling (q512 3.1 -> 6.2 ms/q). Round 9's builder attributed it
to host weather (a same-code fixed workload swung 4.2x across hours), but
r9 DID ship changes on these paths (eager pins, lane filters), so the
judge marked the raw ANN curve `weak` pending r8-bisect-strength evidence.

This probe re-measures the regressed set at best-of-4 on the SAME host so
code-vs-host variance can be attributed: run it once from HEAD and once
from a round-8 worktree (commit 9736d3d, "round 8: verdict/advice/
correctness/bench"), then diff the JSON:

    git worktree add /tmp/r8tree 9736d3d
    python tools/bench_bisect_r10.py HEAD
    PYTHONPATH=/tmp/r8tree python tools/bench_bisect_r10.py r8 /tmp/r8tree

When invoked with a checkout path, that tree's __spark_entry__ and
mindb_spark are imported instead of HEAD's — both measurements then run
the same driver, same host, same data, minutes apart.

Environment:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

_tree = sys.argv[2] if len(sys.argv) > 2 else None
sys.path.insert(
    0, _tree or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# reduced probe set for alternating A/B legs (SPARK_GRAFT_BISECT_FAST=1):
# the raw ANN curve (the r9 `weak` mark) + one control, ~3 min/leg, so
# four alternating legs fit inside one host-weather window
FAST = os.environ.get("SPARK_GRAFT_BISECT_FAST") == "1"


def _sentinel(spark) -> dict:
    """Zero-repo-code host sentinel (inlined copy of bench.py's so the
    r8 worktree leg — whose bench.py predates it — measures the same
    thing). See bench.py SENTINEL_REF for the calibration story."""
    import numpy as np

    ref = {"jvm": 1.1, "shuffle": 0.6, "gemm": 0.5}

    def best_of(k, fn):
        fn()
        best = None
        for _ in range(k):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    walls = {
        "jvm": best_of(3, lambda: spark.range(1 << 32).selectExpr(
            "sum(xxhash64(id) % 1000000007)").collect()),
        "shuffle": best_of(3, lambda: spark.range(1 << 27).selectExpr(
            "id % 65536 as k").groupBy("k").count().selectExpr(
            "sum(count)").collect()),
    }
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1536, 1536))

    def gemm():
        b = a
        for _ in range(24):
            b = np.tanh(b @ a * 1e-3)
        return b

    walls["gemm"] = best_of(3, gemm)
    ratios = [walls[k] / ref[k] for k in ref]
    idx = float(np.exp(np.mean(np.log(ratios))))
    return {"walls": {k: round(v, 3) for k, v in walls.items()},
            "host_index": round(idx, 3)}

# the r8->r9 >40% regressions + two controls that stayed within noise
PROBE_QUERIES = [
    "ann_build",            # 5.6 -> 10.8 s
    "similarity_join",      # 2.4 -> 7.3 s
    "dedup_simhash",        # 2.4 -> 3.7 s
    "ann_clustered_query",  # regressed with the raw curve
    # controls (small movers r8->r9):
    "agg_rollup",
    "tfidf_top_terms",
]
RUNS = 4


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    import __spark_entry__ as E
    from mindb_spark.session import get_spark

    spark = get_spark("bisect-r10", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()

    sent = _sentinel(spark)
    print(f"# sentinel = {sent}", file=sys.stderr)

    qs = E.queries()
    out: dict[str, dict] = {}
    for name in (["agg_rollup", "ann_clustered_query"] if FAST else PROBE_QUERIES):
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

    # the raw (internal Spark two-stage) ANN amortized curve — the r9
    # `weak` mark — best-of-4 per Q with a warm pass
    ann: dict[str, float] = {}
    pin = E._sf_fallback_probe(spark, SF_DIR)
    E._ann_search(spark, SF_DIR, n_queries=16, n_probe=pin).count()  # warm
    for nq in (16, 128, 512):
        best = None
        for _ in range(RUNS):
            t0 = time.time()
            E._ann_search(spark, SF_DIR, n_queries=nq, n_probe=pin).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ann[f"q{nq}"] = round(best / nq * 1000, 2)
        print(f"# ann q{nq}: {ann[f'q{nq}']} ms/q", file=sys.stderr)

    print(json.dumps({
        "label": label, "queries": out, "ann_ms_per_query": ann,
        "sentinel": sent,
        "ann_ms_per_query_normalized": {
            k: round(v / sent["host_index"], 2) for k, v in ann.items()
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
