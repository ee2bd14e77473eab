"""Round-12 cross-round creep adjudication (VERDICT r11 #2, #6).

Raw walls on four queries crept monotonically r8->r11 with no code change
on (most of) their paths: stream_dedup 1.43->5.11 s, stream_sessionize
1.37->3.58, hybrid_search_rrf 2.91->4.12, dedup_minhash 1.63->4.25 (plus
quality_deciles 1.70->2.47 r10->r11). Single-round weather arguments can
justify any one step; a four-round monotone trend cannot be settled
without a same-host A/B. This probe runs ONE leg: the creep set (plus a
stable control) best-of-2 with bench.py's per-query discipline
(clearCache + System.gc) in a FRESH process, bracketed by the zero-repo-
code host sentinel. Alternate legs between HEAD and the round-8 tree:

    python tools/ab_creep_r12.py HEAD
    PYTHONPATH=/tmp/r8tree python tools/ab_creep_r12.py r8 /tmp/r8tree
    (repeat, alternating, 2-3 legs each)

Interpretation contract (written before measuring):
  - r8 tree reproduces today's walls ~ HEAD's -> the trend is
    environment/driver-context, not code; per-query normalized walls
    become the metric of record for these queries.
  - HEAD consistently slower than r8 on the same minutes-apart host ->
    genuine code-path regression; bisect the rounds between.
  - both trees FAST in fresh processes vs the driver bench's walls ->
    the creep is run-context (JVM/codegen state from the 40+ queries
    that precede these in the bench loop, or fixture-cost growth), not
    host weather and not the operators themselves.

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
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

# the r8->r11 creep set + one stable control (orders_by_month moved
# <1.2x across the same rounds)
PROBE_QUERIES = [
    "stream_dedup",
    "stream_sessionize",
    "hybrid_search_rrf",
    "dedup_minhash",
    "quality_deciles",
    "orders_by_month",
]
RUNS = 2


def _sentinel(spark) -> dict:
    """Zero-repo-code host sentinel (inlined so the r8 leg measures the
    identical workload; same kernels as bench.py's)."""
    import numpy as np

    ref = {"jvm": 1.15, "shuffle": 0.65, "gemm": 0.60}

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


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    import __spark_entry__ as E
    from mindb_spark.session import get_spark

    spark = get_spark("ab-creep-r12", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    sent = _sentinel(spark)
    print(f"# [{label}] sentinel = {sent}", file=sys.stderr)

    qs = E.queries()
    out: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        fn = qs.get(name)
        if fn is None:  # entry absent in this tree's round
            out[name] = {"best": None, "all": [], "note": "entry absent"}
            continue
        ts = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            try:
                fn(spark, SF_DIR).count()
            except Exception as e:  # noqa: BLE001
                out[name] = {"best": None, "all": ts,
                             "note": f"{type(e).__name__}: {e}"[:160]}
                break
            ts.append(round(time.time() - t0, 3))
        else:
            out[name] = {"best": min(ts), "all": ts}
        print(f"# [{label}] {name}: {out[name]}", file=sys.stderr)

    sent_end = _sentinel(spark)
    print(f"# [{label}] sentinel(end) = {sent_end}", file=sys.stderr)
    print(json.dumps({
        "label": label,
        "sf_dir": SF_DIR,
        "queries": out,
        "sentinel_start": sent,
        "sentinel_end": sent_end,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
