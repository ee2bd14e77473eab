"""Round-12 per-query profiler: wall split + job/stage counts + plans.

For each bench query (or the named subset): time fn() construction vs the
count() action separately, count the Spark jobs/stages the query submits
(job-group bookkeeping via the status tracker), and dump
``explain("formatted")`` to ``plans/r13/<query>_<tag>.txt``.

Usage: python tools/profile_queries_r13.py [--tag before] [--sf SF_DIR] [query ...]

Output: one JSON line per query on stdout
  {"query": ..., "build_s": ..., "action_s": ..., "jobs": N, "stages": N,
   "rows": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    import bench as B
    import __spark_entry__ as E
    from mindb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_spark("profile-r13", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    # warm up
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    qs = E.queries()
    todo = names or list(B.BENCH_QUERIES)
    tracker = sc.statusTracker()
    for name in todo:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        fn = qs[name]
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            n = df.count()
            t2 = time.time()
            jobs = tracker.getJobIdsForGroup(group)
            stages = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is not None:
                    stages += len(ji.stageIds)
            # plan of the RETURNED df (post-construction; localCheckpoint'd
            # entries show the checkpoint scan — construction jobs are the
            # real story for those, captured in the numbers)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            print(json.dumps({
                "query": name,
                "build_s": round(t1 - t0, 3),
                "action_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs": len(jobs),
                "stages": stages,
                "rows": n,
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "query": name, "error": f"{type(e).__name__}: {e}"[:200]
            }), flush=True)
        finally:
            sc.setJobGroup("", "")


if __name__ == "__main__":
    main()
