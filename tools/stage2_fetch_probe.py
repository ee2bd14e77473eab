"""Stage-2 fetch levers at 1M x 768 (round 8, VERDICT r7 #5).

Stage 2 of the two-stage ANN query joins the candidate (query_id, id)
pairs against the vectors table: a broadcast hash join probing a FULL
table scan, because candidate ids are geometrically clustered but
id-UNIFORM (ingestion order), so parquet row-group min/max stats cannot
prune them. At 3M x 768 that scan decodes ~18 GB per batch (PERF_NOTES
round 7). This probe measures the two candidate levers VERDICT r7
proposed, against the parquet scan's OWN metrics (the SQL REST API's
"number of output rows" / "size of files read" per Scan node — the
stage-level inputBytes metric reads a constant ~340 KB for a 38 MiB
local-FS scan and is unusable):

  (a) runtime Bloom-filter join (spark.sql.optimizer.runtime.
      bloomFilter.*) — expected no-op: Bloom injection targets the
      probe side of SHUFFLE joins, and this join broadcasts the small
      side, so nothing reaches the scan;
  (b) candidate-id BETWEEN-range coalescing over an id-range-clustered
      layout (repartitionByRange + sortWithinPartitions on id, so each
      file/row group covers a narrow id slice) — expected no-op:
      prelim-k candidate ids are uniform over [0, n), so every range
      query still touches ~every row group.

Either way the numbers land in PERF_NOTES; the architecture's real
answer to stage-2 bytes stays the covering/fused route and the
resident snapshot (both measured elsewhere).

Usage: python tools/stage2_fetch_probe.py [n] [d]   (default 1M x 768)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
WORK = f"/tmp/stage2_fetch_probe_{N}_{D}"

_SIZE_UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def _parse_size(s: str) -> float:
    m = re.match(r"([\d.]+)\s*([KMGT]?i?B)", s.replace(",", ""))
    return float(m.group(1)) * _SIZE_UNITS.get(m.group(2), 1) if m else 0.0


def _sql_executions(spark) -> list:
    app = spark.sparkContext.applicationId
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    url = (
        f"http://localhost:{port}/api/v1/applications/{app}/sql"
        "?details=true&planDescription=false&length=10000"
    )
    return json.load(urllib.request.urlopen(url, timeout=20))


def _max_exec_id(spark) -> int:
    execs = _sql_executions(spark)
    return max((e["id"] for e in execs), default=-1)


def _scan_totals_since(spark, exec_floor: int) -> dict:
    """Sum parquet-Scan node metrics over executions with id > floor."""
    time.sleep(1.5)  # the status store aggregates metrics asynchronously
    rows = files_b = scans = 0
    for e in _sql_executions(spark):
        if e["id"] <= exec_floor:
            continue
        for n in e.get("nodes", []):
            if "Scan parquet" not in n.get("nodeName", ""):
                continue
            mets = {m["name"]: m["value"] for m in n.get("metrics", [])}
            rows += int(mets.get("number of output rows", "0").replace(",", ""))
            files_b += _parse_size(mets.get("size of files read", "0 B"))
            scans += 1
    return {
        "scan_rows": rows,
        "files_read_gb": round(files_b / 2**30, 2),
        "scan_nodes": scans,
    }


def main() -> None:
    from pyspark.sql import functions as F

    from mindb_spark.core.heuristics import resolve_index_params
    from mindb_spark.index import ivf
    from mindb_spark.index.build import (
        IndexArtifacts,
        build_index,
        default_n_buckets,
    )
    from mindb_spark.session import get_spark

    spark = get_spark("stage2-fetch-probe")
    spark.sparkContext.setLogLevel("ERROR")

    vec_path = f"{WORK}/vectors"
    vec_sorted_path = f"{WORK}/vectors_sorted"
    idx_dir = f"{WORK}/idx"
    if not os.path.isdir(vec_path):
        # decay-spectrum clustered corpus, generated distributed
        print(f"# generating {N} x {D} ...", file=sys.stderr)
        C = 256
        rng = np.random.default_rng(5)
        centers = (rng.normal(size=(C, D)) * 4.0).astype(np.float32)
        nsc = 1.0 / (np.arange(D) + 1.0)
        nsc = (nsc * np.sqrt(D / np.sum(nsc * nsc))).astype(np.float32)
        bc = spark.sparkContext.broadcast((centers, nsc))

        def gen(batches):
            import pyarrow as pa

            ctr, s = bc.value
            for b in batches:
                ids = b.column(0).to_numpy()
                r = np.random.default_rng(int(ids[0]) + 11)
                a = r.integers(0, C, size=ids.size)
                m = ctr[a] + r.normal(size=(ids.size, D)).astype(np.float32) * s
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids), pa.array(list(m.astype(np.float64)))],
                    ["id", "vector"],
                )

        spark.range(N, numPartitions=64).mapInArrow(
            gen, "id long, vector array<double>"
        ).write.mode("overwrite").parquet(vec_path)
        # id-range-CLUSTERED layout: each file (and so each row group)
        # covers a narrow id slice — the layout lever (b) presumes
        spark.read.parquet(vec_path).repartitionByRange(
            64, "id"
        ).sortWithinPartitions("id").write.mode("overwrite").parquet(
            vec_sorted_path
        )

    vectors = spark.read.parquet(vec_path)
    params = resolve_index_params(N, D)
    nb = default_n_buckets(params.num_clusters)
    if not os.path.isdir(f"{idx_dir}/codes"):
        t0 = time.time()
        build_index(vectors, params, idx_dir, n_buckets=nb)
        print(f"# build {round(time.time() - t0, 1)}s", file=sys.stderr)
    codes = spark.read.parquet(f"{idx_dir}/codes")
    arts = IndexArtifacts.load(os.path.join(idx_dir, "artifacts.npz"))

    sample = vectors.where(F.col("id") % (N // 128) == 7).limit(128).collect()
    qmat = np.array([r.vector for r in sample], dtype=np.float64)
    qmat += 0.05 * np.random.default_rng(9).normal(size=qmat.shape)

    out: dict = {"n": N, "d": D, "modes": {}}

    def run(tag: str, vecs, q: int, extra_conf: dict | None = None):
        confs = extra_conf or {}
        olds = {}
        for k, v in confs.items():
            olds[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            queries = [(i, qmat[i]) for i in range(q)]
            ivf.search(  # warm
                codes, vecs, arts, queries[: min(q, 8)],
                preliminary_top_k=500, final_top_k=50,
                n_probe=params.n_probe, max_trained_id=None, n_buckets=nb,
            ).count()
            floor = _max_exec_id(spark)
            t0 = time.time()
            ivf.search(
                codes, vecs, arts, queries, preliminary_top_k=500,
                final_top_k=50, n_probe=params.n_probe,
                max_trained_id=None, n_buckets=nb,
            ).count()
            dt = time.time() - t0
            m = _scan_totals_since(spark, floor)
            out["modes"][tag] = {"q": q, "sec": round(dt, 2), **m}
            print(f"# {tag}: {out['modes'][tag]}", file=sys.stderr)
        finally:
            for k, v in olds.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    run("baseline_q128", vectors, 128)
    run(
        "bloom_q128", vectors, 128,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1g",
        },
    )
    sorted_vecs = spark.read.parquet(vec_sorted_path)
    run("sorted_layout_q128", sorted_vecs, 128)
    run("baseline_q1", vectors, 1)
    run("sorted_layout_q1", sorted_vecs, 1)

    # lever (b) isolated: coalesce ACTUAL stage-1 candidate ids into
    # BETWEEN ranges and measure the range-clustered layout's scan rows
    # under that pushed predicate — the upper bound of what pushdown
    # can save (scan_rows << n would mean row groups were skipped)
    for q in (1, 128):
        cand = ivf.adc_candidates(
            codes, arts, np.arange(q, dtype=np.int64),
            qmat[:q] / np.linalg.norm(qmat[:q], axis=1, keepdims=True),
            params.n_probe, 500, n_buckets=nb,
        ).select("id").distinct().collect()
        ids = np.sort(np.array([r.id for r in cand], dtype=np.int64))
        gap = max(1, N // 2000)  # merge ids closer than ~half a row group
        ranges, lo, prev = [], int(ids[0]), int(ids[0])
        for i in ids[1:]:
            i = int(i)
            if i - prev > gap:
                ranges.append((lo, prev))
                lo = i
            prev = i
        ranges.append((lo, prev))
        pred = " OR ".join(f"(id BETWEEN {a} AND {b})" for a, b in ranges[:500])
        floor = _max_exec_id(spark)
        sorted_vecs.where(F.expr(pred)).agg(
            F.sum(F.element_at("vector", 1))
        ).collect()
        m = _scan_totals_since(spark, floor)
        out["modes"][f"range_pushdown_scan_q{q}"] = {
            "candidate_ids": int(ids.size),
            "ranges": len(ranges),
            **m,
            "table_rows": N,
        }
        print(
            f"# range q{q}: {out['modes'][f'range_pushdown_scan_q{q}']}",
            file=sys.stderr,
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
