"""MinHash wall-time attribution at 5.1M docs (round 9, VERDICT r8 #4).

Round 8's dedup_scale_probe established the family is LINEAR in docs and
concluded "MinHash is not the wall; the text SCAN is" — this probe makes
that quantitative and measures the one lever it implies: the
``hash_family="xxhash64"`` scale lane (shingles as 64-bit token-window
fingerprints — no shingle strings, no md5; operators/dedup.py) against
the oracle-portable md5 lane.

Measurement design (the first version of this probe taught two lessons
the hard way):
- ONE timed end-to-end run per lane, each in a FRESH SparkSession with a
  1/16-scale warm pass first — nested-prefix phase timing (count stage A,
  then A+B, subtract) produced NEGATIVE deltas because accumulated JVM
  heap/GC debt and cold-first-measurement ordering dwarf the stage costs
  (the same cross-probe GC effect bench.py's _quiesce documents, 4-8x),
  and an un-quiesced md5 lane read 737 s where a clean session reads
  ~360 s (dedup_scale_probe r8).
- Phase attribution comes from the Spark UI's per-stage executor metrics
  of the SINGLE timed run instead of re-running prefixes: the scan +
  shingle explode + partial signature aggregation FUSE into one
  whole-stage-codegen'd stage by design, so "scan vs signature" is not a
  physical boundary — the stage table is the truthful split.

Correctness is asserted in-probe: both lanes must land in the
[99.9%, 100%] band of the planted pair count (verify=True removes every
false positive, so > planted is a hard bug; misses are the ~1e-4/pair
LSH detection tail at j~0.84 with 16 hashes / 8 bands).

Usage: python tools/minhash_phase_probe.py [n_groups] [lane[,lane]]
  default 3_400_000 -> 5.1M docs, the round-8 scale point, both lanes;
  a lane filter (e.g. `13600000 xxhash64`) runs one lane at another
  scale — used for the 20.4M-doc fast-lane linearity point.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

G = int(sys.argv[1]) if len(sys.argv) > 1 else 3_400_000
LANES = tuple(
    sys.argv[2].split(",") if len(sys.argv) > 2 else ("md5", "xxhash64")
)
# dedup_scale_probe reads ITS argv at import time — hand it none
sys.argv = sys.argv[:1]

from dedup_scale_probe import corpus  # noqa: E402  (same dir)


def _stages(spark) -> dict[int, dict]:
    """Completed-stage metrics keyed by stageId (UI REST)."""
    try:
        app = spark.sparkContext.applicationId
        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
        url = f"http://localhost:{port}/api/v1/applications/{app}/stages?status=complete"
        rows = json.load(urllib.request.urlopen(url, timeout=10))
        return {
            r["stageId"]: {
                "name": r.get("name", "")[:60],
                "executor_run_sec": round(r.get("executorRunTime", 0) / 1000),
                "input_gb": round(r.get("inputBytes", 0) / 2**30, 2),
                "shuffle_read_gb": round(r.get("shuffleReadBytes", 0) / 2**30, 2),
                "shuffle_write_gb": round(r.get("shuffleWriteBytes", 0) / 2**30, 2),
                "tasks": r.get("numCompleteTasks", 0),
            }
            for r in rows
        }
    except Exception as e:  # UI disabled / race: walls only
        print(f"# stage-metric read failed: {e}", file=sys.stderr)
        return {}


def _planted(g: int) -> int:
    def copies(res: int) -> int:
        return 1 if res < 7 else (2 if res < 9 else 4)

    return sum(
        (copies(res) * (copies(res) - 1) // 2)
        * (g // 10 + (1 if res < g % 10 else 0))
        for res in range(10)
    )


def _run_lane(lane: str, g: int) -> dict:
    from mindb_spark.operators.dedup import minhash_lsh_pairs
    from mindb_spark.session import get_spark

    spark = get_spark(f"minhash-phase-{lane}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        kw = dict(k=3, num_hashes=16, n_bands=8, verify=True, hash_family=lane)
        # JIT/codegen warm pass at 1/16 scale — first-run effects otherwise
        # land on the timed run (measured: 2x on the first lane)
        small = corpus(spark, max(g // 16, 1000)).localCheckpoint()
        minhash_lsh_pairs(small, 0.5, **kw).count()
        small.unpersist()
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
            time.sleep(0.5)

        docs = corpus(spark, g).localCheckpoint()
        n_docs = docs.count()
        before = set(_stages(spark))
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(docs, 0.5, **kw).count()
        wall = time.time() - t0
        stage_rows = {
            sid: row for sid, row in _stages(spark).items() if sid not in before
        }
        planted = _planted(g)
        if not (planted * 0.999 <= n_pairs <= planted):
            raise SystemExit(
                f"{lane} lane pair count {n_pairs} vs planted {planted} "
                "outside the [0.999, 1.0] detection band"
            )
        out = {
            "docs": n_docs,
            "pairs": n_pairs,
            "end_to_end_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall),
            "stages": [
                stage_rows[sid] | {"stage": sid}
                for sid in sorted(stage_rows)
                if stage_rows[sid]["executor_run_sec"] >= 1
            ],
        }
        print(f"# {lane}: e2e {out['end_to_end_sec']}s "
              f"({out['docs_per_sec']} docs/s), pairs {n_pairs}",
              file=sys.stderr)
        for row in out["stages"]:
            print(f"#   {row}", file=sys.stderr)
        return out
    finally:
        spark.stop()
        # a fresh session per lane needs the previous JVM actually gone
        time.sleep(3)


def main() -> None:
    out = {"n_groups": G, "planted_pairs": _planted(G), "lanes": {}}
    for lane in LANES:
        out["lanes"][lane] = _run_lane(lane, G)
    if {"md5", "xxhash64"} <= set(out["lanes"]):
        out["speedup_end_to_end"] = round(
            out["lanes"]["md5"]["end_to_end_sec"]
            / out["lanes"]["xxhash64"]["end_to_end_sec"],
            2,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
