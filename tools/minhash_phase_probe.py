"""MinHash wall-time attribution at 5.1M docs (round 9, VERDICT r8 #4).

Round 8's dedup_scale_probe established the family is LINEAR in docs and
concluded "MinHash is not the wall; the text SCAN is" — this probe makes
that claim quantitative and tests the one lever it implies: per-phase
wall time (scan+shingle explode | signature aggregation | band/bucket
join | verify) for BOTH hash families:

- md5 lane (default, oracle-portable): shingle STRINGS + one md5 + two
  hex-substring parses per exploded row (operators/dedup.py::
  _signatures_from_shingled);
- xxhash64 lane (round 9 scale path): shingles are 64-bit fingerprints
  of the token windows — no shingle string is ever materialized, every
  downstream row moves 8 bytes, and the KM base hashes are one extra
  xxhash64 per row (functions/text.py::shingle_hashes_from_tokens,
  operators/dedup.py::_signatures_from_hashes).

Phases are attributed by nested-prefix timing (each later measurement
recomputes the earlier stages, so phase cost = delta between successive
cumulative walls — no giant checkpoint of the ~600M exploded rows).
Correctness is asserted inside the probe: the fast lane must find
EXACTLY the planted pair count (the corpus plants bounded dup groups at
shingle Jaccard ~0.84 >> tau 0.5; LSH detection probability ~0.9999 at
16/8) and the same count as the md5 lane.

Usage: python tools/minhash_phase_probe.py [n_groups]
  default 3_400_000 -> 5.1M docs, the round-8 scale point.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from dedup_scale_probe import corpus  # noqa: E402  (same dir)

G = int(sys.argv[1]) if len(sys.argv) > 1 else 3_400_000


def main() -> None:
    from mindb_spark.functions.text import exploded_shingle_hashes
    from mindb_spark.operators.dedup import (
        _exploded_shingles,
        _signatures_from_hashes,
        _signatures_from_shingled,
        minhash_lsh_pairs,
    )
    from mindb_spark.session import get_spark

    spark = get_spark("minhash-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = corpus(spark, G).localCheckpoint()
    n_docs = docs.count()
    # planted pairs: per group of c copies, C(c,2) intra-group pairs —
    # exact per-residue accounting (gid % 10: 0-6 -> 1 copy, 7-8 -> 2, 9 -> 4)
    def copies(res: int) -> int:
        return 1 if res < 7 else (2 if res < 9 else 4)

    planted = sum(
        (copies(res) * (copies(res) - 1) // 2) * (G // 10 + (1 if res < G % 10 else 0))
        for res in range(10)
    )
    out: dict = {"docs": n_docs, "planted_pairs": planted, "lanes": {}}

    for lane in ("md5", "xxhash64"):
        fast = lane == "xxhash64"
        t: dict[str, float] = {}

        t0 = time.time()
        shingled = (
            exploded_shingle_hashes(docs, "doc_id", "text", 3)
            if fast
            else _exploded_shingles(docs, "doc_id", "text", 3)
        )
        n_shingles = shingled.count()
        t["scan_shingle"] = time.time() - t0

        t0 = time.time()
        sig_fn = _signatures_from_hashes if fast else _signatures_from_shingled
        sig_fn(shingled.withColumnRenamed("_id", "doc_id"), "doc_id", 16).count()
        cum_sig = time.time() - t0
        t["signature"] = cum_sig - t["scan_shingle"]

        t0 = time.time()
        minhash_lsh_pairs(
            docs, 0.5, k=3, num_hashes=16, n_bands=8,
            verify=False, hash_family=lane,
        ).count()
        cum_band = time.time() - t0
        t["band_join"] = cum_band - cum_sig

        t0 = time.time()
        n_pairs = minhash_lsh_pairs(
            docs, 0.5, k=3, num_hashes=16, n_bands=8,
            verify=True, hash_family=lane,
        ).count()
        cum_full = time.time() - t0
        t["verify"] = cum_full - cum_band

        out["lanes"][lane] = {
            "shingle_rows": n_shingles,
            "pairs": n_pairs,
            "end_to_end_sec": round(cum_full, 1),
            "docs_per_sec": round(n_docs / cum_full),
            "phases_sec": {k: round(v, 1) for k, v in t.items()},
            "phases_pct": {
                k: round(100 * v / cum_full) for k, v in t.items()
            },
        }
        print(f"# {lane}: {out['lanes'][lane]}", file=sys.stderr)
        spark.catalog.clearCache()
        # verify=True removes every false positive, so count > planted is
        # a hard bug; misses are the LSH detection tail (~1e-4/pair at
        # j~0.84 with 16/8) — bound them at 0.1%
        if not (planted * 0.999 <= n_pairs <= planted):
            raise SystemExit(
                f"{lane} lane pair count {n_pairs} vs planted {planted} "
                "outside the [0.999, 1.0] detection band"
            )

    out["speedup_end_to_end"] = round(
        out["lanes"]["md5"]["end_to_end_sec"]
        / out["lanes"]["xxhash64"]["end_to_end_sec"],
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
