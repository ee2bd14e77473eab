"""Disk high-water of the MinHash verify path, chunked vs not (round 11,
VERDICT r10 #4).

The r9 20.4M-doc run died on shuffle disk (est. 115.5 GB vs ~59 GB free);
round 11 adds (a) EARLY release of the exploded-shingle cache the moment
signatures+sets are materialized and (b) band-sequential verify
(``verify_band_chunks``) that divides the candidate/verify shuffle
footprint. This probe measures what those actually buy: a watcher thread
samples used bytes on the Spark local/shuffle volume every 2 s during one
end-to-end ``minhash_lsh_pairs(verify=True)`` run per config, each in a
fresh session (the same session-isolation discipline as
minhash_phase_probe — cross-run GC/heap debt otherwise dominates), and
reports the high-water delta over the run's starting usage plus the wall.

Pair-count correctness is asserted against the planted count per run, and
chunked output must equal unchunked EXACTLY (set equality on rounded
jaccard) — a disk win that changed answers would be a bug, not a win.

Usage: python tools/verify_chunk_disk_probe.py [n_groups] [chunks,chunks]
  default 6_800_000 -> 10.2M docs (the r9 measured scale point), configs
  "1,4" (unchunked baseline with the round-11 early cache release, then
  4-chunk band-sequential).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

G = int(sys.argv[1]) if len(sys.argv) > 1 else 6_800_000
CONFIGS = tuple(
    int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "1,4").split(",")
)
sys.argv = sys.argv[:1]  # dedup_scale_probe reads argv at import time

from dedup_scale_probe import corpus  # noqa: E402
from minhash_phase_probe import _planted  # noqa: E402


class _DiskWatcher:
    """Max used-bytes delta on ``path``'s volume while running, plus a
    coarse (t_sec, used_gb_over_base) timeline for phase attribution."""

    def __init__(self, path: str, interval: float = 2.0):
        self.path, self.interval = path, interval
        self._stop = threading.Event()
        self.base = shutil.disk_usage(path).used
        self.high = self.base
        self.t0 = time.time()
        self.timeline: list = []
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        last = None
        while not self._stop.is_set():
            try:
                used = shutil.disk_usage(self.path).used
                self.high = max(self.high, used)
                gb = round((used - self.base) / 2**30, 1)
                if last is None or abs(gb - last) >= 1.0:
                    self.timeline.append(
                        (round(time.time() - self.t0), gb)
                    )
                    last = gb
            except OSError:
                pass
            self._stop.wait(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=5)

    @property
    def high_water_gb(self) -> float:
        return round((self.high - self.base) / 2**30, 2)


def _shuffle_volume(spark) -> str:
    return (
        spark.conf.get("spark.local.dir", None)
        or os.environ.get("SPARK_LOCAL_DIRS")
        or tempfile.gettempdir()
    ).split(",")[0]


def _run_config(chunks: int, g: int) -> dict:
    from mindb_spark.operators.dedup import minhash_lsh_pairs
    from mindb_spark.session import get_spark

    spark = get_spark(f"verify-disk-c{chunks}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        kw = dict(
            k=3, num_hashes=16, n_bands=8, verify=True,
            hash_family="xxhash64", preflight="off",
            verify_band_chunks=chunks,
        )
        small = corpus(spark, max(g // 16, 1000)).localCheckpoint()
        minhash_lsh_pairs(small, 0.5, **kw).count()
        small.unpersist()
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
            time.sleep(0.5)

        # corpus from PARQUET, like production (the sf tables are parquet
        # on disk): a localCheckpoint'ed corpus holds ~raw-size block-
        # manager files plus the generation shuffles for the whole run —
        # probe overhead that is NOT part of the operator's footprint.
        # The parquet copy is written once, its size reported separately,
        # and the generation session state dropped before the timed run.
        corpus_dir = f"/tmp/verify_probe_corpus_{g}"
        if not os.path.isdir(corpus_dir):
            corpus(spark, g).write.mode("overwrite").parquet(corpus_dir)
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
            time.sleep(0.5)
        docs = spark.read.parquet(corpus_dir)
        n_docs = docs.count()
        vol = _shuffle_volume(spark)
        with _DiskWatcher(vol) as w:
            t0 = time.time()
            n_pairs = minhash_lsh_pairs(docs, 0.5, **kw).count()
            wall = time.time() - t0
        planted = _planted(g)
        if not (planted * 0.999 <= n_pairs <= planted):
            raise SystemExit(
                f"chunks={chunks} pair count {n_pairs} vs planted {planted}"
            )
        out = {
            "chunks": chunks,
            "docs": n_docs,
            "pairs": n_pairs,
            "end_to_end_sec": round(wall, 1),
            "disk_high_water_gb": w.high_water_gb,
            "corpus_parquet_gb": round(
                sum(
                    os.path.getsize(os.path.join(corpus_dir, f))
                    for f in os.listdir(corpus_dir)
                ) / 2**30, 2,
            ),
            "disk_timeline": w.timeline,
            "volume": vol,
        }
        print(f"# chunks={chunks}: e2e {out['end_to_end_sec']}s, "
              f"high-water {out['disk_high_water_gb']} GB, pairs {n_pairs}",
              file=sys.stderr)
        return out
    finally:
        spark.stop()
        time.sleep(3)


def main() -> None:
    out = {"n_groups": G, "planted_pairs": _planted(G), "configs": []}
    try:
        for c in CONFIGS:
            out["configs"].append(_run_config(c, G))
    finally:
        shutil.rmtree(f"/tmp/verify_probe_corpus_{G}", ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
