"""Resident-snapshot refresh-vs-rebuild cost (VERDICT r5 item 6).

Measures, on a trained VectorDB, the cost of absorbing a sparse delete
into the serving snapshot via the round-6 tombstone mask
(``refresh_deletes``: one id-column scan) against the full rebuild it
replaces (``build``: collect codes + vectors + metadata for every
indexed row). The results are pinned bit-identical by
tests/test_resident.py; this probe records the latency ratio.

Usage: python tools/resident_refresh_probe.py [n_rows]  (default 500k)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
D, C, N_PARTS = 32, 64, 32


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from mindb_spark.core.database import VectorDB
    from mindb_spark.core.resident import ResidentSnapshot
    from mindb_spark.session import get_spark

    spark = get_spark("refresh-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(3)
    centers = (rng.normal(size=(C, D)) * 4.0).astype(np.float32)
    bc = spark.sparkContext.broadcast(centers)
    base, rem = divmod(N, N_PARTS)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for pid in pdf["id"]:
                per = base + (1 if pid < rem else 0)
                r = np.random.default_rng(2000 + pid)
                a = r.integers(0, C, size=per)
                m = bc.value[a] + r.normal(size=(per, D)).astype(np.float32)
                yield pd.DataFrame({"vector": list(m.astype(np.float64))})

    src = (
        spark.range(N_PARTS).repartition(N_PARTS, "id")
        .mapInPandas(gen, schema="vector array<double>")
    )
    db = VectorDB(spark, "refreshprobe", base_path="/tmp/refresh_probe_db")
    t0 = time.time()
    db.add_dataframe(src)
    print(f"ingest: {time.time()-t0:.1f}s for {N} x {D}", flush=True)
    t0 = time.time()
    db.train()
    print(f"train: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    snap = ResidentSnapshot.build(db, max_bytes=None)
    t_build = time.time() - t0
    print(f"full build: {t_build:.1f}s ({snap.ids.size} rows, "
          f"{snap.nbytes()/1e6:.0f} MB)", flush=True)

    victims = [int(i) for i in rng.integers(0, N, size=50)]
    db.remove(sorted(set(victims)))
    t0 = time.time()
    refreshed = snap.refresh_deletes(db, max_bytes=None)
    t_refresh = time.time() - t0
    assert refreshed is not None and refreshed.live_mask is not None
    dead = int(refreshed.ids.size - refreshed.live_mask.sum())
    print(
        f"tombstone refresh: {t_refresh:.2f}s ({dead} masked) — "
        f"{t_build / t_refresh:.0f}x cheaper than rebuild", flush=True,
    )
    # and the post-delete rebuild for the same state, for the honest ratio
    t0 = time.time()
    snap2 = ResidentSnapshot.build(db, max_bytes=None)
    t_build2 = time.time() - t0
    print(f"post-delete full rebuild: {t_build2:.1f}s "
          f"(ratio vs refresh: {t_build2 / t_refresh:.0f}x)", flush=True)


if __name__ == "__main__":
    main()
