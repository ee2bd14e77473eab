"""768-d ANN scale probe — the reference-dimension evidence (VERDICT r6 #1).

Every prior scale probe ran at d=64; the reference's published regime is
768-d (FIQA 57.6k x 768, README benchmark table) with PCA 256 / PQ 32
defaults (``mindb/utils/training_utils.py:90-129``) and a recall contract
of 0.97@50 (``tests/integration/test_full_eval.py:75-78``). PCA quality,
ADC cost, covering-scan ship volume, and resident budgets all scale with
d, so this probe runs the full stack at the reference's dimension through
the DEFAULT heuristics (at 1M x 768 that is PCA 256, m=32, two-level,
k=6324, n_probe=445) and reports:

- build s and ms/vector (covering layout)
- PCA explained variance (sampled) — the projection-loss signal
- recall@50 vs exact brute force over 64 held-out queries, swept over
  ``preliminary_top_k`` (the reference's fixed default is 500 with a
  "5-10x final_top_k" rule, mindb.py:368-373 — no n-scaling, so the
  sweep documents how the budget must grow with corpus size)
- the Q-curve, fused vs two-stage vs ROUTED, with the router's
  estimated Arrow ship volume per point (the fused kernel ships
  scanned_rows x d x 8 bytes; at 768-d the same scan fraction ships
  12x the bytes of d=64 — round 7 replaced the fixed ship-bytes cap
  with a d-aware cost model after this probe caught the Q=1 misroute)
- resident snapshot: assemble time, bytes, Q=1 and Q=16 latency

Synthetic clustered data (the real FIQA pickles are blob-stripped in
this snapshot), in TWO spectra:

- ``decay`` (default): within-cluster noise with a steep power-law
  spectrum (std_i ~ 1/(i+1), total energy equal to the flat case) —
  the low-intrinsic-dimension shape real text embeddings have and the
  reference's own PCA-256 default assumes. PCA-256 loses <1% of the
  noise variance here, so the defaults' recall contract is expected
  to hold at any n.
- ``flat``: full-rank isotropic noise — the PCA-256 WORST case. At 1M
  rows the top-500-by-exact-projected-distance candidate set already
  caps recall@50 at 0.676 (numpy side experiment, engine-independent:
  any PCA-256+PQ engine, the reference's Faiss stack included, hits
  the same information-theoretic ceiling); preliminary_top_k=2000
  lifts the ceiling to 0.978. The sweep shows what the engine
  actually delivers on both sides of the knob.

Usage:
  python tools/scale_probe_768d.py [n] [dim] [spectrum] [key=val ...]
    spectrum: decay (default) | flat
    curve=0        skip the Q-curve (recall/resident only)
    resident=0     skip the resident section
    prelims=500,2000   preliminary_top_k values for the recall sweep

Work files under /tmp/scale_probe_768d_{spectrum} (a 1M x 768 run
writes ~13 GB: vectors + covering codes). Corpus, index and brute-force
ground truth are REUSED when present — delete the dir to force a
rebuild. ~25-45 min cold at 1M on local[32]; warm re-runs skip the
build (~174 s) and the ground-truth fold (~197 s).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_pos = [a for a in sys.argv[1:] if "=" not in a]
_kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
N = int(_pos[0]) if len(_pos) > 0 else 1_000_000
D = int(_pos[1]) if len(_pos) > 1 else 768
SPECTRUM = _pos[2] if len(_pos) > 2 else "decay"
RUN_CURVE = _kv.get("curve", "1") != "0"
RUN_RESIDENT = _kv.get("resident", "1") != "0"
PRELIMS = tuple(int(x) for x in _kv.get("prelims", "500,2000").split(","))
C, N_PARTS = 256, 64
# the reuse key must carry n: a 3M run against a reused 1M dir would
# silently measure the smaller corpus under the larger corpus' params
WORK = f"/tmp/scale_probe_768d_{SPECTRUM}_{N}"
# pre-rename reuse dirs hold exactly the 1M corpora; the BARE pre-rename
# dir was generated with isotropic noise, i.e. the 'flat' shape — reusing
# it for any other spectrum would silently mislabel the measurement
# (round-8 ADVICE)
_legacies = [f"/tmp/scale_probe_768d_{SPECTRUM}"]
if SPECTRUM == "flat":
    _legacies.append("/tmp/scale_probe_768d")
for _legacy in _legacies:
    if N == 1_000_000 and not os.path.isdir(WORK) and os.path.isdir(_legacy):
        WORK = _legacy
        break


def noise_scale(d: int) -> np.ndarray:
    """Per-coordinate noise std for the chosen spectrum, total variance d
    (same energy as isotropic) so the two regimes differ only in SHAPE."""
    if SPECTRUM == "flat":
        return np.ones(d, dtype=np.float32)
    s = 1.0 / (np.arange(d, dtype=np.float64) + 1.0)
    s *= np.sqrt(d / np.sum(s * s))
    return s.astype(np.float32)


def main() -> None:
    from mindb_spark.session import get_spark

    spark = get_spark("scale-probe-768d")
    spark.sparkContext.setLogLevel("ERROR")
    from mindb_spark.core.heuristics import (
        resolve_index_params,
        use_two_level_clustering,
    )
    from mindb_spark.index import build as B
    from mindb_spark.index import ivf
    from mindb_spark.index.build import IndexArtifacts

    rng = np.random.default_rng(11)
    # same center-separation ratio as the d=64 probes: pair distance
    # s*sqrt(2d) vs noise norm sqrt(d) is s*sqrt(2) regardless of d
    centers = (rng.normal(size=(C, D)) * 4.0).astype(np.float32)
    nscale = noise_scale(D)
    bc = spark.sparkContext.broadcast((centers, nscale))
    base, rem = divmod(N, N_PARTS)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for pid in pdf["id"]:
                per = base + (1 if pid < rem else 0)
                if per == 0:
                    continue
                start = pid * base + min(pid, rem)
                r = np.random.default_rng(1000 + pid)
                ctrs, nsc = bc.value
                a = r.integers(0, C, size=per)
                m = ctrs[a] + r.normal(size=(per, D)).astype(np.float32) * nsc
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                ids = np.arange(start, start + per, dtype=np.int64)
                yield pd.DataFrame({"id": ids, "vector": list(m.astype(np.float64))})

    params = resolve_index_params(N, D)
    two_level = use_two_level_clustering(N, D, None)
    n_buckets = B.default_n_buckets(params.num_clusters)
    print(
        f"spectrum={SPECTRUM} defaults: pca={params.pca_dimension} "
        f"m={params.compressed_vector_bytes} k={params.num_clusters} "
        f"n_probe={params.n_probe} two_level={two_level}", flush=True,
    )

    if not os.path.isdir(f"{WORK}/idx/codes"):
        t0 = time.time()
        (
            spark.range(N_PARTS).repartition(N_PARTS, "id")
            .mapInPandas(gen, schema="id long, vector array<double>")
            .write.mode("overwrite").parquet(f"{WORK}/vectors")
        )
        print(f"gen+write: {time.time() - t0:.1f}s for {N} x {D}", flush=True)
        vdf = spark.read.parquet(f"{WORK}/vectors")
        t0 = time.time()
        B.build_index(
            vdf, params, f"{WORK}/idx", n_buckets=n_buckets,
            use_two_level=two_level, carry_cols=("vector",),
        )
        dt = time.time() - t0
        print(
            f"build (covering, {n_buckets} buckets): {dt:.1f}s = "
            f"{dt / N * 1000:.3f} ms/vector", flush=True,
        )
    else:
        print(f"reusing corpus+index under {WORK}", flush=True)
    vdf = spark.read.parquet(f"{WORK}/vectors")
    arts = IndexArtifacts.load(f"{WORK}/idx/artifacts.npz")
    codes = spark.read.parquet(f"{WORK}/idx/codes")

    # PCA explained variance on a sample — the projection-loss signal
    smp = np.array(
        [r.vector for r in vdf.sample(fraction=min(1.0, 20_000 / N), seed=5)
         .limit(20_000).collect()]
    )
    cen = smp - arts.mean
    tot = float((cen * cen).sum())
    proj = cen @ arts.pca
    print(
        f"pca explained variance ({arts.pca.shape[1]}/{D}): "
        f"{float((proj * proj).sum()) / tot:.4f} (sampled {len(smp)} rows)",
        flush=True,
    )

    r = np.random.default_rng(1000)
    Q = 512
    qm = centers[r.integers(0, C, size=Q)] + (
        r.normal(size=(Q, D)).astype(np.float32) * nscale
    )
    qm = qm.astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    queries = [(i, qm[i]) for i in range(Q)]

    def run(nq, fused, routed=False, prelim=500):
        t0 = time.time()
        out = ivf.search(
            codes, vdf, arts, queries[:nq], preliminary_top_k=prelim,
            final_top_k=50, n_probe=params.n_probe, max_trained_id=None,
            n_buckets=n_buckets, rescore_from_codes=fused,
            approx_rows=N if routed else None,
        ).collect()
        return time.time() - t0, out

    if RUN_CURVE:
        run(8, fused=True)  # warm the kernels (JIT + Arrow init)
        print("Q-curve (best-of-2 per point):", flush=True)
        for nq in (1, 128, Q):
            p = min(1.0, params.n_probe / max(1, params.num_clusters))
            frac = 1.0 - (1.0 - p) ** nq
            est_mb = N * frac * D * 8 / (1 << 20)
            choice = ivf.route_fused(
                N, params.n_probe, params.num_clusters, nq, D, 500
            )
            row = {
                "q": nq, "est_ship_mb": round(est_mb, 1),
                "router": "fused" if choice else "two-stage",
            }
            for label, fused, routed in (
                ("fused", True, False), ("two_stage", False, False),
                ("routed", True, True),
            ):
                best = None
                for _ in range(2):
                    dt, _ = run(nq, fused=fused, routed=routed)
                    best = dt if best is None else min(best, dt)
                row[label + "_ms_per_q"] = round(best / nq * 1000, 1)
            print(f"  {row}", flush=True)

    # exact ground truth for 64 queries: streamed driver-side GEMM,
    # cached on disk (same query seed every run)
    gt_path = f"{WORK}/gt64.npz"
    if os.path.exists(gt_path):
        ids = np.load(gt_path)["ids"]
        print("reusing brute-force ground truth", flush=True)
    else:
        qf = qm[:64].astype(np.float32)
        scores = np.full((64, 50), -2.0, dtype=np.float32)
        ids = np.zeros((64, 50), dtype=np.int64)

        def fold(buf_v, buf_i):
            V = np.asarray(buf_v, dtype=np.float32)
            I = np.asarray(buf_i, dtype=np.int64)
            S = qf @ V.T
            for qi in range(64):
                s = np.concatenate([scores[qi], S[qi]])
                ii = np.concatenate([ids[qi], I])
                keep = np.argsort(-s)[:50]
                scores[qi], ids[qi] = s[keep], ii[keep]

        t0 = time.time()
        buf_v, buf_i = [], []
        for row in vdf.toLocalIterator(prefetchPartitions=True):
            buf_v.append(row.vector)
            buf_i.append(row.id)
            if len(buf_v) >= 100_000:
                fold(buf_v, buf_i)
                buf_v, buf_i = [], []
        if buf_v:
            fold(buf_v, buf_i)
        np.savez(gt_path, ids=ids)
        print(f"brute-force ground truth: {time.time() - t0:.1f}s", flush=True)

    for prelim in PRELIMS:
        got: dict[int, set] = {}
        for rrow in ivf.search(
            codes, vdf, arts, queries[:64], preliminary_top_k=prelim,
            final_top_k=50, n_probe=params.n_probe, max_trained_id=None,
            n_buckets=n_buckets, approx_rows=N,
        ).collect():
            got.setdefault(rrow.query_id, set()).add(rrow.id)
        recs = [
            len(got.get(qi, set()) & set(ids[qi].tolist())) / 50
            for qi in range(64)
        ]
        print(
            f"recall@50 (prelim={prelim}): {float(np.mean(recs)):.4f} "
            f"(reference contract: >= 0.97 at 768-d defaults)", flush=True,
        )

    if not RUN_RESIDENT:
        return
    # resident snapshot at the reference dimension: the Arrow assemble
    # keeps peak driver memory ~ the data size (a Row collect at 1M x 768
    # would transiently need tens of GB)
    from mindb_spark.core.resident import ResidentSnapshot

    t0 = time.time()
    table = (
        codes.select("cluster_id", "id", "code", "bterm", "vector")
        .orderBy("cluster_id", "id")
        .toArrow()
    )
    snap = ResidentSnapshot.assemble_from_arrow(
        arts, params.n_probe, table, D, arts.m, True
    )
    asm_s = time.time() - t0
    print(
        f"resident assemble: {asm_s:.1f}s, {snap.nbytes() / (1 << 30):.2f} GiB",
        flush=True,
    )
    for _ in range(3):
        snap.query(qm[:1], preliminary_top_k=500, final_top_k=50)
    ts = []
    for i in range(5):
        t0 = time.time()
        snap.query(qm[i : i + 1], preliminary_top_k=500, final_top_k=50)
        ts.append(time.time() - t0)
    print(f"resident q1: {sorted(ts)[2] * 1000:.1f} ms (median of 5)", flush=True)
    t0 = time.time()
    snap.query(qm[:16], preliminary_top_k=500, final_top_k=50)
    print(f"resident q16: {(time.time() - t0) / 16 * 1000:.1f} ms/query", flush=True)


if __name__ == "__main__":
    main()
