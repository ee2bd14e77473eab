"""Quickstart: the reference's README workflow, Spark-native.

Run from the repo root:  python examples/quickstart.py

Covers the full lifecycle a minDB user runs today — create, add, query
(exact while small), train (IVF-PQ, distributed build), query again
(two-stage), remove, persist/reload — plus the corpus-pipeline operators
the reference lists as future work.
"""

import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np

from mindb_spark import Engine
from mindb_spark.session import get_spark


def main() -> None:
    spark = get_spark("mindb-quickstart", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="mindb_quickstart_")
    eng = Engine(spark, base_path=base)

    # --- create + add (validated, L2-normalized, gapless sequential ids)
    db = eng.create_db("demo")
    rng = np.random.default_rng(0)
    vectors = rng.normal(size=(6000, 32))
    ids = db.add([(v.tolist(), {"tag": f"doc{i}"}) for i, v in enumerate(vectors)])
    print(f"added {len(ids)} vectors, ids {ids[0]}..{ids[-1]}")

    # --- query while untrained: exact brute-force kNN
    res = db.query(vectors[7], final_top_k=3)
    print("flat query top-3 ids:", res["ids"], "(self first, sim ~1)")

    # --- train: distributed IVF-PQ build (PCA + KMeans + PQ codebooks)
    db.train()
    print("trained:", db.is_trained, "| params:", db.info()["index_params"])

    # --- query the trained index: probe -> ADC scan -> exact rerank
    res = db.query(vectors[7], preliminary_top_k=200, final_top_k=3)
    print("trained query top-3 ids:", res["ids"])

    # --- resident serving: pin a RAM snapshot for interactive latency
    # (bit-identical results; falls back to the Spark path when stale or
    # over budget — see core/resident.py)
    import time

    if db.enable_resident_serving():
        db.query(vectors[7], final_top_k=3)  # warm
        t0 = time.time()
        res_r = db.query(vectors[7], preliminary_top_k=200, final_top_k=3)
        print(
            f"resident query top-3 ids: {res_r['ids']} "
            f"({(time.time() - t0) * 1000:.1f} ms)"
        )
        assert res_r["ids"] == res["ids"]  # same answers, faster path

    # --- deletes are immediate; counters drive the auto-retrain policy
    db.remove(ids[:10])
    print("after remove:", db.num_vectors, "coverage:", round(db.coverage_ratio(), 4))

    # --- persistence: everything lives in parquet + a manifest
    eng.close("demo")
    db2 = eng.get_db("demo")
    print("reloaded:", db2.num_vectors, "vectors, trained =", db2.is_trained)

    # --- corpus operators over any DataFrame (here: the synthetic docs)
    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "the quick brown fox"), (2, "something else")],
        "doc_id long, text string",
    )
    from mindb_spark.operators.dedup import dedup_exact_survivors
    from mindb_spark.operators.textops import quality_features

    print("dedup survivors:", sorted(r.doc_id for r in dedup_exact_survivors(docs).collect()))
    quality_features(docs).show(truncate=False)

    db2.delete()


if __name__ == "__main__":
    main()
