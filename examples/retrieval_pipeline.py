"""Retrieval pipeline: keyword (BM25), vector, hybrid (RRF), and SQ8.

Run from the repo root:  python examples/retrieval_pipeline.py

The modern retrieval stack around the vector core: score documents by
keywords, by embedding similarity, fuse the two rankings, and show the
SQ8 scalar-quantized path that trades 4x memory for near-lossless
integer-arithmetic search.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindb_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("mindb-retrieval", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # --- keyword search (BM25-family, rational idf)
    from mindb_spark.operators.search import bm25_scores, rrf_fuse

    kw = bm25_scores(docs, ["hash", "scan", "table"])
    ktop = kw.orderBy(F.desc("score"), "doc_id").limit(10)
    print("keyword top-3:", [(r.doc_id, round(r.score, 3)) for r in ktop.take(3)])

    # --- vector search (exact cosine for the demo corpus size)
    from mindb_spark.functions.vector import l2_normalize
    from mindb_spark.operators.topk import knn_batch

    corpus = emb.select("vec_id", l2_normalize("embedding", "double").alias("vector"))
    q = emb.where(F.col("vec_id") == 0).first().embedding
    vtop = knn_batch(corpus, [(0, list(q))], k=10, id_col="vec_id").select(
        F.col("vec_id").alias("doc_id"),
        F.col("cosine_similarity").alias("score"),
    )
    print("vector top-3:", [(r.doc_id, round(r.score, 3)) for r in vtop.take(3)])

    # --- hybrid: reciprocal-rank fusion of the two rankings
    wk = Window.orderBy(F.desc("score"), "doc_id")
    fused = rrf_fuse(
        vtop.select("doc_id", F.row_number().over(wk).alias("rank")),
        ktop.select("doc_id", F.row_number().over(wk).alias("rank")),
        k=60,
    ).orderBy(F.desc("rrf_score"), "doc_id")
    print("hybrid top-3:", [(r.doc_id, round(r.rrf_score, 4), r.in_both)
                            for r in fused.take(3)])

    # --- SQ8: 4x-compressed codes, asymmetric integer-weight search
    from mindb_spark.index.sq import query_weights, sq_encode, sq_search, sq_train

    vdf = emb.select("vec_id", F.col("embedding").alias("vector"))
    mins, maxs = sq_train(vdf)
    codes = sq_encode(vdf, mins, maxs)
    res = sq_search(
        codes, [(0, query_weights([float(x) for x in q], mins, maxs))],
        k=5, id_col="vec_id",
    )
    print("sq8 top-5:", [(r.vec_id, r.qscore) for r in res.collect()])
    print("done")


if __name__ == "__main__":
    main()
