"""Two-stage ANN query over an IVF-PQ index.

The reference's defining query shape (``mindb/mindb.py:416-431``):
stage 1 probes a compressed index for ``preliminary_top_k`` candidate ids,
stage 2 fetches the candidates' full-precision vectors and exactly reranks
to ``final_top_k``. Spark re-expression:

stage 1:  rank centroids per query (driver numpy — the centroid table is
          small by construction, §heuristics) → probed (query, cluster)
          pairs → ``cluster_bucket``/``cluster_id`` filters PRUNE the codes
          scan (directory + row-group pruning) → ADC scoring in an Arrow
          UDF with per-(query, cluster) lookup tables → per-query partial
          top-k inside each batch → global per-query top-prelim_k window.

stage 2:  semi-join candidate ids against the vectors table (the
          reference's LMDB point-lookups become one hash join,
          ``lmdb_utils.py:48-62`` → ``join``) → exact dot product against
          the full-precision query → per-query top-final_k.

Rows added after the index snapshot (``id > max_trained_id`` — the
reference's watermark, ``mindb.py:332``) are searched exactly and unioned
into stage 2, which subsumes the reference's dual-write/replay machinery
(``fastapi.py:245-311``). Deleted rows drop out in stage 2's inner join
against the live vectors table, so deletes take effect immediately
(reference semantic §2.3.5) even though the codes table still holds them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mindb_spark.index import pq as PQ
from mindb_spark.index.build import IndexArtifacts


def rank_centroids(
    artifacts: IndexArtifacts, queries: np.ndarray, n_probe: int
) -> np.ndarray:
    """(Q, n_probe) best cluster ids per projected query (L2, ascending)."""
    proj = artifacts.project(queries)  # (Q, p)
    C = artifacts.centroids
    d2 = ((proj**2).sum(axis=1, keepdims=True)
          - 2.0 * proj @ C.T
          + (C**2).sum(axis=1)[None, :])
    n_probe = min(n_probe, C.shape[0])
    part = np.argpartition(d2, kth=n_probe - 1, axis=1)[:, :n_probe]
    # order the probed cells best-first (stable for determinism)
    rows = np.arange(d2.shape[0])[:, None]
    order = np.argsort(d2[rows, part], axis=1, kind="stable")
    return part[rows, order]


def adc_candidates(
    codes: DataFrame,
    artifacts: IndexArtifacts,
    query_ids: np.ndarray,
    query_vectors: np.ndarray,
    n_probe: int,
    preliminary_top_k: int,
    id_col: str = "id",
    n_buckets: int = 64,
) -> DataFrame:
    """Stage 1: ADC-score PQ codes in the probed cells; top-prelim_k per query.

    Returns (query_id, id, adc_dist) with <= preliminary_top_k rows/query.
    """
    spark = codes.sparkSession
    from mindb_spark.session import ship_package

    ship_package(spark)
    probed = rank_centroids(artifacts, query_vectors, n_probe)  # (Q, nprobe)

    # Partition + row-group pruning: only the probed buckets/cells are read.
    probed_cids = sorted({int(c) for row in probed for c in row})
    probed_buckets = sorted({c % n_buckets for c in probed_cids})
    pruned = codes.where(
        F.col("cluster_bucket").isin(probed_buckets) & F.col("cluster_id").isin(probed_cids)
    )

    # cluster_id -> [query indexes probing it]
    cluster_to_q: dict[int, list[int]] = {}
    for qi, row in enumerate(probed):
        for c in row:
            cluster_to_q.setdefault(int(c), []).append(qi)

    proj_queries = artifacts.project(query_vectors)  # (Q, p)
    b = spark.sparkContext.broadcast(
        (artifacts.centroids, artifacts.codebooks, proj_queries,
         np.asarray(query_ids, dtype=np.int64), cluster_to_q, preliminary_top_k)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centroids, codebooks, projq, qids, c2q, prelim = b.value
        m = codebooks.shape[0]
        lut_cache: dict[tuple[int, int], np.ndarray] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            out_q, out_id, out_d = [], [], []
            for cid, grp in pdf.groupby("cluster_id"):
                cid = int(cid)
                ids = grp[id_col].to_numpy(dtype=np.int64)
                code_mat = np.frombuffer(b"".join(grp["code"]), dtype=np.uint8).reshape(-1, m)
                for qi in c2q.get(cid, ()):
                    key = (qi, cid)
                    lut = lut_cache.get(key)
                    if lut is None:
                        residual_q = projq[qi] - centroids[cid]
                        lut = PQ.adc_table(residual_q.astype(np.float32), codebooks)
                        lut_cache[key] = lut
                    dists = PQ.adc_scan(code_mat, lut)
                    kk = min(prelim, len(dists))
                    sel = np.argpartition(dists, kth=kk - 1)[:kk] if kk < len(dists) else np.arange(len(dists))
                    out_q.append(np.full(kk, qids[qi], dtype=np.int64))
                    out_id.append(ids[sel])
                    out_d.append(dists[sel].astype(np.float64))
            if out_q:
                yield pd.DataFrame(
                    {"query_id": np.concatenate(out_q),
                     id_col: np.concatenate(out_id),
                     "adc_dist": np.concatenate(out_d)}
                )

    scored = pruned.select("cluster_id", id_col, "code").mapInPandas(
        score, schema=f"query_id long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.col(id_col))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= preliminary_top_k)
        .drop("_rank")
    )


def rerank_exact(
    candidates: DataFrame,
    vectors: DataFrame,
    query_ids: np.ndarray,
    query_vectors_normalized: np.ndarray,
    final_top_k: int,
    id_col: str = "id",
    vector_col: str = "vector",
    score_col: str = "cosine_similarity",
    extra_cols: tuple = (),
) -> DataFrame:
    """Stage 2: exact rerank of candidate ids against full-precision vectors.

    ``candidates``: (query_id, id) pairs. Joined (broadcast — at most
    Q * prelim_k rows) against the vectors table, then scored with the exact
    dot product and cut to final_top_k per query. Inner join against the
    live table drops deleted ids.
    """
    spark = candidates.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(query_ids, query_vectors_normalized)],
        "query_id long, _qvec array<double>",
    )
    from mindb_spark.functions.vector import dot

    cand = candidates.select("query_id", id_col).dropDuplicates(["query_id", id_col])
    joined = vectors.join(F.broadcast(cand), id_col, "inner").join(
        F.broadcast(qdf), "query_id", "inner"
    )
    scored = joined.select(
        "query_id",
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        dot(vector_col, "_qvec").alias(score_col),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(score_col), F.col(id_col))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= final_top_k)
        .drop("_rank")
    )


def search(
    codes: DataFrame,
    vectors: DataFrame,
    artifacts: IndexArtifacts,
    queries: list[tuple[int, np.ndarray]],
    preliminary_top_k: int = 500,
    final_top_k: int = 100,
    n_probe: int | None = None,
    max_trained_id: int | None = None,
    id_col: str = "id",
    vector_col: str = "vector",
    n_buckets: int = 64,
    extra_cols: tuple = (),
) -> DataFrame:
    """Full two-stage query (+ exact search of the unindexed tail)."""
    from mindb_spark.core.heuristics import get_n_probe

    qids = np.array([int(q) for q, _ in queries], dtype=np.int64)
    qmat = np.array([np.asarray(v, dtype=np.float64) for _, v in queries])
    norms = np.linalg.norm(qmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    qnorm = qmat / norms
    n_probe = n_probe or get_n_probe(artifacts.num_clusters)

    cand = adc_candidates(
        codes, artifacts, qids, qnorm, n_probe, preliminary_top_k,
        id_col=id_col, n_buckets=n_buckets,
    ).select("query_id", id_col)

    if max_trained_id is not None:
        # no emptiness probe: an empty tail unions zero rows for free, and
        # callers skip passing a watermark when max_id <= max_trained_id
        tail = vectors.where(F.col(id_col) > max_trained_id)
        from mindb_spark.operators.topk import knn_batch

        tail_cand = knn_batch(
            tail, [(int(q), v) for q, v in zip(qids, qnorm)],
            preliminary_top_k, id_col=id_col, vector_col=vector_col,
        ).select("query_id", id_col)
        cand = cand.unionByName(tail_cand)

    return rerank_exact(
        cand, vectors, qids, qnorm, final_top_k,
        id_col=id_col, vector_col=vector_col, extra_cols=extra_cols,
    )
