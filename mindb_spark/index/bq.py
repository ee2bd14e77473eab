"""1-bit binary quantization (BQ): sign-bit packing + Hamming search.

The cheapest compressed vector-search path: each dimension becomes one
bit (v[j] > 0), packed into 32-bit words stored as BIGINT columns. A
64-d float32 vector (256 B) becomes two words (16 B) — 16x smaller —
and the stage-1 scan is pure xor + bit_count per row, the cheapest
distance kernel that exists; Hamming distance on sign bits is a proven
proxy for angular distance (Charikar 2002, SimHash for cosine). Stage 2
reranks the Hamming top-R by exact cosine against the raw vectors, the
standard BQ-with-rescore pattern of modern vector stores.

Scale design
------------
- Encoding is a single projection (no shuffle); words live in plain
  BIGINT columns so min/max parquet row-group stats, column pruning and
  whole-stage codegen all apply. 32 bits per word keeps every shift
  inside signed-int64 range in EVERY engine (DuckDB errors on BIGINT
  overflow; Spark would silently wrap at bit 63).
- Stage 1 is ONE scan of the word columns (16 B/row at 64-d) with the
  query batch broadcast beside it; the Hamming expression is flat
  xor/bit_count inside whole-stage codegen — embarrassingly parallel,
  no skew (every row costs the same). The per-query top-R cut uses the
  same declarative window shape as the exact-kNN oracle path; at
  cluster scale the partial-top-k pattern of ``operators.topk`` applies
  unchanged on top of the same Hamming column.
- Rerank touches only the <= Q*R survivors' raw vectors via an id join,
  never shipping the corpus.

No counterpart in the reference (its compressed path is IVF-PQ,
`mindb/index/faiss_index.py`); this is the beyond-reference 1-bit tier
below SQ8 (`index/sq.py`).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bits packed per BIGINT word — 32 so that ``1 << (bits_per_word - 1)``
#: stays far inside signed-int64 in both Spark and the DuckDB oracle
BITS_PER_WORD = 32


def n_words(dim: int) -> int:
    return math.ceil(dim / BITS_PER_WORD)


def _word_expr(vec, w: int):
    """BIGINT word w: bit i set iff vec[w*32 + i] > 0 (0-based dims).

    NaN dims leave the bit UNSET: Spark SQL's ``NaN > 0`` is true (NaN
    sorts above all numbers) while driver-side Python's is false, so the
    comparison is guarded with isnan to keep ``bq_encode`` and
    ``encode_query`` bit-identical on NaN-bearing vectors.
    """
    window = F.slice(vec, w * BITS_PER_WORD + 1, BITS_PER_WORD)
    # 2^i via pow: shiftleft takes only a literal shift amount, and pow is
    # exact in double far beyond 2^31 (i <= 31 here)
    bits = F.transform(
        window,
        lambda x, i: F.when(
            (~F.isnan(x)) & (x > 0), F.pow(F.lit(2.0), i).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def bq_encode(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """(id, bq_w0, bq_w1, ...): sign-bit words of each vector.

    One projection, no shuffle; words are plain BIGINT columns (not an
    array) so scans prune to exactly the words a query touches and the
    Hamming expression stays flat inside codegen.
    """
    vec = F.col(vector_col)
    return df.select(
        F.col(id_col),
        *[_word_expr(vec, w).alias(f"bq_w{w}") for w in range(n_words(dim))],
    )


def encode_query(vec, dim: int) -> list[int]:
    """Driver-side sign-bit packing of one query vector (list/ndarray)."""
    words = []
    for w in range(n_words(dim)):
        acc = 0
        for i, x in enumerate(vec[w * BITS_PER_WORD : (w + 1) * BITS_PER_WORD]):
            if x > 0:
                acc += 1 << i
        words.append(acc)
    return words


def _unpack_bits(words):
    """(n, nw) int64 words -> (n, nw*64) float32 0/1 bit matrix.

    Bit ORDER is arbitrary but identical for corpus and queries, which is
    all Hamming needs. float32 because the distance is computed as a GEMM
    (exact: every value here is an integer < 2^24).
    """
    import numpy as np

    u8 = np.ascontiguousarray(words, dtype="<i8").view(np.uint8)
    return np.unpackbits(u8, axis=1).astype(np.float32)


def _hamming_partial_topk(
    encoded: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    rerank: int,
    id_col: str,
) -> DataFrame:
    """(query_id, id, hamming): per-Arrow-batch partial top-``rerank``.

    The scale path for stage 1: each task emits at most
    ``rerank * Q`` survivor rows instead of shuffling all N*Q scored
    rows into the global window — the same partial-top-k discipline as
    ``operators.topk.knn_batch``. The per-batch cut orders by the
    composite key hamming * 2^44 + id, which is EXACTLY the
    (hamming, id) lexicographic order of the global cut (ids must be
    < 2^44 — ~17.6e12, any realistic corpus), so the final window over
    the survivors returns the bit-identical result of the declarative
    path (pinned by tests and the SQL oracle).
    """
    import numpy as np
    import pandas as pd

    from mindb_spark.session import ship_package

    spark = encoded.sparkSession
    ship_package(spark)
    nw = n_words(dim)
    qids = np.array([int(q[0]) for q in queries], dtype=np.int64)
    qwords = np.array(
        [encode_query(v, dim) for _, v in queries], dtype=np.int64
    )  # (Q, nw)
    b_qids = spark.sparkContext.broadcast(qids)
    b_qwords = spark.sparkContext.broadcast(qwords)

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Hamming as a GEMM over unpacked bits: |a xor b| = |a| + |b| - 2a.b
        # for 0/1 vectors — one BLAS call per (batch, all queries) instead
        # of materializing an (n, Q, nw) xor cube (numpy < 2 has no
        # vectorized popcount; the GEMM form is ~40x faster even where it
        # does). All values are integers < 2^24, exact in float32.
        qbits = _unpack_bits(b_qwords.value)  # (Q, nw*64)
        q_pop = qbits.sum(axis=1)  # (Q,)
        qi = b_qids.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            words = np.stack(
                [pdf[f"bq_w{w}"].to_numpy(dtype=np.int64) for w in range(nw)],
                axis=1,
            )  # (n, nw)
            bits = _unpack_bits(words)  # (n, nw*64)
            row_pop = bits.sum(axis=1)  # (n,)
            # in place on the GEMM output (round 13): saves three fresh
            # (n, Q) temps per batch; integer-valued floats, so the
            # reordering is exact
            ham = bits @ qbits.T
            ham *= -2.0
            ham += row_pop[:, None]
            ham += q_pop[None, :]
            ham = ham.astype(np.int64)  # (n, Q)
            # the composite key below is order-equivalent to (hamming, id)
            # ONLY for ids in [0, 2^44); validate per batch so an
            # out-of-range id fails loudly instead of silently breaking
            # the bit-identical-to-declarative guarantee
            if ids.size and (ids.min() < 0 or ids.max() >= (1 << 44)):
                raise ValueError(
                    "bq partial top-k requires ids in [0, 2**44); got "
                    f"range [{ids.min()}, {ids.max()}]"
                )
            key = ham * (1 << 44) + ids[:, None]  # (n, Q)
            kk = min(rerank, key.shape[0])
            idx = np.argpartition(key, kth=kk - 1, axis=0)[:kk]  # (kk, Q)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qi, kk),
                    id_col: ids[idx.T.ravel()],
                    "hamming": np.take_along_axis(ham, idx, axis=0).T.ravel(),
                }
            )

    return encoded.select(id_col, *[f"bq_w{w}" for w in range(nw)]).mapInPandas(
        cut, schema=f"query_id long, {id_col} long, hamming long"
    )


def bq_knn(
    encoded: DataFrame,
    raw: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    partial: bool = True,
) -> DataFrame:
    """Two-stage BQ search: Hamming top-``rerank`` -> exact-cosine top-``k``.

    (query_id, id, score) with deterministic (score desc, id) tie-break
    on the final cut and (hamming, id) on the stage-1 cut, so results
    are exactly reproducible by the SQL oracle.

    ``partial=True`` (default, the scale path) pre-cuts stage 1 per
    Arrow batch so only ``<= rerank * Q`` rows per task reach the global
    window — at cluster scale the all-rows shuffle is the bottleneck,
    not the xor. ``partial=False`` keeps stage 1 fully declarative
    (flat codegen expressions, no Python) — same result bit-for-bit;
    useful for plan inspection and engines without Arrow.
    """
    nw = n_words(dim)
    spark = encoded.sparkSession
    qrows = [
        (int(qid), *encode_query(qvec, dim), [float(x) for x in qvec])
        for qid, qvec in queries
    ]
    schema = (
        "query_id long, "
        + ", ".join(f"_qw{w} long" for w in range(nw))
        + ", _qv array<double>"
    )
    qdf = spark.createDataFrame(qrows, schema)

    if partial:
        scans = _hamming_partial_topk(encoded, queries, dim, rerank, id_col)
    else:
        ham = F.lit(0)
        for w in range(nw):
            ham = ham + F.bit_count(
                F.col(f"bq_w{w}").bitwiseXOR(F.col(f"_qw{w}"))
            )
        scans = encoded.crossJoin(
            F.broadcast(qdf.select("query_id", *[f"_qw{w}" for w in range(nw)]))
        ).select("query_id", F.col(id_col), ham.alias("hamming"))
    w_ham = Window.partitionBy("query_id").orderBy("hamming", id_col)
    cands = (
        scans.withColumn("_rn", F.row_number().over(w_ham))
        .where(F.col("_rn") <= rerank)
        .select("query_id", id_col)
    )

    dot = F.aggregate(
        F.zip_with(
            F.col(vector_col).cast("array<double>"), F.col("_qv"), lambda x, y: x * y
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))

    scored = (
        cands.join(raw.select(F.col(id_col), F.col(vector_col)), id_col)
        .join(F.broadcast(qdf.select("query_id", "_qv")), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            (
                dot
                / (norm(F.col(vector_col).cast("array<double>")) * norm(F.col("_qv")))
            ).alias("score"),
        )
    )
    w_score = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_score))
        .where(F.col("_rn") <= k)
        .select("query_id", id_col, "score")
    )
