"""Keyword search (BM25-family) and hybrid rank fusion.

Completes the retrieval surface around the vector engine: BM25-scored
keyword search over the documents table and reciprocal-rank fusion (RRF)
of a keyword ranking with a vector-similarity ranking — the standard
"hybrid search" composition modern retrieval stacks run next to ANN.

Portability: BM25's usual ``log`` idf is replaced by its rational Robertson
core ``(N - df + 0.5) / (df + 0.5)`` *without* the log — libm ``log``
differs in the last ulp across engines, while add/mul/div on the same IEEE
doubles do not, so a SQL oracle replays scores bit-for-bit. The log is
monotone, so per-term ordering is preserved; multi-term totals weight rare
terms more sharply than log-BM25 (documented, deterministic). RRF is pure
rational arithmetic over integer ranks by construction.

Scale notes
-----------
- ``bm25_scores`` is explode -> two hash aggregations + a broadcast of the
  (tiny) query-term df table; per-doc state is one row per matched
  (doc, term) — posting-list sized, not corpus sized.
- ``rrf_fuse`` is a full-outer join of two (id, rank) lists — both already
  top-k sized, so the fusion cost is negligible next to either retriever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mindb_spark.functions.text import tokens
from mindb_spark.session import widen

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document containing at least one query term.

    ``score = sum_t idf_t * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))``
    with the rational idf ``(N - df + 0.5) / (df + 0.5)`` (see module doc).
    Terms are matched on lowercased whitespace tokens. Returns
    (id, n_matched_terms, score) — rank downstream with a deterministic
    (score desc, id) order.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    base = widen(docs.select(F.col(id_col).alias("_id"), F.col(text_col)))
    # document length is a PER-ROW projection (size of the token array) —
    # no explode/shuffle needed for it; the explode below feeds only the
    # query-term matches
    from mindb_spark.functions.text import token_count

    lens = base.select("_id", token_count(text_col).alias("dl"))
    # one stats job: corpus size (ids are primary keys, so count(*) ==
    # count distinct) + avgdl as exact-long-sum / count — NOT avg(), so
    # the double is the same single division in every engine regardless
    # of accumulation order. avgdl averages docs with >= 1 token, matching
    # the explode-based definition (empty docs contribute no tokens).
    n_docs, tot, cnt = lens.agg(
        F.count("*"),
        F.sum("dl"),
        F.count(F.when(F.col("dl") > 0, True)),
    ).first()
    if not cnt:  # no document has a single token: nothing can match
        return base.select("_id").limit(0).select(
            F.col("_id").alias(id_col),
            F.lit(0).cast("long").alias("n_matched_terms"),
            F.lit(0.0).alias("score"),
        )
    avgdl = tot / cnt

    tok = base.select(
        "_id", F.explode(tokens(text_col)).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    qt = F.array(*[F.lit(t) for t in terms])
    hits = tok.where(F.array_contains(qt, F.col("term")))
    # persist the posting-list-sized tf table: dfreq and the scored join
    # both consume it, and Spark re-runs the corpus explode per consumer
    # otherwise (no cross-consumer exchange reuse) — at corpus scale that
    # doubles the dominant scan+regex cost
    tf = hits.groupBy("_id", "term").agg(F.count("*").alias("tf")).persist()
    try:
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (
            F.col("df") + F.lit(0.5)
        )
        scored = (
            tf.join(F.broadcast(dfreq), "term")
            .join(
                lens.withColumnRenamed("_id", "_did"),
                F.col("_id") == F.col("_did"),
            )
            .withColumn(
                "_s",
                idf
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
                    )
                ),
            )
        )
        # per-term pivot then a FIXED-ORDER sum (sorted terms): float
        # addition is order-sensitive in the last ulp, and a groupBy sum()
        # leaves the order to the engine — this keeps scores bit-identical
        # to the oracle
        per_term = [
            F.sum(F.when(F.col("term") == t, F.col("_s"))).alias(f"_s{i}")
            for i, t in enumerate(terms)
        ]
        agg = scored.groupBy("_id").agg(
            F.count("*").alias("n_matched_terms"), *per_term
        )
        total = None
        for i in range(len(terms)):
            c = F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
            total = c if total is None else total + c
        out = agg.select(
            F.col("_id").alias(id_col), "n_matched_terms", total.alias("score")
        )
        # eager materialization so the cache can be released before return:
        # the scored output is matched-docs-sized, tiny next to the explode
        return out.localCheckpoint(eager=True)
    finally:
        tf.unpersist()


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked id lists.

    ``rrf = 1/(k + rank_a) + 1/(k + rank_b)`` with a missing side
    contributing 0 — the standard hybrid-search combiner (Cormack et al.;
    pure rational arithmetic, engine-exact). Inputs carry (id, rank) with
    rank starting at 1. Returns (id, rrf_score, in_both).
    """
    a = rank_a.select(F.col(id_col), F.col(rank_col).alias("_ra"))
    b = rank_b.select(F.col(id_col), F.col(rank_col).alias("_rb"))
    j = a.join(b, id_col, "full_outer")
    contrib_a = F.when(
        F.col("_ra").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("_ra"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("_rb").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("_rb"))
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col(id_col),
        (contrib_a + contrib_b).alias("rrf_score"),
        (F.col("_ra").isNotNull() & F.col("_rb").isNotNull()).alias("in_both"),
    )
