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


def _eq_lit(term: str):
    """One-arg element predicate for ``F.filter`` (a two-arg lambda would
    be read as the (element, index) form by the higher-order-function
    binder, not a captured default)."""
    return lambda x: x == F.lit(term)


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

    Small-query assumption (ADVICE r12): scoring evaluates one
    ``size(filter(tokens))`` pass per query term per row — O(k · doc_len)
    with k query terms — and caches k+1 longs per doc. That beats the
    explode formulation decisively for the short queries keyword search
    serves (k ≲ 32); for a very long term list (hundreds of terms, i.e.
    more a join than a query) the old term-count-independent explode
    shape would win — compose one from ``_doc_term_tf`` +
    ``F.broadcast`` of the term list if that workload ever appears.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    base = widen(docs.select(F.col(id_col).alias("_id"), F.col(text_col)))
    # Round 12 (guide §2.3/§2.4): tf is a PER-ROW quantity — count the
    # query term's occurrences inside each doc's token array directly
    # instead of exploding every corpus token into a (doc, term) shuffle.
    # The whole query then runs on ONE tokenize pass over the corpus and
    # ZERO exchanges: the old plan tokenized three times (dl stats, the
    # explode, the dl join's lens side) and paid two hash-agg exchanges
    # plus two joins; here the per-doc stats row (id, dl, tf_0..tf_k —
    # a few longs) is persisted, one combined aggregate computes
    # n_docs/avgdl/df_t, and the scored output is a plain filter+project
    # over the cached rows. Values are bit-identical: tf/df/dl are the
    # same integers, and every double op below replays the old
    # expression tree's IEEE order (idf folded from the same (N, df)
    # doubles, per-term products in the same sorted-term order).
    # two-step projection: the lowered token array materializes ONCE per
    # row (CollapseProject keeps non-cheap expressions single-evaluated),
    # then dl and every per-term tf read it — one regex pass per row
    lowered = base.select("_id", F.transform(tokens(text_col), F.lower).alias("_lt"))
    per_doc = lowered.select(
        "_id",
        F.size("_lt").cast("long").alias("dl"),
        *[
            F.size(F.filter("_lt", _eq_lit(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    ).persist()
    try:
        # one stats job over the cached narrow rows: corpus size (ids are
        # primary keys, so count(*) == count distinct), avgdl as
        # exact-long-sum / count — NOT avg(), so the double is the same
        # single division in every engine regardless of accumulation
        # order (avgdl averages docs with >= 1 token, matching the
        # explode-based definition) — and per-term document frequency
        # df_t = #docs with tf_t > 0, all in a single aggregate.
        stats = per_doc.agg(
            F.count("*"),
            F.sum("dl"),
            F.count(F.when(F.col("dl") > 0, True)),
            *[
                F.count(F.when(F.col(f"_tf{i}") > 0, True))
                for i in range(len(terms))
            ],
        ).first()
        n_docs, tot, cnt = stats[0], stats[1], stats[2]
        dfs = [stats[3 + i] for i in range(len(terms))]
        if not cnt:  # no document has a single token: nothing can match
            return base.select("_id").limit(0).select(
                F.col("_id").alias(id_col),
                F.lit(0).cast("long").alias("n_matched_terms"),
                F.lit(0.0).alias("score"),
            )
        avgdl = tot / cnt

        # idf_t replayed in Python doubles with the old op order
        # ((N - df) + 0.5) / (df + 0.5) — identical IEEE result to the
        # old in-plan fold over the same values.
        idfs = [
            (float(n_docs) - dfs[i] + 0.5) / (dfs[i] + 0.5)
            for i in range(len(terms))
        ]
        matched = [F.col(f"_tf{i}") > 0 for i in range(len(terms))]
        n_matched = None
        for m in matched:
            c = F.when(m, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            n_matched = c if n_matched is None else n_matched + c
        # per-term score with the old expression's exact IEEE op order;
        # a non-matching term contributes 0.0, like the old coalesce of
        # the absent pivot cell
        total = None
        for i in range(len(terms)):
            s = (
                F.lit(idfs[i])
                * F.col(f"_tf{i}")
                * F.lit(k1 + 1.0)
                / (
                    F.col(f"_tf{i}")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
                    )
                )
            )
            c = F.when(matched[i], s).otherwise(F.lit(0.0))
            total = c if total is None else total + c
        any_match = matched[0]
        for m in matched[1:]:
            any_match = any_match | m
        out = per_doc.where(any_match).select(
            F.col("_id").alias(id_col),
            n_matched.alias("n_matched_terms"),
            total.alias("score"),
        )
        # eager materialization so the cache can be released before
        # return: the scored output is matched-docs-sized
        return out.localCheckpoint(eager=True)
    finally:
        per_doc.unpersist()


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
