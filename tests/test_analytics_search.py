"""Funnel / retention analytics and BM25 / RRF hybrid search."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mindb_spark.operators.analytics import funnel_counts, retention_cohorts
from mindb_spark.operators.search import bm25_scores, rrf_fuse


def _events(spark, rows):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    )


def _t(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


# ------------------------------------------------------------------ funnel
def test_funnel_strict_ordering(spark):
    ev = _events(
        spark,
        [
            # user 1 completes the whole funnel in order
            (1, "view", _t(1, 9)), (1, "click", _t(1, 10)), (1, "purchase", _t(1, 11)),
            # user 2 clicks BEFORE viewing -> click doesn't count; no purchase
            (2, "click", _t(1, 8)), (2, "view", _t(1, 9)),
            # user 3 views only
            (3, "view", _t(2)),
            # user 4 purchases without ever viewing -> not in funnel at all
            (4, "purchase", _t(1)),
            # user 5: view -> click, purchase before click -> stops at click
            (5, "view", _t(1, 1)), (5, "purchase", _t(1, 2)), (5, "click", _t(1, 3)),
        ],
    )
    out = {r.step: r.n_users for r in
           funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_equal_timestamp_does_not_convert(spark):
    # strictly-after semantics: same-instant next step does not count
    ev = _events(spark, [(1, "view", _t(1, 9)), (1, "click", _t(1, 9))])
    out = {r.step: r.n_users for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 0}


def test_funnel_step_numbers_and_order(spark):
    ev = _events(spark, [(1, "view", _t(1))])
    rows = funnel_counts(ev, ["view", "click"]).collect()
    assert [(r.step_no, r.step) for r in rows] == [(0, "view"), (1, "click")]


# --------------------------------------------------------------- retention
def test_retention_cohort_table(spark):
    ev = _events(
        spark,
        [
            (1, "view", _t(1)), (1, "view", _t(2)), (1, "view", _t(4)),
            (2, "view", _t(1, 23, 59)), (2, "view", _t(2)),
            (3, "view", _t(2)),
        ],
    )
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in retention_cohorts(ev).collect()}
    d0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    assert out[(d0, 0)] == 2          # users 1, 2 first seen day 1
    assert out[(d0, 1)] == 2          # both active day 2
    assert out[(d0, 3)] == 1          # only user 1 on day 4
    assert out[(d0 + 1, 0)] == 1      # user 3's own cohort
    assert (d0, 2) not in out         # nobody active on day 3


def test_retention_max_offset_filter(spark):
    ev = _events(spark, [(1, "view", _t(1)), (1, "view", _t(30))])
    out = retention_cohorts(ev, max_offset_days=7).collect()
    assert max(r.day_offset for r in out) == 0


# -------------------------------------------------------------------- bm25
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_rare_term_matches_higher(spark):
    docs = _docs(
        spark,
        [
            (0, "hash table scan"),          # matches both query terms
            (1, "hash hash hash filler"),    # common term, repeated
            (2, "scan"),                     # rare term only
            (3, "unrelated words entirely"),
            (4, "hash join"),
            (5, "hash partition"),
        ],
    )
    out = {r.doc_id: r for r in bm25_scores(docs, ["hash", "scan"]).collect()}
    assert 3 not in out                      # no match -> no row
    assert out[0].n_matched_terms == 2
    # doc 0 (both terms) outscores every hash-only doc (doc 2's one-token
    # length normalization legitimately boosts it — classic BM25)
    assert all(out[0].score > out[d].score for d in (1, 4, 5))
    # 'scan' (df=2) is rarer than 'hash' (df=4): doc 2 beats doc 4
    assert out[2].score > out[4].score


def test_bm25_tf_saturation(spark):
    # k1 saturation: tripling tf must NOT triple the score
    docs = _docs(spark, [(0, "x y z"), (1, "x x x y z")])
    out = {r.doc_id: r.score for r in bm25_scores(docs, ["x"]).collect()}
    assert out[1] > out[0]
    assert out[1] < 3 * out[0]


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        bm25_scores(_docs(spark, [(0, "a")]), [])


# --------------------------------------------------------------------- rrf
def test_rrf_fusion_prefers_docs_in_both_lists(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=60).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert out[11].in_both and not out[10].in_both
    assert out[11].rrf_score == pytest.approx(1 / 62 + 1 / 61)
    assert out[10].rrf_score == pytest.approx(1 / 61)
    # 11 (rank 2 + rank 1) beats 10 (rank 1 only)
    assert out[11].rrf_score > out[10].rrf_score


def test_rrf_no_python_nodes_and_single_join(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    plan = rrf_fuse(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
