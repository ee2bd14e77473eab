"""Corpus-construction operators: contamination, incremental dedup, tf-idf,
and SQ8 scalar quantization."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.operators.corpus import (
    incremental_dedup,
    ngram_contamination,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------ contamination
def test_contamination_detects_benchmark_ngrams(spark):
    corpus = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon"),   # fully inside benchmark
            (1, "completely unrelated words here now"),
            (2, "alpha beta gamma something else entirely"),  # partial
            (3, "a b"),  # too short for any shingle
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    out = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, k=3).collect()
    }
    assert out[0].n_shingles == 3 and out[0].n_contaminated == 3
    assert out[0].contamination_rate == 1.0
    assert out[1].n_contaminated == 0
    assert out[2].n_shingles == 4 and out[2].n_contaminated == 1
    assert out[3].n_shingles == 0 and out[3].contamination_rate == 0.0
    # total row per corpus doc, even shingle-less ones
    assert set(out) == {0, 1, 2, 3}


def test_contamination_plan_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)])
    bench = _docs(spark, [(0, "w1 w2 w3 w4")])
    plan = ngram_contamination(corpus, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# -------------------------------------------------------- incremental dedup
def test_incremental_dedup_statuses(spark):
    existing = _docs(spark, [(0, "the corpus copy"), (1, "another old doc")])
    batch = _docs(
        spark,
        [
            (10, "THE   corpus copy"),      # dup of corpus (canonicalized)
            (11, "a brand new document"),   # novel
            (12, "a brand new document"),   # dup within batch (11 survives)
            (13, "a brand  NEW document"),  # same canonical text -> dup too
            (14, "something else again"),   # novel
        ],
    )
    out = {r.doc_id: r.status for r in incremental_dedup(existing, batch).collect()}
    assert out == {
        10: "dup_of_corpus",
        11: "novel",
        12: "dup_in_batch",
        13: "dup_in_batch",
        14: "novel",
    }


def test_incremental_dedup_corpus_precedence_over_batch_survivor(spark):
    # when the fingerprint exists in the corpus, NO batch doc survives
    existing = _docs(spark, [(0, "shared text")])
    batch = _docs(spark, [(10, "shared text"), (11, "shared text")])
    out = {r.doc_id: r.status for r in incremental_dedup(existing, batch).collect()}
    assert out == {10: "dup_of_corpus", 11: "dup_of_corpus"}


# ------------------------------------------------------------------- tf-idf
def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = _docs(
        spark,
        [
            (0, "common common zebra"),
            (1, "common common yak yak yak"),
            (2, "common xylophone"),
        ],
    )
    out = tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc's rank-1 term is its distinctive one, not 'common'
    assert by_doc[0][0].term == "zebra"
    assert by_doc[1][0].term == "yak"
    assert by_doc[2][0].term == "xylophone"
    # score = tf * N / df: zebra tf=1, N=3, df=1 -> 3.0; common tf=2 df=3 -> 2.0
    assert by_doc[0][0].tfidf_score == 3.0
    assert [r.term for r in by_doc[0]] == ["zebra", "common"]
    for rows in by_doc.values():
        assert [r.rank for r in rows] == sorted(r.rank for r in rows)


def test_tfidf_tie_breaks_by_term(spark):
    docs = _docs(spark, [(0, "bb aa"), (1, "cc dd")])
    out = [r.term for r in tfidf_top_terms(docs, top_n=2).collect() if r.doc_id == 0]
    assert out == ["aa", "bb"]  # equal scores -> alphabetical


def test_doc_term_tf_matches_explode_formulation(spark):
    """Round-13 internals pin: the per-row sorted-run (doc, term, tf)
    table is value-identical to the classic tokenize-explode-groupBy
    formulation, including case folding, repeated runs, single-token and
    empty documents."""
    from pyspark.sql import functions as F

    from mindb_spark.functions.text import tokens
    from mindb_spark.operators.corpus import _doc_term_tf

    docs = _docs(
        spark,
        [
            (0, "The the THE cat cat sat"),
            (1, "solo"),
            (2, ""),
            (3, "  spaced   out   spaced "),
            (4, "a b a b a c C"),
        ],
    )
    got = {
        (r._id, r.term): r.tf for r in _doc_term_tf(docs, "doc_id", "text").collect()
    }
    expected_rows = (
        docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("t"))
        .select("doc_id", F.lower("t").alias("t"))
        .groupBy("doc_id", "t")
        .count()
        .collect()
    )
    expected = {(r.doc_id, r.t): r["count"] for r in expected_rows}
    assert got == expected
    assert (0, "the") in got and got[(0, "the")] == 3
    assert not any(doc == 2 for doc, _ in got)  # empty doc emits no rows


# ---------------------------------------------------------------------- SQ8
def test_sq8_roundtrip_and_search_recall(spark):
    from mindb_spark.index.sq import encode_query, sq_encode, sq_search, sq_train

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(400, 16))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        "id long, vector array<double>",
    )
    mins, maxs = sq_train(vdf, "vector")
    assert len(mins) == 16 and all(m1 < m2 for m1, m2 in zip(mins, maxs))

    codes_df = sq_encode(vdf, mins, maxs)
    first = codes_df.orderBy("id").first()
    assert len(first.codes) == 16
    assert all(0 <= c <= 255 for c in first.codes)
    # encode_query reproduces the distributed encoder exactly
    assert encode_query(mat[0], mins, maxs) == list(first.codes)

    from mindb_spark.index.sq import query_weights

    qfloat = {qi: mat[qi] + 0.01 * rng.normal(size=16) for qi in (0, 7, 42)}
    queries = [(qi, query_weights(qf, mins, maxs)) for qi, qf in qfloat.items()]
    got = sq_search(codes_df, queries, k=10, id_col="id")
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 7, 42}
    # recall@10 vs exact float search: asymmetric SQ8 is near-lossless
    for qi, _ in queries:
        q = qfloat[qi]
        exact = set(np.argsort(-(mat @ q))[:10].tolist())
        approx = {r.id for r in by_q[qi]}
        assert len(approx) == 10
        assert len(exact & approx) >= 9, (qi, exact, approx)


def test_sq8_degenerate_dimension_encodes_zero(spark):
    from mindb_spark.index.sq import encode_query, sq_encode, sq_train

    vdf = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 9.0])], "id long, vector array<double>"
    )
    mins, maxs = sq_train(vdf, "vector")
    assert mins[0] == maxs[0] == 1.0
    codes = {r.id: r.codes for r in sq_encode(vdf, mins, maxs).collect()}
    assert codes[0][0] == 0 and codes[1][0] == 0
    assert codes[0][1] == 0 and codes[1][1] == 255
    assert encode_query([1.0, 5.0], mins, maxs) == [0, 0]


def test_sq8_search_plan_is_window_limited(spark):
    from mindb_spark.index.sq import sq_encode, sq_search, sq_train

    vdf = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(50)],
        "id long, vector array<double>",
    )
    mins, maxs = sq_train(vdf)
    codes = sq_encode(vdf, mins, maxs)
    plan = sq_search(codes, [(0, [255, 0]), (1, [0, 255])], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------- chunking
def test_chunking_offsets_and_overlap(spark):
    from mindb_spark.operators.corpus import chunk_documents

    docs = _docs(spark, [(0, "abcdefghij"), (1, "xy"), (2, "")])
    out = chunk_documents(docs, chunk_size=4, overlap=2)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_no))
    d0 = [r for r in rows if r.doc_id == 0]
    # len 10, size 4, step 2 -> starts 1,3,5,7 (stop at len-overlap=8)
    assert [(r.start, r.chunk_text) for r in d0] == [
        (1, "abcd"), (3, "cdef"), (5, "efgh"), (7, "ghij"),
    ]
    assert [r.chunk_no for r in d0] == [0, 1, 2, 3]
    # consecutive chunks overlap by exactly `overlap` chars
    for a, b in zip(d0, d0[1:]):
        assert a.chunk_text[-2:] == b.chunk_text[:2]
    d1 = [r for r in rows if r.doc_id == 1]
    assert [(r.start, r.chunk_text, r.chunk_len) for r in d1] == [(1, "xy", 2)]
    assert not [r for r in rows if r.doc_id == 2]  # empty text -> no chunks


def test_chunking_reconstructs_document(spark):
    from mindb_spark.operators.corpus import chunk_documents

    text = "the quick brown fox jumps over the lazy dog " * 20
    docs = _docs(spark, [(0, text)])
    rows = sorted(chunk_documents(docs, 100, 10).collect(), key=lambda r: r.chunk_no)
    rebuilt = rows[0].chunk_text
    for r in rows[1:]:
        rebuilt += r.chunk_text[10:]
    assert rebuilt == text


def test_chunking_rejects_bad_overlap(spark):
    from mindb_spark.operators.corpus import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(0, "x")]), chunk_size=4, overlap=4)


def test_chunking_no_shuffle_plan(spark):
    from mindb_spark.operators.corpus import chunk_documents

    docs = _docs(spark, [(0, "hello world " * 50)])
    p = chunk_documents(docs, 64, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in p


# ----------------------------------------------------------------- deciles
def test_quality_deciles_equal_count_bins(spark):
    from mindb_spark.operators.corpus import quality_deciles

    docs = _docs(
        spark,
        [(i, ("the quick brown fox jumps . " * (1 + i % 7))) for i in range(40)],
    )
    out = {r.bin: r for r in quality_deciles(docs, n_bins=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(out[b].n_docs == 10 for b in out)
    # bins are ordered best-first: min of bin b >= max of bin b+1
    for b in (1, 2, 3):
        assert out[b].min_score >= out[b + 1].max_score


def test_sq8_search_rejects_bad_query_sets_and_allows_negative_ids(spark):
    from mindb_spark.index.sq import sq_encode, sq_search, sq_train

    vdf = spark.createDataFrame(
        [(i, [float(i), 1.0 - i]) for i in range(10)],
        "id long, vector array<double>",
    )
    mins, maxs = sq_train(vdf)
    codes = sq_encode(vdf, mins, maxs)
    with pytest.raises(ValueError):
        sq_search(codes, [], k=3)
    with pytest.raises(ValueError):
        sq_search(codes, [(1, [1, 2]), (1, [3, 4])], k=3)
    # negative query ids must survive the generated plan (positional alias)
    out = sq_search(codes, [(-5, [255, 0])], k=3).collect()
    assert {r.query_id for r in out} == {-5} and len(out) == 3


# ---------------------------------------------------------- unigram logprob
def test_unigram_logprob_hand_math(spark):
    from mindb_spark.operators.corpus import unigram_logprob

    df = _docs(spark, [(0, "a a b"), (1, "a c")])
    # corpus counts: a=3, b=1, c=1; T=5
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    exp0 = (2 * math.log(3) + math.log(1)) / 3 - math.log(5)
    exp1 = (math.log(3) + math.log(1)) / 2 - math.log(5)
    assert rows[0].n_tokens == 3 and rows[0].avg_logprob == round(exp0, 6)
    assert rows[1].n_tokens == 2 and rows[1].avg_logprob == round(exp1, 6)


def test_unigram_logprob_ranks_gibberish_below_common_text(spark):
    from mindb_spark.operators.corpus import unigram_logprob

    common = "the cat sat on the mat " * 5
    df = _docs(
        spark,
        [(i, common) for i in range(20)]
        + [(99, "qzxv jkwpf mlurt zzyqo qzxv")],  # rare-token doc
    )
    rows = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    assert rows[99] < min(v for k, v in rows.items() if k != 99)


def test_unigram_logprob_case_folds_and_lazy_variant(spark):
    from mindb_spark.operators.corpus import unigram_logprob

    df = _docs(spark, [(0, "The THE the"), (1, "the")])
    out = unigram_logprob(df, materialize=False)
    rows = {r.doc_id: r for r in out.collect()}
    # single term "the", p=1 -> logprob 0 for both docs
    assert rows[0].avg_logprob == 0.0 and rows[1].avg_logprob == 0.0
    assert rows[0].n_tokens == 3


def test_quality_deciles_matches_sql_ntile(spark):
    """The two-phase binning must reproduce SQL ntile semantics exactly,
    including the uneven sizes when n is not a multiple of n_bins."""
    from pyspark.sql import Window

    from mindb_spark.operators.corpus import quality_deciles
    from mindb_spark.operators.textops import quality_columns

    for n in (1, 7, 23, 100):
        df = _docs(
            spark, [(i, ("word " * ((i % 9) + 1)).strip()) for i in range(n)]
        )
        got = {r.bin: (r.n_docs, r.min_score, r.max_score)
               for r in quality_deciles(df, n_bins=10).collect()}
        qual = quality_columns("text")
        scored = df.select("doc_id", qual["quality_score"].alias("s"))
        w = Window.orderBy(F.desc("s"), F.col("doc_id"))
        want_rows = (
            scored.withColumn("bin", F.ntile(10).over(w))
            .groupBy("bin")
            .agg(F.count("*").alias("c"), F.min("s").alias("lo"), F.max("s").alias("hi"))
            .collect()
        )
        want = {r.bin: (r.c, r.lo, r.hi) for r in want_rows}
        assert got == want, (n, got, want)
