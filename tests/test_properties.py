"""Property-based tests (hypothesis) for the numeric kernels and operators.

Kernel properties run pure-numpy (fast, thousands of cases); Spark-backed
properties use a few drawn examples against an in-Python oracle.
"""

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra.numpy import arrays

from mindb_spark.index import pq as PQ

DIMS = st.sampled_from([4, 8, 16])


@st.composite
def matrices(draw, min_rows=2, max_rows=64):
    d = draw(DIMS)
    n = draw(st.integers(min_rows, max_rows))
    return draw(
        arrays(
            np.float32,
            (n, d),
            elements=st.floats(-10, 10, width=32, allow_nan=False),
        )
    )


@given(matrices())
@settings(max_examples=50, deadline=None)
def test_pq_encode_decode_reduces_distortion(mat):
    """Decoded vectors must lie no farther from the input than the data
    radius, and encoding must be deterministic."""
    m = 2
    codes1 = PQ.encode(mat.astype(np.float64), PQ.train_codebooks(mat, m))
    codes2 = PQ.encode(mat.astype(np.float64), PQ.train_codebooks(mat, m))
    assert (codes1 == codes2).all()


@given(matrices(min_rows=8, max_rows=128))
@settings(max_examples=30, deadline=None)
def test_kmeans_centroids_within_hull(mat):
    """Centroids are means of points (or reseeded points), so each must lie
    inside the per-dimension bounding box of the data."""
    k = min(4, mat.shape[0])
    cents = PQ._kmeans(mat.astype(np.float64), k, n_iter=5)
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    eps = 1e-4
    assert (cents >= lo - eps).all() and (cents <= hi + eps).all()
    assert cents.shape == (k, mat.shape[1])


@given(matrices(min_rows=4, max_rows=64))
@settings(max_examples=30, deadline=None)
def test_adc_scan_matches_explicit_distance(mat):
    """ADC lookup distances == explicit ||q - decode(code)||^2."""
    m = 2
    books = PQ.train_codebooks(mat, m)
    codes = PQ.encode(mat.astype(np.float64), books)
    q = mat[0].astype(np.float64)
    table = PQ.adc_table(q.astype(np.float32), books)
    got = PQ.adc_scan(codes, table)
    decoded = PQ.decode(codes, books).astype(np.float64)
    want = ((decoded - q) ** 2).sum(axis=1)
    assert np.allclose(got, want, rtol=1e-3, atol=1e-3)


@given(
    arrays(
        np.float64, (16,), elements=st.floats(-100, 100, allow_nan=False)
    ).filter(lambda v: np.linalg.norm(v) > 1e-6)
)
@settings(max_examples=100, deadline=None)
def test_normalization_idempotent(v):
    n1 = v / np.linalg.norm(v)
    n2 = n1 / np.linalg.norm(n1)
    assert abs(np.linalg.norm(n1) - 1.0) < 1e-9
    assert np.allclose(n1, n2)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 10**6)),
        min_size=0,
        max_size=40,
    ),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_naive_oracle(spark, left_rows, right_rows):
    """asof_join == 'latest right with ts <= left ts per key', computed naively."""
    from mindb_spark.operators.temporal import asof_join

    left_rows = [(k, t, i) for i, (k, t, _) in enumerate(left_rows)]
    right = [(k, t, v) for (k, t, v) in right_rows]
    ldf = spark.createDataFrame(left_rows, "k int, ts int, lid int")
    rdf = spark.createDataFrame(right or [(99, -1, -1)], "k int, ts int, v int")
    out = asof_join(ldf, rdf, on="k", right_cols=("v",), right_tiebreak="v")
    got = {r.lid: r.v_asof for r in out.collect()}

    for k, t, lid in left_rows:
        cand = [(rt, rv) for (rk, rt, rv) in (right or [(99, -1, -1)]) if rk == k and rt <= t]
        want = max(cand)[1] if cand else None
        assert got[lid] == want, (lid, got[lid], want, cand)


@given(matrices(min_rows=3, max_rows=48), st.integers(1, 5))
@settings(max_examples=20, deadline=None)
def test_decomposed_adc_identity_property(mat, m_pick):
    """The faiss-style decomposition equals the residual-LUT distance for
    arbitrary data, any cluster count, any subspace split."""
    rng = np.random.default_rng(0)
    n, d = mat.shape
    m = next(mm for mm in (m_pick, 4, 2, 1) if d % mm == 0)
    C = min(4, n)
    centroids = mat[rng.choice(n, C, replace=False)].astype(np.float64)
    books = PQ.train_codebooks(mat, m)
    c2 = (centroids**2).sum(axis=1)
    cid = np.argmin(c2[None, :] - 2.0 * (mat.astype(np.float64) @ centroids.T), axis=1)
    codes = PQ.encode((mat - centroids[cid]).astype(np.float32), books)
    queries = rng.normal(size=(3, d))

    want = np.empty((n, 3))
    for qi in range(3):
        for ci in range(C):
            rows = cid == ci
            if rows.any():
                t = PQ.adc_table((queries[qi] - centroids[ci]).astype(np.float32), books)
                want[rows, qi] = PQ.adc_scan(codes[rows], t)
    A = PQ.adc_query_tables(queries, books)
    bterm = PQ.cell_code_term(codes, cid, centroids, books)
    d2 = ((queries**2).sum(axis=1, keepdims=True) - 2.0 * queries @ centroids.T
          + (centroids**2).sum(axis=1)[None, :])
    got = PQ.adc_scan_multi(codes, A) + bterm[:, None] + d2.T[cid].astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-2)


# ------------------------------------------------------- corpus properties
TEXTS = st.text(
    alphabet=st.sampled_from(list("ab c\ndef")), min_size=0, max_size=120
)


@given(
    texts=st.lists(TEXTS, min_size=1, max_size=8),
    size=st.integers(2, 40),
    overlap=st.integers(0, 20),
)
@settings(max_examples=12, deadline=None)
def test_chunking_reconstruction_property(spark, texts, size, overlap):
    """For ANY text/size/overlap (overlap < size): concatenating chunks
    minus the overlapped prefixes reproduces the document exactly, chunk
    offsets are the arithmetic sequence, and empty texts emit nothing."""
    from mindb_spark.operators.corpus import chunk_documents

    if overlap >= size:
        overlap = size - 1
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_size=size, overlap=overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        if not t:
            assert i not in by_doc
            continue
        cs = sorted(by_doc[i], key=lambda r: r.chunk_no)
        assert [c.start for c in cs] == [
            1 + j * (size - overlap) for j in range(len(cs))
        ]
        rebuilt = cs[0].chunk_text
        for c in cs[1:]:
            rebuilt += c.chunk_text[overlap:]
        assert rebuilt == t, (i, size, overlap)


@given(
    old=st.lists(TEXTS, min_size=0, max_size=6),
    new=st.lists(TEXTS, min_size=1, max_size=6),
)
@settings(max_examples=10, deadline=None)
def test_incremental_dedup_partition_property(spark, old, new):
    """Statuses partition the batch: every batch doc gets exactly one
    status; novel docs have unique canonical fingerprints not present in
    the corpus; dup_in_batch always has a lower-id novel twin."""
    from mindb_spark.functions.text import normalized_text
    from mindb_spark.operators.corpus import incremental_dedup
    from pyspark.sql import functions as F

    existing = spark.createDataFrame(
        list(enumerate(old)) or [(0, "seed")], "doc_id long, text string"
    )
    if not old:
        existing = existing.where(F.lit(False))
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(new)], "doc_id long, text string"
    )
    rows = incremental_dedup(existing, batch).collect()
    assert len(rows) == len(new)
    by_id = {r.doc_id: r for r in rows}
    novel_fp = {r.fingerprint for r in rows if r.status == "novel"}
    corpus_fp = {
        r.f for r in existing.select(normalized_text("text").alias("t"))
        .select(F.md5("t").alias("f")).collect()
    }
    assert len(novel_fp) == sum(1 for r in rows if r.status == "novel")
    assert not (novel_fp & corpus_fp)
    for r in rows:
        if r.status == "dup_in_batch":
            twin = [
                x for x in rows
                if x.fingerprint == r.fingerprint and x.doc_id < r.doc_id
            ]
            assert twin and any(x.status == "novel" for x in twin)
        if r.status == "dup_of_corpus":
            assert r.fingerprint in corpus_fp


@given(
    n_rows=st.integers(5, 60),
    n_keys=st.integers(1, 4),
    n_salt=st.integers(1, 8),
)
@settings(max_examples=10, deadline=None)
def test_salted_join_equals_plain_join_property(spark, n_rows, n_keys, n_salt):
    """For ANY fact/dim shape and salt factor, the salted join returns
    exactly the plain inner join's rows."""
    from mindb_spark.operators.joins import salted_join

    facts = spark.createDataFrame(
        [(i, i % (n_keys + 1)) for i in range(n_rows)], "row_id long, k int"
    )
    dims = spark.createDataFrame(
        [(k, f"d{k}") for k in range(n_keys)], "k int, name string"
    )
    plain = {(r.row_id, r.name) for r in facts.join(dims, "k").collect()}
    salted = {
        (r.row_id, r.name)
        for r in salted_join(facts, dims, "k", "row_id", n_salt=n_salt).collect()
    }
    assert salted == plain


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("abc def")), min_size=0, max_size=40),
        min_size=1, max_size=6,
    ),
    terms=st.lists(st.sampled_from(["abc", "def", "a", "zzz"]),
                   min_size=1, max_size=3, unique=True),
)
@settings(max_examples=8, deadline=None)
def test_bm25_matches_pure_python_oracle(spark, texts, terms):
    """bm25_scores equals an independent pure-Python BM25 with the same
    rational idf, for arbitrary corpora and query term sets."""
    from mindb_spark.operators.search import bm25_scores

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_matched_terms, r.score)
           for r in bm25_scores(docs, list(terms)).collect()}

    # independent implementation
    k1, b = 1.2, 0.75
    toks = {i: t.split() for i, t in enumerate(texts)}
    lens = {i: len(v) for i, v in toks.items()}
    with_tokens = [l for l in lens.values() if l > 0]
    if not with_tokens:
        assert got == {}
        return
    avgdl = sum(with_tokens) / len(with_tokens)
    N = len(texts)
    tset = sorted({t.lower() for t in terms})
    dfreq = {t: sum(1 for v in toks.values()
                    if t in [x.lower() for x in v]) for t in tset}
    expect = {}
    for i, v in toks.items():
        low = [x.lower() for x in v]
        total, matched = 0.0, 0
        for t in tset:
            tf = low.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            total += idf * tf * (k1 + 1.0) / (
                tf + k1 * ((1.0 - b) + b * lens[i] / avgdl)
            )
        if matched:
            expect[i] = (matched, total)
    assert set(got) == set(expect)
    for i in got:
        assert got[i][0] == expect[i][0]
        assert abs(got[i][1] - expect[i][1]) < 1e-9, (i, got[i], expect[i])


@given(
    st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=60, unique=True),
    st.integers(0, 5),
)
@settings(max_examples=12, deadline=None)
def test_global_shuffle_permutation_property(spark, ids, seed):
    """For ANY unique id set (negative, sparse, clustered), global_shuffle
    assigns a bijection onto 0..n-1 that equals rank by md5(seed:id)."""
    import hashlib

    from mindb_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.pos for r in global_shuffle(df, seed=seed, n_ranges=4).collect()}
    key = lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i)
    want = {i: rank for rank, i in enumerate(sorted(ids, key=key))}
    assert got == want


@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=24),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=12, deadline=None)
def test_unigram_logprob_bounds_property(spark, texts):
    """avg_logprob is always <= 0 (probabilities <= 1), == 0 only when the
    doc's every token is the corpus's only token type; n_tokens matches
    the whitespace token count."""
    from mindb_spark.operators.corpus import unigram_logprob

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    import re

    vocab = set()
    for _, t in rows:
        vocab |= {w.lower() for w in re.findall(r"\S+", t)}
    for i, t in rows:
        toks = re.findall(r"\S+", t)
        if not toks:
            assert i not in out  # token-less docs drop out
            continue
        r = out[i]
        assert r.n_tokens == len(toks)
        assert r.avg_logprob <= 0.0
        if len(vocab) == 1:
            assert r.avg_logprob == 0.0
