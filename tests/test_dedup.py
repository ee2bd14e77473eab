"""Dedup operators vs a DuckDB oracle on real testdata documents."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.operators import dedup as D

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from '{SF}/documents.parquet'"
    )
    return con


def test_dedup_exact_matches_duckdb(docs, duck):
    got = {
        (r.fingerprint, r.doc_id, r.dup_count)
        for r in D.dedup_exact(docs).collect()
    }
    exp = set(
        duck.sql(
            """
            select md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) fp,
                   min(doc_id), count(*)
            from documents group by fp
            """
        ).fetchall()
    )
    assert got == exp


def test_dedup_exact_survivors_planted(spark):
    rows = [(1, "Hello  World"), (2, "hello world"), (3, "something else"), (4, "Hello World ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    survivors = D.dedup_exact_survivors(df).select("doc_id").collect()
    # 1, 2, 4 are canonical-equal; min id 1 survives
    assert sorted(r.doc_id for r in survivors) == [1, 3]


def test_ngram_jaccard_matches_duckdb(docs, duck):
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in D.ngram_jaccard_pairs(docs, 0.5, k=3).collect()
    }
    exp_rows = duck.sql(
        r"""
        with toks as (
          select doc_id, regexp_extract_all(text, '\S+') t from documents
        ), sh as (
          select doc_id,
                 list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) shingles
          from toks where len(t) >= 3
        ), ex as (
          select doc_id, unnest(shingles) shingle, len(shingles) n from sh
        ), inter as (
          select a.doc_id id_a, b.doc_id id_b, count(*) i, any_value(a.n) na, any_value(b.n) nb
          from ex a join ex b using (shingle)
          where a.doc_id < b.doc_id
          group by 1, 2
        )
        select id_a, id_b, round(i * 1.0 / (na + nb - i), 6) j
        from inter where i * 1.0 / (na + nb - i) >= 0.5
        """
    ).fetchall()
    exp = {(a, b, float(j)) for a, b, j in exp_rows}
    assert got == exp
    assert len(got) > 0, "no jaccard pairs at 0.5 — testdata assumption broken"


def test_minhash_signatures_are_min_of_family(spark):
    import hashlib

    rows = [(1, "a b c d"), (2, "x y z w v")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r.doc_id: r.signature
        for r in D.minhash_signatures(
            df, k=3, num_hashes=4, hash_family="md5"  # the md5 family's math
        ).collect()
    }

    def shingles(text, k=3):
        t = text.split()
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    def km(s, i):
        # independent recomputation of the Kirsch-Mitzenmacher family
        d = hashlib.md5(s.encode()).hexdigest()
        a, b0 = int(d[0:12], 16), int(d[16:28], 16)
        return (a + i * (b0 | 1)) % (1 << 48)

    for doc_id, text in rows:
        for i in range(4):
            exp = min(km(s, i) for s in shingles(text))
            assert sigs[doc_id][i] == exp


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),  # high jaccard
        (3, "completely different words entirely unrelated to anything else here now"),
        (4, base),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(df, 0.5, k=3, num_hashes=32, n_bands=16).collect()
    }
    assert (1, 4) in pairs  # identical
    assert (1, 2) in pairs and (2, 4) in pairs  # near-dup
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_recall_vs_exact(docs):
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, 0.5, k=3).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, 0.5, k=3, num_hashes=32, n_bands=16).collect()
    }
    assert got <= exact  # verification removes false positives
    recall = len(got & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"minhash recall {recall} ({len(got)}/{len(exact)})"


def test_simhash_hamming_semantics(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, base),
        (2, base),  # identical -> hamming 0
        (3, base.replace("gamma", "zilch")),  # one token changed -> small hamming
        (4, "totally unrelated text about spark query engines and parquet files"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.doc_id: r.simhash for r in D.simhash64(df).collect()}
    assert sigs[1] == sigs[2]
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    ham14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham13 < ham14
    pairs = {(r.id_a, r.id_b): r.hamming for r in D.simhash_pairs(df, max_hamming=8).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs


def test_connected_components_basic(spark):
    from mindb_spark.operators.dedup import connected_components

    # components: {1,2,3,4} (chain), {10,11}, singleton edges only
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    from mindb_spark.operators.dedup import connected_components

    n = 30  # path graph: worst case for min-label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(edges, max_iter=64).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_connected_components_empty(spark):
    from mindb_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0
    assert connected_components(edges, algorithm="star").count() == 0


def test_star_contraction_matches_label_on_random_graphs(spark):
    """Both algorithms produce the identical (id, component) map on
    seeded random graphs (mixed components, isolated pairs, stars)."""
    import numpy as np

    from mindb_spark.operators.dedup import connected_components

    rng = np.random.default_rng(5)
    for trial in range(3):
        n, m = 200, 300
        pairs = rng.integers(0, n, size=(m, 2))
        pairs = [(int(a), int(b)) for a, b in pairs if a != b]
        edges = spark.createDataFrame(pairs, "id_a long, id_b long")
        lbl = {r.id: r.component for r in connected_components(edges).collect()}
        star = {
            r.id: r.component
            for r in connected_components(edges, algorithm="star").collect()
        }
        assert lbl == star


def test_star_contraction_long_chain_10k_under_15_rounds(spark):
    """VERDICT r3 #5: a 10k-node path graph (the adversarial
    chained-duplicate shape — crawl mirrors with drifting boilerplate)
    converges within 15 star rounds, where min-label would need ~10k
    diameter iterations. Node ids are permuted so the component min sits
    mid-chain, not at an end."""
    import numpy as np

    from mindb_spark.operators.dedup import connected_components

    n = 10_000
    rng = np.random.default_rng(9)
    perm = rng.permutation(n)
    edges = spark.createDataFrame(
        [(int(perm[i]), int(perm[i + 1])) for i in range(n - 1)],
        "id_a long, id_b long",
    ).repartition(8)
    # max_iter=15 doubles as the round-count assertion: _cc_star raises
    # if the fixed point isn't reached within it
    got = {
        r.id: r.component
        for r in connected_components(edges, algorithm="star", max_iter=15).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {0}


def test_survivors_from_components(spark):
    from mindb_spark.operators.dedup import (
        connected_components,
        survivors_from_components,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], "id_a long, id_b long")
    comps = connected_components(edges)
    kept = sorted(r.doc_id for r in survivors_from_components(docs, comps).collect())
    # {1,2,5} -> keep 1; {6,7} -> keep 6; 0,3,4 untouched
    assert kept == [0, 1, 3, 4, 6]


# ------------------------------------------------------- duplicated spans


def test_duplicate_spans_hand_computed(spark):
    """Three docs sharing a 7-token sentence; with k=6 the shared
    sentence yields two overlapping duplicate windows that must merge
    into ONE maximal span covering exactly its 7 tokens."""
    shared = "the quick brown fox jumps over fences"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} unrelated tail words here now"),
            (3, "completely different content with no duplication at all"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: r
        for r in D.duplicate_spans(docs, k=6, min_count=2).collect()
    }
    assert set(spans) == {1, 2}
    # doc 1: shared starts at token 2 -> windows at pos 2,3 -> span [2, 9)
    assert (spans[1].span_start, spans[1].span_end, spans[1].n_windows) == (2, 9, 2)
    # doc 2: shared starts at token 0 -> span [0, 7)
    assert (spans[2].span_start, spans[2].span_end, spans[2].n_windows) == (0, 7, 2)


def test_duplicate_spans_merges_and_separates_islands(spark):
    """Two duplicated regions separated by enough unique tokens must
    stay TWO spans; back-to-back duplicated windows must merge."""
    a = "one two three four five six"        # 6 tokens, duplicated
    b = "red orange yellow green blue violet"  # 6 tokens, duplicated
    docs = spark.createDataFrame(
        [
            (1, f"{a} u1 u2 u3 u4 u5 u6 u7 {b}"),
            (2, f"{a} x1 x2 x3 x4 x5 x6 x7 {b}"),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r.span_start, r.span_end)
        for r in D.duplicate_spans(docs, k=6, min_count=2).collect()
        if r.doc_id == 1
    )
    assert spans == [(0, 6), (13, 19)]


def test_duplicate_span_stats_matches_duckdb(spark):
    """Cross-engine pin on a corpus with whole-doc and partial dups."""
    rows = [
        (1, "aa bb cc dd ee ff gg hh ii jj"),
        (2, "aa bb cc dd ee ff gg hh ii jj"),       # exact dup of 1
        (3, "zz yy aa bb cc dd ee ff xx ww vv uu"),  # partial overlap
        (4, "totally unique words that never repeat anywhere else okay"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens)
        for r in D.duplicate_span_stats(docs, k=6, min_count=2).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create table documents (doc_id bigint, text varchar)"
    )
    con.executemany("insert into documents values (?, ?)", rows)
    sql = r"""
with toks as (
  select doc_id, regexp_extract_all(text, '\S+') t from documents
),
sh as (
  select doc_id, u.pos as pos, u.w as w from (
    select doc_id,
           unnest([{'pos': i - 1, 'w': array_to_string(t[i:i+5], ' ')}
                   for i in range(1, len(t) - 6 + 2)]) u
    from toks
  )
),
dup as (
  select doc_id, pos from (
    select doc_id, pos, count(*) over (partition by w) c from sh
  ) where c >= 2
),
brk as (
  select doc_id, pos,
         case when pos > lag(pos) over (partition by doc_id order by pos) + 6
              then 1 else 0 end as b
  from dup
),
isl as (
  select doc_id, pos,
         sum(b) over (partition by doc_id order by pos
                      rows unbounded preceding) as span_id
  from brk
),
spans as (
  select doc_id, span_id, min(pos) as span_start, max(pos) + 6 as span_end
  from isl group by 1, 2
)
select doc_id, count(*) as n_spans, sum(span_end - span_start) as dup_tokens
from spans group by 1
"""
    exp = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == exp
    assert 1 in got and 3 in got and 4 not in got
    # whole-doc dup: all 10 tokens covered
    assert got[1] == (1, 10)


def test_duplicate_spans_plan_has_no_python(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i} a b c d e f g") for i in range(4)],
        "doc_id long, text string",
    )
    plan = D.duplicate_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_survivors_null_and_unique_id_contract(spark):
    """round 9 (ADVICE): dedup_exact_survivors' anti-join semantics,
    pinned explicitly. (a) Null-id rows are always KEPT — a row without
    an identity cannot be deduplicated against one (null never matches
    in the anti-join; the loser side filters nulls up front). (b) The
    unique-id PRECONDITION is documented, not asserted: with duplicate
    ids, a loser-ranked copy drops every row sharing that id — this
    test records that boundary so a change is a conscious decision."""
    rows = [
        (1, "same text"), (2, "same text"),       # dup group, 1 survives
        (None, "same text"), (None, "unique a"),  # null ids: always kept
        (7, "unique b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        ((r.doc_id, r.text) for r in D.dedup_exact_survivors(df).collect()),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    assert got == [
        (None, "same text"), (None, "unique a"), (1, "same text"),
        (7, "unique b"),
    ]
    # (b) duplicate ids: BOTH rows of id 5 vanish once one copy ranks
    # row_number > 1 in its fingerprint group — the documented boundary
    dup = spark.createDataFrame(
        [(5, "x"), (5, "x"), (6, "y")], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in D.dedup_exact_survivors(dup).collect())
    assert kept == [6]


def test_minhash_fast_lane_matches_md5_lane(docs):
    """hash_family="xxhash64" (round 9, VERDICT r8 #4): with verify=True
    both lanes compute exact Jaccard over the same DISTINCT shingle
    identities (64-bit fingerprints collide with probability ~n²/2⁶⁵),
    so the verified pair sets AND their jaccard values must agree — the
    correctness pin that lets the scale path skip md5 entirely."""
    kw = dict(k=3, num_hashes=32, n_bands=16)
    md5 = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in D.minhash_lsh_pairs(
            docs, 0.5, hash_family="md5", **kw
        ).collect()
    }
    fast = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in D.minhash_lsh_pairs(
            docs, 0.5, hash_family="xxhash64", **kw
        ).collect()
    }
    assert md5 == fast
    assert len(md5) > 0


def test_minhash_fast_signatures_valid_km_family(spark):
    """Fast-lane signatures: correct length, 48-bit range, deterministic,
    and identical docs get identical signatures while disjoint docs
    (whp) do not — the min-wise-family sanity the md5 lane pins via
    exact recomputation (xxhash64 is not recomputable in pure Python,
    so the pin here is behavioral)."""
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),
        (3, "q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    get = lambda: {
        r.doc_id: tuple(r.signature)
        for r in D.minhash_signatures(
            df, k=3, num_hashes=8, hash_family="xxhash64"
        ).collect()
    }
    s1, s2 = get(), get()
    assert s1 == s2  # deterministic
    assert all(len(v) == 8 for v in s1.values())
    assert all(0 <= h < (1 << 48) for v in s1.values() for h in v)
    assert s1[1] == s1[2]  # identical text -> identical signature
    assert s1[1] != s1[3]  # disjoint shingle sets -> different (whp)


def test_minhash_unknown_hash_family_rejected(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_family"):
        D.minhash_signatures(df, hash_family="sha1")
    with pytest.raises(ValueError, match="hash_family"):
        D.minhash_lsh_pairs(df, 0.5, hash_family="sha1")


def test_verify_footprint_estimator_matches_formula(spark):
    """VERDICT r9 #3: estimate = docs x avg shingles x calibrated
    bytes/row; at the round-9 failure shape (20.4M docs x ~118
    shingles) it predicts > 80 GB — the run that actually died on an
    ~80 GB-free disk an hour in would now be refused up front."""
    rows = [(i, " ".join(["w"] * 12)) for i in range(50)]  # 12 tokens -> 10 shingles
    df = spark.createDataFrame(rows, "doc_id long, text string")
    est = D.estimate_verify_footprint(df, k=3)
    assert est["n_docs"] == 50
    assert abs(est["avg_shingles_per_doc"] - 10.0) < 0.01
    assert est["est_bytes"] == int(50 * 10.0 * 60)
    assert est["est_bytes"] == est["fixed_bytes"] + est["chunkable_bytes"]
    assert est["fixed_bytes"] == int(50 * 10.0 * 16)
    # md5 lane strings cost ~3x
    est_md5 = D.estimate_verify_footprint(df, k=3, hash_family="md5")
    assert est_md5["est_bytes"] == int(50 * 10.0 * 180)
    # the r9 failure shape through the round-11 constants: UNCHUNKED it
    # still predicts death on a ~60-80 GB budget (the v1 probe died
    # exactly there), while max-chunked (8 bands) it predicts ~51 GB —
    # the measured 4-chunk completion ran at 62.8 GB
    rows_20m = 20_400_000 * 118
    assert rows_20m * 60 > 80e9
    assert rows_20m * (16 + 44 / 8) < 60e9


def test_verify_preflight_warns_and_errors_on_small_budget(spark):
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(20))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=3, num_hashes=8, n_bands=4, preflight_min_docs=1)
    with pytest.warns(UserWarning, match="disk pre-flight"):
        D.minhash_lsh_pairs(df, 0.5, disk_budget_bytes=10, **kw)
    with pytest.raises(RuntimeError, match="disk pre-flight"):
        D.minhash_lsh_pairs(
            df, 0.5, disk_budget_bytes=10, preflight="error", **kw
        )
    # generous budget: no warning, normal result
    import warnings as W
    with W.catch_warnings():
        W.simplefilter("error")
        out = D.minhash_lsh_pairs(df, 0.5, disk_budget_bytes=1 << 40, **kw)
    assert out.columns == ["id_a", "id_b", "jaccard"]
    with pytest.raises(ValueError, match="preflight"):
        D.minhash_lsh_pairs(df, 0.5, preflight="maybe")


def _near_dup_corpus(spark, n=120):
    """Docs with planted near-dup clusters (shared token runs + salt)."""
    rows = []
    for i in range(n):
        fam = i % 17
        base = " ".join(f"tok{fam}_{j}" for j in range(25))
        salt = f" uniq{i} tail{i % 5}" if i % 3 else ""
        rows.append((i, base + salt))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_chunked_verify_bit_equal_to_unchunked(spark):
    """VERDICT r10 #4: the band-sequential verify must emit exactly the
    unchunked pair set with identical jaccard values, for chunk counts
    that divide the bands evenly and ones that don't."""
    df = _near_dup_corpus(spark)
    kw = dict(k=3, num_hashes=16, n_bands=8, preflight="off")
    ref = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_pairs(df, 0.5, **kw).collect()
    }
    assert len(ref) > 50  # the corpus actually has near-dups to find
    for chunks in (2, 3, 8):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in D.minhash_lsh_pairs(
                df, 0.5, verify_band_chunks=chunks, **kw
            ).collect()
        }
        assert got == ref, f"chunked({chunks}) diverged from unchunked"
    # chunk counts beyond n_bands clamp to n_bands rather than erroring
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_pairs(df, 0.5, verify_band_chunks=99, **kw).collect()
    }
    assert got == ref
    with pytest.raises(ValueError, match="verify_band_chunks"):
        D.minhash_lsh_pairs(df, 0.5, verify_band_chunks=0, **kw)
    with pytest.raises(ValueError, match="verify_band_chunks"):
        D.minhash_lsh_pairs(df, 0.5, verify_band_chunks="half", **kw)


def test_preflight_auto_engages_band_chunked_verify(spark):
    """When the estimate breaches the budget but the FIXED part fits,
    auto mode must engage chunking (warning says so) and still return
    the correct pairs — instead of warning and running the breaching
    plan anyway (round-10 behavior)."""
    df = _near_dup_corpus(spark, n=40)
    kw = dict(k=3, num_hashes=16, n_bands=8, preflight_min_docs=1)
    est = D.estimate_verify_footprint(df, k=3)
    # budget between fixed and fixed+chunkable -> chunking fixes it
    budget = est["fixed_bytes"] + est["chunkable_bytes"] // 4
    with pytest.warns(UserWarning, match="band-sequential verify"):
        out = D.minhash_lsh_pairs(df, 0.5, disk_budget_bytes=budget, **kw)
    ref = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_pairs(df, 0.5, preflight="off", **kw).collect()
    }
    assert {(r.id_a, r.id_b): r.jaccard for r in out.collect()} == ref
    # budget below even the fixed part -> chunking can't fix it: the
    # round-10 warn/error contract is preserved
    with pytest.raises(RuntimeError, match="disk pre-flight"):
        D.minhash_lsh_pairs(
            df, 0.5, disk_budget_bytes=10, preflight="error", **kw
        )
    # verify_band_chunks=1 forbids chunking: plain warn even when
    # chunking would have fixed the breach
    with pytest.warns(UserWarning, match="exceeds budget"):
        D.minhash_lsh_pairs(
            df, 0.5, disk_budget_bytes=budget, verify_band_chunks=1, **kw
        )


def test_verify_preflight_skipped_below_min_docs(spark):
    """Small corpora must not pay the estimator jobs or warn."""
    rows = [(i, "a b c d e") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import warnings as W
    with W.catch_warnings():
        W.simplefilter("error")
        D.minhash_lsh_pairs(df, 0.5, k=3, num_hashes=8, n_bands=4,
                            disk_budget_bytes=10)
