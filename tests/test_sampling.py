"""Mixture sampling and token-shard assignment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.operators.sampling import assign_token_shards, stratified_sample_exact


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], 10 + (i * 7) % 50) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_stratified_sample_exact_counts_and_determinism(corpus):
    counts = {"en": 30, "de": 10, "fr": 5}
    a = stratified_sample_exact(corpus, "lang", counts, seed=7)
    by_lang = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang == counts  # EXACT, not Bernoulli-approximate
    b = stratified_sample_exact(corpus, "lang", counts, seed=7)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
    c = stratified_sample_exact(corpus, "lang", counts, seed=8)
    assert sorted(r.doc_id for r in a.collect()) != sorted(r.doc_id for r in c.collect())


def test_stratified_sample_clamps_to_stratum_size(corpus):
    out = stratified_sample_exact(corpus, "lang", {"en": 10_000}, seed=1)
    assert out.count() == 100  # all of en (300/3), nothing else


def test_assign_token_shards_prefix_sum_and_budget(corpus):
    out = assign_token_shards(corpus, budget=256).orderBy("doc_id").collect()
    toks = [r.n_tokens for r in out]
    offsets = [r.offset for r in out]
    assert offsets == list(np.cumsum([0] + toks[:-1]))
    assert all(r.shard_id == r.offset // 256 for r in out)
    # shard ids are nondecreasing in id order and start at 0
    sids = [r.shard_id for r in out]
    assert sids[0] == 0 and all(a <= b for a, b in zip(sids, sids[1:]))


def test_assign_token_shards_partition_invariance(corpus):
    a = assign_token_shards(corpus, budget=100, n_ranges=2).orderBy("doc_id").collect()
    b = assign_token_shards(corpus, budget=100, n_ranges=13).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_assign_token_shards_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert assign_token_shards(empty, budget=10).count() == 0


# ------------------------------------------------------------ global shuffle
def test_global_shuffle_is_a_deterministic_permutation(spark):
    from mindb_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(257)], "doc_id long")
    out1 = {r.doc_id: r.pos for r in global_shuffle(df, seed=7, n_ranges=5).collect()}
    # bijection onto 0..n-1
    assert sorted(out1.values()) == list(range(257))
    # reproducible for the same seed, including across range widths
    out2 = {r.doc_id: r.pos for r in global_shuffle(df, seed=7, n_ranges=3).collect()}
    assert out1 == out2
    # a different seed is a different permutation
    out3 = {r.doc_id: r.pos for r in global_shuffle(df, seed=8, n_ranges=5).collect()}
    assert out3 != out1


def test_global_shuffle_decorelates_ingest_order(spark):
    from mindb_spark.operators.sampling import global_shuffle

    n = 1000
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pos = {r.doc_id: r.pos for r in global_shuffle(df, seed=1).collect()}
    # Spearman-ish check: correlation between id order and shuffled order
    # should be near zero for a random permutation
    import numpy as np

    xs = np.arange(n, dtype=np.float64)
    ys = np.array([pos[i] for i in range(n)], dtype=np.float64)
    rho = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(rho) < 0.1, rho


def test_global_shuffle_empty_input(spark):
    from mindb_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([], "doc_id long")
    assert global_shuffle(df).count() == 0
