"""Physical-plan contracts: the scale properties the operators claim.

These assertions pin the *plan shape*, not timings — the properties that
decide whether a query survives a 100x scale-up: filter/column pushdown
into the parquet scan, broadcast of small join sides, TakeOrderedAndProject
(not global sort) for top-k, WindowGroupLimit partial top-k below windows,
single-shuffle temporal plans, no nested-loop joins, and no Python UDFs in
paths documented as JVM-side.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    return E.queries()


def test_topk_join_uses_broadcast_and_takeordered(spark, sf_dir, qs):
    p = plan_of(qs["join_top_customers"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p  # top-k, never a global sort
    assert "BroadcastHashJoin" in p      # dim side broadcast
    assert "SortMergeJoin" not in p


def test_filtered_knn_pushes_label_filter_to_scan(spark, sf_dir, qs):
    p = plan_of(qs["filtered_knn"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    # the attribute filter must reach the parquet reader, not a post-scan Filter only
    assert "PushedFilters: [" in p and "EqualTo(label,3)" in p


def test_text_ops_stay_jvm_side(spark, sf_dir, qs):
    for name in ("text_quality", "text_langid", "text_tokens", "text_fingerprint",
                 "text_pii_scrub"):
        p = plan_of(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name
        assert "Exchange" not in p, f"{name}: narrow projection should not shuffle"


def test_window_topk_uses_group_limit_pushdown(spark, sf_dir, qs):
    p = plan_of(qs["window_top_events"](spark, sf_dir))
    # rank<=k is executed as partial+final WindowGroupLimit, so each map task
    # emits at most k rows per key into the single shuffle
    assert p.count("WindowGroupLimit") >= 2
    assert p.count("Exchange") == 1


def test_sessionize_is_single_shuffle(spark, sf_dir, qs):
    p = plan_of(qs["sessionize"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1


def test_range_join_has_no_nested_loop(spark, sf_dir, qs):
    p = plan_of(qs["range_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_asof_join_has_no_nested_loop_and_bounded_shuffles(spark, sf_dir, qs):
    p = plan_of(qs["asof_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # union + carry-forward window: one hash shuffle for the window (+ AQE
    # may add coalesces, which are not hash exchanges)
    assert p.count("Exchange hashpartitioning") <= 2


def test_pricing_summary_prunes_and_pushes(spark, sf_dir, qs):
    p = plan_of(qs["agg_pricing_summary"](spark, sf_dir))
    # only the referenced lineitem columns are read
    assert "l_orderkey" not in p.split("ReadSchema")[-1]
    assert "l_shipdate" in p.split("PushedFilters")[-1].split("ReadSchema")[0]


def test_dedup_exact_stays_on_codegen_hash_aggregate(spark, sf_dir, qs):
    p = plan_of(qs["dedup_exact"](spark, sf_dir))
    assert "HashAggregate" in p
    assert "ObjectHashAggregate" not in p and "SortAggregate" not in p


def test_pack_shards_avoids_single_partition_window(spark, sf_dir, qs):
    p = plan_of(qs["pack_shards"](spark, sf_dir))
    # the naive global-order prefix sum plans as Exchange SinglePartition —
    # the two-phase layout must not
    assert "Exchange SinglePartition" not in p
    assert "WindowGroupLimit" not in p  # sanity: it's a prefix sum, not top-k


def test_sample_mixture_is_one_shuffle(spark, sf_dir, qs):
    p = plan_of(qs["sample_mixture"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1


def test_top_tokens_uses_takeordered(spark, sf_dir, qs):
    p = plan_of(qs["top_tokens"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_window_rolling_is_one_shuffle(spark, sf_dir, qs):
    p = plan_of(qs["window_rolling"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1


def test_pipeline_curation_two_shuffles(spark, sf_dir, qs):
    """The fused curation pipeline: dedup exchange + final rollup exchange
    — the per-row language/quality projections must not add joins."""
    p = plan_of(qs["pipeline_curation"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in p


def test_contamination_broadcasts_benchmark_side(spark, sf_dir, qs):
    """Benchmark shingle sets are small by construction — the corpus side
    must stream through one BroadcastHashJoin, never shuffle-join against
    the benchmark."""
    p = plan_of(qs["contamination_check"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_dedup_incremental_prunes_corpus_scan_to_fingerprint(spark, sf_dir, qs):
    """The existing corpus contributes only its fingerprint: the corpus-side
    parquet scan must read doc-id + text (fingerprint inputs) and nothing
    else — no n_chars/lang/source columns."""
    p = plan_of(qs["dedup_incremental"](spark, sf_dir))
    read_schemas = [s.split("\n")[0] for s in p.split("ReadSchema: ")[1:]]
    assert read_schemas, p
    for rs in read_schemas:
        assert "n_chars" not in rs and "source" not in rs, rs
    assert "CartesianProduct" not in p


def test_tfidf_uses_window_group_limit(spark, sf_dir, qs):
    # the entry returns an eager checkpoint (per-row tf via the persisted
    # (doc, term, tf) table) — the contract holds on the LAZY pipeline
    import re

    from mindb_spark.operators.corpus import tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(tfidf_top_terms(docs, top_n=3, materialize=False))
    # per-doc top-n rank must be bounded before the final window
    assert "WindowGroupLimit" in p
    assert "Exchange SinglePartition" not in p
    # round 13: tf is computed PER ROW (sorted-run counting) — the
    # corpus-token explode's (doc, term) hash-agg exchange must be gone,
    # and the vocab-bounded df table must be BROADCAST back (the scored
    # rows never leave their doc's partition before the ranked window)
    assert not re.search(r"hashpartitioning\(_id#\d+L?, term", p), p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # and the benched entry is recompute-proof (checkpointed)
    assert "Scan ExistingRDD" in plan_of(qs["tfidf_top_terms"](spark, sf_dir))


def test_sq_knn_is_codegen_with_partial_group_limit(spark, sf_dir, qs):
    """SQ8 search: integer dot + stack + ranked window. The WindowGroupLimit
    partial pass must bound rows before the exchange, and nothing in the
    scoring path may fall out of the JVM."""
    p = plan_of(qs["sq_knn"](spark, sf_dir))
    assert "WindowGroupLimit" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_keyword_search_no_explode_no_exchange(spark, sf_dir):
    """BM25 (round 12): tf/dl are per-row array expressions over ONE
    tokenize pass — the scoring pipeline has NO Generate (no corpus
    explode) and NO Exchange (no shuffle); only the stats aggregate's
    single-partition gather touches exchange machinery, and the returned
    frame is an eager checkpoint of a filter+project over the cached
    per-doc stats."""
    from mindb_spark.operators.search import bm25_scores

    docs = spark.createDataFrame(
        [(i, "hash scan table x") for i in range(10)], "doc_id long, text string"
    )
    # pin the pre-checkpoint scoring plan: same shape bm25_scores builds
    from pyspark.sql import functions as F
    from mindb_spark.functions.text import tokens

    lowered = docs.select(
        "doc_id", F.transform(tokens("text"), F.lower).alias("_lt")
    )
    per_doc = lowered.select(
        "doc_id",
        F.size("_lt").cast("long").alias("dl"),
        F.size(F.filter("_lt", lambda x: x == F.lit("hash"))).cast("long").alias("_tf0"),
    )
    scoring = per_doc.where(F.col("_tf0") > 0)
    p = plan_of(scoring)
    assert "Generate" not in p, p
    assert "Exchange" not in p, p
    # and the public operator still returns an eager checkpoint with the
    # contract columns
    out = bm25_scores(docs, ["hash", "scan"])
    assert "Scan ExistingRDD" in plan_of(out)
    assert set(out.columns) == {"doc_id", "n_matched_terms", "score"}


def test_funnel_joins_on_user_key_without_cartesian(spark, sf_dir, qs):
    p = plan_of(qs["event_funnel"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_retention_prunes_event_columns(spark, sf_dir, qs):
    """Retention reads only (user_id, ts) — event payloads must be pruned
    at the scan."""
    p = plan_of(qs["retention_cohorts"](spark, sf_dir))
    read_schemas = [s.split("\n")[0] for s in p.split("ReadSchema: ")[1:]]
    assert read_schemas, p
    for rs in read_schemas:
        assert "props" not in rs and "event_type" not in rs and "value" not in rs, rs


def test_hybrid_rrf_no_nested_loop(spark, sf_dir, qs):
    p = plan_of(qs["hybrid_search_rrf"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_multi_join_revenue_broadcasts_dimension_chain(spark, sf_dir, qs):
    """Q5 shape: dims (region/nation/supplier) broadcast; facts never feed
    a nested-loop join."""
    p = plan_of(qs["multi_join_revenue"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the date filter reaches the orders scan (any PushedFilters block)
    assert any(
        "o_orderdate" in blk.split("ReadSchema")[0]
        for blk in p.split("PushedFilters")[1:]
    ), p


def test_anti_join_pushes_date_filter(spark, sf_dir, qs):
    p = plan_of(qs["join_anti_customers"](spark, sf_dir))
    assert "LeftAnti" in p
    assert any(
        "o_orderdate" in blk.split("ReadSchema")[0]
        for blk in p.split("PushedFilters")[1:]
    ), p


def test_shuffle_order_single_hash_shuffle(spark, sf_dir, qs):
    p = plan_of(qs["shuffle_order"](spark, sf_dir))
    # a naive global row_number plans as Exchange SinglePartition; the
    # expression-bucketed permutation needs exactly ONE hash shuffle (the
    # in-bucket rank window) — no range shuffle, no checkpoint
    assert "Exchange SinglePartition" not in p
    assert "Exchange rangepartitioning" not in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in p  # base offsets join, never shuffled


def test_text_logprob_no_python_and_bounded_shuffles(spark, sf_dir):
    # the entry materializes (localCheckpoint), which hides the plan —
    # contract-check the LAZY operator plan directly
    from mindb_spark.operators.corpus import unigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import re

    p = plan_of(unigram_logprob(docs, materialize=False))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # shuffles are keyed on term / doc — never a global sort
    assert "Exchange rangepartitioning" not in p
    # exactly one SinglePartition exchange is fine: the corpus-total
    # 1-row aggregate (map-side partials, one row per partition moves)
    assert p.count("Exchange SinglePartition") == 1
    assert "Exchange hashpartitioning" in p
    # round 13: tf is per-row (sorted-run counting) — no (doc, term)
    # exchange anywhere; term totals come back as a broadcast
    assert not re.search(r"hashpartitioning\(_id#\d+L?, term", p), p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_above_avg_balance_single_shuffle(spark, sf_dir, qs):
    # window avg and the following aggregate share the nationkey
    # partitioning — exactly one exchange, no scalar-subquery rescan
    p = plan_of(qs["above_avg_balance"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_quality_deciles_no_global_sort(spark, sf_dir, qs):
    # exact ntile semantics WITHOUT a single-task global window: the
    # two-phase rank plans no SinglePartition exchange anywhere
    p = plan_of(qs["quality_deciles"](spark, sf_dir))
    assert "Exchange SinglePartition" not in p


def test_minhash_fast_lane_plan_no_md5_no_python(spark, sf_dir):
    """Round 9 (VERDICT r8 #4): the xxhash64 scale lane's winning shape,
    pinned. The signature pipeline must contain zero md5 (the cost the
    lane exists to remove), zero Python nodes, xxhash64 expressions, a
    BIGINT shingle column (no shingle strings), and exactly one exchange
    into the partial-min KM aggregation."""
    from pyspark.sql import functions as F

    from mindb_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = plan_of(minhash_signatures(docs, hash_family="xxhash64"))
    assert "md5" not in p.lower()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "xxhash64" in p.lower()
    assert "partial_min" in p  # map-side combine before the one exchange
    # exchanges: the deliberate widen() repartition + the agg exchange —
    # nothing else (a third would mean the shingle rows shuffled twice)
    assert p.count("Exchange") <= 2, p


def test_ngram_jaccard_moves_longs_not_strings(spark, sf_dir):
    """Round 9: the exact-Jaccard join's exploded shingle column must be
    BIGINT (xxhash64 fingerprints) — the ~3x shuffle-byte cut — while
    the emitted schema stays (id_a, id_b, jaccard) exactly as the
    string-based DuckDB oracle computes it."""
    from mindb_spark.functions.text import exploded_shingle_hashes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    sh = exploded_shingle_hashes(docs, "doc_id", "text", 3)
    assert dict(sh.dtypes)["shingle"] == "bigint"
    p = plan_of(sh)
    assert "md5" not in p.lower()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_similarity_lsh_signature_stage_is_arrow_not_row_python(spark, sf_dir):
    """Round 10 (VERDICT r9 #6 done-criterion): the vector-signature
    stages of the similarity lanes are Arrow-batched pandas_udfs
    (ArrowEvalPython — one GEMM per batch), never row-at-a-time
    BatchEvalPython; bucket scoring is mapInArrow (MapInArrow/PythonMapInArrow)."""
    from mindb_spark.operators.similarity import cosine_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = len(emb.select("embedding").first()[0])
    p = plan_of(
        cosine_pairs_lsh(
            emb, 0.6, dim=d, id_col="vec_id", vector_col="embedding",
            n_bits=8, n_bands=4,
        )
    )
    assert "BatchEvalPython" not in p, p
    assert "ArrowEvalPython" in p  # the all-band signature pandas_udf
    assert "MapInArrow" in p or "PythonMapInArrow" in p  # bucket GEMM kernel


def test_minhash_verify_join_streams_sets_without_sort(spark, sf_dir):
    """Round 10: the verify path joins the per-doc shingle-set relation
    exactly ONCE, shuffle-hash built from the exploded CANDIDATE side
    (two longs per row, bounded), at the at-scale shape (no broadcast):
    never sort-merge (SMJ sorts the ~18 GB sets relation — the r9
    20.4M disk death), never a build side carrying set arrays (the
    two-sided shuffle-hash heap death), and the cached sets side moves
    through NO new exchange (the groupBy partitioning propagates
    through the _sid alias)."""
    from pyspark.sql import functions as F

    from mindb_spark.functions.text import exploded_shingle_hashes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    shingled = exploded_shingle_hashes(docs, "doc_id", "text", 3).persist()
    sets = (
        shingled.groupBy("_id")
        .agg(F.collect_list("shingle").alias("_shs"))
        .select(F.col("_id").alias("_sid"), F.col("_shs"))
        .persist()
    )
    cand = spark.range(64).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        expl = cand.select(
            "id_a",
            "id_b",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("_sid"),
        )
        out = (
            expl.hint("shuffle_hash")
            .join(sets, "_sid")
            .groupBy("id_a", "id_b")
            .agg(F.collect_list("_shs").alias("_two"))
        )
        p = plan_of(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        sets.unpersist()
        shingled.unpersist()
    assert p.count("ShuffledHashJoin") == 1, p
    assert "SortMergeJoin" not in p, p
    # the pair gather must be the spill-safe object hash aggregate
    assert "ObjectHashAggregate" in p, p
    # the sets InMemoryTableScan must feed the join directly: no Sort
    # node anywhere at this shape
    for line in p.splitlines():
        if "Sort " in line and "InMemoryTableScan" not in line:
            raise AssertionError(f"unexpected sort at scale shape: {line}")


def test_cooccur_pairs_single_exchange_no_self_join(spark, sf_dir):
    """Round 12: candidate/intersection pair generation groups ids per key
    (ONE hash exchange) and emits ordered pairs in place — the plan must
    contain no join operator and exactly one exchange up to the pair
    aggregation's own shuffle (the old equi-self-join shuffled the
    exploded rows twice and planned a SortMergeJoin/ShuffledHashJoin)."""
    from pyspark.sql import functions as F

    from mindb_spark.functions.text import exploded_shingle_hashes
    from mindb_spark.operators.dedup import _cooccur_pair_rows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    sh = exploded_shingle_hashes(docs, "doc_id", "text", 3)
    lists = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
        .where(F.size("_ids") > 1)
    )
    pairs = _cooccur_pair_rows(lists).select("id_a", "id_b")
    p = plan_of(pairs)
    assert "Join" not in p, p
    # widen()'s deliberate round-robin + the grouping hash exchange
    assert p.count("Exchange hashpartitioning") == 1, p
    # round 13 (VERDICT r12 #2): pair generation must be TWO staged
    # Generates (posexplode left, then the O(c) suffix) — a single
    # flatten-all-pairs Generate holds O(c^2) structs in one row
    assert p.count("Generate") >= 2, p


def test_cooccur_pair_values_match_self_join(spark):
    """The grouped pair generator must emit exactly the ordered pair
    multiset the equi-self-join produced (same keys -> same c(c-1)/2
    fan-out, id_a < id_b)."""
    from pyspark.sql import functions as F

    from mindb_spark.operators.dedup import _cooccur_pair_rows

    rows = [(k, i) for k in ("x", "y", "z") for i in ([1, 2, 3, 9] if k != "z" else [7])]
    df = spark.createDataFrame(rows, "k string, _id long")
    lists = df.groupBy("k").agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
    got = sorted(
        (r.k, r.id_a, r.id_b)
        for r in _cooccur_pair_rows(lists, carry=("k",)).collect()
    )
    a = df.select("k", F.col("_id").alias("id_a"))
    b = df.select("k", F.col("_id").alias("id_b"))
    want = sorted(
        (r.k, r.id_a, r.id_b)
        for r in a.join(b, "k").where(F.col("id_a") < F.col("id_b")).collect()
    )
    assert got == want and len(want) == 12  # C(4,2) per 4-doc key, 0 for the singleton


def test_cooccur_hot_group_streams_with_linear_row_memory(spark):
    """VERDICT r12 #2 'done' pin: one degenerate group (every id in a
    single bucket — the no-frequency-cap minhash/simhash hazard) must
    stream its c(c-1)/2 pairs through the staged Generates instead of
    materializing them in one row. At c=20,000 the round-12 single-row
    pair array would be ~2e8 structs (gigabytes on one task's heap);
    the staged form's per-row allocation is O(c)."""
    from pyspark.sql import functions as F

    from mindb_spark.operators.dedup import _cooccur_pair_rows

    c = 20_000
    one = spark.range(c).agg(F.sort_array(F.collect_list("id")).alias("_ids"))
    got = _cooccur_pair_rows(one).agg(
        F.count("*").alias("n"),
        F.sum(F.col("id_a") + F.col("id_b")).alias("s"),
    ).first()
    assert got["n"] == c * (c - 1) // 2
    # each unordered pair (a, b) contributes a+b exactly once:
    # sum = (c-1) * sum(ids)
    assert got["s"] == (c - 1) * (c * (c - 1) // 2)
