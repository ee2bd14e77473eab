"""Corpus-construction operators: benchmark decontamination, incremental
dedup, and term weighting.

Beyond-reference capability (the reference is a vector store; these are the
remaining standard passes a pre-training data pipeline runs before
tokenization), built Spark-first and defined purely by portable primitives
(md5 / regexp / arithmetic) so a DuckDB SQL oracle replays them exactly.

Scale notes
-----------
- ``ngram_contamination`` broadcasts the DISTINCT benchmark shingle set —
  eval benchmarks are tiny (thousands of docs) next to a 100 TB corpus, so
  the corpus side is a single broadcast-hash-join pass with no shuffle of
  corpus rows at all; the per-doc aggregate shuffles one (doc, counts) row
  per document.
- ``incremental_dedup`` is the production dedup shape: a new batch arrives
  and must be checked against the (already-deduplicated) corpus without
  re-scanning corpus text — the corpus contributes only its 16-byte
  fingerprint column (pruned scan), and the join shuffles fingerprints,
  not documents. Within-batch duplicates resolve by min-id in the same
  aggregation.
- ``tfidf_top_terms`` / ``unigram_logprob`` compute the per-doc (term, tf)
  table PER ROW (sorted-run counting over the token array — round 13, the
  BM25 recipe): the corpus is never exploded into a (doc, term) shuffle;
  the only exchanges left are the vocab-bounded term-stats aggregates and
  the per-doc finisher, both over map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mindb_spark.functions.text import (
    exploded_shingle_hashes,
    fingerprint,
    tokens,
)
from mindb_spark.session import widen


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    # 64-bit shingle fingerprints, not strings (round 9): hit counts and
    # rates are invariant under an injective shingle mapping (collision
    # odds ~s²/2⁶⁵), and the broadcast benchmark set + the corpus-side
    # join keys shrink to 8 bytes/shingle — the DuckDB oracle still
    # matches because no shingle value is ever emitted
    return exploded_shingle_hashes(df, id_col, text_col, k, out_id="_id")


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-decontamination scan: for each corpus document, how many of
    its distinct word-``k``-shingles also appear in the benchmark set.

    The standard eval-leakage check (the n-gram-overlap family used to
    decontaminate pre-training corpora against held-out benchmarks).

    Returns (id, n_shingles, n_contaminated, contamination_rate) for every
    corpus document — downstream filters cut at a rate threshold.

    Plan: the benchmark side collapses to DISTINCT shingles and is
    broadcast (benchmarks are small by construction); the corpus side is
    one pass — explode distinct shingles, broadcast-join, count hits per
    doc. Docs shorter than ``k`` tokens have no shingles and report a rate
    of 0.
    """
    corp = _distinct_shingles(corpus, id_col, text_col, k)
    bench = (
        _distinct_shingles(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    per_doc = corp.join(
        F.broadcast(bench).withColumn("_hit", F.lit(1)), "shingle", "left"
    ).groupBy("_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
    )
    out = corpus.select(F.col(id_col)).join(
        per_doc.withColumnRenamed("_id", id_col), id_col, "left"
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0))
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return out.select(
        F.col(id_col),
        n_sh.cast("long").alias("n_shingles"),
        n_hit.cast("long").alias("n_contaminated"),
        F.round(n_hit / F.greatest(n_sh, F.lit(1)), 6).alias("contamination_rate"),
    )


def incremental_dedup(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify each batch document against an existing corpus:

    - ``dup_of_corpus``  — canonical fingerprint already present in corpus
    - ``dup_in_batch``   — novel vs corpus, but a lower-id batch doc has
      the same fingerprint (that doc is the survivor)
    - ``novel``          — first occurrence anywhere; would be ingested

    Returns (id, fingerprint, status). Corpus precedence is checked first:
    a batch group whose fingerprint exists in the corpus is ENTIRELY
    ``dup_of_corpus`` (no batch survivor — the corpus copy survives),
    matching how a production ingest treats the corpus as ground truth.

    Plan: corpus scan prunes to the fingerprint expression only; one
    left-join on the 32-char key + one min-id window per fingerprint group
    within the batch (bounded by batch size, not corpus size).
    """
    corp_fp = (
        existing.select(fingerprint(text_col).alias("fingerprint"))
        .distinct()
        .withColumn("_in_corpus", F.lit(1))
    )
    b = batch.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
    first_in_batch = F.min(id_col).over(Window.partitionBy("fingerprint"))
    joined = b.join(corp_fp, "fingerprint", "left").withColumn(
        "_first", first_in_batch
    )
    status = (
        F.when(F.col("_in_corpus").isNotNull(), F.lit("dup_of_corpus"))
        .when(F.col(id_col) != F.col("_first"), F.lit("dup_in_batch"))
        .otherwise(F.lit("novel"))
    )
    return joined.select(F.col(id_col), "fingerprint", status.alias("status"))


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap — the
    standard RAG / embedding-prep pass before vectorization.

    Returns (id, chunk_no, start, chunk_text, chunk_len): ``chunk_no``
    counts from 0, ``start`` is the 1-based character offset, windows
    advance by ``chunk_size - overlap``, and the final window is clipped
    to the text length. Empty texts produce no chunks.

    Plan: pure per-row array expressions (sequence -> transform ->
    explode) — whole-stage codegen, no shuffle at all; chunk rows land on
    the partition that held the document, and the Generate carries only
    the (start, piece) structs, never a copy of the full document per
    exploded row.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    tcol = F.col(text_col)
    n = F.length(tcol)
    empty = F.array().cast("array<struct<start:int,chunk_text:string>>")
    pieces = F.when(F.coalesce(n, F.lit(0)) <= 0, empty).otherwise(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step)
            ),
            lambda s: F.struct(
                s.cast("int").alias("start"),
                tcol.substr(s, F.lit(chunk_size)).alias("chunk_text"),
            ),
        )
    )
    chunks = widen(df.select(F.col(id_col), tcol)).select(
        F.col(id_col), F.posexplode(pieces).alias("chunk_no", "_c")
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.col("_c.start").alias("start"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.length("_c.chunk_text").cast("int").alias("chunk_len"),
    )


def quality_deciles(
    df: DataFrame,
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide quality binning: rank documents by the heuristic quality
    score into ``n_bins`` equal-count bins (curriculum / mixture levers
    pick from the top bins).

    Returns one row per bin: (bin, n_docs, min_score, max_score).
    Semantics are EXACTLY SQL ``ntile(n_bins)`` over (score desc, id) —
    deterministic and engine-portable — but computed WITHOUT the
    single-task global sort a window ntile plans: global rank comes from
    the two-phase prefix-sum scaffold (range-partition on (-score, id),
    per-partition counts to the driver, broadcast base offsets,
    in-partition rank), and the ntile bin is closed-form from the rank
    (the first ``n mod k`` bins get one extra row, like SQL).
    """
    from mindb_spark.operators.sampling import _ranged_base_offsets
    from mindb_spark.operators.textops import quality_columns

    qual = quality_columns(text_col)
    # widen BEFORE scoring (round 12): the quality expressions are the
    # CPU of this operator (token/punct/stopword passes per row) and the
    # range sampler below evaluates its input once more for boundary
    # picking — both runs inherit the scan's split count without this
    # (a small file scans as ONE task and serializes the regex work)
    scored = widen(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        qual["quality_score"].alias("quality_score"),
    ).withColumn("_ns", -F.col("quality_score"))
    # n comes from the scaffold's own totals — the SAME pinned rows the
    # offsets cover, so the bin boundaries can never disagree with the
    # ranked rows (an independent df.count() could, over a
    # nondeterministic upstream)
    based, n = _ranged_base_offsets(
        scored, ["_ns", id_col], weight_col=None, n_ranges=None
    )
    q_, r_ = divmod(n, n_bins)
    head = r_ * (q_ + 1)
    w = Window.partitionBy("_pid").orderBy("_ns", F.col(id_col))
    pos = (F.col("_base") + F.row_number().over(w) - 1).cast("long")
    binned = based.withColumn("_pos", pos).withColumn(
        "bin",
        F.when(
            F.col("_pos") < F.lit(head), F.expr(f"_pos DIV {q_ + 1}") + 1
        )
        .otherwise(F.lit(r_) + F.expr(f"(_pos - {head}) DIV {max(q_, 1)}") + 1)
        .cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.min("quality_score").alias("min_score"),
        F.max("quality_score").alias("max_score"),
    )


def _doc_term_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, term, tf) — the per-doc term-frequency table, computed PER ROW.

    Round 13 (guide §1.2/§2.3, the BM25 recipe generalized to an unbounded
    vocabulary): tf of a term within a doc is a per-row quantity, so the
    corpus-token explode + (doc, term) hash-agg exchange the old shape
    paid is replaced by sorted-run counting over each row's token array —
    sort the lowered tokens once (O(n log n) per row), find the run-start
    positions, and the gaps between consecutive starts are the tfs. The
    emitted rows are the distinct (doc, term) pairs with their counts;
    downstream consumers aggregate them WITHOUT ever shuffling one row
    per corpus token.

    Projections are staged so CollapseProject keeps each non-cheap array
    (the tokenize+sort, the run starts) single-evaluated per row — the
    same duplicate-evaluation guard as bm25_scores/pipeline_curation.
    ``F.get`` (0-based, null out-of-bounds) handles the array edges
    without ANSI index errors; a doc with zero tokens emits no rows,
    exactly like the explode formulation.
    """
    sorted_toks = widen(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))
    ).select(
        "_id", F.array_sort(F.transform(tokens(text_col), F.lower)).alias("_s")
    )
    s = F.col("_s")
    n = F.size(s)
    # 1-based positions where a new run starts: position 1, or value
    # differs from its predecessor (F.get is 0-based; at i=1 the
    # predecessor read is null, and `x != null` is null => the i=1 branch
    # carries the row)
    with_starts = sorted_toks.select(
        "_id",
        "_s",
        F.when(n <= 0, F.array().cast("array<int>"))
        .otherwise(
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (i == F.lit(1))
                | (F.get(s, i - 1) != F.get(s, i - 2)),
            )
        )
        .alias("_st"),
    )
    st = F.col("_st")
    # run j (0-based) spans [st[j], next_start) with next_start = st[j+1]
    # or n+1 for the last run — its length is the term's tf
    pairs = F.transform(
        st,
        lambda b, j: F.struct(
            F.element_at(F.col("_s"), b).alias("term"),
            (F.coalesce(F.get(st, j + 1), F.size(F.col("_s")) + 1) - b)
            .cast("long")
            .alias("tf"),
        ),
    )
    return with_starts.select("_id", F.inline(pairs))


def tfidf_top_terms(
    df: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-document top-``top_n`` terms by tf-idf (linear idf variant).

    Weighting: ``score = tf * N / df`` — rank-equivalent to classic
    tf-idf's ``tf * (N/df)`` inside a document and, unlike ``ln(N/df)``,
    reproducible bit-for-bit by any IEEE SQL engine (libm ``log`` differs
    in the last ulp across engines; a single divide and multiply do not).
    Terms are lowercased whitespace tokens. Ties break by term ascending.

    Returns (id, term, tf, df, tfidf_score, rank).

    Plan (round 13, guide §1.2/§2.3): the (doc, term, tf) table comes from
    :func:`_doc_term_tf` — per-row sorted-run counting, NO corpus-token
    explode and NO (doc, term) exchange. It is persisted (narrow rows:
    two keys + a long) because its two consumers (the term
    document-frequency aggregate and the scoring join) would otherwise
    each re-run the tokenize+sort pass. df-per-term is one vocab-bounded
    hash aggregate; the df table is broadcast back (``broadcast_stats``,
    default True — term-df is vocab-sized, Heaps'-law sublinear in the
    corpus; pass False to shuffle-join instead for a pathological
    vocabulary), so the scored rows never leave their doc's partition
    until the final ranked window — which Spark bounds with
    WindowGroupLimit (partial top-n per partition == final top-n per doc,
    since each doc's rows are co-located by construction). Result is
    eagerly checkpointed (top_n x docs rows) so the cache releases before
    return.

    ``materialize=False`` returns the LAZY single-pipeline plan instead
    (no persist, no checkpoint) — for plan inspection and composition;
    the caller then owns the recompute-per-consumer risk.
    """
    tf = _doc_term_tf(df, id_col, text_col)
    if materialize:
        tf = tf.persist()
    try:
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        if broadcast_stats:
            dfreq = F.broadcast(dfreq)
        # ids are primary keys: plain count == count distinct, and a plain
        # count over a parquet scan is metadata-only (no shuffle)
        n_docs = df.count()
        scored = tf.join(dfreq, "term").withColumn(
            "tfidf_score",
            F.round(F.col("tf") * F.lit(float(n_docs)) / F.col("df"), 6),
        )
        w = Window.partitionBy("_id").orderBy(
            F.desc("tfidf_score"), F.asc("term")
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_n)
            .select(
                F.col(id_col) if id_col == "_id" else F.col("_id").alias(id_col),
                "term",
                "tf",
                "df",
                "tfidf_score",
                F.col("rank").cast("int").alias("rank"),
            )
        )
        return out.localCheckpoint(eager=True) if materialize else out
    finally:
        if materialize:
            tf.unpersist()


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Corpus-unigram-LM document scoring (pseudo-perplexity).

    The cheap LM-quality pass a pre-training pipeline runs before paying
    for a real LM: score each document by the mean log-probability of its
    tokens under the corpus's own unigram distribution,

        avg_logprob(doc) = (1/n) * sum_instances ln p(t),
        p(t) = c(t) / T,

    so rare-token-heavy documents (OCR noise, gibberish, wrong-charset)
    score very negative and boilerplate scores near the top — the same
    signal family as CCNet's LM-perplexity filter, self-contained (no
    external model). Equivalently computed from the (doc, term, tf)
    table: ``sum(tf*ln c)/sum(tf) - ln T``.

    Plan (round 13, guide §1.2/§2.3): the (doc, term, tf) table comes
    from :func:`_doc_term_tf` — per-row sorted-run counting, NO
    corpus-token explode and NO (doc, term) exchange; it is persisted
    (narrow rows) for its two stats consumers, and ONE driver stats
    action (the corpus token total) doubles as the eager cache pin, then
    replays into the plan as a literal long — the same
    ``ln(cast(total as double))`` the in-plan form evaluates. Term
    totals are one vocab-bounded hash agg broadcast back into the
    scoring pass (``broadcast_stats`` — see :func:`tfidf_top_terms`).
    The lazy variant keeps the total IN-PLAN (1-row aggregate crossJoin)
    so it really is lazy. The per-doc finisher aggregates rows that
    never left their doc's partition, so its exchange moves one narrow
    partial row per doc. No
    float enters an ordering (unlike tf-idf's rank there is nothing to
    flip on a last-ulp ``ln`` difference), so rounding the final score to
    6 dp makes it engine-portable.

    Returns (id, n_tokens, avg_logprob).
    """
    tf = _doc_term_tf(df, id_col, text_col)
    if not materialize:
        # lazy variant: the corpus total stays IN-PLAN (1-row aggregate
        # broadcast into the scoring pass) so building the frame runs no
        # job at all; the caller owns the recompute-per-consumer risk
        termc = tf.groupBy("term").agg(F.sum("tf").alias("c"))
        if broadcast_stats:
            termc = F.broadcast(termc)
        total = tf.agg(F.sum("tf").alias("_t"))
        return (
            tf.join(termc, "term")
            .crossJoin(F.broadcast(total))
            .groupBy("_id")
            .agg(
                F.sum("tf").cast("long").alias("n_tokens"),
                F.round(
                    F.sum(F.col("tf") * F.log(F.col("c").cast("double")))
                    / F.sum("tf")
                    # _t is constant across the group; max() just carries it
                    - F.max(F.log(F.col("_t").cast("double"))),
                    6,
                ).alias("avg_logprob"),
            )
            .select(F.col("_id").alias(id_col), "n_tokens", "avg_logprob")
        )
    tf = tf.persist()
    try:
        # ONE stats action doubles as the eager cache pin (the BM25
        # recipe): AQE submits independent leaf stages CONCURRENTLY, so
        # without a pin the term-total and scoring branches would race
        # the unpopulated cache and each recompute the tokenize+sort
        # pass. The corpus token total rides the pin job; it re-enters
        # the plan as a literal LONG (same ln(cast to double) expression
        # the in-plan form evaluates — bit-identical).
        tot = tf.agg(F.sum("tf")).first()[0]
        if tot is None:
            tot = 1  # empty corpus: no rows exist for the expression below
        termc = tf.groupBy("term").agg(F.sum("tf").alias("c"))
        if broadcast_stats:
            termc = F.broadcast(termc)
        out = (
            tf.join(termc, "term")
            .groupBy("_id")
            .agg(
                F.sum("tf").cast("long").alias("n_tokens"),
                F.round(
                    F.sum(F.col("tf") * F.log(F.col("c").cast("double")))
                    / F.sum("tf")
                    - F.log(F.lit(int(tot)).cast("double")),
                    6,
                ).alias("avg_logprob"),
            )
            .select(F.col("_id").alias(id_col), "n_tokens", "avg_logprob")
        )
        return out.localCheckpoint(eager=True)
    finally:
        tf.unpersist()
