"""Document deduplication operators for training-data pipelines.

Beyond-reference capability (the reference dedups nothing; these are the
standard LLM-corpus cleaning passes), built Spark-first:

- ``dedup_exact``            — hash-groupBy on a canonical fingerprint
- ``ngram_jaccard_pairs``    — exact n-gram Jaccard via shingle equi-join
- ``minhash_lsh_pairs``      — MinHash signatures + banded LSH candidates,
                               exact-Jaccard verified
- ``simhash_pairs``          — 64-bit SimHash, banded hamming candidates
- embedding near-dup         — ``operators.similarity.cosine_pairs[_lsh]``

Portability: the exact operators are defined purely in terms of md5 /
regexp / array primitives so an independent SQL engine (DuckDB) reproduces
them bit-for-bit — that's the correctness oracle. MinHash uses *string-min
of md5(seed || shingle)*, which is engine-agnostic (no reliance on Spark's
xxhash64 vs DuckDB's hash).

Scale notes
-----------
- Exact dedup is one hash aggregation on a 32-char key: map-side partial
  aggregation + one shuffle of (fingerprint, id) — optimal.
- The shingle equi-join shuffles (shingle, id) pairs; shingle frequency
  skew (stop-shingles) is the hazard at 100 TB — ``max_shingle_freq``
  drops shingles occurring in more than N docs (standard df-cut), which
  bounds the join fan-out. AQE skew-join handles the remainder.
- MinHash LSH shuffles only (band, bucket-hash, id) — constant per doc —
  then verifies candidates; this is THE scalable text near-dup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mindb_spark.functions.text import fingerprint, word_shingles


def dedup_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on canonical text. Returns (fingerprint, kept id, dup count).

    Keeps the min (default) or max id per group — deterministic across
    engines. One aggregation; no window, no sort.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(agg.alias(id_col), F.count("*").alias("dup_count"))
    )


def dedup_exact_survivors(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The deduplicated dataset itself (all columns, first id per dup group)."""
    keep = dedup_exact(df, id_col, text_col).select(id_col)
    return df.join(keep, id_col, "left_semi")


def _shingle_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_shingle_freq: int | None,
) -> DataFrame:
    """(id_a, id_b, intersection_size) for docs sharing >=1 distinct shingle."""
    shingled = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_shingles(text_col, k))).alias("shingle"),
    )
    if max_shingle_freq is not None:
        # df-cut: drop stop-shingles before the join to bound skew/fan-out
        freq_ok = (
            shingled.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_shingle_freq)
            .select("shingle")
        )
        shingled = shingled.join(freq_ok, "shingle", "left_semi")
    a = shingled.select(F.col("_id").alias("id_a"), "shingle")
    b = shingled.select(F.col("_id").alias("id_b"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact word-k-shingle Jaccard similarity join: pairs >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over DISTINCT shingle sets.
    Fully declarative (explode → equi-join → agg), hence oracle-checkable.
    """
    sizes = df.select(
        F.col(id_col).alias("_id"),
        F.size(F.array_distinct(word_shingles(text_col, k))).alias("_n"),
    )
    inter = _shingle_pairs(df, id_col, text_col, k, max_shingle_freq)
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("intersection")
                / (F.col("_na") + F.col("_nb") - F.col("intersection"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per doc: ARRAY<STRING> of length ``num_hashes``.

    Hash family i = md5(i || ':' || shingle); the signature element is the
    lexicographic MIN over the doc's shingles — a valid min-wise permutation
    family over the md5 string space, and reproducible in any engine with
    md5. Docs with no shingles are dropped (they can't collide).
    """
    shingled = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, k))).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = shingled.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    n_bands: int = 8,
    verify: bool = True,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, exact-Jaccard verified.

    ``num_hashes`` must divide into ``n_bands`` equal rows-per-band groups;
    a pair is a candidate if any band's row-slice matches exactly
    (bucket-hash equi-join). With r rows/band and b bands, candidate
    probability is 1-(1-j^r)^b. ``verify=True`` computes the true Jaccard
    for candidates only, so output has no false positives.
    """
    if num_hashes % n_bands != 0:
        raise ValueError("num_hashes must be divisible by n_bands")
    r = num_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws("|", *[F.col("signature")[b * r + i] for i in range(r)])
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = bands.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"))
    b = bands.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cand
    exact = ngram_jaccard_pairs(
        df, 0.0, id_col=id_col, text_col=text_col, k=k, max_shingle_freq=max_shingle_freq
    ).withColumnRenamed("jaccard", "jaccard")
    return (
        cand.join(exact, ["id_a", "id_b"])
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document over its token multiset.

    bit_j(doc) = sign of sum over tokens of (bit_j(xxhash64(token)) ? +1 : -1).
    Computed entirely with JVM expressions: per-token hash → per-bit ±1 →
    elementwise array sum via aggregate/zip_with → sign bits → one BIGINT.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    # per token: 64-array of ±1 (bit positions unrolled — shift amounts must
    # be Python ints for shiftright)
    bitvec = F.transform(
        toks,
        lambda t: F.array(
            *[
                F.when(
                    F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for j in range(64)
            ]
        ),
    )
    summed = F.aggregate(
        bitvec,
        F.array_repeat(F.lit(0), 64),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
    )
    sig = F.lit(0).cast("long")
    for j in range(64):
        bit = (1 << j) if j < 63 else -(1 << 63)  # sign bit in two's complement
        sig = sig.bitwiseXOR(
            F.when(F.element_at(summed, j + 1) > 0, F.lit(bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return df.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banded exact-match trick: split the 64-bit signature into
    ``max_hamming + 1`` chunks — any pair within the hamming budget must
    match exactly on at least one chunk (pigeonhole), so candidates come
    from chunk equi-joins, then the true hamming distance filters.
    """
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    sigs = simhash64(df, id_col, text_col)
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))

    a = chunks.select("chunk", "val", F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"))
    b = chunks.select("chunk", "val", F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"))
    cand = (
        a.join(b, ["chunk", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
