"""Text-feature column expressions for training-data pipelines.

Tokenization, shingling, and fingerprinting as pure Catalyst expressions.
Deliberately defined by *portable* primitives (regex token extraction, md5)
so the exact same definition can be evaluated by an independent SQL oracle
(DuckDB) for correctness checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# One token = a maximal run of non-whitespace. Matches `regexp_extract_all(text, '\S+')`
# in ANSI-ish SQL engines.
TOKEN_REGEX = r"\S+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """ARRAY<STRING> of whitespace-delimited tokens."""
    return F.regexp_extract_all(_c(col), F.lit(TOKEN_REGEX), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


# GPT-2-style pre-tokenizer shape, restricted to RE2 syntax (no lookahead)
# so an independent engine (DuckDB) reproduces it token-for-token:
# a leading-space word, a leading-space number run, a leading-space
# punctuation run, or residual whitespace.
BPE_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_tokens(col: Column | str) -> Column:
    """ARRAY<STRING> of BPE-ish subword pre-tokens (word/number/punct runs)."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_REGEX), 0)


def bpe_token_count(col: Column | str) -> Column:
    """Subword-ish token count — the LLM-pipeline cost estimate (a real BPE
    merge table would refine these pre-tokens; the count is the standard
    pre-tokenization upper bound)."""
    return F.size(F.filter(bpe_tokens(col), lambda t: t.rlike(r"\S"))).cast("long")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """ARRAY<STRING> of word k-shingles (space-joined sliding windows).

    Texts shorter than k tokens yield an empty array.
    """
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def word_shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """ARRAY<STRING> of word k-shingles from an already-materialized token
    array column.

    Prefer this (behind a projection that evaluates ``tokens(text)`` once)
    over ``word_shingles`` in hot paths: the sliding-window ``transform``
    is an interpreted higher-order function, and handing it the raw
    ``regexp_extract_all`` expression re-evaluates the regex per window —
    measured 3-10x slower and GC-heavy at 40k docs vs shingling from a
    materialized array, where the regex runs once per row inside codegen.
    """
    t = _c(toks)
    n = F.size(t)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        )
    )


def exploded_word_shingles(df, id_col: str, text_col: str, k: int, out_id: str = "_id"):
    """(out_id, shingle): one exploded row per DISTINCT word k-shingle of
    each document — the shared front end of the MinHash / Jaccard /
    contamination pipelines.

    Plan choices, each measured ~3-10x here:
    - shingling runs AFTER the widen exchange, so the regex/array work is
      spread across all cores even when the scan is a single split;
    - the token array is materialized in its OWN projection before the
      shingle ``transform`` (see ``word_shingles_from_tokens``) — the two
      projects don't collapse because the token array is non-cheap and
      multiply referenced, which is exactly what keeps the regex at one
      evaluation per row;
    - the Generate retains no extra columns (a Generate that also carries
      the shingle array or its size copies/re-evaluates per exploded row).
    """
    from mindb_spark.session import widen

    return (
        widen(df.select(F.col(id_col).alias(out_id), F.col(text_col)))
        .select(out_id, tokens(text_col).alias("_toks"))
        .select(
            out_id,
            F.explode(
                F.array_distinct(word_shingles_from_tokens("_toks", k))
            ).alias("shingle"),
        )
    )


def shingle_hashes_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """ARRAY<BIGINT> of 64-bit shingle fingerprints — ``xxhash64`` over the
    k tokens of each sliding window, hashed as a k-column tuple.

    The scale-path replacement for ``word_shingles_from_tokens``: no
    shingle STRING is ever materialized (no array_join allocation, and
    every downstream row — distinct, explode, shuffle, aggregate — moves
    8 bytes instead of a ~(k·word)-char string), and the downstream
    MinHash stage consumes the long directly instead of paying an md5 +
    hex-parse per row. Identity-preserving with probability
    1 − ~n²/2⁶⁵ (64-bit fingerprints): two documents' DISTINCT shingle
    sets intersect under hashing exactly as the string sets do, so
    Jaccard over hashes equals Jaccard over strings whp. xxhash64 is
    Spark-native (JVM codegen) but NOT portable to other engines — use
    the md5 string lane when an independent oracle must reproduce the
    values.

    Same hot-path contract as ``word_shingles_from_tokens``: pass an
    already-materialized token array column; the window ``transform``
    re-evaluates captured expressions per element.
    """
    t = _c(toks)
    n = F.size(t)
    return F.when(n < k, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.xxhash64(*[F.element_at(t, i + j) for j in range(k)]),
        )
    )


def exploded_shingle_hashes(df, id_col: str, text_col: str, k: int, out_id: str = "_id"):
    """(out_id, shingle BIGINT): one exploded row per DISTINCT word
    k-shingle HASH of each document — the fast-lane twin of
    ``exploded_word_shingles`` (same widen-first / tokens-materialized /
    bare-Generate plan shape; see that docstring for the rationale),
    emitting ``xxhash64`` fingerprints instead of shingle strings."""
    from mindb_spark.session import widen

    return (
        widen(df.select(F.col(id_col).alias(out_id), F.col(text_col)))
        .select(out_id, tokens(text_col).alias("_toks"))
        .select(
            out_id,
            F.explode(
                F.array_distinct(shingle_hashes_from_tokens("_toks", k))
            ).alias("shingle"),
        )
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """ARRAY<STRING> of character n-grams of the whitespace-normalized text.

    Hot-path note: the window ``transform`` captures the normalization
    expression, and interpreted higher-order functions re-evaluate captured
    expressions per element — at scale, materialize ``normalized_text`` in
    its own projection first and pass that column here (the same trap and
    fix as ``word_shingles`` vs ``word_shingles_from_tokens``)."""
    norm = normalized_text(col)
    length = F.length(norm)
    return F.when(length < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), length - n + 1),
            lambda i: F.substring(norm, i, n),
        )
    )


def normalized_text(col: Column | str) -> Column:
    """Lowercased, whitespace-collapsed, trimmed text — canonical form for
    exact dedup and fingerprinting."""
    return F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint: md5 of the canonical text.

    md5 rather than Spark's xxhash64 so any SQL engine reproduces it.
    """
    return F.md5(normalized_text(col))
