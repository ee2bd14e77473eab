"""Text-analysis operators for corpus curation.

Language ID (stopword-marker heuristic), quality scoring (length / punct /
stopword ratios), token counting, and content fingerprinting — the standard
pre-training corpus passes. All pure Catalyst expressions (regexp + array
lambdas), deliberately defined by portable primitives so a SQL oracle can
replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mindb_spark.functions.text import fingerprint, token_count, tokens

# Small marker-word inventories per language. Membership counting over these
# is the whole language-ID heuristic — crude but deterministic, cheap at any
# scale, and exactly reproducible in SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"),
    "fr": ("le", "la", "les", "de", "et", "des", "est", "une", "dans", "que"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("a", "an", "on", "at", "by", "be", "as", "are", "was")

PUNCT_CLASS = r"[^.,;:!?]"  # deleting non-punctuation leaves the punctuation


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def language_scores(
    text_col: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Per-language marker-hit counts for a text column.

    ``toks`` (round 12): a pre-materialized token-array column. The
    marker counts reference the token array many times (one filter per
    language plus the argmax CASE's re-references), and each reference
    re-runs the tokenize regex when it is an inline expression — pass
    the array as its own projected column and the regex runs once per
    row (guide §4.4's duplicate-evaluation problem, built-in-expression
    form).
    """
    t = toks if toks is not None else tokens(text_col)
    return {lang: _marker_hits(t, markers) for lang, markers in LANG_MARKERS.items()}


def language_columns(
    text_col: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Column-level language ID: {'detected_lang', 'marker_hits'}.

    Exposed so pipelines can FUSE the projection onto another frame
    (e.g. dedup survivors) instead of paying a per-doc shuffle join.
    Tie-break is alphabetical-by-language (deterministic); zero hits in
    every language yields 'und' (undetermined). ``toks``: see
    :func:`language_scores`.
    """
    scores = language_scores(text_col, toks=toks)
    # build greatest-by-count with deterministic tie-break via ordered CASE
    langs = sorted(scores)  # alphabetical
    best_count = F.greatest(*[scores[l] for l in langs])
    pick = F.lit("und")
    for lang in reversed(langs):
        pick = F.when(scores[lang] == best_count, F.lit(lang)).otherwise(pick)
    pick = F.when(best_count == 0, F.lit("und")).otherwise(pick)
    return {
        "detected_lang": pick,
        "marker_hits": best_count.cast("long"),
    }


def detect_language(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, detected_lang, marker_hits): argmax language by marker count."""
    cols = language_columns(text_col)
    return df.select(
        F.col(id_col),
        cols["detected_lang"].alias("detected_lang"),
        cols["marker_hits"].alias("marker_hits"),
    )


def quality_columns(
    text_col: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Column-level quality features — fuse-able like :func:`language_columns`.

    Keys (all deterministic arithmetic, rounded where fractional):
    - n_chars, n_tokens
    - avg_token_len   = n_chars_in_tokens / n_tokens
    - punct_ratio     = punctuation chars / chars
    - stopword_ratio  = EN-stopword tokens / tokens
    - quality_score   = heuristic blend in [0, 1]: length signal x
                        (has sane avg token len) x (has some stopwords)

    ``toks``: pre-materialized token array — see :func:`language_scores`.
    """
    if toks is None:
        toks = tokens(text_col)
    tcol = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(tcol)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    punct = F.length(F.regexp_replace(tcol, PUNCT_CLASS, ""))
    stop_hits = _marker_hits(toks, STOPWORDS_EN)

    avg_tok = tok_chars / F.greatest(n_tokens, F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))

    length_signal = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    tok_signal = F.when((avg_tok >= 2.0) & (avg_tok <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_signal = F.when(stop_ratio > 0.0, F.lit(1.0)).otherwise(F.lit(0.7))
    score = length_signal * tok_signal * stop_signal

    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(avg_tok, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features: lengths, ratios, a composite score."""
    cols = quality_columns(text_col)
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_subtokens): whitespace count + BPE-ish pre-token
    count (word/number/punctuation runs — the LLM cost estimate)."""
    from mindb_spark.functions.text import bpe_token_count

    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_token_count(text_col).alias("n_subtokens"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — md5 of canonical (lower, ws-collapsed) text."""
    return df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (the Gopher-rules family used to
    filter boilerplate/spam from pre-training corpora).

    Columns per doc:
    - n_tokens             total whitespace tokens
    - distinct_token_ratio distinct / total tokens (1.0 = no repetition)
    - top_token_ratio      occurrences of the modal token / total tokens
    - dup_line_ratio       1 - distinct lines / lines

    Plan: line stats are per-row array expressions; token stats are one
    explode + two codegen'd hash aggregates (doc,token) -> doc. Shuffle
    bytes are bounded by distinct (doc, token) pairs — no per-doc
    quadratic work, no higher-order-function loops over token arrays
    (an `aggregate(filter(...))` mode-count would be O(tokens^2) per doc).
    """
    from mindb_spark.session import widen

    base = df.select(F.col(id_col), F.col(text_col))
    lines = base.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).alias("_nl"),
        F.size(F.array_distinct(F.split(F.col(text_col), "\n"))).alias("_ndl"),
    )
    tok = widen(base).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    )
    per_tok = tok.groupBy(id_col, "_tok").agg(F.count("*").alias("_c"))
    agg = per_tok.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count("*").alias("_nd"),
        F.max("_c").alias("_top"),
    )
    out = lines.join(agg, id_col, "left")
    n = F.col("_n")
    return out.select(
        F.col(id_col),
        F.coalesce(n, F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.coalesce(F.col("_nd") / n, F.lit(0.0)), 6).alias("distinct_token_ratio"),
        F.round(F.coalesce(F.col("_top") / n, F.lit(0.0)), 6).alias("top_token_ratio"),
        F.round(F.lit(1.0) - F.col("_ndl") / F.col("_nl"), 6).alias("dup_line_ratio"),
    )


# PII patterns kept to the Java-regex/RE2 COMMON SUBSET (no lookaround, no
# backreferences) so a SQL oracle replays the scrub byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / IPv4s / phone numbers; count what was removed.

    Applied in a fixed order (email -> ip -> phone) with each count taken
    against the previous stage's text, so counts compose deterministically
    when patterns could overlap. Pure regexp expressions — whole-stage
    codegen, no Python in the path.

    Returns (id, clean_text, n_emails, n_ips, n_phones).
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IP_RE, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        t3.alias("clean_text"),
        F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(PII_IP_RE), F.lit(0))).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
    )
