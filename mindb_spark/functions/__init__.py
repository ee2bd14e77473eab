"""Column-expression building blocks (vector math, text features).

Everything in this package returns ``pyspark.sql.Column`` objects built from
built-in ``pyspark.sql.functions`` so the hot path stays inside whole-stage
codegen — no Python row-at-a-time UDFs. Arrow-batched pandas UDF kernels for
the few genuinely-numeric inner loops (PQ/ADC, matrix scoring) live next to
their operators in ``mindb_spark.index`` / ``mindb_spark.operators``.
"""

from mindb_spark.functions.vector import (
    cosine_similarity,
    dot,
    dot_literal,
    l2_norm,
    l2_normalize,
)
from mindb_spark.functions.text import (
    char_ngrams,
    fingerprint,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "dot_literal",
    "l2_norm",
    "l2_normalize",
    "char_ngrams",
    "fingerprint",
    "token_count",
    "tokens",
    "word_shingles",
]
