"""Vector math as Catalyst array expressions (JVM-side, codegen-friendly).

These replace the reference's numpy/Faiss kernels for the *declarative* parts
of query execution: L2 normalization at ingest (reference
``mindb/utils/input_validation.py:96-99``) and dot-product cosine similarity
(reference ``mindb/utils/query_utils.py:3-8``). Because ingest normalizes
unconditionally, ``dot == cosine`` everywhere downstream — same contract as
the reference.

All arithmetic is done in DOUBLE regardless of the stored element type so
that scores are reproducible across engines (our DuckDB oracle computes in
double too).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_literal(a: Column | str, q: Sequence[float]) -> Column:
    """Dot product of an array column with a constant query vector.

    The literal array is constant-folded by Catalyst; for q vectors up to a
    few thousand dims this beats shipping a one-row DataFrame to join with.
    """
    lit_arr = F.array(*[F.lit(float(x)) for x in q])
    return dot(a, lit_arr)


def l2_norm(col: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(col), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(col: Column | str, element_type: str = "float") -> Column:
    """Unit-normalize an array column; zero vectors pass through unchanged.

    Mirrors ingest normalization (reference input_validation.py:96-99) —
    stored vectors are unit length so inner product equals cosine similarity.
    ``element_type="float"`` matches the engine's ARRAY<FLOAT> storage;
    operators that compare against a double-precision oracle should pass
    ``"double"`` to avoid float32 quantization noise.
    """
    col = F.col(col) if isinstance(col, str) else col
    norm = l2_norm(col)
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return F.transform(col, lambda x: (x.cast("double") / safe).cast(element_type))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Full cosine similarity (normalizes both sides; use ``dot`` when inputs
    are already unit vectors, as engine-stored vectors always are)."""
    na, nb = l2_norm(a), l2_norm(b)
    denom = na * nb
    safe = F.when(denom == 0.0, F.lit(1.0)).otherwise(denom)
    return dot(a, b) / safe
