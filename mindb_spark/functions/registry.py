"""SQL-surface registration for the vector/text expression library.

Spark 4 SQL UDFs (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) expose
the same Catalyst expressions ``functions.vector`` builds in Python to
plain ``spark.sql`` users — the bodies are pure SQL, so they stay inside
whole-stage codegen (NOT Python UDFs; nothing leaves the JVM).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS: dict[str, str] = {
    # dot product accumulated in double (functions/vector.py::dot)
    "vec_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    ),
    "vec_l2_norm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    ),
    # zero vectors normalize to themselves (validation rejects them at
    # ingest; this mirrors functions/vector.py::l2_normalize's guard).
    # CAVEAT: the norm expression sits inside the transform lambda after
    # SQL-UDF inlining and Catalyst does not hoist it, so this evaluates
    # the O(d) norm per element — a convenience for small d; bulk
    # normalization should use functions.vector.l2_normalize (Python
    # Column builder, norm evaluated once).
    "vec_normalize": (
        "(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> RETURN "
        "transform(a, x -> x / (CASE WHEN vec_l2_norm(a) = 0.0 THEN 1.0 "
        "ELSE vec_l2_norm(a) END))"
    ),
    # dot/(na*nb) form: every norm reference sits at TOP level (not inside
    # a lambda), so the whole call is O(d) — never normalize-then-dot here
    "vec_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "vec_dot(a, b) / (CASE WHEN vec_l2_norm(a) * vec_l2_norm(b) = 0.0 "
        "THEN 1.0 ELSE vec_l2_norm(a) * vec_l2_norm(b) END)"
    ),
    # canonical text fingerprint (functions/text.py::fingerprint)
    "text_fingerprint": (
        "(t STRING) RETURNS STRING RETURN "
        r"md5(lower(trim(regexp_replace(t, '\\s+', ' '))))"
    ),
    # whitespace token count (functions/text.py::token_count)
    "text_token_count": (
        "(t STRING) RETURNS BIGINT RETURN "
        r"size(regexp_extract_all(t, '\\S+', 0))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the library's expression surface as session-scoped SQL
    functions. Returns the registered names. Idempotent (OR REPLACE)."""
    for name, body in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(_FUNCTIONS)
