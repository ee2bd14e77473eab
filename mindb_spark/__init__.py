"""mindb_spark — a PySpark-native vector analytics engine.

A from-scratch rebuild of the capabilities of D-Star-AI/minDB (a two-stage
compressed-index vector database) on top of Apache Spark: DataFrame-first,
Catalyst-optimized, designed for 100 TB-scale clusters while remaining
testable on local[N].

Layout:
- ``core``       — the VectorDB engine (ingest / delete / query / train /
                   persistence / manifest counters), heuristics & validation.
- ``index``      — IVF + PQ index build (MLlib KMeans + pandas-UDF PQ) and
                   the two-stage (probe → exact-rerank) query path.
- ``functions``  — vector & text column expressions (pure
                   ``pyspark.sql.functions`` compositions; JVM-side).
- ``operators``  — standalone dataset operators: top-k similarity search,
                   similarity join, dedup family (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard / embedding cosine), text
                   analysis (lang-id, quality, tokens, fingerprints).
- ``multimodal`` — binary-column (image/audio/video) plumbing with stubbed
                   decoders.
- ``streaming``  — Structured Streaming ingest + auto-train trigger hooks.
"""

__version__ = "0.1.0"

# reference-parity convenience surface: the reference's `from mindb import
# minDB` becomes `from mindb_spark import VectorDB` (one database) or
# `Engine` (the multi-db registry behind the REST routes)
from mindb_spark.core.database import VectorDB  # noqa: E402
from mindb_spark.core.engine import Engine  # noqa: E402

__all__ = ["VectorDB", "Engine", "__version__"]
