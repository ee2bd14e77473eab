"""Ingest / query / train argument validation.

Preserves the reference's validation semantics (``mindb/utils/
input_validation.py``): batch-atomic checks *before* any write, dimension
pinning by the first add, (1,d)/(d,1) squeeze, L2 normalization on ingest,
and the train-parameter constraint set (OPQ <= PCA <= d, opq % pq_bytes == 0,
pq_bytes required when OPQ set). Error messages keep the same substance so
tests written against the reference's message table still apply.

Validation of *small driver-side batches* (the ``add(list_of_tuples)`` API)
runs in numpy here; validation of *DataFrame ingest* is expressed as column
checks in ``mindb_spark.core.database`` so it runs distributed.
"""

from __future__ import annotations

import re

import numpy as np

NAME_REGEX = re.compile(r"^[a-zA-Z0-9_ -]+$")


class ValidationError(ValueError):
    """Raised when an input batch fails validation (whole batch rejected)."""


def validate_database_name(name: str) -> None:
    # must be usable as a file/table path component (reference input_validation.py:6-12)
    if not isinstance(name, str) or not NAME_REGEX.match(name):
        raise ValidationError(
            "The name is invalid. It must only contain alphanumeric characters, "
            "spaces, underscores, and hyphens."
        )


def validate_train_params(
    vector_dimension: int | None,
    pca_dimension: int | None,
    opq_dimension: int | None,
    compressed_vector_bytes: int | None,
) -> None:
    """Train-parameter constraints (reference input_validation.py:15-51)."""
    if vector_dimension is None:
        raise ValidationError("No vectors have been added to the database")
    if compressed_vector_bytes is None and opq_dimension is not None:
        raise ValidationError("compressed_vector_bytes must be set if opq_dimension is set")

    for label, value in (
        ("pca_dimension", pca_dimension),
        ("opq_dimension", opq_dimension),
        ("compressed_vector_bytes", compressed_vector_bytes),
    ):
        if value is not None and not isinstance(value, int):
            raise ValidationError(
                f"{label} is not the correct type. Expected type: int. "
                f"Actual type: {type(value)}"
            )
        if value is not None and value < 1:
            raise ValidationError(f"{label} is not positive. {label}: {value}")

    if pca_dimension is not None and pca_dimension > vector_dimension:
        raise ValidationError(
            "pca_dimension is larger than the number of columns in the data. "
            f"Number of columns in data: {vector_dimension} pca_dimension: {pca_dimension}"
        )
    if opq_dimension is not None and pca_dimension is not None and opq_dimension > pca_dimension:
        raise ValidationError(
            f"opq_dimension is larger than pca_dimension. "
            f"pca_dimension: {pca_dimension} opq_dimension: {opq_dimension}"
        )
    if opq_dimension is not None and opq_dimension % compressed_vector_bytes != 0:
        raise ValidationError(
            "opq_dimension is not divisible by compressed_vector_bytes. "
            f"opq_dimension: {opq_dimension} compressed_vector_bytes: {compressed_vector_bytes}"
        )


def validate_and_normalize_add(
    data: list,
    vector_dimension: int | None,
) -> tuple[np.ndarray, list]:
    """Validate one add batch; return (normalized float32 matrix, metadata list).

    Batch-atomic: any bad record rejects the whole batch before a single row
    is written (reference mindb.py:175-178, input_validation.py:54-110).
    """
    if not isinstance(data, list):
        raise ValidationError(
            f"Data is not the correct type. Expected type: list. Actual type: {type(data)}"
        )
    for item in data:
        if not isinstance(item, tuple):
            raise ValidationError(
                f"List item is not the correct type. Expected type: tuple. "
                f"Actual type: {type(item)}"
            )

    vectors = [item[0] for item in data]
    metadata = [item[1] for item in data]
    if len(vectors) < 1:
        raise ValidationError("There are no vectors in the data")

    cleaned: list[np.ndarray] = []
    for vector in vectors:
        if isinstance(vector, list):
            vector = np.array(vector, dtype=np.float32)
        if not isinstance(vector, np.ndarray):
            raise ValidationError(
                "Vector is not the correct type. Expected type: numpy array or list. "
                f"Actual type: {type(vector)}"
            )
        if vector.ndim != 1:
            # a (1,d) or (d,1) matrix is squeezed; anything else is rejected
            if vector.ndim != 2 or (vector.shape[0] != 1 and vector.shape[1] != 1):
                raise ValidationError(
                    f"Each vector should be a single array. Actual size: {vector.shape}"
                )
            vector = np.squeeze(vector)
        if vector.shape[0] == 0:
            raise ValidationError("Vector dimension cannot be 0")
        if vector_dimension is not None and vector.shape[0] != vector_dimension:
            raise ValidationError(
                f"Vector is not the correct size. Expected size: {vector_dimension} "
                f"Actual size: {vector.shape[0]}"
            )
        cleaned.append(np.asarray(vector, dtype=np.float32))

    matrix = np.stack(cleaned).astype(np.float32)
    # Unconditional L2 normalization — the stored vector is NOT the user's
    # vector; this makes dot product == cosine similarity downstream
    # (reference input_validation.py:96-99).
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matrix = matrix / norms
    return matrix.astype(np.float32), metadata


def validate_remove_ids(ids) -> np.ndarray:
    """Remove-batch checks (reference input_validation.py:113-132)."""
    if isinstance(ids, list):
        ids = np.array(ids, dtype=np.int64)
    if not isinstance(ids, np.ndarray):
        raise ValidationError(
            f"IDs are not the correct type. Expected type: numpy array. Actual type: {type(ids)}"
        )
    if not np.issubdtype(ids.dtype, np.integer):
        raise ValidationError(f"IDs are not integers. IDs: {ids.dtype}")
    if np.any(ids < 0):
        raise ValidationError("Negative IDs found. All IDs must be positive")
    if ids.ndim != 1:
        raise ValidationError(f"IDs are not 1D. IDs: {ids.shape}")
    return ids.astype(np.int64)


def validate_query_vectors(query_vectors, vector_dimension: int | None) -> np.ndarray:
    """Accept one (d,) vector or a (q, d) batch; return a (q, d) float32 matrix.

    The reference only supports a single query (mindb.py:390-392); the Spark
    build generalizes to batches — a single vector is the q=1 case.
    """
    if isinstance(query_vectors, list):
        query_vectors = np.array(query_vectors, dtype=np.float32)
    if not isinstance(query_vectors, np.ndarray):
        raise ValidationError(
            "Query vectors are not the correct type. Expected type: numpy array. "
            f"Actual type: {type(query_vectors)}"
        )
    if query_vectors.ndim == 1:
        query_vectors = query_vectors.reshape(1, -1)
    if query_vectors.ndim != 2:
        raise ValidationError(f"Query vectors must be 1D or 2D. Actual: {query_vectors.shape}")
    if vector_dimension is not None and query_vectors.shape[1] != vector_dimension:
        raise ValidationError(
            f"Query vector is not the correct size. Expected size: {vector_dimension} "
            f"Actual size: {query_vectors.shape[1]}"
        )
    return query_vectors.astype(np.float32)
