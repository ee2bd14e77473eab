"""Validation-semantics tests (reference ``tests/unit/test_input_validation.py``)."""

import numpy as np
import pytest

from mindb_spark.core import validation as V


def test_database_name():
    V.validate_database_name("my_db-1 ok")
    with pytest.raises(V.ValidationError):
        V.validate_database_name("bad/name")
    with pytest.raises(V.ValidationError):
        V.validate_database_name("")


@pytest.mark.parametrize(
    "kwargs,msg",
    [
        (dict(vector_dimension=None, pca_dimension=None, opq_dimension=None, compressed_vector_bytes=None), "No vectors"),
        (dict(vector_dimension=768, pca_dimension=256, opq_dimension=128, compressed_vector_bytes=None), "must be set"),
        (dict(vector_dimension=768, pca_dimension="256", opq_dimension=None, compressed_vector_bytes=None), "not the correct type"),
        (dict(vector_dimension=768, pca_dimension=-1, opq_dimension=None, compressed_vector_bytes=None), "not positive"),
        (dict(vector_dimension=768, pca_dimension=1024, opq_dimension=None, compressed_vector_bytes=None), "larger than the number of columns"),
        (dict(vector_dimension=768, pca_dimension=128, opq_dimension=256, compressed_vector_bytes=32), "larger than pca_dimension"),
        (dict(vector_dimension=768, pca_dimension=256, opq_dimension=100, compressed_vector_bytes=32), "not divisible"),
    ],
)
def test_train_param_rejections(kwargs, msg):
    with pytest.raises(V.ValidationError, match=msg):
        V.validate_train_params(**kwargs)


def test_train_params_valid():
    V.validate_train_params(768, 256, 128, 32)
    V.validate_train_params(768, None, None, None)


def test_add_normalizes_and_pins_dimension():
    data = [(np.array([3.0, 4.0]), {"t": "a"}), ([0.0, 2.0], {"t": "b"})]
    vecs, meta = V.validate_and_normalize_add(data, vector_dimension=None)
    assert vecs.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(vecs[0], [0.6, 0.8], rtol=1e-6)
    assert meta == [{"t": "a"}, {"t": "b"}]


def test_add_squeezes_row_and_column_vectors():
    data = [(np.ones((1, 4)), {}), (np.ones((4, 1)), {})]
    vecs, _ = V.validate_and_normalize_add(data, vector_dimension=4)
    assert vecs.shape == (2, 4)


@pytest.mark.parametrize(
    "data,msg",
    [
        ("nope", "not the correct type"),
        ([["v", {}]], "List item is not the correct type"),
        ([], "no vectors"),
        ([(np.ones((2, 3)), {})], "single array"),
        ([("text", {})], "numpy array or list"),
    ],
)
def test_add_rejections(data, msg):
    with pytest.raises(V.ValidationError, match=msg):
        V.validate_and_normalize_add(data, vector_dimension=None)


def test_add_dim_mismatch_rejects_whole_batch():
    data = [(np.ones(4), {}), (np.ones(5), {})]
    with pytest.raises(V.ValidationError, match="not the correct size"):
        V.validate_and_normalize_add(data, vector_dimension=4)


def test_remove_ids():
    out = V.validate_remove_ids([1, 2, 3])
    assert out.dtype == np.int64
    with pytest.raises(V.ValidationError, match="not integers"):
        V.validate_remove_ids(np.array([1.5]))
    with pytest.raises(V.ValidationError, match="Negative"):
        V.validate_remove_ids(np.array([-1]))
    with pytest.raises(V.ValidationError, match="not 1D"):
        V.validate_remove_ids(np.array([[1], [2]]))


def test_query_vectors():
    q = V.validate_query_vectors([1.0, 2.0, 3.0], 3)
    assert q.shape == (1, 3)
    qb = V.validate_query_vectors(np.ones((5, 3), dtype=np.float64), 3)
    assert qb.shape == (5, 3) and qb.dtype == np.float32
    with pytest.raises(V.ValidationError, match="not the correct size"):
        V.validate_query_vectors(np.ones(4), 3)
