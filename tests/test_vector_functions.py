"""Vector column expressions vs numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.functions import vector as VF


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(20, 8)).astype(np.float32)
    rows = [(i, row.tolist()) for i, row in enumerate(mat)]
    df = spark.createDataFrame(rows, "id long, vector array<float>")
    return df, mat


def test_l2_normalize_matches_numpy(spark, vec_df):
    df, mat = vec_df
    out = df.select("id", VF.l2_normalize("vector").alias("nv")).orderBy("id").collect()
    expected = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    got = np.array([r.nv for r in out])
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_dot_literal_matches_numpy(spark, vec_df):
    df, mat = vec_df
    q = np.arange(8, dtype=np.float64)
    out = df.select("id", VF.dot_literal("vector", q).alias("d")).orderBy("id").collect()
    expected = mat.astype(np.float64) @ q
    np.testing.assert_allclose([r.d for r in out], expected, rtol=1e-5)


def test_cosine_similarity_range_and_self(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [-1.0, -1.0])],
        "a array<float>, b array<float>",
    )
    got = [r.c for r in df.select(VF.cosine_similarity("a", "b").alias("c")).collect()]
    np.testing.assert_allclose(got, [1.0, 0.0, -1.0], atol=1e-6)


def test_zero_vector_normalize_is_safe(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "vector array<float>")
    row = df.select(VF.l2_normalize("vector").alias("nv"), VF.l2_norm("vector").alias("n")).first()
    assert row.nv == [0.0, 0.0]
    assert row.n == 0.0
