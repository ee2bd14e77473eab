"""Bucket-scheme versioning: legacy mod-bucketed codes tables must keep
returning complete results under the scheme-aware reader.

Pre-range-bucketing indexes wrote ``cluster_bucket = cluster_id % B``;
round-5 builds write range buckets. Reading one scheme's table with the
other scheme's bucket filter silently drops probed rows — the manifest
``bucket_scheme`` key (absent = legacy mod) plus the ``bucket_scheme``
parameter threaded through encode/search prevents that.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.index import ivf
from mindb_spark.index.build import bucket_expr, cell_bucket, encode_all, fit_pca


def test_cell_bucket_schemes():
    # range: contiguous ids share buckets; mod: round-robin
    assert [cell_bucket(c, 4, 16, "range") for c in range(8)] == [0, 0, 0, 0, 1, 1, 1, 1]
    assert [cell_bucket(c, 4, 16, "mod") for c in range(8)] == [0, 1, 2, 3, 0, 1, 2, 3]
    # clamp at the top of the range
    assert cell_bucket(15, 4, 16, "range") == 3


def test_bucket_expr_matches_python(spark):
    df = spark.range(100).selectExpr("cast(id as int) as cluster_id")
    for scheme in ("range", "mod"):
        got = {
            r.cluster_id: r.b
            for r in df.withColumn("b", bucket_expr(8, 100, scheme)).collect()
        }
        for cid in range(100):
            assert got[cid] == cell_bucket(cid, 8, 100, scheme), (scheme, cid)


@pytest.mark.slow
def test_mod_bucketed_table_reads_complete(spark, tmp_path):
    """A mod-partitioned codes table searched with bucket_scheme='mod'
    returns exactly the same rows as the unpartitioned (filter-free)
    scan — i.e. the legacy layout loses nothing under the new reader."""
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(12, 16)) * 3.0
    mat = centers[rng.integers(0, 12, 4000)] + rng.normal(size=(4000, 16))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        "id long, vector array<double>",
    )
    import mindb_spark.index.pq as PQ
    from mindb_spark.index.build import IndexArtifacts

    mean, pca = fit_pca(vdf, "vector", 16)
    # tiny handmade index: 32 sampled centroids, PQ on residuals
    sample = mat[rng.integers(0, 4000, 512)]
    proj = (sample - mean) @ pca
    centroids = proj[rng.integers(0, 512, 32)]
    codebooks = PQ.train_codebooks(proj - centroids[0], m=4, seed=1)
    arts = IndexArtifacts(mean, pca, centroids, codebooks)

    codes = encode_all(vdf, arts, n_buckets=8, bucket_scheme="mod")
    path = str(tmp_path / "codes_mod")
    codes.write.mode("overwrite").partitionBy("cluster_bucket").parquet(path)
    codes_read = spark.read.parquet(path)

    queries = [(0, mat[7]), (1, mat[99])]
    out_mod = ivf.search(
        codes_read, vdf, arts, queries, preliminary_top_k=100, final_top_k=10,
        n_probe=4, n_buckets=8, bucket_scheme="mod", rescore_from_codes=False,
    ).collect()
    # ground truth: the same search over an unpartitioned table (no
    # bucket filter can apply, kernel sees every row)
    out_flat = ivf.search(
        codes.drop("cluster_bucket").withColumn("cluster_bucket", F.lit(0)),
        vdf, arts, queries, preliminary_top_k=100, final_top_k=10,
        n_probe=4, n_buckets=1, bucket_scheme="mod", rescore_from_codes=False,
    ).collect()
    key = lambda r: (r.query_id, r.id)
    assert sorted(map(key, out_mod)) == sorted(map(key, out_flat))
    # and reading the SAME mod table with the WRONG (range) scheme drops
    # rows for at least one selective probe — the bug the manifest key
    # prevents (documenting the failure mode, not desired behavior)
    out_wrong = ivf.search(
        codes_read, vdf, arts, queries, preliminary_top_k=100, final_top_k=10,
        n_probe=4, n_buckets=8, bucket_scheme="range", rescore_from_codes=False,
    ).collect()
    assert len(out_wrong) <= len(out_flat)


def test_manifest_scheme_roundtrip(spark, tmp_path):
    """train() stamps bucket_scheme='range'; a manifest without the key
    is read as legacy 'mod' everywhere."""
    from mindb_spark.core.database import VectorDB

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 12)) * 3.0
    mat = (centers[rng.integers(0, 8, 5200)] + rng.normal(size=(5200, 12))).astype(
        np.float32
    )
    db = VectorDB(spark, "schemedb", base_path=str(tmp_path))
    db.add([(v, {}) for v in mat])
    db.train(use_two_level_clustering=False)
    assert db._manifest["bucket_scheme"] == "range"
    assert db._manifest.get("covering") is False
    # covering persists across an auto-style retrain with no explicit flag
    db.train(covering=True, use_two_level_clustering=False)
    assert db._manifest["covering"] is True
    db.train(use_two_level_clustering=False)  # covering=None -> inherit
    assert db._manifest["covering"] is True
