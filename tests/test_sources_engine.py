"""Source readers (parquet/csv/json -> canonical vectors) + Engine facade."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from mindb_spark.core import validation as V
from mindb_spark.core.engine import Engine
from mindb_spark.sources.readers import (
    ingest_file,
    read_vectors_csv,
    read_vectors_json,
    read_vectors_parquet,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="src_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_vectors_parquet(spark, tmpdir):
    p = os.path.join(tmpdir, "v.parquet")
    spark.createDataFrame(
        [([0.1, 0.2], "a", 1), ([0.3, 0.4], "b", 2)],
        "vector array<double>, tag string, k long",
    ).write.parquet(p)
    df = read_vectors_parquet(spark, p, metadata_cols=["tag", "k"])
    rows = sorted(df.collect(), key=lambda r: r.vector[0])
    assert rows[0].vector == [0.1, 0.2]
    assert '"tag":"a"' in rows[0].metadata and '"k":1' in rows[0].metadata


def test_read_vectors_csv(spark, tmpdir):
    p = os.path.join(tmpdir, "v.csv")
    with open(p, "w") as f:
        f.write("vector,label\n0.5|1.5,x\n2.5|3.5,y\n")
    df = read_vectors_csv(spark, p, metadata_cols=["label"])
    rows = sorted(df.collect(), key=lambda r: r.vector[0])
    assert rows[0].vector == [0.5, 1.5] and rows[1].vector == [2.5, 3.5]


def test_read_vectors_json(spark, tmpdir):
    p = os.path.join(tmpdir, "v.jsonl")
    with open(p, "w") as f:
        f.write('{"vector": [1.0, 0.0], "src": "j1"}\n{"vector": [0.0, 1.0], "src": "j2"}\n')
    df = read_vectors_json(spark, p, metadata_cols=["src"])
    assert df.count() == 2


def test_ragged_vectors_rejected(spark, tmpdir):
    p = os.path.join(tmpdir, "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"vector": [1.0, 0.0]}\n{"vector": [1.0, 0.0, 5.0]}\n')
    with pytest.raises(V.ValidationError, match="inconsistent"):
        read_vectors_json(spark, p)


def test_engine_lifecycle(spark, tmpdir):
    eng = Engine(spark, base_path=tmpdir)
    assert eng.list_dbs() == []
    eng.create_db("alpha")
    with pytest.raises(V.ValidationError, match="already exists"):
        eng.create_db("alpha")
    eng.create_db("beta")
    assert eng.list_dbs() == ["alpha", "beta"]

    rng = np.random.default_rng(3)
    ids = eng.add("alpha", [(rng.normal(size=8).tolist(), {"n": str(i)}) for i in range(50)])
    assert len(ids) == 50
    assert eng.info("alpha")["num_vectors"] == 50
    assert eng.train_status("alpha") == "untrained"

    out = eng.query("alpha", rng.normal(size=8).tolist(), final_top_k=3)
    assert len(out["ids"]) == 3

    removed = eng.remove("alpha", ids[:5])
    assert len(removed) == 5

    # handle registry parity (view_cache / remove_from_cache / reload)
    assert eng.open_databases() == ["alpha", "beta"]
    assert eng.close("beta") and not eng.close("beta")
    db2 = eng.reload("alpha")
    assert db2.num_vectors == 45

    # ingest from a file source
    p = os.path.join(tmpdir, "more.parquet")
    spark.createDataFrame(
        [([float(i)] * 8, f"m{i}") for i in range(1, 6)], "vector array<double>, tag string"
    ).write.parquet(p)
    n = ingest_file(eng.get_db("alpha"), p, "parquet", metadata_cols=["tag"])
    assert n == 5 and eng.info("alpha")["num_vectors"] == 50

    eng.delete_db("alpha")
    assert eng.list_dbs() == ["beta"]


def test_engine_auto_train_queue(spark, tmpdir, monkeypatch):
    # lower the threshold so the policy can fire on test-sized data
    import mindb_spark.core.heuristics as H

    monkeypatch.setattr(H, "TRAINING_CUTOFF", 40)
    eng = Engine(spark, base_path=tmpdir)
    eng.create_db("small")
    eng.create_db("big")
    rng = np.random.default_rng(4)
    eng.add("small", [(rng.normal(size=4).tolist(), {}) for _ in range(10)])
    eng.add("big", [(rng.normal(size=4).tolist(), {}) for _ in range(60)])
    assert eng.initial_training_queue() == ["big"]
    assert eng.find_indexes_to_train() == ["big"]


# ------------------------------------------------------------------ sinks
def test_write_table_partition_layout_and_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from mindb_spark.sources import write_table

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(300)], "id long, grp int, v double"
    )
    path = str(tmp_path / "laid_out")
    write_table(df, path, partition_by=["grp"], sort_by=["id"])

    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("grp="))
    assert dirs == ["grp=0", "grp=1", "grp=2"]

    back = spark.read.parquet(path)
    assert back.count() == 300
    # equality filter on the partition column prunes at plan time
    plan = back.where(F.col("grp") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "grp" in plan.split("PartitionFilters")[-1].split("]")[0]


def test_write_table_sorted_row_groups_tighten_stats(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from mindb_spark.sources import write_table

    df = spark.createDataFrame(
        [((i * 7919) % 1000, "x" * 10) for i in range(1000)], "k long, pad string"
    ).repartition(2)
    path = str(tmp_path / "sorted")
    write_table(df, path, sort_by=["k"])
    # row-group/file min-max stats must be tight (sorted): per file,
    # observed min == stats min and max == stats max, and files written by
    # one task cover non-degenerate sorted ranges
    files = glob.glob(f"{path}/*.parquet")
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("k")
        vals = pq.read_table(f, columns=["k"])["k"].to_pylist()
        st = md.row_group(0).column(col_idx).statistics
        assert st.min == min(vals) and md.row_group(md.num_row_groups - 1).column(col_idx).statistics.max == max(vals)
        assert vals == sorted(vals)


def test_write_table_csv_json_and_validation(spark, tmp_path):
    import pytest

    from mindb_spark.sources import write_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    write_table(df, str(tmp_path / "t.csv"), fmt="csv")
    assert spark.read.option("header", True).csv(str(tmp_path / "t.csv")).count() == 2
    write_table(df, str(tmp_path / "t.json"), fmt="json")
    assert spark.read.json(str(tmp_path / "t.json")).count() == 2
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "t.x"), fmt="avro")
