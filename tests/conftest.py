"""Shared Spark session for the test suite (local mode, AQE on)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    session = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mindb_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _isolated_gate_cert_store(tmp_path):
    """Point the similarity lanes' AUTO gate-certification store at a
    per-test temp file (round 12). Without this, certifications written
    through to the default ~/.cache store by one pytest run would be
    auto-loaded by the next, breaking every _GATE_RUNS counter pin."""
    from mindb_spark.operators import similarity as S

    S.set_gate_certification_store(str(tmp_path / "gate_certs.json"))
    yield
    S.set_gate_certification_store(None)
    S.clear_gate_certifications()
