"""Session builder helpers."""

from __future__ import annotations

from mindb_spark.session import _scaled_mem, widen


def test_scaled_mem_units_and_floor():
    assert _scaled_mem("48g", 0.75) == "36864m"
    assert _scaled_mem("512m", 0.75) == "384m"
    assert _scaled_mem("2t", 0.5) == f"{1024 * 1024}m"
    assert _scaled_mem("1024k", 1.0) == "1m"
    # bare bytes parse, and the 1 MiB floor holds
    assert _scaled_mem("1048576", 2.0) == "2m"
    assert _scaled_mem("1", 0.5) == "1m"


def test_widen_is_noop_when_already_wide(spark):
    df = spark.range(1000, numPartitions=64)
    # target defaults to driver parallelism, which is < 64 here
    assert widen(df) is df


def test_widen_repartitions_narrow_input(spark):
    df = spark.range(1000, numPartitions=1)
    out = widen(df, min_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 1000
