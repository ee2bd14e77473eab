"""Salted skew join and the SQL-function registry."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mindb_spark.operators.joins import salted_join


def test_salted_join_matches_plain_join(spark):
    facts = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(500)], "row_id long, k int, v double"
    )
    dims = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    plain = {(r.row_id, r.name) for r in facts.join(dims, "k").collect()}
    salted = {
        (r.row_id, r.name)
        for r in salted_join(facts, dims, "k", salt_from="row_id", n_salt=8).collect()
    }
    assert salted == plain and len(plain) == 500


def test_salted_join_left_keeps_unmatched(spark):
    facts = spark.createDataFrame([(1, 10), (2, 99)], "row_id long, k int")
    dims = spark.createDataFrame([(10, "x")], "k int, name string")
    out = {r.row_id: r.name for r in
           salted_join(facts, dims, "k", "row_id", n_salt=4, how="left").collect()}
    assert out == {1: "x", 2: None}


def test_salted_join_distributes_hot_key(spark):
    # one key owns every row: the salt must spread it across sub-keys
    facts = spark.createDataFrame(
        [(i, 7) for i in range(4000)], "row_id long, k int"
    )
    salts = (
        facts.withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(16)))
        .groupBy("_salt").count().collect()
    )
    assert len(salts) == 16
    # roughly uniform: no sub-key owns more than 2x the fair share
    assert max(r["count"] for r in salts) < 2 * (4000 / 16)


def test_salted_join_validation(spark):
    df = spark.createDataFrame([(1, 1)], "row_id long, k int")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", "row_id", n_salt=0)
    with pytest.raises(ValueError):
        salted_join(df, df, "k", "row_id", how="full_outer")


# ----------------------------------------------------------------- registry
def test_sql_registry_matches_python_builders(spark):
    from mindb_spark.functions.registry import register_sql_functions
    from mindb_spark.functions.vector import dot, l2_norm

    names = register_sql_functions(spark)
    assert "vec_dot" in names and "text_fingerprint" in names

    df = spark.createDataFrame(
        [(0, [3.0, 4.0], [1.0, 0.0])], "id long, a array<double>, b array<double>"
    )
    df.createOrReplaceTempView("vecs")
    row = spark.sql(
        "select vec_dot(a, b) d, vec_l2_norm(a) n, vec_cosine(a, b) c, "
        "vec_normalize(a) na from vecs"
    ).first()
    assert row.d == 3.0 and row.n == 5.0
    assert row.c == pytest.approx(0.6)
    assert row.na == pytest.approx([0.6, 0.8])
    # parity with the Python Column builders
    py = df.select(dot("a", "b").alias("d"), l2_norm("a").alias("n")).first()
    assert (py.d, py.n) == (row.d, row.n)

    trow = spark.sql(
        "select text_fingerprint('  The   QUICK fox ') f, "
        "text_token_count('a b  c') n"
    ).first()
    from mindb_spark.functions.text import fingerprint, token_count

    ref = spark.createDataFrame([("  The   QUICK fox ",)], "t string").select(
        fingerprint("t").alias("f")
    ).first()
    assert trow.f == ref.f and trow.n == 3

    # registration is idempotent and stays JVM-side
    register_sql_functions(spark)
    plan = spark.sql("select vec_dot(a, b) from vecs")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_sql_registry_zero_vector_normalize(spark):
    from mindb_spark.functions.registry import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql("select vec_normalize(array(0.0D, 0.0D)) z").first()
    assert row.z == [0.0, 0.0]


def test_salted_join_null_keys_match_plain_join_semantics(spark):
    # null join keys never match (SQL equality), salted or not; left join
    # keeps them with null dim columns — identical to the plain join
    facts = spark.createDataFrame(
        [(1, 10), (2, None), (3, 10)], "row_id long, k int"
    )
    dims = spark.createDataFrame([(10, "x")], "k int, name string")
    plain_inner = {(r.row_id, r.name) for r in facts.join(dims, "k").collect()}
    salted_inner = {(r.row_id, r.name) for r in
                    salted_join(facts, dims, "k", "row_id", n_salt=4).collect()}
    assert salted_inner == plain_inner == {(1, "x"), (3, "x")}
    plain_left = {(r.row_id, r.name) for r in
                  facts.join(dims, "k", "left").collect()}
    salted_left = {(r.row_id, r.name) for r in
                   salted_join(facts, dims, "k", "row_id", n_salt=4, how="left").collect()}
    assert salted_left == plain_left == {(1, "x"), (2, None), (3, "x")}
