"""As-of join operator + metadata-filtered vector queries."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.core.database import VectorDB
from mindb_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, 100.0),
            ("A", 20, 101.0),
            ("A", 5, 99.0),
            ("B", 15, 50.0),
            ("C", 1, 7.0),  # no quote before it
        ],
        "sym string, ts long, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 8, 1),
            ("A", 10, 2),   # equal-ts quote: included for <=, excluded for <
            ("A", 18, 3),
            ("B", 15, 4),
            ("B", 15, 5),   # same-ts duplicate: tiebreak must pick qid 5
            ("C", 9, 6),    # after the only C trade
        ],
        "sym string, ts long, qid long",
    )
    return trades, quotes


def _result(df):
    return {
        (r.sym, r.ts): (r.qid_asof, r.ts_asof)
        for r in df.collect()
    }


def test_asof_join_nonstrict(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", right_cols=("qid",), right_tiebreak="qid"
    )
    got = _result(out)
    assert got[("A", 10)] == (2, 10)   # equal ts matches
    assert got[("A", 20)] == (3, 18)
    assert got[("A", 5)] == (None, None)
    assert got[("B", 15)] == (5, 15)   # deterministic tiebreak: larger qid
    assert got[("C", 1)] == (None, None)
    # left row count preserved (no fan-out)
    assert out.count() == trades.count()


def test_asof_join_strict(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", right_cols=("qid",), strict=True, right_tiebreak="qid"
    )
    got = _result(out)
    assert got[("A", 10)] == (1, 8)    # equal ts excluded
    assert got[("B", 15)] == (None, None)


def test_asof_join_keeps_left_columns(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", right_cols=("qid",), right_tiebreak="qid")
    row = {(r.sym, r.ts): r.px for r in out.collect()}
    assert row[("A", 10)] == 100.0


def test_metadata_filtered_query(spark):
    tmp = tempfile.mkdtemp(prefix="vdb_f_")
    try:
        db = VectorDB(spark, "filtered", base_path=tmp)
        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(100, 8)).astype("float64")
        db.add([(v.tolist(), {"lang": "en" if i % 2 == 0 else "de"}) for i, v in enumerate(vecs)])

        out = db.query(
            vecs[1].tolist(), final_top_k=5,
            metadata_filter="get_json_object(metadata, '$.lang') = 'de'",
        )
        assert out["ids"][0] == 1  # the de-tagged self vector wins
        assert all(m["lang"] == "de" for m in out["metadata"])
        assert len(out["ids"]) == 5

        # filter excluding the self vector: it must not appear
        out2 = db.query(
            vecs[1].tolist(), final_top_k=5,
            metadata_filter="get_json_object(metadata, '$.lang') = 'en'",
        )
        assert 1 not in out2["ids"]
        assert all(m["lang"] == "en" for m in out2["metadata"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_asof_join_carries_whole_right_row_with_nulls(spark):
    """Right columns with nulls must arrive from ONE right row (the latest),
    never mixed across rows by independent ignorenulls carries."""
    quotes = spark.createDataFrame(
        [("A", 1, 10.0, None), ("A", 2, None, "y2")],
        "sym string, ts long, px double, note string",
    )
    trades = spark.createDataFrame([("A", 3)], "sym string, ts long")
    out = asof_join(
        trades, quotes, on="sym", right_cols=("px", "note"), right_tiebreak="ts"
    ).collect()
    assert len(out) == 1
    r = out[0]
    # latest right row is ts=2: px NULL, note "y2" — a column-wise carry
    # would wrongly surface px=10.0 from ts=1
    assert r.px_asof is None
    assert r.note_asof == "y2"
    assert r.ts_asof == 2
