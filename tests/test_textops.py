"""Text-analysis operators vs DuckDB oracle + planted cases."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mindb_spark.operators import textops as T

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    return con


def test_token_counts_match_duckdb(docs, duck):
    got = {(r.doc_id, r.n_tokens) for r in T.token_counts(docs).collect()}
    exp = set(
        duck.sql(
            r"select doc_id, len(regexp_extract_all(text, '\S+')) from documents"
        ).fetchall()
    )
    assert got == exp


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, " one  two\tthree\nfour ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens for r in T.token_counts(df).collect()}
    assert got == {1: 0, 2: 0, 3: 4}


def test_fingerprints_match_duckdb(docs, duck):
    got = {(r.doc_id, r.fingerprint) for r in T.fingerprints(docs).collect()}
    exp = set(
        duck.sql(
            r"select doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) from documents"
        ).fetchall()
    )
    assert got == exp


def test_quality_features_match_duckdb(docs, duck):
    got = {
        (r.doc_id, r.n_chars, r.n_tokens, r.avg_token_len, r.punct_ratio)
        for r in T.quality_features(docs).collect()
    }
    exp_rows = duck.sql(
        r"""
        with t as (
          select doc_id, text, regexp_extract_all(text, '\S+') toks,
                 length(text) n_chars,
                 len(regexp_extract_all(text, '\S+')) n_tokens,
                 length(regexp_replace(text, '[^.,;:!?]', '', 'g')) punct
          from documents
        )
        select doc_id, n_chars, n_tokens,
               round(list_sum(list_transform(toks, x -> length(x))) * 1.0 / greatest(n_tokens, 1), 6),
               round(punct * 1.0 / greatest(n_chars, 1), 6)
        from t
        """
    ).fetchall()
    exp = {(a, b, c, float(d), float(e)) for a, b, c, d, e in exp_rows}
    assert got == exp


def test_detect_language_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house with it"),
            (2, "el perro y la casa de los gatos en la calle"),
            (3, "der Hund und die Katze von den Leuten ist nicht da"),
            (4, "le chat et les chiens dans une maison est que"),
            (5, "xylophone zebra quantum"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.detected_lang for r in T.detect_language(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_detect_language_runs_on_testdata(docs):
    out = T.detect_language(docs)
    assert out.count() == docs.count()
    langs = {r.detected_lang for r in out.select("detected_lang").distinct().collect()}
    assert langs <= {"en", "es", "de", "fr", "und"}


def test_repetition_stats_planted(spark):
    from mindb_spark.operators.textops import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a a"),                      # one token repeated 4x
            (2, "w x y z"),                      # all distinct
            (3, "line\nline\nother"),            # duplicate line
            (4, ""),                             # empty doc
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].n_tokens == 4
    assert got[1].distinct_token_ratio == 0.25
    assert got[1].top_token_ratio == 1.0
    assert got[2].distinct_token_ratio == 1.0
    assert got[2].top_token_ratio == 0.25
    assert abs(got[3].dup_line_ratio - (1 - 2 / 3)) < 1e-6
    assert got[4].n_tokens == 0 and got[4].top_token_ratio == 0.0


def test_scrub_pii_planted(spark):
    from mindb_spark.operators.textops import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk please"),
            (2, "server 192.168.001.1 and phone 555-123-4567"),
            (3, "nothing sensitive here"),
            (4, "two mails a@b.io c@d.org and 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert got[1].clean_text == "mail me at <EMAIL> please"
    assert got[1].n_emails == 1 and got[1].n_ips == 0
    assert got[2].clean_text == "server <IP> and phone <PHONE>"
    assert got[2].n_ips == 1 and got[2].n_phones == 1
    assert got[3].clean_text == "nothing sensitive here"
    assert got[4].n_emails == 2 and got[4].n_ips == 1
    assert got[4].clean_text == "two mails <EMAIL> <EMAIL> and <IP>"
