"""Sub-document (paragraph-level) dedup: corpus-wide first-occurrence
semantics, bypass rule, order preservation, and DuckDB parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.dedup import dedup_paragraphs

SEP = "\n\n"

DOCS = [
    (1, "alpha beta" + SEP + "COMMON LICENSE BLOCK" + SEP + "gamma"),
    (2, "COMMON LICENSE BLOCK" + SEP + "delta epsilon"),
    (3, "unique text here" + SEP + "COMMON LICENSE BLOCK" + SEP + "zeta"),
    (4, "COMMON LICENSE BLOCK"),  # every paragraph a dup -> empty doc
    (5, "eta theta" + SEP + "eta theta"),  # intra-doc repeat: keep first
    (6, "ok"),  # short paragraph
]


def _got(spark, min_chars=0):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = dedup_paragraphs(df, "doc_id", "text", sep=SEP, min_chars=min_chars)
    return {r["doc_id"]: r["text"] for r in out.collect()}


def test_first_occurrence_wins_and_order_is_preserved(spark):
    got = _got(spark)
    assert got[1] == "alpha beta" + SEP + "COMMON LICENSE BLOCK" + SEP + "gamma"
    assert got[2] == "delta epsilon"  # lost the boilerplate to doc 1
    assert got[3] == "unique text here" + SEP + "zeta"
    assert got[4] == ""  # all paragraphs were dups
    assert got[5] == "eta theta"  # intra-doc repeat collapsed
    assert got[6] == "ok"


def test_min_chars_bypass_keeps_short_paragraphs(spark):
    docs = [
        (1, "xx" + SEP + "long enough paragraph"),
        (2, "xx" + SEP + "long enough paragraph" + SEP + "xx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup_paragraphs(df, "doc_id", "text", sep=SEP, min_chars=3)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # "xx" is under min_chars: every copy survives; the long paragraph dedups
    assert got[1] == "xx" + SEP + "long enough paragraph"
    assert got[2] == "xx" + SEP + "xx"


def test_null_text_passes_through(spark):
    df = spark.createDataFrame(
        [(1, "a" + SEP + "b"), (2, None)], "doc_id long, text string"
    )
    out = dedup_paragraphs(df, "doc_id", "text", sep=SEP)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[2] is None and got[1] == "a" + SEP + "b"


@pytest.mark.parametrize("min_chars", [0, 3])
def test_duckdb_parity(spark, min_chars):
    got = _got(spark, min_chars)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", DOCS)
    want = {
        doc_id: text
        for doc_id, text in con.sql(
            f"""
            WITH parts AS (
              SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps FROM t),
            ex AS (
              SELECT doc_id, unnest(ps) AS p,
                     unnest(generate_series(1, len(ps))) AS i
              FROM parts),
            dedupable AS (SELECT * FROM ex WHERE length(p) >= {min_chars}),
            winners AS (
              SELECT doc_id, i, p FROM dedupable
              QUALIFY row_number() OVER (PARTITION BY p ORDER BY doc_id, i) = 1),
            keep AS (
              SELECT * FROM winners
              UNION ALL
              SELECT doc_id, i, p FROM ex WHERE length(p) < {min_chars})
            SELECT t.doc_id,
                   coalesce(string_agg(k.p, chr(10)||chr(10) ORDER BY k.i), '')
                     AS text
            FROM t LEFT JOIN keep k USING (doc_id)
            GROUP BY t.doc_id
            """
        ).fetchall()
    }
    assert got == want
