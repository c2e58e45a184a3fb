"""Gopher quality-rule pack: each rule triggers on a targeted document;
flags are integer-exact and DuckDB-reproducible."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.text import gopher_rules

GOOD = (
    "the quick brown fox jumps over that lazy dog and it continues to "
    "run with great speed through fields of wheat and corn because "
    "morning light makes every path look open and the long day have "
    "only begun for creatures that wander with purpose and hope while "
    "evening shadows gather slowly across quiet meadows"
)

DOCS = [
    (1, GOOD),  # passes everything
    (2, "too short to pass the word count and that is all of it"),  # < 50 words
    (3, GOOD + " " + " ".join(["a"] * 60)),  # mean word length < 3
    (4, GOOD + " " + " ".join(["####"] * 20)),  # symbol ratio > 0.1
    (5, GOOD + " " + " ".join(["1234"] * 40)),  # < 80% alphabetic words
    (6, " ".join(["lorem", "ipsum", "dolor", "sit", "amet"] * 12)),  # no stopwords
    (7, GOOD + " " + " ".join(["..."] * 20)),  # ellipsis symbol ratio
]


def _got(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(df, "text", min_words=50).collect()
    }


def test_each_rule_fires_on_its_target(spark):
    got = _got(spark)
    assert got[1]["gopher_pass"]
    assert not got[2]["rule_word_count"] and not got[2]["gopher_pass"]
    assert not got[3]["rule_mean_len"] and not got[3]["gopher_pass"]
    assert not got[4]["rule_symbol_ratio"] and not got[4]["gopher_pass"]
    assert not got[5]["rule_alpha_words"] and not got[5]["gopher_pass"]
    assert not got[6]["rule_stopwords"] and not got[6]["gopher_pass"]
    assert not got[7]["rule_symbol_ratio"] and not got[7]["gopher_pass"]
    # targeted docs keep unrelated rules green
    assert got[2]["rule_mean_len"] and got[2]["rule_stopwords"]
    assert got[4]["rule_word_count"] and got[4]["rule_stopwords"]
    assert got[5]["rule_word_count"] and got[5]["rule_symbol_ratio"]


def test_duckdb_parity(spark):
    got = {
        d: (
            r["n_words"],
            r["n_stopwords_distinct"],
            r["gopher_pass"],
        )
        for d, r in _got(spark).items()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = dict()
    for doc_id, n_words, n_stop, gp in con.sql(
        """
        WITH m AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_words,
                 length(replace(text, ' ', '')) AS word_chars,
                 length(text) - length(replace(text, '#', '')) AS n_hash,
                 (length(text) - length(replace(text, '...', ''))) // 3
                   AS n_ellipsis,
                 len(list_filter(string_split(text, ' '),
                     w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
                 len(list_intersect(string_split(text, ' '),
                     ['the','be','to','of','and','that','have','with']))
                   AS n_stop
          FROM documents)
        SELECT doc_id, n_words, n_stop,
               (n_words BETWEEN 50 AND 100000)
               AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
               AND (10 * (n_hash + n_ellipsis) <= n_words)
               AND (5 * n_alpha >= 4 * n_words)
               AND (n_stop >= 2) AS gopher_pass
        FROM m
        """
    ).fetchall():
        want[doc_id] = (n_words, n_stop, gp)
    assert got == want


def test_blocklist_filter_token_level(spark):
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.text import blocklist_filter, blocklist_hits

    rows = [
        (1, "a perfectly CLEAN document about classes"),  # 'classes' != 'class'
        (2, "contains one BadWord here"),
        (3, "badword badword twice"),
        (4, "no issues at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", blocklist_hits(F.col("text"), ["badword", "class"]).alias("h")
        ).collect()
    }
    assert hits == {1: 0, 2: 1, 3: 2, 4: 0}
    kept = sorted(
        r["doc_id"]
        for r in blocklist_filter(df, "text", ["badword", "class"]).collect()
    )
    assert kept == [1, 4]
    lenient = sorted(
        r["doc_id"]
        for r in blocklist_filter(df, "text", ["badword"], max_hits=1).collect()
    )
    assert lenient == [1, 2, 4]
    # empty blocklist keeps everything
    assert blocklist_filter(df, "text", []).count() == 4


def test_c4_line_filter_and_page_gates(spark):
    """C4 rule pack: each line rule and each page gate fires on exactly
    its target; the cleaned text preserves surviving lines in order."""
    from bitfilters_spark.operators.text import c4_rules

    pages = {
        0: "Good first line stays right here.\nshort one.\nAnother fine sentence with enough words.",
        1: "This page is fine overall today.\nBut it has a { brace line.",
        2: "Nice opener sentence with many words.\nLorem Ipsum is planted right here.",
        3: "Perfectly clean page line number one.\nThis line mentions badword1 openly here.",
        4: "A javascript cookie warning sentence here.\nReal content line with proper ending.",
        5: "no terminal punctuation on this line at all\nSecond line also unterminated",
        6: "Embedded notbadword1x should not trip the word-boundary gate.",
    }
    df = spark.createDataFrame(list(pages.items()), "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_rules(df, "text").collect()}

    assert out[0]["c4_n_kept"] == 2
    assert out[0]["c4_clean"] == (
        "Good first line stays right here.\n"
        "Another fine sentence with enough words."
    )
    assert out[1]["c4_has_brace"] and not out[1]["c4_pass"]
    assert out[2]["c4_has_lorem"] and not out[2]["c4_pass"]
    assert out[3]["c4_has_badword"] and not out[3]["c4_pass"]
    # javascript line dropped, the other survives
    assert out[4]["c4_n_kept"] == 1
    assert "javascript" not in out[4]["c4_clean"]
    # nothing survives: n_kept 0, clean empty, page fails on min lines
    assert out[5]["c4_n_kept"] == 0 and out[5]["c4_clean"] == ""
    assert not out[5]["c4_pass"]
    # word-boundary: substring hit must NOT fire the bad-word gate
    assert not out[6]["c4_has_badword"]

    # a page that keeps >= 3 lines and trips no gate passes
    ok = spark.createDataFrame(
        [(9, "One proper line stays right here.\n"
             "Two proper lines stay right here.\n"
             "Three proper lines stay right here.")],
        "doc_id long, text string",
    )
    row = c4_rules(ok, "text").collect()[0]
    assert row["c4_pass"] and row["c4_n_kept"] == 3
