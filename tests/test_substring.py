"""Exact substring (token-span) dedup: span extraction, coverage, and
removal vs a brute-force reference, plus DuckDB parity for the coverage
profile (the shape the driver oracle uses)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.substring import (
    dup_token_coverage,
    duplicated_spans,
    remove_duplicated_spans,
)

DOCS = [
    # doc 1 is the first occurrence of everything it contains
    (1, "a b c d e f g h"),
    # doc 2 repeats doc 1's full text -> one span covering all 8 tokens
    (2, "a b c d e f g h"),
    # doc 3 embeds doc 1's prefix (a..e = grams a-e only) plus unique tail
    (3, "a b c d e x y z w"),
    # doc 4: two disjoint duplicated regions separated by unique tokens
    (4, "a b c d e q r s t u d e f g h"),
    # doc 5: too short for any 5-gram
    (5, "p q"),
    # doc 6: unique text, no spans
    (6, "m n o p q r s t"),
]
N = 5


def _brute(docs, n):
    """(id -> set of covered token positions) by literal gram strings."""
    first = {}
    occs = []
    for doc_id, text in docs:
        ts = text.split(" ")
        for i in range(max(len(ts) - n + 1, 0)):
            g = " ".join(ts[i : i + n])
            occs.append((doc_id, i, g))
            if g not in first or (doc_id, i) < first[g]:
                first[g] = (doc_id, i)
    counts = {}
    for _, _, g in occs:
        counts[g] = counts.get(g, 0) + 1
    covered = {doc_id: set() for doc_id, _ in docs}
    for doc_id, i, g in occs:
        if counts[g] > 1 and first[g] != (doc_id, i):
            covered[doc_id].update(range(i, i + n))
    return covered


def test_spans_match_brute_force_coverage(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in duplicated_spans(df, "doc_id", "text", n=N).collect():
        got.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"])
        )
    want = {k: v for k, v in _brute(DOCS, N).items() if v}
    assert got == want


def test_spans_are_maximal_and_disjoint(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    spans = duplicated_spans(df, "doc_id", "text", n=N).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for doc_id, ss in per_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1, f"doc {doc_id}: spans {ss} overlap or touch"
    # doc 4 has two separate regions
    assert len(per_doc[4]) == 2


def test_coverage_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_token_coverage(df, "doc_id", "text", n=N).collect()
    }
    want = {doc_id: len(c) for doc_id, c in _brute(DOCS, N).items()}
    assert got == want
    assert got[1] == 0 and got[2] == 8 and got[5] == 0 and got[6] == 0


def test_removal_keeps_first_copy_and_uncovered_tokens(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_spans(df, "doc_id", "text", n=N).collect()
    }
    covered = _brute(DOCS, N)
    for doc_id, text in DOCS:
        ts = text.split(" ")
        want = " ".join(
            t for i, t in enumerate(ts) if i not in covered[doc_id]
        )
        assert got[doc_id] == want, doc_id
    assert got[1] == "a b c d e f g h"  # first copy intact
    assert got[2] == ""  # full duplicate emptied


def test_null_text_passes_through(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, None)], "doc_id long, text string"
    )
    out = remove_duplicated_spans(df, "doc_id", "text", n=N)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[2] is None and got[1] == "a b c d e f"


def test_duckdb_parity_coverage(spark):
    """The driver-oracle shape: dup_tokens per doc vs DuckDB computing the
    same first-occurrence rule on literal gram strings."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_token_coverage(df, "doc_id", "text", n=N).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = dict(
        con.sql(
            f"""
            WITH tok AS (
              SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest(generate_series(1, greatest(len(ts) - {N - 1}, 0)))
                       AS i,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ts) - {N - 1}, 0)),
                       i -> array_to_string(ts[i:i+{N - 1}], ' '))) AS g
              FROM tok),
            marked AS (
              SELECT doc_id, i,
                     count(*) OVER (PARTITION BY g) AS c,
                     row_number() OVER (
                       PARTITION BY g ORDER BY doc_id, i) AS rn
              FROM grams),
            flagged AS (
              SELECT doc_id, i FROM marked WHERE c > 1 AND rn > 1),
            covered AS (
              SELECT doc_id, count(DISTINCT t) AS dup_tokens
              FROM (SELECT doc_id, unnest(generate_series(i, i + {N - 1}))
                      AS t FROM flagged)
              GROUP BY doc_id)
            SELECT d.doc_id, coalesce(c.dup_tokens, 0) AS dup_tokens
            FROM documents d LEFT JOIN covered c USING (doc_id)
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_corpus_matches_brute_force(spark, seed):
    """Random corpora over a 4-token alphabet (dense gram collisions,
    intra-doc repeats, many cross-doc ties) — coverage must equal the
    literal brute-force reference for every doc."""
    import random

    rng = random.Random(seed)
    docs = [
        (i, " ".join(rng.choice("abcd") for _ in range(rng.randint(3, 30))))
        for i in range(1, 26)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_token_coverage(df, "doc_id", "text", n=N).collect()
    }
    want = {doc_id: len(c) for doc_id, c in _brute(docs, N).items()}
    assert got == want


def test_min_span_tokens_keeps_short_repeats(spark):
    """Only long duplicated regions are removed; short incidental matches
    (common phrases) survive everywhere."""
    docs = [
        (1, "a b c d e f g h i j"),       # source of the long region
        (2, "a b c d e f g h i j"),       # 10-token repeat -> removed
        (3, "z z a b c d e y y w w q"),   # only a 5-token repeat -> kept
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_spans(
            df, "doc_id", "text", n=N, min_span_tokens=8
        ).collect()
    }
    assert got[1] == docs[0][1]
    assert got[2] == ""                   # long repeat removed
    assert got[3] == docs[2][1]           # short repeat kept intact
    # with the knob off, the short region is removed too
    got0 = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_spans(df, "doc_id", "text", n=N).collect()
    }
    assert got0[3] == "z z y y w w q"


def test_flagged_starts_broadcasts_on_clean_corpus(spark):
    """On a mostly-clean corpus the duplicated-gram winner set is tiny:
    AQE must broadcast it so the occurrence rows never shuffle for the
    join; results unchanged."""
    from bitfilters_spark.operators.substring import dup_token_coverage

    rows = [(i, " ".join(f"u{i}w{j}" for j in range(40))) for i in range(200)]
    # one duplicated region shared by two docs
    rows[0] = (0, rows[2][1])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cov = dup_token_coverage(df, "doc_id", "text", n=5)
    got = {r["doc_id"]: r["dup_tokens"] for r in cov.collect()}
    assert got[2] == 40 and got[0] == 0 and got[1] == 0  # min-(id,pos) keeps doc 0
    plan = cov._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
